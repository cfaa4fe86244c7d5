package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Dev tool: stage attribution for q_canonical_dedup (r17 — the full-suite
  * timing sweep found it the slowest declared query at sf0.1). Times the
  * pair pipeline, the connected-components loop (with iteration count),
  * the quality score, and the declared query end-to-end, so wall time can
  * be pinned to a stage rather than guessed. */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.QueriesText.{Bands, Rows, JaccardThreshold}

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best3(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => System.gc(); time(f) }
      println(f"$name%-28s best ${ts.min}%.3f s  samples ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables.documents(spark, sfDir)
    def pairs = DedupOps.minhashNearDupsWords(docs, "doc_id", "text",
      Bands, Rows, JaccardThreshold)
    best3("pairs_pipeline")(noop(pairs))
    best3("dedup_clusters")(noop(DedupOps.dedupClusters(pairs)))
    best3("quality")(noop(
      SparkEntry.queries("q_quality")(spark, sfDir)))
    best3("full_q_canonical_dedup")(noop(
      SparkEntry.queries("q_canonical_dedup")(spark, sfDir)))
    spark.stop()
  }
}
