package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Dev tool: stage-attribution for the q_neardup_lsh pipeline — times each
  * phase cumulatively (shingles, signatures, band candidates, estimate
  * pre-filter, exact rerank, full declared query) and prints the row count
  * each phase carries, so a wall-time shift can be pinned to a specific
  * phase or to corpus-shape change (candidate density, shingle volume).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.QueriesText.{Bands, Rows, JaccardThreshold}

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s best ${ts.min}%.3f s  samples ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    def docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nUniq = docs.select(md5(col("text"))).distinct().count()
    println(s"docs=$nDocs distinctText=$nUniq")

    def sh = DedupOps.wordShingleHashes(docs, "doc_id", "text")
    println(s"shingleRows=${sh.count()}")
    def sigs = DedupOps.minhashSignatures(sh)
    def cand = DedupOps.lshCandidates(sigs, Bands, Rows)
    println(s"candidates=${cand.count()}")

    best3("shingles")(sh)
    best3("signatures")(sigs)
    best3("candidates")(cand)
    best3("full_q_neardup_lsh")(
      SparkEntry.queries("q_neardup_lsh")(spark, sfDir))

    // Cap-cost isolation (r9 bench watch item): candidates from CUT
    // signatures — the shape the real query runs — with the hot-bucket
    // cap vs the raw band self-join, plus the capped plan's reuse audit.
    import graft.ops.Phase._
    val sigsCut = sigs.phaseCut
    def rawCand = {
      val banded = DedupOps.bandedKeys(sigsCut, Bands, Rows)
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct()
    }
    best3("cand_capped_cutsigs")(DedupOps.lshCandidates(sigsCut, Bands, Rows))
    best3("cand_uncapped_cutsigs")(rawCand)
    val cdf = DedupOps.lshCandidates(sigsCut, Bands, Rows)
    noop(cdf)
    println(cdf.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
