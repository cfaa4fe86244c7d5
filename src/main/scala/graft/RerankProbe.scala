package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Dev tool: sub-stage attribution for the array-based exact-Jaccard
  * rerank — isolates the set aggregate, the pair-attach joins, and the
  * intersect expression so a slow rerank can be pinned. */
object RerankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.QueriesText.JaccardThreshold
    import graft.ops.Phase._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best ${ts.min}%.3f s  samples ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables.documents(spark, sfDir)
    val tNum = math.floor(JaccardThreshold * 100).toLong
    val sh = DedupOps.wordShingleHashes(docs, "doc_id", "text").phaseCut
    val cand = DedupOps.ngramPrefixCandidates(sh, tNum, lengthFilter = true)
      .phaseCut
    println(s"cand=${cand.count()} sh=${sh.count()}")

    def sets = sh.groupBy(col("id")).agg(collect_list(col("h")).as("hs"))
    best3("sets_agg")(sets)
    val setsCut = sets.phaseCut
    def attach = cand
      .join(setsCut.select(col("id").as("id_a"), col("hs").as("ha")), Seq("id_a"))
      .join(setsCut.select(col("id").as("id_b"), col("hs").as("hb")), Seq("id_b"))
    best3("attach_joins_only")(attach.select("id_a", "id_b"))
    best3("attach+sizes")(attach.select(col("id_a"), col("id_b"),
      size(col("ha")).as("sz_a"), size(col("hb")).as("sz_b")))
    best3("attach+intersect")(attach.select(col("id_a"), col("id_b"),
      size(array_intersect(col("ha"), col("hb"))).as("inter")))
    best3("full_jaccardOnPairs")(DedupOps.jaccardOnPairs(cand, sh)
      .where(col("jaccard") >= JaccardThreshold))
    best3("micro")(spark.range(10000000L)
      .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
      .groupBy("k").agg(sum("v").as("s")))
    attach.select(col("id_a"), col("id_b"),
      size(array_intersect(col("ha"), col("hb"))).as("inter"))
      .write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
