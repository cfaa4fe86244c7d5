package graft

import graft.ops.{DedupOps, Phase}
import org.apache.spark.sql.functions._

/** Dev tool: stage attribution for the PPJoin n-gram Jaccard pipeline
  * (q_ngram_jaccard) — times each phase cumulatively and prints the row
  * count each phase carries, so a wall-time shift can be pinned to a
  * specific stage (shingles, prefix index, posting join, rerank) or to a
  * corpus-shape change (candidate density). */
object NgramProbe {
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

    def docs = Tables.documents(spark, sfDir)
    val tNum = math.floor(JaccardThreshold * 100).toLong

    // Rep-level corpus, the shape the contracted pipeline actually runs on
    val ids = docs.select(col("doc_id").as("mid"), md5(col("text")).as("d"))
    val g = ids.groupBy(col("d"))
      .agg(min(col("mid")).as("rep"), count(lit(1)).as("n")).phaseCut
    val m = ids.join(g.select(col("d"), col("rep")), Seq("d"))
      .select("mid", "rep").phaseCut
    val repDocs = docs.join(m.where(col("mid") === col("rep")).select("mid"),
      col("doc_id") === col("mid")).drop("mid")
    println(s"docs=${docs.count()} reps=${g.count()}")

    val sh = DedupOps.wordShingleHashes(repDocs, "doc_id", "text").phaseCut
    println(s"shingleRows=${sh.count()}")

    // mirrors DedupOps.ngramPrefixCandidates' prefix stage (r18: the
    // collect/sort/slice aggregate — keep in sync with the engine)
    val freq = sh.groupBy(col("h")).agg(count(lit(1)).as("dfreq"))
    def prefixes = sh.join(freq, Seq("h"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("dfreq"), col("h")))).as("arr"))
      .select(col("id"), size(col("arr")).cast("long").as("sz"),
        explode(expr(("slice(arr.h, 1, cast(size(arr) - " +
          s"((cast(size(arr) as bigint) * $tNum) div 100) + 1 as int))")))
          .as("h"))
      .select("id", "h", "sz")
    val pfx = prefixes.phaseCut
    println(s"prefixRows=${pfx.count()}")

    def joined = pfx
      .select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(pfx
        .select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .where(least(col("sz_a"), col("sz_b")) * 100 >=
        greatest(col("sz_a"), col("sz_b")) * tNum)
    println(s"joinedRows=${joined.count()}")
    def cand = joined.select("id_a", "id_b").distinct()
    println(s"candRows=${cand.count()}")
    val candCut = cand.phaseCut
    def rerank = DedupOps.jaccardOnPairs(candCut, sh)
      .where(col("jaccard") >= JaccardThreshold)
    println(s"pairRows=${rerank.count()}")

    best3("shingles")(DedupOps.wordShingleHashes(repDocs, "doc_id", "text"))
    best3("prefixes_from_cut_sh")(prefixes)
    best3("join+distinct_from_cut_pfx")(cand)
    best3("rerank_from_cut_cand")(rerank)
    best3("full_q_ngram_jaccard")(
      SparkEntry.queries("q_ngram_jaccard")(spark, sfDir))
    best3("micro")(spark.range(10000000L)
      .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
      .groupBy("k").agg(sum("v").as("s")))
    spark.stop()
  }
}
