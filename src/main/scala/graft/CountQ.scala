package graft

/** Dev tool: row-count any declared query at a scale point without
  * materializing its output — `runMain graft.CountQ <sfDir> <query>...`.
  * Companion to [[TimeQ]] for SCALE.md rows whose outputs are too large
  * to dump (e.g. q_neardup_lsh over a replicated corpus emits billions
  * of expanded pairs; the count is the row the table needs). */
object CountQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CountQ <sfDir> <query> [query ...]")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val n = SparkEntry.queries(name)(spark, args.head).count()
      println(s"""{"query":"$name","rows":$n}""")
    }
    spark.stop()
  }
}
