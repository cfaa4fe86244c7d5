package graft

/** Generic single-query timer for scale-point measurements (SCALE.md's
  * engine columns): `runMain graft.TimeQ <sfDir> <query> [query ...]`.
  * Same discipline as [[Bench]] — noop sink so Catalyst can't prune the
  * measured work, one warmup pass at sf0.001 so C2/codegen compilation
  * isn't charged to the timed run, best-of-3 with a GC fence. Prints one
  * JSON line per query. Unlike Bench it accepts ANY declared query, so
  * non-headline operators (e.g. the ANN scale path) get slope points too.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQ <sfDir> <query> [query ...]")
    val sfDir = args.head
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    args.tail.foreach { name =>
      // "micro" = the Bench micro control (grouped sum, 10M×200) — run it
      // alongside scale points so every SCALE.md row carries a same-moment
      // box-weather reading (the box has documented 2-8x co-tenant noise).
      val q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (name == "micro")
          (s, _) => s.range(10000000L)
            .select((org.apache.spark.sql.functions.col("id") % 200).as("k"),
              (org.apache.spark.sql.functions.col("id") % 1000)
                .cast("double").as("v"))
            .groupBy("k")
            .agg(org.apache.spark.sql.functions.sum("v").as("s"))
        else SparkEntry.queries(name)
      try noop(q(spark, "/root/testdata/sf0.001")) catch { case _: Throwable => }
      System.gc()
      val samples = (1 to 3).map(_ => time(noop(q(spark, sfDir))))
      println(f"""{"query":"$name","sec":${samples.min}%.3f,"samples":[${samples.map(s => f"$s%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
