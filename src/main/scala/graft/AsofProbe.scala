package graft

import org.apache.spark.sql.functions._

/** Dev tool: same-JVM A/B of the as-of join's two physical shapes at a
  * scale point — the partitioned-merge operator
  * (graft.plans.AsofMergeJoin, `spark.graft.asof.merge=true`) vs the
  * union-and-scan window formulation (false). Reps ALTERNATE merge/window
  * so box-weather drift hits both arms equally (SortTaxProbe's rule), and
  * a third arm times the shared scan+filter prelude alone (both sides
  * scanned, exchanged and sorted, cheapest possible consume) so the A/B
  * delta can be read against the query's irreducible input cost.
  * Verdict recorded in SCALE.md "r17: merge as-of operator".
  */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf100")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def q() = queries.QueriesRel.qAsof(spark, sfDir)
    // the irreducible prelude: same two filtered scans, each clustered
    // and sorted like the merge exec requires, consumed by noop — what
    // the query costs BEFORE any as-of matching happens at all
    def prelude() = {
      val ev = Tables.events(spark, sfDir)
      val p = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
        .repartition(col("user_id")).sortWithinPartitions("user_id", "ts")
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
        .repartition(col("user_id")).sortWithinPartitions("user_id", "ts")
      p.unionByName(c, allowMissingColumns = true)
    }
    def micro() = spark.range(10000000L)
      .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
      .groupBy("k").agg(sum("v").as("s"))

    // warmup both shapes at the smallest SF so codegen isn't charged
    val warm = "/root/testdata/sf0.001"
    Seq("true", "false").foreach { m =>
      spark.conf.set("spark.graft.asof.merge", m)
      try noop(queries.QueriesRel.qAsof(spark, warm)) catch { case _: Throwable => }
    }
    val merge = new scala.collection.mutable.ArrayBuffer[Double]
    val window = new scala.collection.mutable.ArrayBuffer[Double]
    val pre = new scala.collection.mutable.ArrayBuffer[Double]
    val mic = new scala.collection.mutable.ArrayBuffer[Double]
    (1 to reps).foreach { _ =>
      spark.conf.set("spark.graft.asof.merge", "true")
      merge += time(noop(q()))
      spark.conf.set("spark.graft.asof.merge", "false")
      window += time(noop(q()))
      pre += time(noop(prelude()))
      mic += time(noop(micro()))
    }
    def fmt(b: Seq[Double]) = b.map(s => f"$s%.3f").mkString("/")
    println(f"""{"probe":"asof_ab","merge_best":${merge.min}%.3f,"window_best":${window.min}%.3f,"prelude_best":${pre.min}%.3f,"micro_best":${mic.min}%.3f,"merge":"${fmt(merge.toSeq)}","window":"${fmt(window.toSeq)}","prelude":"${fmt(pre.toSeq)}","micro":"${fmt(mic.toSeq)}","sf":"$sfDir"}""")
    spark.stop()
  }
}
