package graft

import graft.ops.{Money, WindowOps}
import org.apache.spark.sql.functions._

/** Dev tool: stage-attribution for q_cumsum's sf100 wall (r16 probe).
  * At 100M events the full query measured ~25× its sf10-extrapolated
  * time while native DuckDB took 81 s — this probe decomposes the plan
  * (scan, cents projection, window compute, final global orderBy) and
  * times the phase-cut variant that stops the range-sampler from
  * re-executing the window subtree (`orderBy` range-partitions by
  * sampling its CHILD; without a cut the sample pass runs shuffle-read
  * + sort + window a second time). */
object CumsumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf100e")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(name: String, reps: Int = 3)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); noop(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s ${ts.min}%.3f s  samples=${ts.map(t => f"$t%.1f").mkString(",")}")
    }

    val userKey = Seq(col("user_id"))
    val byEvent = Seq(col("event_id"))
    def ev = Tables.events(spark, sfDir)
      .withColumn("c", Money.cents(col("value")))
      .withColumn("c2", when(col("event_id") % 7 =!= 0, Money.cents(col("value"))))
    def windowed = ev.select(col("event_id"), col("user_id"),
      (WindowOps.cumsum(col("c"), userKey, byEvent).cast("double") / 100.0).as("cs_all"),
      (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = true).cast("double") / 100.0).as("cs_skipna"),
      (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = false).cast("double") / 100.0).as("cs_noskip"))

    // micro first: a box-weather reading BEFORE the heavy phases
    best("micro") {
      spark.range(10000000L)
        .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
        .groupBy("k").agg(sum("v").as("s"))
    }
    best("scan_only")(ev.select("event_id", "user_id", "value"))
    best("proj_cents")(ev.select("event_id", "user_id", "c", "c2"))
    best("window_only")(windowed)
    best("window_cut_sort") {
      graft.ops.Phase.cut(windowed, "cumsum.window").orderBy("event_id")
    }
    best("full_current")(SparkEntry.queries("q_cumsum")(spark, sfDir))
    spark.stop()
  }
}
