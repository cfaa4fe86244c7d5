package graft

import graft.ops.{Money, RelOps, WindowOps}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Dev tool: A/B the FINAL global orderBy's cost on the three big-output
  * events queries at a scale point (the r16 sf100 probe whose numbers —
  * 2.1× cumsum / 7.6× sessionize / 1.3× asof — are recorded in SCALE.md
  * "r16: the presentational-sort tax"). Before r16 each declared query
  * ended with a presentational `orderBy` so its dumped parquet was
  * deterministic — but the differential harness sorts rows before
  * hashing, DuckDB's consume-in-DB baselines never materialize an
  * order, and at 100M rows the range exchange both re-executes the
  * window subtree (partitioner sampling runs the child once before the
  * real pass) and adds a full extra sort. The probe's verdict removed
  * those sorts from the declared queries, so the `*_full` arms below
  * now RECONSTRUCT the pre-r16 sorted shape explicitly (an arm that
  * called the declared query would silently A/A). Reps ALTERNATE
  * full/no-sort so slow box-weather drifts hit both arms equally (this
  * box swings 10-50x within minutes). */
object SortTaxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf100e")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val userKey = Seq(col("user_id"))
    val byEvent = Seq(col("event_id"))
    def cumsumNosort(dir: String) = {
      val ev = Tables.events(spark, dir)
        .withColumn("c", Money.cents(col("value")))
        .withColumn("c2", when(col("event_id") % 7 =!= 0, Money.cents(col("value"))))
      ev.select(col("event_id"), col("user_id"),
        (WindowOps.cumsum(col("c"), userKey, byEvent).cast("double") / 100.0).as("cs_all"),
        (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = true).cast("double") / 100.0).as("cs_skipna"),
        (WindowOps.cumsum(col("c2"), userKey, byEvent, skipna = false).cast("double") / 100.0).as("cs_noskip"))
    }
    def asofNosort(dir: String) = {
      val ev = Tables.events(spark, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      RelOps.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts",
          "click_value", "last_click_value")
        .select("event_id", "user_id", "value", "last_click_value")
    }
    def sessNosort(dir: String) = StreamOps.sessionAgg(
        Tables.events(spark, dir).withColumn("c", Money.cents(col("value"))),
        "ts", "30 minutes", Seq(col("user_id")),
        Seq(count(lit(1)).as("n"),
          (sum(col("c")).cast("double") / 100.0).as("sum_value")))
      .select("user_id", "session_start", "n", "sum_value")

    val arms: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "micro" -> ((_: String) => spark.range(10000000L)
        .select((col("id") % 200).as("k"), (col("id") % 1000).cast("double").as("v"))
        .groupBy("k").agg(sum("v").as("s"))),
      "cumsum_full"   -> ((d: String) => cumsumNosort(d).orderBy("event_id")),
      "cumsum_nosort" -> (cumsumNosort(_)),
      "asof_full"     -> ((d: String) => asofNosort(d).orderBy("event_id")),
      "asof_nosort"   -> (asofNosort(_)),
      "sess_full"     -> ((d: String) =>
        sessNosort(d).orderBy("user_id", "session_start")),
      "sess_nosort"   -> (sessNosort(_)))

    // one warmup each at sf0.001 (JIT/codegen), then interleaved reps
    arms.foreach { case (_, f) =>
      try noop(f("/root/testdata/sf0.001")) catch { case _: Throwable => () } }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { r =>
      arms.foreach { case (name, f) =>
        val t = time(noop(f(sfDir)))
        acc(name) :+= t
        println(f"[rep $r] $name%-14s $t%8.3f s")
      }
    }
    arms.foreach { case (name, _) =>
      val ts = acc(name)
      println(f"$name%-14s best=${ts.min}%8.3f  samples=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
