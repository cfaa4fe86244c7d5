package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Edge cases for the CDC / ordinal pack (QueriesCdc) on hand-built
  * frames — the fixture tables never exercise single-row groups,
  * all-identical states, or zero-length gaps. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (user, event, state, epoch_us)
  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "event_id", "state", "us")

  test("scd2 change-compression: all-same-state group collapses to one open interval") {
    val changes = ev((1L, 1L, "a", 10L), (1L, 2L, "a", 20L), (1L, 3L, "a", 30L))
      .withColumn("prev", lag("state", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    assert(changes.count() == 1)
    assert(changes.select("us").as[Long].head() == 10L)
  }

  test("scd2 intervals: A→B→A re-entry produces three intervals, last open") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val iv = ev((1L, 1L, "a", 10L), (1L, 2L, "b", 20L), (1L, 3L, "a", 30L))
      .withColumn("prev", lag("state", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to", lead("us", 1).over(w))
      .orderBy("us")
      .select("state", "us", "valid_to").as[(String, Long, Option[Long])]
      .collect().toSeq
    assert(iv == Seq(("a", 10L, Some(20L)), ("b", 20L, Some(30L)), ("a", 30L, None)))
  }

  test("twa: single-event user contributes no gap and drops out") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    // user 1: value 100 held 10s then 300 (no trailing weight) → twa 100
    // user 2: single event → no gaps → absent
    val out = Seq((1L, 1L, 100L, 0L), (1L, 2L, 300L, 10000000L),
        (2L, 1L, 42L, 0L))
      .toDF("user_id", "event_id", "c", "us")
      .withColumn("dt_us", lead("us", 1).over(w) - col("us"))
      .withColumn("dt_s", expr("dt_us div 1000000L"))
      .where(col("dt_s").isNotNull)
      .groupBy("user_id")
      .agg((sum(col("c") * col("dt_s")).cast("double") /
        sum("dt_s").cast("double")).as("twa"))
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 100.0))
  }

  test("cumcount directions: fwd + rev == n-1 on every row") {
    val df = QueriesCdcFixture.cumcount(spark)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
    val bad = df.where(col("cc_fwd") + col("cc_rev") =!= col("n") - 1)
    assert(bad.count() == 0)
  }
}

/** Tiny fixture indirection so the spec exercises the production query
  * over the real sf0.001 table. */
object QueriesCdcFixture {
  def cumcount(spark: org.apache.spark.sql.SparkSession) =
    graft.queries.QueriesCdc.qCumcount(spark, "/root/testdata/sf0.001")
}
