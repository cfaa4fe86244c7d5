package graft

import graft.ops.WindowOps
import org.apache.spark.sql.functions._

/** Grouped transforms (SURVEY.md §2.3): cumulative skipna poisoning, shift,
  * fill limits at the run-length edges, rank tie methods. */
class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq(col("g"))
  private val ord  = Seq(col("pos"))

  test("cumsum skipna=true skips NAs but keeps accumulating") {
    val rows = Seq((0L, 1L, Some(1.0)), (0L, 2L, None), (0L, 3L, Some(2.0)))
    val got = rows.toDF("g", "pos", "v")
      .select(col("pos"), WindowOps.cumsum(col("v"), keys, ord).as("cs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(1.0) && got(2L).isEmpty && got(3L).contains(3.0))
  }

  test("cumsum skipna=false poisons the group after the first NA") {
    // reference src/groupby.rs:505-519
    val rows = Seq((0L, 1L, Some(1.0)), (0L, 2L, None), (0L, 3L, Some(2.0)),
      (1L, 1L, Some(5.0)))
    val got = rows.toDF("g", "pos", "v")
      .select(col("g"), col("pos"),
        WindowOps.cumsum(col("v"), keys, ord, skipna = false).as("cs"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((0L, 1L)).contains(1.0))
    assert(got((0L, 2L)).isEmpty && got((0L, 3L)).isEmpty)
    assert(got((1L, 1L)).contains(5.0))
  }

  test("cumprod / cummin / cummax running semantics") {
    val rows = Seq((0L, 1L, 2.0), (0L, 2L, 3.0), (0L, 3L, 0.5))
    val got = rows.toDF("g", "pos", "v").select(col("pos"),
        WindowOps.cumprod(col("v"), keys, ord).as("cp"),
        WindowOps.cummin(col("v"), keys, ord).as("cmn"),
        WindowOps.cummax(col("v"), keys, ord).as("cmx"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L) == ((2.0, 2.0, 2.0)))
    assert(got(2L) == ((6.0, 2.0, 3.0)))
    assert(got(3L) == ((3.0, 0.5, 3.0)))
  }

  test("shift by +-periods, 0 = identity, shifted-out = null") {
    val rows = (1L to 4L).map(i => (0L, i, i.toDouble))
    val got = rows.toDF("g", "pos", "v").select(col("pos"),
        WindowOps.shift(col("v"), 2, keys, ord).as("lag2"),
        WindowOps.shift(col("v"), -1, keys, ord).as("lead1"),
        WindowOps.shift(col("v"), 0, keys, ord).as("id"))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getDouble(3))).toMap
    assert(got(1L) == ((None, Some(2.0), 1.0)))
    assert(got(3L) == ((Some(1.0), Some(4.0), 3.0)))
    assert(got(4L) == ((Some(2.0), None, 4.0)))
  }

  test("ffill limit fills runs of length <= limit only") {
    // null runs of length 1, limit(=2), limit+1 — FIXTURES.md §B shift/fill-runs
    val v: Seq[Option[Double]] = Seq(Some(1.0), None, Some(2.0),
      None, None, Some(3.0), None, None, None, Some(4.0))
    val rows = v.zipWithIndex.map { case (ov, i) => (0L, i.toLong, ov) }
    val df   = rows.toDF("g", "pos", "v")
    val got = WindowOps.ffill(df, "f", col("v"), keys, ord, Some(2))
      .orderBy("pos").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    val exp = Seq(Some(1.0), Some(1.0), Some(2.0), Some(2.0), Some(2.0),
      Some(3.0), Some(3.0), Some(3.0), None, Some(4.0))
    assert(got.toSeq == exp)
  }

  test("bfill fills backward; leading trail stays null") {
    val v: Seq[Option[Double]] = Seq(None, Some(1.0), None, None, Some(2.0), None)
    val rows = v.zipWithIndex.map { case (ov, i) => (0L, i.toLong, ov) }
    val got = WindowOps.bfill(rows.toDF("g", "pos", "v"), "b", col("v"), keys, ord)
      .orderBy("pos").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(got.toSeq == Seq(Some(1.0), Some(1.0), Some(2.0), Some(2.0), Some(2.0), None))
  }

  test("rank tie methods on a crafted tie group") {
    // values: 10, 20, 20, 30 -> avg: 1, 2.5, 2.5, 4 ; min: 1,2,2,4 ;
    // max: 1,3,3,4 ; dense: 1,2,2,3 ; first: 1,2,3,4
    val rows = Seq((0L, 1L, 10.0), (0L, 2L, 20.0), (0L, 3L, 20.0), (0L, 4L, 30.0))
    val df   = rows.toDF("g", "pos", "v")
    val got = df.select(col("pos"),
        WindowOps.rank(col("v"), keys, "average").as("avg"),
        WindowOps.rank(col("v"), keys, "min").as("min"),
        WindowOps.rank(col("v"), keys, "max").as("max"),
        WindowOps.rank(col("v"), keys, "dense").as("dense"),
        WindowOps.rank(col("v"), keys, "average", pct = true).as("pct"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got(1L) == ((1.0, 1.0, 1.0, 1.0, 0.25)))
    assert(got(2L) == ((2.5, 2.0, 3.0, 2.0, 0.625)))
    assert(got(3L) == ((2.5, 2.0, 3.0, 2.0, 0.625)))
    assert(got(4L) == ((4.0, 4.0, 4.0, 3.0, 1.0)))
  }

  test("interpolateLinear: interior gaps filled, edges and all-null groups stay null") {
    // group 0: 10, _, _, 40  -> gap of 2 interpolates to 20, 30
    // group 1: _, 5, _       -> leading + trailing nulls stay null
    // group 2: _, _          -> all null stays null
    val rows = Seq(
      (0L, 1L, Some(10L)), (0L, 2L, None), (0L, 3L, None), (0L, 4L, Some(40L)),
      (1L, 1L, None), (1L, 2L, Some(5L)), (1L, 3L, None),
      (2L, 1L, None), (2L, 2L, None))
    val df = rows.toDF("g", "pos", "v")
    val got = WindowOps.interpolateLinear(df, "vi", col("v"), Seq(col("g")), Seq(col("pos")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      (0L, 1L) -> Some(10.0), (0L, 2L) -> Some(20.0), (0L, 3L) -> Some(30.0),
      (0L, 4L) -> Some(40.0),
      (1L, 1L) -> None, (1L, 2L) -> Some(5.0), (1L, 3L) -> None,
      (2L, 1L) -> None, (2L, 2L) -> None))
  }

  test("rank na_option keep vs bottom") {
    val rows = Seq((0L, 1L, Some(10.0)), (0L, 2L, None), (0L, 3L, Some(5.0)))
    val df   = rows.toDF("g", "pos", "v")
    val got = df.select(col("pos"),
        WindowOps.rank(col("v"), keys, "min").as("keep"),
        WindowOps.rank(col("v"), keys, "min", naOption = "bottom").as("bottom"))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getDouble(2))).toMap
    assert(got(1L) == ((Some(2.0), 2.0)))
    assert(got(2L) == ((None, 3.0)))
    assert(got(3L) == ((Some(1.0), 1.0)))
    // na_option=top: nulls rank first, non-nulls shift down
    val top = df.select(col("pos"),
        WindowOps.rank(col("v"), keys, "min", naOption = "top").as("top"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top == Map(1L -> 3.0, 2L -> 1.0, 3L -> 2.0))
  }
}
