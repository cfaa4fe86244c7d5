package graft

import graft.ops.{RelOps, TakeOps}
import org.apache.spark.sql.functions._

/** Positional take, factorize, as-of join, top-k per group. */
class RelTakeSpec extends SparkSpec {
  import spark.implicits._

  test("take1d gathers by position; -1 and out-of-range yield null") {
    val values  = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("pos", "payload")
    val indexer = Seq((10L, 2L), (11L, -1L), (12L, 0L), (13L, 99L)).toDF("row_id", "idx")
    val got = TakeOps.take1d(indexer, "idx", values, "pos")
      .orderBy("row_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2))))
    assert(got.toSeq == Seq((10L, Some("c")), (11L, None), (12L, Some("a")), (13L, None)))
  }

  test("factorize: dense codes in key order, null keys -> -1") {
    val df = Seq(Some("b"), Some("a"), Some("b"), None, Some("c"))
      .toDF("k")
    val got = TakeOps.factorize(df, Seq("k")).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("a") -> 0L, Some("b") -> 1L, Some("c") -> 2L, None -> -1L))
  }

  test("widen: allowed matrix pairs cast; forbidden pairs throw") {
    import org.apache.spark.sql.types._
    val df = Seq((1, 2L, 3.5f, 4.5)).toDF("i", "l", "f", "d")
    // allowed arms (reference lib.rs:64-165)
    val widened = df.select(
      TakeOps.widen(col("i"), IntegerType, LongType).as("i_l"),
      TakeOps.widen(col("i"), IntegerType, DoubleType).as("i_d"),
      TakeOps.widen(col("f"), FloatType, DoubleType).as("f_d"),
      TakeOps.widen(col("d"), DoubleType, DoubleType).as("d_d")).collect()(0)
    assert(widened.getLong(0) == 1L && widened.getDouble(1) == 1.0)
    assert(widened.getDouble(2) == 3.5 && widened.getDouble(3) == 4.5)
    // forbidden arms: i64→f64 (the reference's commented-out TODO arm),
    // narrowing, float→int, and i16→i16 (the dispatch has no such arm —
    // identity is not implied)
    for ((from, to) <- Seq((LongType: DataType, DoubleType: DataType),
        (LongType, IntegerType), (DoubleType, FloatType),
        (DoubleType, LongType), (FloatType, IntegerType),
        (ShortType, ShortType)))
      intercept[IllegalArgumentException](TakeOps.widen(col("l"), from, to))
  }

  test("factorize: high-cardinality keys, distributed plan (no Window)") {
    val n = 20000
    val df = spark.range(n * 3L)
      .selectExpr("CAST((id * 7919) % 20000 AS BIGINT) AS k") // shuffled key order
    val got = TakeOps.factorize(df, Seq("k"))
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "factorize must not use a window (single-task sort at scale)")
    val rows = got.orderBy("code").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == n)
    // dense codes 0..n-1 aligned with ascending key order
    assert(rows.map(_._2).toSeq == (0L until n.toLong))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.head == (0L, 0L) && rows.last == (19999L, (n - 1).toLong))
  }

  test("asof join picks the latest right row at-or-before, inclusive") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 10L, 1.0), (100L, 20L, 2.0), (100L, 30L, 3.0))
      .toDF("k", "t", "p")
    val got = RelOps.asofJoin(left, right, Seq("k"), "t", "t", "p", "asof_p")
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    // t=10 matches p=1.0 (inclusive); t=25 -> 2.0; t=5 -> none
    assert(got.toSeq == Seq(Some(1.0), Some(2.0), None))
  }

  test("asof join matches rows: a matched null payload propagates") {
    val left  = Seq((1L, 100L, 25L)).toDF("id", "k", "t")
    val right = Seq((100L, 10L, Some(2.0)), (100L, 20L, Option.empty[Double]))
      .toDF("k", "t", "p")
    // latest row at-or-before t=25 is (t=20, p=NULL): the match is that
    // ROW, so the result is NULL — not the earlier non-null 2.0 (pandas
    // merge_asof semantics)
    val got = RelOps.asofJoin(left, right, Seq("k"), "t", "t", "p", "ap")
      .collect()(0)
    assert(got.isNullAt(3))
  }

  test("asof join forward / nearest directions") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 35L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 10L, 1.0), (100L, 20L, 2.0), (100L, 30L, 3.0))
      .toDF("k", "t", "p")
    val fwd = RelOps.asofJoin(left, right, Seq("k"), "t", "t", "p", "fp",
        direction = "forward")
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    // t=10 -> 1.0 (inclusive); t=25 -> 3.0 (next at 30); t=35 -> none
    assert(fwd.toSeq == Seq(Some(1.0), Some(3.0), None))
    val near = RelOps.asofJoin(left, right, Seq("k"), "t", "t", "p", "np",
        direction = "nearest")
      .orderBy("id").collect().map(_.getDouble(3))
    // t=10 exact; t=25 equidistant 20/30 -> backward tie-break 2.0; t=35 -> 3.0
    assert(near.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("rangeJoin == naive theta join, incl. boundary points and bin-spanning ranges") {
    // ranges deliberately span 0, 1, 2 and 3 bins at binWidth=10, with
    // points exactly on lo/hi boundaries and on bin edges
    val points = Seq((1L, "k1", 10L), (2L, "k1", 19L), (3L, "k1", 20L),
        (4L, "k1", 35L), (5L, "k2", 10L), (6L, "k1", 9L))
      .toDF("pid", "k", "t")
    val ranges = Seq((100L, "k1", 10L, 20L), (101L, "k1", 15L, 44L),
        (102L, "k1", 21L, 21L), (103L, "k2", 0L, 9L), (104L, "k1", 36L, 38L))
      .toDF("rid", "k", "lo", "hi")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(RelOps.rangeJoin(points, "t", ranges, "lo", "hi", Seq("k"), 10L))
    val naive = pairs(points.join(ranges, Seq("k"))
      .where(col("t") >= col("lo") && col("t") <= col("hi")))
    assert(got == naive)
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 100L), (3L, 101L), (4L, 101L)))
    // binning must also produce each pair exactly once (no dedup in the op)
    val cnt = RelOps.rangeJoin(points, "t", ranges, "lo", "hi", Seq("k"), 10L).count()
    assert(cnt == got.size.toLong)
  }

  test("rangeJoin with no keys: global intervals join on the bin alone") {
    val points = Seq((1L, 5L), (2L, 25L), (3L, -7L)).toDF("pid", "t")
    val ranges = Seq((100L, 0L, 10L), (101L, -10L, -1L), (102L, 20L, 30L))
      .toDF("rid", "lo", "hi")
    val got = RelOps.rangeJoin(points, "t", ranges, "lo", "hi", Seq.empty, 8L)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 102L), (3L, 101L)))
  }

  test("topKPerGroup keeps k rows per group in order") {
    val df = Seq(("x", 1.0), ("x", 3.0), ("x", 2.0), ("y", 9.0)).toDF("g", "v")
    val got = RelOps.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .select("g", "rk", "v").orderBy("g", "rk").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("x", 1, 3.0), ("x", 2, 2.0), ("y", 1, 9.0)))
  }
}
