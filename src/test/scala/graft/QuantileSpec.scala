package graft

import graft.ops.QuantileOps

/** group_quantile semantics (`/root/reference/src/groupby.rs:1532-1660`):
  * all five interpolation modes vs an independent Scala reimplementation,
  * including the fixture grid's frac edge cases and 1/2-element groups
  * (FIXTURES.md §B quantile-grid). */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.0, 0.25, 0.5, 0.513, 0.75, 1.0)

  /** Independent reference implementation of the kernel's interpolation. */
  private def expected(sorted: Seq[Double], q: Double): Map[String, Double] = {
    val n    = sorted.size
    val qidx = q * (n - 1)
    val idx  = qidx.toLong.toInt
    val frac = qidx % 1.0
    val lo   = sorted(idx)
    if (frac == 0.0)
      Map("linear" -> lo, "lower" -> lo, "higher" -> lo, "nearest" -> lo,
        "midpoint" -> lo)
    else {
      val hi = sorted(idx + 1)
      Map(
        "linear"   -> (lo + (hi - lo) * frac),
        "lower"    -> lo,
        "higher"   -> hi,
        "nearest"  -> (if (frac > 0.5 || (frac == 0.5 && q > 0.5)) hi else lo),
        "midpoint" -> ((lo + hi) / 2))
    }
  }

  test("all interpolation modes match the kernel semantics on random groups") {
    val data = kernelData(2000, 20, nullP = 0.2)
    val df   = data.map(t => (t._2, t._3)).toDF("g", "v")
    val got = QuantileOps.groupedQuantiles(df, Seq("g"), "v", qs)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)) -> Map(
        "linear" -> r.getDouble(2), "lower" -> r.getDouble(3),
        "higher" -> r.getDouble(4), "nearest" -> r.getDouble(5),
        "midpoint" -> r.getDouble(6))).toMap
    val byG = data.groupBy(_._2).view.mapValues(_.flatMap(_._3).sorted).toMap
    for ((g, sorted) <- byG if sorted.nonEmpty; q <- qs) {
      val exp = expected(sorted, q)
      val act = got((g, q))
      exp.foreach { case (mode, e) =>
        assert(approx(act(mode), e), s"g=$g q=$q mode=$mode exp=$e got=${act(mode)}")
      }
    }
  }

  test("single- and two-element groups hit the frac edge cases") {
    val df = Seq((0L, 10.0), (1L, 1.0), (1L, 2.0)).toDF("g", "v")
    val got = QuantileOps.groupedQuantiles(df, Seq("g"), "v", Seq(0.5, 1.0))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(4), r.getDouble(6))).toMap // linear, higher, midpoint
    assert(got((0L, 0.5)) == ((10.0, 10.0, 10.0)))
    assert(got((0L, 1.0)) == ((10.0, 10.0, 10.0)))
    assert(got((1L, 0.5)) == ((1.5, 2.0, 1.5)))
    assert(got((1L, 1.0)) == ((2.0, 2.0, 2.0)))
  }

  test("all-NA group yields no quantile row (caller sees missing = NA)") {
    val df = Seq((0L, Option.empty[Double]), (1L, Some(1.0))).toDF("g", "v")
    val got = QuantileOps.groupedQuantiles(df, Seq("g"), "v", Seq(0.5))
    assert(got.where($"g" === 0L).count() == 0)
    assert(got.where($"g" === 1L).count() == 1)
  }

  test("invalid q rejected (reference panics on q outside [0,1])") {
    val df = Seq((0L, 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      QuantileOps.groupedQuantiles(df, Seq("g"), "v", Seq(1.5))
    }
  }

  test("groupedMedian equals linear q=0.5") {
    val df = Seq((0L, 1.0), (0L, 2.0), (0L, 10.0), (0L, 11.0)).toDF("g", "v")
    val m = QuantileOps.groupedMedian(df, Seq("g"), "v").collect().head.getDouble(1)
    assert(m == 6.0)
  }
}
