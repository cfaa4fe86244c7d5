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

  /** Independent reference for the round-10 rank-edge cut: edge_k = sorted
    * value at 0-based rank (k·(n−1)) div bins, bin = 1 + #{k : v > e_k}. */
  private def expectedBins(vals: Seq[Long], bins: Int): Map[Long, Int] = {
    val sorted = vals.sorted
    val n      = sorted.size.toLong
    val edges  = (1 until bins).map(k => sorted(((k * (n - 1)) / bins).toInt))
    vals.map(v => v -> (1 + edges.count(v > _))).toMap
  }

  test("rankEdges + ascBin reproduce the integer-rank cut, ties share a bin") {
    import org.apache.spark.sql.functions.{broadcast, col}
    // skewed + tied values: 40% mass on one value exercises tie collapse
    val rnd  = new scala.util.Random(7)
    val vals = Seq.fill(500)(if (rnd.nextInt(5) < 2) 42L else rnd.nextInt(200).toLong)
    val df   = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    Seq(2, 5, 10).foreach { bins =>
      val exp = expectedBins(vals, bins)
      val got = df.crossJoin(broadcast(QuantileOps.rankEdges(df, "v", bins)))
        .select(col("id"), QuantileOps.ascBin(col("v"), bins).as("bin"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      vals.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) == exp(v), s"bins=$bins id=$i v=$v")
      }
      // every tied value maps to exactly one bin by construction, and bins
      // are equal-frequency up to tie mass: monotone in v
      val byV = vals.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(x => got(x._2.toLong)).distinct }
      assert(byV.values.forall(_.size == 1))
      val sortedBins = byV.toSeq.sortBy(_._1).map(_._2.head)
      assert(sortedBins == sortedBins.sorted)
    }
  }

  test("rankEdges on empty input yields null edges") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val row = QuantileOps.rankEdges(df, "v", 4).collect().head
    assert((0 until 3).forall(row.isNullAt))
  }
}
