package graft

import graft.functions.{ExactAgg, GraftFunctions}
import org.apache.spark.sql.functions._

/** sum_i128 (graft.functions.SumI128): exact two-long 128-bit integer
  * sum. Pins the carry arithmetic against a BigInt reference on
  * adversarial inputs (values at the long extremes, sign mixes, running
  * totals crossing ±2⁶³ many times), the partial/merge path (multiple
  * partitions forces real buffer merges), and SQL-sum null semantics. */
class SumI128Spec extends SparkSpec {
  import spark.implicits._

  private def check(vals: Seq[Long], parts: Int): Unit = {
    val got = vals.toDF("v").repartition(parts)
      .agg(ExactAgg.sumI128(col("v")).as("s")).collect().head
      .getDecimal(0)
    val want = vals.map(BigInt(_)).sum
    assert(BigDecimal(got) == BigDecimal(want), s"vals=${vals.take(8)}…")
  }

  test("sum_i128 == BigInt reference when totals cross the i64 range") {
    // running total swings past ±2⁶³ repeatedly: every step exercises the
    // carry word (a plain long sum wraps thousands of times here)
    val big = (0 until 4000).map(i =>
      if (i % 2 == 0) Long.MaxValue else Long.MinValue + 7L)
    check(big, parts = 7)
    // all-positive overflow (the q1 product shape, scaled up)
    check(Seq.fill(300)(Long.MaxValue / 2 + 11L), parts = 5)
    // all-negative
    check(Seq.fill(300)(Long.MinValue / 2 - 13L), parts = 3)
  }

  test("sum_i128 matches BigInt on random sign-mixed longs across partitions") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(20000)(rnd.nextLong())
    check(vals, parts = 16) // forces many partial-buffer merges
    check(vals, parts = 1)  // and the single-partition path agrees
  }

  test("sum_i128 null semantics match built-in sum (skip nulls, NULL for all-null)") {
    GraftFunctions.register(spark)
    val df = Seq[(Int, Option[Long])](
      (0, Some(5L)), (0, None), (0, Some(-7L)),
      (1, None), (1, None)).toDF("g", "v").repartition(3)
    val rows = df.groupBy("g")
      .agg(expr("sum_i128(v)").as("s"), sum($"v").as("ref"))
      .orderBy("g").collect()
    assert(rows(0).getDecimal(1).longValueExact == -2L)
    assert(rows(0).getDecimal(1).longValueExact == rows(0).getLong(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("sum_i128 evaluate: exact through ±(10³⁸−1), loud failure past it — no silent NULL") {
    // The Decimal(38,0) window edge is unreachable through real data (a
    // 10³⁸ total needs ~10¹⁹ i64 addends), so the boundary is pinned at
    // the expression level: bind evaluateExpression to hand-built
    // (hi, lo, isEmpty) buffers for totals just inside and just past the
    // window (ADVICE r15 — the LEGACY assembly alone returned NULL there).
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, Literal}
    val agg = graft.functions.SumI128(Literal(0L))
    val bound = BindReferences.bindReference(
      agg.evaluateExpression, agg.aggBufferAttributes)
    def evalTotal(t: BigInt): Any = {
      val hi = (t >> 64).toLong
      val lo = (t & ((BigInt(1) << 64) - 1)).toLong // low 64 bits, two's complement
      bound.eval(InternalRow(hi, lo, false))
    }
    val edge = BigInt(10).pow(38)
    for (t <- Seq(edge - 1, 1 - edge, edge - 12345, BigInt(0),
        BigInt(Long.MinValue), BigInt(Long.MaxValue) * 3))
      assert(evalTotal(t).asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toBigDecimal == BigDecimal(t), s"t=$t")
    for (t <- Seq(edge, -edge, edge + 1, (BigInt(1) << 127) - 1,
        -(BigInt(1) << 127))) {
      val e = intercept[Exception] { evalTotal(t) }
      assert(e.getMessage.contains("sum_i128 overflow"),
        s"t=$t → ${e.getMessage}")
    }
  }

  test("sum_i128 grouped by key matches per-group BigInt reference") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)((rnd.nextInt(6), rnd.nextLong() / 3))
    val got = data.toDF("g", "v").repartition(8).groupBy("g")
      .agg(ExactAgg.sumI128(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1))).toMap
    val want = data.groupBy(_._1).map { case (g, xs) =>
      g -> BigDecimal(xs.map(x => BigInt(x._2)).sum) }
    assert(got == want)
  }
}
