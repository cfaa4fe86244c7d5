package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 128-bit integer sum of a LongType column, as a native Catalyst
  * `DeclarativeAggregate` over a two-long (hi, lo) buffer — the JVM
  * analogue of DuckDB's HUGEINT `sum(BIGINT)` (the exact accumulator the
  * differential oracle uses).
  *
  * Why not `sum(x)` (long): wraps silently (legacy) or throws (ANSI) once
  * a group's total passes 2⁶³ — the r15 overflow sweep (PLANS.md) found
  * the flagship's Σ(price·(100−disc)) crossing that at ~8e9 rows/group,
  * well inside the 100 TB design point. Why not `sum(cast(x as
  * decimal(38,0)))`: exact, but Spark's decimal aggregation paid a
  * measured ~5.7 s of q1_flagship's 15.1 s at sf100 (Q1Probe, 600M rows:
  * long-product sums 6.5 s vs decimal(38) 12.3 s) — per-row
  * `changePrecision`/overflow checks on a 16-byte buffer, ~6× a long add.
  *
  * This buffer is two wrapping long adds + one carry-out per row
  * (`(a&b | ((a|b) & ~r)) >>> 63` — the classic carry formula), all plain
  * integer Catalyst expressions: fixed-width UnsafeRow agg buffer,
  * whole-stage codegen, map-side partial aggregation. Adds are built with
  * `EvalMode.LEGACY` explicitly — two's-complement wraparound IS the
  * 128-bit carry arithmetic, so ANSI overflow checks must not intervene
  * regardless of session mode. Exact for any input multiset whose true
  * sum fits in i128 (headroom: 2¹²⁷ ≈ 1.7e38 ≈ 10¹⁹ × i64's range).
  * Null inputs are skipped; an empty/all-null group returns NULL
  * (built-in `sum` contract). Evaluates to Decimal(38,0) =
  * hi·2⁶⁴ + (lo as unsigned), converted once per GROUP, not per row.
  */
case class SumI128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean  = true
  override def prettyName: String = "sum_i128"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(ByteType, ShortType, IntegerType, LongType).contains(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sum_i128 requires an integral child, got ${child.dataType.catalogString}")

  private lazy val hi      = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo      = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // wrapping add — two's-complement wraparound is the carry arithmetic
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned 64-bit add a + b = r (r already wrapped):
    * MSB of (a&b | ((a|b) & ~r)). */
  private def carryOut(a: Expression, b: Expression, r: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(r))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = if (child.dataType == LongType) child else Cast(child, LongType)
    // x sign-extends to 128 bits: low word x, high word x >> 63 (0 or -1)
    val xh = ShiftRight(x, Literal(63))
    val t  = wadd(lo, x)
    val h  = wadd(wadd(hi, xh), carryOut(lo, x, t))
    Seq(
      If(IsNull(x), hi, h),
      If(IsNull(x), lo, t),
      And(isEmpty, IsNull(x)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = wadd(lo.left, lo.right)
    val h = wadd(wadd(hi.left, hi.right), carryOut(lo.left, lo.right, t))
    Seq(h, t, And(isEmpty.left, isEmpty.right))
  }

  // hi·2⁶⁴ + unsigned(lo), assembled in Decimal once per group
  override lazy val evaluateExpression: Expression = {
    val dec   = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0), dec)
    val loDec = If(GreaterThanOrEqual(lo, Literal(0L)),
      Cast(lo, dec), Add(Cast(lo, dec), two64, EvalMode.LEGACY))
    val total = Add(Multiply(Cast(hi, dec), two64, EvalMode.LEGACY), loDec,
      EvalMode.LEGACY)
    If(isEmpty, Literal(null, dec), total)
  }

  override protected def withNewChildInternal(newChild: Expression): SumI128 =
    copy(child = newChild)
}

/** Column-DSL entry point for the exact aggregates. */
object ExactAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `sum_i128(c)` as a Column — see [[SumI128]]. */
  def sumI128(c: Column): Column =
    ColumnBridge.column(
      SumI128(ColumnBridge.expression(c)).toAggregateExpression())
}
