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
  * regardless of session mode.
  *
  * Exact range: the BUFFER is a full i128, but the result materializes
  * as Decimal(38,0), whose window is ±(10³⁸−1) ≈ 0.59·2¹²⁷ — still
  * ~10¹⁹ × i64's range, and every PLANS.md 100 TB bound is orders of
  * magnitude inside it. A group total outside that window FAILS LOUDLY
  * at evaluate (a per-group long-arithmetic range check raises; without
  * it the LEGACY decimal assembly would return a silent NULL —
  * ADVICE r15). Totals between consecutive evaluates may wrap through
  * i128 freely; only the final per-group value must fit.
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

  // Assembled in Decimal once per group, on the ABSOLUTE value: the
  // straight hi·2⁶⁴ + unsigned(lo) spelling overflows Decimal(38,0) on an
  // intermediate for in-window NEGATIVE totals within 2⁶⁴ of −10³⁸
  // (hi·2⁶⁴ = total − unsigned(lo) is more negative than the total);
  // over |total| every partial sum is ≤ |total| < 10³⁸, so nothing can.
  override lazy val evaluateExpression: Expression = {
    val dec   = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0), dec)
    // Decimal(38,0)'s window is ±(10³⁸−1), ~0.59 of the i128 buffer's: a
    // total outside it must FAIL, not silently NULL through a LEGACY
    // decimal op. Checked in plain long arithmetic once per group:
    // |sum| ≥ 10³⁸ ⟺ (hi, lo-as-unsigned) is past (HiTen38, LoTen38) on
    // either side (unsigned compares spelled as signed compares of
    // sign-bit-flipped values).
    import SumI128.{HiTen38, LoTen38}
    def flip(e: Expression) = BitwiseXor(e, Literal(Long.MinValue))
    val posOver = Or(GreaterThan(hi, Literal(HiTen38)),
      And(EqualTo(hi, Literal(HiTen38)),
        GreaterThanOrEqual(flip(lo), Literal(LoTen38 ^ Long.MinValue))))
    val negOver = Or(LessThan(hi, Literal(-HiTen38 - 1L)),
      And(EqualTo(hi, Literal(-HiTen38 - 1L)),
        LessThanOrEqual(flip(lo), Literal(-LoTen38 ^ Long.MinValue))))
    // two's-complement |buffer|: (~hi + (lo==0), −lo) — hi > −10³⁸/2⁶⁴
    // here (range check passed), so no negate can itself wrap
    val neg = LessThan(hi, Literal(0L))
    val absHi = If(neg,
      wadd(BitwiseNot(hi), If(EqualTo(lo, Literal(0L)), Literal(1L), Literal(0L))),
      hi)
    val absLo = If(neg, Subtract(Literal(0L), lo, EvalMode.LEGACY), lo)
    val absLoDec = If(GreaterThanOrEqual(absLo, Literal(0L)),
      Cast(absLo, dec), Add(Cast(absLo, dec), two64, EvalMode.LEGACY))
    val absTotal = Add(Multiply(Cast(absHi, dec), two64, EvalMode.LEGACY),
      absLoDec, EvalMode.LEGACY)
    // negate via decimal 0 − x: UnaryMinus on Decimal rounds through
    // scala BigDecimal's 34-digit DECIMAL128 MathContext and mangles
    // 35+-digit totals; Subtract uses Spark's 39-digit context (exact)
    val total = If(neg,
      Subtract(Literal(Decimal(0L, 38, 0), dec), absTotal, EvalMode.LEGACY),
      absTotal)
    val boom = Cast(new RaiseError(Literal(
      "sum_i128 overflow: |group total| >= 10^38 exceeds the " +
        "Decimal(38,0) result range")), dec)
    If(isEmpty, Literal(null, dec),
      If(Or(posOver, negOver), boom, total))
  }

  override protected def withNewChildInternal(newChild: Expression): SumI128 =
    copy(child = newChild)
}

object SumI128 {
  /** 10³⁸ = HiTen38·2⁶⁴ + LoTen38 (LoTen38 < 2⁶³, so its signed and
    * unsigned readings agree) — the first total past Decimal(38,0)'s
    * representable window. */
  val HiTen38: Long = 5421010862427522170L
  val LoTen38: Long = 687399551400673280L
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
