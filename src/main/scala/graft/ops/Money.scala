package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money→integer-cents conversion for the engine's
  * integer-exactness recipe (sum cents, divide once at the end).
  *
  * The obvious spelling, `round(x * 100).cast("long")`, routes every row
  * through Spark's `Round` on DoubleType — a per-value
  * `BigDecimal.setScale(HALF_UP)` allocation. The r15 sf100 attribution
  * (Q1Probe, 600M rows) measured that at ~3 ns/value ≈ 3–5 s of
  * q1_flagship's 15 s — a third of the flagship's gap to DuckDB, whose
  * `round()` is a native vectorized op.
  *
  * [[cents]] computes the identical integer with three codegen'd
  * primitives: `floor(x·100 + 0.5)` (floor of DoubleType is already
  * LongType). Equivalence argument, not an approximation: fixture money
  * values are 2-decimal, so the true cent count n = 100·x is an integer
  * with |repr(x)·100 − n| < 0.5 ulp-propagated error for all n < 2⁵⁰ —
  * both `round` (BigDecimal HALF_UP) and `floor(+0.5)` therefore land on
  * exactly n. The two differ only on exact .5 ties (half-away vs
  * half-up), which a 2-decimal money double cannot produce (a tie needs
  * a true value ending in .005). The DuckDB oracle's `round(x*100)`
  * (C `round`, half-away) agrees for the same reason — pinned by the
  * 189-query differential sweep at every verified SF.
  */
object Money {
  def cents(c: Column): Column = scaled(c, 100)

  /** `round(c·factor)` without the per-value BigDecimal, PRECONDITION:
    * the input is non-negative OR tie-free (no value whose scaled image
    * is a binary-exact .5). For x ≥ 0, `floor(x + 0.5)` IS
    * round-half-up, which equals both Spark round's HALF_UP and DuckDB
    * round's half-away — including exact .5 ties, where all three round
    * up. For x < 0 the three agree EXCEPT on exact .5 ties (floor(+0.5)
    * rounds toward +∞, round rounds away from zero) — which a k-decimal
    * value scaled by 10ᵏ cannot produce (a tie needs a true digit past
    * the scale). The engine's one signed adopter, `c_acctbal`, is
    * 2-decimal and therefore tie-free; every other scaled column is
    * non-negative. MoneySpec pins both facts and the divergence itself.
    * A caller that cannot rule ties out uses [[scaledSigned]]. */
  def scaled(c: Column, factor: Long): Column =
    floor(c * lit(factor) + lit(0.5))

  /** Sign-split `round(c·factor)` — exact round-half-away-from-zero on
    * ANY input, ties included (matches Spark round / DuckDB round on all
    * signs): the negative branch mirrors [[scaled]] through `-floor(-x·f
    * + 0.5)`. Two branches of the same three codegen'd primitives — use
    * it when the non-negative-or-tie-free precondition of [[scaled]]
    * can't be established (ADVICE r15: the precondition used to live
    * only in prose). */
  def scaledSigned(c: Column, factor: Long): Column =
    when(c >= 0, floor(c * lit(factor) + lit(0.5)))
      .otherwise(-floor(-c * lit(factor) + lit(0.5)))
}
