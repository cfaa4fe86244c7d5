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

  /** `round(c·factor)` for NON-NEGATIVE inputs, without the per-value
    * BigDecimal: for x ≥ 0, `floor(x + 0.5)` IS round-half-up, which
    * equals both Spark round's HALF_UP and DuckDB round's half-away on
    * non-negatives — including binary-exact .5 ties, where all three
    * round up. (For negative inputs half-up and half-away diverge on
    * ties; the engine's scaled columns — money, event values, scores —
    * are all non-negative.) */
  def scaled(c: Column, factor: Long): Column =
    floor(c * lit(factor) + lit(0.5))
}
