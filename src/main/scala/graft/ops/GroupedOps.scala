package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Grouped-aggregation building blocks reproducing the reference's NA
  * contract (`/root/reference/src/groupby.rs`, see SURVEY.md §1.3/§2.2):
  * skipna (SQL default), `min_count`, Kleene any/all, dropped null keys.
  *
  * Everything here is a plain `Column` combinator over Spark's built-in
  * (codegen'd, partial-aggregation-friendly) aggregates — no UDFs, so plans
  * stay in whole-stage codegen and map-side combine works at 100 TB.
  *
  * Determinism note: several helpers compute variance/skewness from *raw
  * power sums* rather than Spark's streaming central-moment aggregates.
  * With integer-valued inputs the power sums are exact, so the final
  * float formula is bitwise-reproducible across engines and partition
  * orders — that is what lets the DuckDB differential oracle hash-match.
  *
  * Validity bound (r15 overflow sweep, PLANS.md): the per-row k-th power
  * is formed in double (exact while |x|ᵏ < 2⁵³ — l_quantity ≤ 50 → x³
  * ≤ 1.25e5, cents ≤ 5.6e4 → x·y ≤ 3.2e9, both exact), cast to long, and
  * ACCUMULATED in [[graft.functions.SumI128]] — the two-long exact
  * 128-bit sum, good to ~1.7e38 ≈ 10²³ rows per group at these summand
  * widths. The pre-r15 double accumulators lost integer exactness past
  * 2⁵³/max|x|ᵏ ≈ 7e10 rows per group for s3 — INSIDE the 100 TB design
  * point (8e11 rows/group on the 6-group flagship shape); sum_i128 has no
  * such cliff and costs two long adds + a carry per row. For general
  * (non-integer) data, Spark's built-in `var_samp` / `skewness` remain
  * available; both forms are exposed.
  */
object GroupedOps {

  /** `min_count` gate (reference `check_below_mincount`,
    * `/root/reference/src/groupby.rs:788-843`): result is NULL when the
    * number of non-NA observations is below `minCount`. `minCount <= 0`
    * means "unused" (reference passes -1).
    */
  def withMinCount(agg: Column, value: Column, minCount: Int): Column =
    if (minCount <= 0) agg
    else when(count(value) >= lit(minCount.toLong), agg).otherwise(lit(null))

  /** skipna=false for plain aggregations: any NA in the group poisons the
    * result (`src/groupby.rs:257-261` analog for one-shot aggs): NULL
    * unless every row is non-NA. */
  def noSkipna(agg: Column, value: Column): Column =
    when(count(lit(1)) === count(value), agg)

  /** Sum with min_count — `group_sum` (`src/groupby.rs:846-907`). */
  def sumMinCount(value: Column, minCount: Int): Column =
    withMinCount(sum(value), value, minCount)

  /** Product with min_count — `group_prod` (`src/groupby.rs:909-985`). */
  def prodMinCount(value: Column, minCount: Int): Column =
    withMinCount(product(value), value, minCount)

  /** Variance with arbitrary ddof — `group_var` (`src/groupby.rs:987-1129`,
    * correct unmasked formula `M2/(count-ddof)`). Built on Spark's Welford
    * `var_samp` rescaled, so it stays a single streaming aggregate. */
  def varDdof(value: Column, ddof: Int): Column = {
    val n = count(value).cast("double")
    when(n - lit(ddof) <= 0, lit(null))
      .otherwise(var_samp(value) * (n - 1) / (n - lit(ddof)))
  }

  /** Standard deviation with ddof. */
  def stdDdof(value: Column, ddof: Int): Column = sqrt(varDdof(value, ddof))

  /** Standard error of the mean: std(ddof)/sqrt(n) — `group_var` with
    * `name="sem"` (`src/groupby.rs:1107-1126`). */
  def sem(value: Column, ddof: Int): Column =
    stdDdof(value, ddof) / sqrt(count(value).cast("double"))

  /** Exact 128-bit sum of an integer-valued column (the power-sum
    * accumulator — see the object scaladoc's validity bound).
    *
    * CONTRACT (applies to every *Exact/skewAdjusted helper below): the
    * summand must be INTEGER-VALUED. The `cast("long")` TRUNCATES toward
    * zero, so a fractional input does not "degrade to float rounding" —
    * it produces substantially wrong moments (ADVICE r15). Callers with
    * general doubles scale to an integer grid first ([[Money.scaled]])
    * or use Spark's built-in `var_samp`/`covar_samp`/`skewness`. */
  private def sx(value: Column): Column =
    graft.functions.ExactAgg.sumI128(value.cast("long")).cast("double")

  /** Exact-power-sum variance: deterministic for integer-valued inputs.
    * m2 = (Σx² − (Σx)²/n) / (n − ddof), guarded for n ≤ ddof. */
  def varExact(value: Column, ddof: Int): Column = {
    val n  = count(value).cast("double")
    val s1 = sx(value)
    val s2 = sx(value * value)
    when(n - lit(ddof) <= 0, lit(null))
      .otherwise((s2 - s1 * s1 / n) / (n - lit(ddof)))
  }

  def stdExact(value: Column, ddof: Int): Column = sqrt(varExact(value, ddof))

  /** Sample covariance from exact power sums (pandas `groupby.cov`,
    * ddof=1): rows where EITHER side is null are excluded (pairwise
    * complete), matching pandas. Summands must be integer-valued for the
    * sums to be exact (the caller's cents/quantity contract). */
  def covExact(x: Column, y: Column, ddof: Int = 1): Column = {
    val both = x.isNotNull && y.isNotNull
    val xa   = when(both, x)
    val ya   = when(both, y)
    val n    = count(xa).cast("double")
    val s1x  = sx(xa)
    val s1y  = sx(ya)
    val sxy  = sx(xa * ya)
    when(n - lit(ddof) <= 0, lit(null))
      .otherwise((sxy - s1x * s1y / n) / (n - lit(ddof)))
  }

  /** Pearson correlation from exact power sums (pandas `groupby.corr`):
    * (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)); NULL for
    * degenerate (zero-variance or n<2) groups. Same explicit formula on
    * the oracle side — built-in corr() implementations differ in update
    * algorithm and would not hash-match. */
  def corrExact(x: Column, y: Column): Column = {
    val both = x.isNotNull && y.isNotNull
    val xa   = when(both, x)
    val ya   = when(both, y)
    val n    = count(xa).cast("double")
    val s1x  = sx(xa)
    val s1y  = sx(ya)
    val sxx  = sx(xa * xa)
    val syy  = sx(ya * ya)
    val sxy  = sx(xa * ya)
    val vx   = n * sxx - s1x * s1x
    val vy   = n * syy - s1y * s1y
    when(n < 2 || vx <= 0 || vy <= 0, lit(null))
      .otherwise((n * sxy - s1x * s1y) / sqrt(vx * vy))
  }

  def semExact(value: Column, ddof: Int): Column =
    stdExact(value, ddof) / sqrt(count(value).cast("double"))

  /** Adjusted (Fisher–Pearson, bias-corrected) skewness — the reference's
    * documented intent for `group_skew` (`src/groupby.rs:1131-1268`; its
    * finalize-loop bugs are catalogued in SURVEY.md §7.4 and NOT replicated).
    *
    * Computed from raw power sums (exact for integer-valued input):
    *   m2 = Σx²/n − mean²,  m3 = Σx³/n − 3·mean·Σx²/n + 2·mean³
    *   g1 = m3 / m2^1.5,    adj = g1 · √(n(n−1)) / (n−2)
    * n < 3 → NULL; m2 = 0 → 0 (reference `:1203-1207`).
    */
  def skewAdjusted(value: Column): Column = {
    val n  = count(value).cast("double")
    val s1 = sx(value)
    val s2 = sx(value * value)
    val s3 = sx(value * value * value)
    val m  = s1 / n
    val m2 = s2 / n - m * m
    val m3 = s3 / n - lit(3.0) * m * (s2 / n) + lit(2.0) * m * m * m
    when(n < 3, lit(null))
      .when(m2 === 0, lit(0.0))
      // m2^1.5 as m2·√m2: sqrt is IEEE-correctly-rounded in every engine,
      // pow is not (libm vs Math.pow differ by 1 ulp) — keeps differential
      // comparisons bitwise-exact.
      .otherwise((m3 / (m2 * sqrt(m2))) * sqrt(n * (n - 1)) / (n - 2))
  }

  /** First non-NA value per group under an explicit deterministic ordering —
    * `group_last`'s mirror (`src/groupby.rs:1662-1744`). The reference's
    * "order" is physical row order; Spark requires an order column
    * (SURVEY.md §7.3), supplied as `ord` (must be unique per group). */
  def firstByOrd(value: Column, ord: Column): Column =
    min_by(value, when(value.isNotNull, ord))

  /** Last non-NA value per group by `ord` — `group_last`. */
  def lastByOrd(value: Column, ord: Column): Column =
    max_by(value, when(value.isNotNull, ord))

  /** Grouped any/all — `group_any_all` (`src/groupby.rs:698-784`).
    *
    * skipna=true (pandas default): NAs ignored — exactly SQL
    * `bool_or`/`bool_and` (any([F, NA]) = F).
    * skipna=false: Kleene three-valued logic (`:737-745`) — result is NA
    * iff no determining value (T for any, F for all) was seen and ≥1 NA
    * was; SQL aggregates skip nulls, so the NA case is reinstated
    * explicitly. */
  def any(pred: Column, skipna: Boolean = true): Column =
    if (skipna) bool_or(pred)
    else when(bool_or(pred) === true, lit(true))
      .when(count(lit(1)) > count(pred), lit(null))
      .otherwise(lit(false))

  def all(pred: Column, skipna: Boolean = true): Column =
    if (skipna) bool_and(pred)
    else when(bool_and(pred) === false, lit(false))
      .when(count(lit(1)) > count(pred), lit(null))
      .otherwise(lit(true))

  /** pandas' `dropna=True` default for group keys: the reference drops
    * null-keyed rows before aggregating (`lab < 0` skip in every kernel,
    * e.g. `src/groupby.rs:937-939`), while Spark's groupBy KEEPS a null
    * group. Pre-filter to get pandas semantics; pass `dropna = false` for
    * the SQL behavior. */
  def groupByDropNa(df: org.apache.spark.sql.DataFrame, keys: Seq[Column],
                    dropna: Boolean = true)
      : org.apache.spark.sql.RelationalGroupedDataset = {
    val base = if (dropna) df.where(keys.map(_.isNotNull).reduce(_ && _)) else df
    base.groupBy(keys: _*)
  }

  /** OHLC = (first, max, min, last) of `value` ordered by `ord` —
    * `group_ohlc`'s documented intent (`src/groupby.rs:1405-1530`; its
    * flag/low-slot bugs are not replicated). Returns the four columns. */
  def ohlc(value: Column, ord: Column): Seq[(String, Column)] = Seq(
    "open"  -> firstByOrd(value, ord),
    "high"  -> max(value),
    "low"   -> min(value),
    "close" -> lastByOrd(value, ord)
  )
}
