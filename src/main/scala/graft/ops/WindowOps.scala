package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Grouped length-preserving transforms — the reference's cumulative /
  * shift / fill / rank kernels (`/root/reference/src/groupby.rs` §2.3 of
  * SURVEY.md), expressed as Spark window functions.
  *
  * All of these shuffle once on the partition keys and sort once within the
  * partition (`WindowExec`); running frames are streamed, so group size is
  * unbounded — no per-group buffering, which is what makes the pattern hold
  * at 100 TB. The reference's implicit "physical row order" is replaced by
  * an explicit unique order column (SURVEY.md §7.3).
  */
object WindowOps {

  private def cum(keys: Seq[Column], ord: Seq[Column]): WindowSpec =
    Window.partitionBy(keys: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Running NA poison flag: true once the group has seen a NA at or before
    * the current row — the `skipna=false` accumulator state
    * (`src/groupby.rs:505-519`). */
  private def seenNa(v: Column, keys: Seq[Column], ord: Seq[Column]): Column =
    max(when(v.isNull, 1).otherwise(0)).over(cum(keys, ord)) === 1

  /** Per-group running sum — `group_cumsum` (`src/groupby.rs:424-536`).
    * skipna=true: NA positions stay NA, accumulation continues.
    * skipna=false: first NA poisons the rest of the group. */
  def cumsum(v: Column, keys: Seq[Column], ord: Seq[Column],
             skipna: Boolean = true): Column = {
    val run = sum(v).over(cum(keys, ord)) // Spark sum already skips nulls
    if (skipna) when(v.isNull, lit(null)).otherwise(run)
    else when(seenNa(v, keys, ord), lit(null)).otherwise(run)
  }

  /** Per-group compensated running sum — float-fidelity parity with the
    * reference's Kahan `CumSumAccumulator` for f32/f64
    * (`src/groupby.rs:314-360`): the [[graft.functions.KahanSum]]
    * DeclarativeAggregate evaluated over a running frame, so each prefix
    * sum is Neumaier-compensated instead of naively accumulated. Same
    * streamed one-sort window plan as [[cumsum]] (the aggregate buffer is
    * (sum, comp, seen) — constant state per group). Use for raw-double
    * pipelines; the oracle-checked queries use integer cents instead,
    * which makes plain [[cumsum]] already exact. */
  def cumsumKahan(v: Column, keys: Seq[Column], ord: Seq[Column],
                  skipna: Boolean = true): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val run = ColumnBridge.column(
      graft.functions.KahanSum(ColumnBridge.expression(v)).toAggregateExpression())
      .over(cum(keys, ord))
    if (skipna) when(v.isNull, lit(null)).otherwise(run)
    else when(seenNa(v, keys, ord), lit(null)).otherwise(run)
  }

  /** Per-group running product — `group_cumprod` (`src/groupby.rs:211-300`). */
  def cumprod(v: Column, keys: Seq[Column], ord: Seq[Column],
              skipna: Boolean = true): Column = {
    val run = product(v).over(cum(keys, ord))
    if (skipna) when(v.isNull, lit(null)).otherwise(run)
    else when(seenNa(v, keys, ord), lit(null)).otherwise(run)
  }

  /** Per-group running min/max — `group_cummin_max`
    * (`src/groupby.rs:2185-2294`; the exported cummax binding is bugged to
    * compute cummin, SURVEY.md §7.4 — we implement the documented intent). */
  def cummin(v: Column, keys: Seq[Column], ord: Seq[Column],
             skipna: Boolean = true): Column = {
    val run = min(v).over(cum(keys, ord))
    if (skipna) when(v.isNull, lit(null)).otherwise(run)
    else when(seenNa(v, keys, ord), lit(null)).otherwise(run)
  }

  def cummax(v: Column, keys: Seq[Column], ord: Seq[Column],
             skipna: Boolean = true): Column = {
    val run = max(v).over(cum(keys, ord))
    if (skipna) when(v.isNull, lit(null)).otherwise(run)
    else when(seenNa(v, keys, ord), lit(null)).otherwise(run)
  }

  /** Per-group shift by ±periods — `group_shift_indexer`
    * (`src/groupby.rs:538-595`). The reference emits an indexer for a later
    * `take`; Spark's lag/lead shifts values directly. */
  def shift(v: Column, periods: Int, keys: Seq[Column], ord: Seq[Column]): Column = {
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    if (periods >= 0) lag(v, periods).over(w) else lead(v, -periods).over(w)
  }

  /** Per-group forward-fill with optional `limit` (max consecutive fills) —
    * `group_fillna_indexer` (`src/groupby.rs:621-669`).
    *
    * Run-structure trick (two streaming window passes, no self-join): the
    * running count of non-null values splits each group into runs of
    * [anchor, trailing nulls...]; within a run the fill value is the run's
    * single non-null anchor and the fill distance is the row offset. */
  def ffill(df: DataFrame, out: String, v: Column, keys: Seq[Column],
            ord: Seq[Column], limit: Option[Int] = None): DataFrame =
    directionalFill(df, out, v, keys, ord, limit, backward = false)

  /** Per-group backward-fill: same machinery over reversed order (the
    * reference realizes bfill by passing reversed `sorted_labels`,
    * `src/groupby.rs:606-608`). */
  def bfill(df: DataFrame, out: String, v: Column, keys: Seq[Column],
            ord: Seq[Column], limit: Option[Int] = None): DataFrame =
    directionalFill(df, out, v, keys, ord, limit, backward = true)

  private def directionalFill(df: DataFrame, out: String, v: Column,
                              keys: Seq[Column], ord: Seq[Column],
                              limit: Option[Int], backward: Boolean): DataFrame = {
    val dirOrd = if (backward) ord.map(_.desc) else ord
    val c      = cum(keys, dirOrd)
    val withRun = df
      .withColumn("__rn", row_number().over(Window.partitionBy(keys: _*).orderBy(dirOrd: _*)))
      .withColumn("__run", count(v).over(c)) // non-null count so far = run id
    val runW   = Window.partitionBy(keys :+ col("__run"): _*)
    val filled = withRun
      .withColumn("__fill", max(v).over(runW)) // ≤1 non-null per run
      .withColumn("__dist", col("__rn") - min(col("__rn")).over(runW))
    val ok = limit match {
      case Some(k) => col("__run") > 0 && col("__dist") <= k
      case None    => col("__run") > 0
    }
    filled
      .withColumn(out, when(v.isNotNull, v).when(ok, col("__fill")))
      .drop("__rn", "__run", "__fill", "__dist")
  }

  /** Per-group LINEAR interpolation of interior nulls (pandas
    * `interpolate(method='linear')` over the row position): a null at
    * position x between the nearest non-null neighbors (px, py) and
    * (nx, ny) becomes `py + (ny − py) · (x − px)/(nx − px)`. Leading and
    * trailing nulls (missing a neighbor on either side) stay null —
    * interpolation, not extrapolation; pair with [[ffill]]/[[bfill]] for
    * the edges. Output column `out` is DoubleType.
    *
    * Two streaming window passes (nearest non-null behind via a running
    * `last ignore nulls`, nearest ahead via `first ignore nulls` over the
    * following frame) — no self-join, state is one struct per direction,
    * so arbitrarily long null runs cost O(1) memory per row at any group
    * size. */
  def interpolateLinear(df: DataFrame, out: String, v: Column,
                        keys: Seq[Column], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = w.rowsBetween(1, Window.unboundedFollowing)
    val known = when(v.isNotNull, struct(col("__x").as("x"), v.as("y")))
    val withPos = df.withColumn("__x", row_number().over(w))
    val p = last(known, ignoreNulls = true).over(prevW)
    val n = first(known, ignoreNulls = true).over(nextW)
    val frac = (col("__x") - p.getField("x")) / (n.getField("x") - p.getField("x"))
    withPos
      .withColumn(out,
        when(v.isNotNull, v.cast("double"))
          .when(p.isNotNull && n.isNotNull,
            p.getField("y") + (n.getField("y") - p.getField("y")) * frac))
      .drop("__x")
  }

  /** Grouped rank with pandas tie-breaking methods — completes the
    * reference's `group_rank` stub (`/root/reference/src/lib.rs:1259-1274`)
    * per its declared signature (ties_method, ascending, pct, na_option).
    *
    * Returns the rank Column for use under an explicit window; `na_option`:
    * "keep" → NULL rank for NULL values; "top"/"bottom" → nulls ranked
    * first/last (Spark's null ordering).
    */
  def rank(v: Column, keys: Seq[Column], tiesMethod: String,
           ascending: Boolean = true, pct: Boolean = false,
           naOption: String = "keep"): Column = {
    val ordered = (ascending, naOption) match {
      case (true, "top")     => v.asc_nulls_first
      case (true, _)         => v.asc_nulls_last
      case (false, "top")    => v.desc_nulls_first
      case (false, _)        => v.desc_nulls_last
    }
    val w  = Window.partitionBy(keys: _*).orderBy(ordered)
    val wp = Window.partitionBy(keys: _*)
    val base: Column = tiesMethod match {
      case "min"     => org.apache.spark.sql.functions.rank().over(w).cast("double")
      case "dense"   => dense_rank().over(w).cast("double")
      case "first"   => row_number().over(w).cast("double")
      case "max"     => // min rank of ties + tie count − 1
        (org.apache.spark.sql.functions.rank().over(w)
          + count(lit(1)).over(Window.partitionBy(keys :+ v: _*)) - 1).cast("double")
      case "average" => // mean of the tied row_numbers = rank + (ties−1)/2
        org.apache.spark.sql.functions.rank().over(w).cast("double") +
          (count(lit(1)).over(Window.partitionBy(keys :+ v: _*)).cast("double") - 1) / 2
      case other => throw new IllegalArgumentException(s"ties_method $other")
    }
    val withNa = if (naOption == "keep") when(v.isNull, lit(null)).otherwise(base) else base
    if (!pct) withNa
    else {
      // pandas pct: rank / number of non-NA rows (keep) or all rows (top/bottom)
      val denom = if (naOption == "keep") count(v).over(wp) else count(lit(1)).over(wp)
      withNa / denom.cast("double")
    }
  }
}
