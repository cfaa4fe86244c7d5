package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped quantiles with the reference's five interpolation modes —
  * `group_quantile` (`/root/reference/src/groupby.rs:1532-1660`) and
  * `group_median_float64` (`src/groupby.rs:114-184`).
  *
  * Reference semantics reproduced exactly:
  *   - NAs dropped first; all-NA group → NULL (`:1594-1604`).
  *   - position `q·(n−1)`; `idx = trunc(pos)`, `frac = pos mod 1` (`:1617-1621`).
  *   - `frac == 0` (or mode=lower) → value at idx; otherwise interpolate with
  *     the value at idx+1: linear `v + (next−v)·frac`, higher `next`,
  *     midpoint `(v+next)/2`, nearest `next` iff `frac>0.5 ∨ (frac=0.5 ∧ q>0.5)`
  *     (`:1625-1652`).
  *
  * Physical shape (scale rationale): ONE hash-shuffle on the group keys +
  * ONE in-partition sort (the window), then a cheap explode over the
  * (small, constant) quantile list, filter to ≤2 rows per (group, q), and a
  * final tiny hash-agg. This is the distributed analog of the reference's
  * `groupsort_indexer` counting-sort plan (`src/groupby.rs:132-138`) and —
  * unlike collect-to-buffer quantile UDAFs — never materializes a group in
  * memory, so it survives skewed multi-GB groups at 100 TB.
  */
object QuantileOps {

  /** One output row per (group, q): columns keys..., `q`, `linear`, `lower`,
    * `higher`, `nearest`, `midpoint`. */
  def groupedQuantiles(df: DataFrame, keys: Seq[String], value: String,
                       qs: Seq[Double]): DataFrame = {
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1], got $qs") // reference `:1549-1554`
    val v       = col(value)
    val keyCols = keys.map(col)
    val w  = Window.partitionBy(keyCols: _*).orderBy(v)
    val wp = Window.partitionBy(keyCols: _*)

    val pos = df.filter(v.isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("__n", count(lit(1)).over(wp))
      .withColumn("q", explode(array(qs.map(lit): _*)))

    val qidx = col("q") * (col("__n") - 1).cast("double")
    val idx  = floor(qidx).cast("long")
    val frac = qidx - floor(qidx)

    val agged = pos
      .withColumn("__frac", frac)
      .withColumn("__lo", when(col("__rn") === idx, v))
      .withColumn("__hi", when(col("__rn") === idx + 1, v))
      .where(col("__lo").isNotNull || col("__hi").isNotNull)
      .groupBy(keyCols :+ col("q"): _*)
      .agg(
        max(col("__lo")).as("__lov"),
        max(col("__hi")).as("__hiv"),
        max(col("__frac")).as("__f"))

    val lo = col("__lov").cast("double")
    val hi = col("__hiv").cast("double")
    val f  = col("__f")
    agged.select(keyCols ++ Seq(
      col("q"),
      when(f === 0, lo).otherwise(lo + (hi - lo) * f).as("linear"),
      lo.as("lower"),
      when(f === 0, lo).otherwise(hi).as("higher"),
      when(f === 0, lo)
        .when(f > 0.5 || (f === 0.5 && col("q") > 0.5), hi)
        .otherwise(lo).as("nearest"),
      when(f === 0, lo).otherwise((lo + hi) / 2).as("midpoint")
    ): _*)
  }

  /** Per-group exact median (linear interpolation at q=0.5) —
    * `group_median_float64`. */
  def groupedMedian(df: DataFrame, keys: Seq[String], value: String,
                    as: String = "median"): DataFrame =
    groupedQuantiles(df, keys, value, Seq(0.5))
      .select((keys.map(col) :+ col("linear").as(as)): _*)
}
