package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks beyond plain joins: as-of join and top-k per
  * group. These are capabilities a user of the reference gets from pandas
  * (`merge_asof`, `nlargest`) — SURVEY.md §2.5.
  */
object RelOps {

  /** As-of join: for every left row, the payload of the latest right row
    * with the same keys and `rightOrd <= leftOrd` (inclusive).
    *
    * Union-and-scan formulation: tag both sides, sort by (keys, ord,
    * rightFirst) once, and stream `last(payload ignore nulls)` over the
    * running frame. ONE shuffle + ONE sort, no point-in-time self-join
    * explosion — this is the plan a sort-merge as-of needs at 100 TB, and
    * AQE handles skewed keys. Right rows at the exact same ord sort before
    * left rows so the match is inclusive.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftOrd: String, rightOrd: String,
               payload: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__ord", col(leftOrd)).withColumn("__isR", lit(0))
      .withColumn("__pay", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(
      (keys.map(col) :+ col(rightOrd).as("__ord")) :+ lit(1).as("__isR") :+
        col(payload).as("__pay"): _*)
    val unioned = l.select((keys.map(col) ++ Seq(col("__ord"), col("__isR"), col("__pay")) ++
      leftCols.filterNot(keys.contains).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)
      .select(leftCols.map(col) :+ col(as): _*)
  }

  /** Skew-resistant grouped aggregation by key salting: phase 1 aggregates
    * on (key, salt) so a hot key's rows spread over `buckets` reducers;
    * phase 2 combines the partials per key. Only usable for aggregations
    * with a partial/final decomposition — the caller provides both sides
    * (e.g. partial `sum`/`count`, final `sum`/`sum`). AQE's skew handling
    * covers joins; this covers the hot-key aggregation case it does not.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[(String, Column)],
                finalAgg: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finalAgg.head._2.as(finalAgg.head._1),
        finalAgg.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Top-k rows per group by `ord` (descending), deterministic via the
    * caller-supplied tiebreaker in `ord`. Window row_number + filter: one
    * shuffle, k rows kept per group per partition — no global sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }
}
