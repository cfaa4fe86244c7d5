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

  /** Top-k rows per group by `ord` (descending), deterministic via the
    * caller-supplied tiebreaker in `ord`. Window row_number + filter: one
    * shuffle, k rows kept per group per partition — no global sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }
}
