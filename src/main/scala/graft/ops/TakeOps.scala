package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional gather / factorize — the reference's take family
  * (`/root/reference/src/lib.rs:37-209`, `/root/reference/src/algos.rs:48-93`)
  * and the key-factorization contract its callers supply (SURVEY.md §2.5).
  */
object TakeOps {

  /** `take_1d` (`src/lib.rs:37-55`): `out[i] = values[indexer[i]]`, with
    * `indexer[i] == -1` (or any out-of-range position) → NULL — our engine
    * uses real SQL NULLs instead of the reference's hardcoded 0 fill
    * (`README.md:28-30` notes the fill arg was future work).
    *
    * `indexer` rows carry (`idxCol` = requested position); `values` rows
    * carry (`posCol` = their position, payload columns). Implemented as a
    * left equi-join on position — at scale this is a plain shuffled (or
    * broadcast, if `values` is small) hash join; no driver-side gather.
    */
  def take1d(indexer: DataFrame, idxCol: String,
             values: DataFrame, posCol: String): DataFrame =
    indexer.join(values, col(idxCol) === values(posCol), "left")
      .drop(posCol)

  /** `take_2d_axis1` (`/root/reference/src/algos.rs:48-62`): gather
    * *columns* by position — in a declarative engine this is a pure
    * Catalyst projection (SURVEY.md §2.1), free of data movement. */
  def take2dAxis1(df: DataFrame, indices: Seq[Int]): DataFrame = {
    val cols = df.columns
    df.select(indices.map(i => col(cols(i))): _*)
  }

  /** Factorize: distinct keys → dense codes 0..n−1 in key sort order.
    * The caller-side `labels` contract of every reference kernel
    * (`src/lib.rs:781-783`). Null keys get code −1 (pandas' `dropna` label).
    *
    * dense_rank over the *distinct* keys (not the raw rows) keeps the sort
    * tiny; joining codes back is a broadcast at any realistic cardinality.
    */
  def factorize(df: DataFrame, keys: Seq[String], codeCol: String = "code"): DataFrame = {
    val keyCols  = keys.map(col)
    val nonNull  = keyCols.map(_.isNotNull).reduce(_ && _)
    val distinct = df.select(keyCols: _*).distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy(keyCols: _*)
    distinct.filter(nonNull)
      .withColumn(codeCol, dense_rank().over(w).cast("long") - 1)
      .unionByName(distinct.filter(!nonNull).withColumn(codeCol, lit(-1L)))
  }
}
