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

  /** The reference's take_1d dtype upcast matrix
    * (`/root/reference/src/lib.rs:64-165`): the exact (values → out) pairs
    * its dispatch implements. Signed ints widen to wider ints or f64,
    * f32 → f64, identity always; i64 → f64 is NOT allowed (the reference
    * leaves that arm commented out, `src/lib.rs:139-147`), and narrowing /
    * float→int are NotImplementedError. */
  import org.apache.spark.sql.types._
  val upcastMatrix: Set[(DataType, DataType)] = Set[(DataType, DataType)](
    (ByteType, ByteType), (ByteType, IntegerType), (ByteType, LongType),
    (ByteType, DoubleType),
    (ShortType, IntegerType), (ShortType, LongType), (ShortType, DoubleType),
    (IntegerType, IntegerType), (IntegerType, LongType), (IntegerType, DoubleType),
    (LongType, LongType),
    (FloatType, FloatType), (FloatType, DoubleType),
    (DoubleType, DoubleType))

  /** Widen a gathered column per the reference's allowed matrix; forbidden
    * pairs (narrowing, i64→f64, float→int — and i16→i16, which the
    * reference dispatch also lacks) throw — the Spark analog of the
    * reference's `PyNotImplementedError` arm (`src/lib.rs:160`). Identity
    * arms are NOT implied: only the pairs the dispatch lists pass. */
  def widen(c: Column, from: DataType, to: DataType): Column =
    if (upcastMatrix((from, to))) { if (from == to) c else c.cast(to) }
    else throw new IllegalArgumentException(
      s"take_1d upcast $from -> $to is outside the reference's allowed matrix")

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
    * Scale shape: a global window (`Window.orderBy` with no partitioning)
    * would pull every distinct key through one task; instead the distinct
    * set is range-partition sorted (a distributed `orderBy`) and codes are
    * assigned with `zipWithIndex`, which numbers rows per partition and
    * adds partition-offset prefix sums — one extra count job, no
    * single-task stage, so high-cardinality keys (user ids, URLs)
    * factorize at any scale.
    */
  def factorize(df: DataFrame, keys: Seq[String], codeCol: String = "code"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark    = df.sparkSession
    val keyCols  = keys.map(col)
    val nonNull  = keyCols.map(_.isNotNull).reduce(_ && _)
    val distinct = df.select(keyCols: _*).distinct()
    val sorted   = distinct.filter(nonNull).orderBy(keyCols: _*)
    val schema   = StructType(distinct.schema.fields :+
      StructField(codeCol, LongType, nullable = false))
    val coded = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
    coded.unionByName(distinct.filter(!nonNull).withColumn(codeCol, lit(-1L)))
  }
}
