package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Kahan-compensated floating-point sum as a native Catalyst
  * `DeclarativeAggregate` — numeric-fidelity parity with the reference's
  * compensated accumulators (`group_mean`
  * `/root/reference/src/groupby.rs:1325-1337`, `CumSumAccumulator`
  * `src/groupby.rs:314-360`). Spark's built-in `sum` accumulates naively;
  * this keeps a (sum, compensation) buffer so per-partition partial sums
  * lose no low-order bits, making large-scale double sums both more
  * accurate and far less partition-order-sensitive.
  *
  * Declarative (pure-expression) form: updates/merges stay inside
  * whole-stage codegen and map-side partial aggregation — no UDAF object
  * allocation per row, so it is usable in the 100 TB hot path.
  */
case class KahanSum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType   = DoubleType
  override def nullable: Boolean    = true
  override def prettyName: String   = "kahan_sum"

  private lazy val sum     = AttributeReference("sum", DoubleType, nullable = false)()
  private lazy val comp    = AttributeReference("comp", DoubleType, nullable = false)()
  private lazy val isEmpty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sum, comp, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(true))

  // Neumaier/KBN update: t = s + x; the exact rounding error of that add
  // is recoverable as (s − t) + x when |s| ≥ |x|, else (x − t) + s —
  // classic Kahan's single form loses it under catastrophic cancellation.
  // `comp` accumulates the errors and is added back at evaluation.
  override lazy val updateExpressions: Seq[Expression] = {
    val x   = child.cast(DoubleType)
    val t   = sum + x
    val err = If(Abs(sum) >= Abs(x), (sum - t) + x, (x - t) + sum)
    Seq(
      If(x.isNull, sum, t),
      If(x.isNull, comp, comp + err),
      isEmpty && x.isNull)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val t = sum.left + sum.right
    val err = If(Abs(sum.left) >= Abs(sum.right),
      (sum.left - t) + sum.right, (sum.right - t) + sum.left)
    Seq(
      t,
      comp.left + comp.right + err,
      isEmpty.left && isEmpty.right)
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DoubleType), sum + comp)

  override protected def withNewChildInternal(newChild: Expression): KahanSum =
    copy(child = newChild)
}

object GraftFunctions {
  /** Register the engine's SQL-callable custom functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kahan_sum", exprs => KahanSum(exprs.head).toAggregateExpression(), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg", exprs => TopKByValue(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sum_i128", exprs => SumI128(exprs.head).toAggregateExpression(),
      "scala_udf")
  }
}
