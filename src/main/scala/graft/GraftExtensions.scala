package graft

import graft.functions.{DotProductQ, KahanSum, TopKByValue}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Canonical deployment seam for the engine's custom Catalyst pieces:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) registers the SQL-callable
  * functions on every session, cluster-wide — the supported alternative to
  * per-session `GraftFunctions.register`.
  *
  * Reference parity needs no custom Rule/Strategy (SURVEY.md §4.1-§4.2) —
  * all operators lower to built-in Catalyst plans. One OPT-IN optimizer
  * rule is injected beyond parity: [[graft.plans.RangeJoinBinRule]]
  * rewrites pure range-predicate joins into the binned equi-join shape
  * (active only when `spark.graft.rangeJoin.binWidth` is set).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("kahan_sum"),
      new ExpressionInfo(classOf[KahanSum].getName, "kahan_sum"),
      exprs => KahanSum(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("dotq"),
      new ExpressionInfo(classOf[DotProductQ].getName, "dotq"),
      exprs => DotProductQ(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("topk_agg"),
      new ExpressionInfo(classOf[TopKByValue].getName, "topk_agg"),
      exprs => TopKByValue(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression()))
    e.injectOptimizerRule(_ => new graft.plans.RangeJoinBinRule)
  }
}
