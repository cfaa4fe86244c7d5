package graft

import graft.functions.{DotProductQ, KahanSum}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Canonical deployment seam for the engine's custom Catalyst pieces:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) registers the SQL-callable
  * functions on every session, cluster-wide — the supported alternative to
  * per-session `GraftFunctions.register`.
  *
  * No custom Rule/Strategy is injected: reference parity needs none
  * (SURVEY.md §4.1-§4.2) — all operators lower to built-in Catalyst plans.
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
  }
}
