package graft

import graft.functions.{DotProductQ, KahanSum, QuantileAgg, TextFunctions, TopKByValue}
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
    // quantile_agg(v, q, 'linear'|'lower'|'higher'|'nearest'|'midpoint'):
    // the engine's exact grouped-quantile kernel (5 reference interpolation
    // modes) as a plain SQL aggregate — value→count map buffer, map-side
    // combinable, O(distinct values) state (see QuantileAgg).
    e.injectFunction((
      FunctionIdentifier("quantile_agg"),
      new ExpressionInfo(classOf[QuantileAgg].getName, "quantile_agg"),
      exprs => QuantileAgg(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression()))
    // minhash_agg(h, i): i-th minwise signature component over a shingle-
    // hash column — the EXACT expression tree TextFunctions.minhashAgg
    // builds on the DataFrame path (min((h·aᵢ + bᵢ) % P32)), so SQL and
    // DataFrame pipelines plan identically.
    e.injectFunction((
      FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(TextFunctions.getClass.getName, "minhash_agg"),
      exprs => {
        require(exprs(1).foldable, "minhash_agg: i must be a literal")
        val i = exprs(1).eval().asInstanceOf[Number].intValue
        require(i >= 0 && i < TextFunctions.MinhashAB.size,
          s"minhash_agg: i must be in [0, ${TextFunctions.MinhashAB.size})")
        val (a, b) = TextFunctions.MinhashAB(i)
        org.apache.spark.sql.catalyst.expressions.aggregate.Min(
          org.apache.spark.sql.catalyst.expressions.Remainder(
            org.apache.spark.sql.catalyst.expressions.Add(
              org.apache.spark.sql.catalyst.expressions.Multiply(
                exprs(0),
                org.apache.spark.sql.catalyst.expressions.Literal(a)),
              org.apache.spark.sql.catalyst.expressions.Literal(b)),
            org.apache.spark.sql.catalyst.expressions.Literal(
              TextFunctions.P32))).toAggregateExpression()
      }))
    e.injectOptimizerRule(_ => new graft.plans.RangeJoinBinRule)
    // Whole-operator seam: plans graft.plans.AsofMergeJoin (the
    // partitioned merge as-of join RelOps.asofJoin emits by default) —
    // RelOps also self-registers this per session via
    // experimental.extraStrategies, so extensions-less sessions work; the
    // injection here is the cluster-wide `spark.sql.extensions` path.
    e.injectPlannerStrategy(_ => new graft.plans.AsofMergeJoinStrategy)
  }
}
