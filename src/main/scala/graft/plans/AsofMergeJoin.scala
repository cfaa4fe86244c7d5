package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Partitioned merge as-of join — the whole-operator Catalyst path
  * (custom LogicalPlan + SparkStrategy + SparkPlan) for
  * [[graft.ops.RelOps.asofJoin]]'s backward/forward directions.
  *
  * Why a physical operator: Spark has no as-of join. The composition
  * that expresses it with built-ins (union both sides, ONE sort of the
  * combined relation, `last(match IGNORE NULLS)` window scan) is the
  * right declarative shape but pays for it at scale — the shuffle and
  * sort carry left+right TOGETHER, every left row is widened with the
  * right-side columns before the sort, and the window frame machinery
  * evaluates a struct aggregate per row. The merge form is what native
  * engines run (DuckDB's ASOF JOIN operator — measured 2.45× faster
  * than the union plan at 100M events, SCALE.md "r17: q_asof and
  * q_session_window at sf100"): co-partition each side by key
  * SEPARATELY, sort each side by (key, ord) SEPARATELY (two small sorts
  * instead of one big one; the payload never rides through the left
  * sort), then a single forward pass per partition with two cursors —
  * O(|L|+|R|) with no per-row aggregate machinery.
  *
  * Distribution contract: both children clustered on the join keys —
  * co-partitioned by EnsureRequirements exactly like a sort-merge join
  * — and sorted ascending nulls-first by (keys :+ ord). On a
  * 1000-executor cluster this is one shuffle per side of only that
  * side's columns; AQE sizes both exchanges independently.
  *
  * Match semantics (pandas `merge_asof`, byte-compatible with the
  * window formulation — the A/B property is spec-pinned across random
  * data in RelOpsSpec):
  *   - backward: latest right row with rightOrd <= leftOrd (inclusive);
  *   - forward: earliest right row with rightOrd >= leftOrd (inclusive);
  *   - matching is by ROW: a matched row with a null payload yields a
  *     null payload (never falls through to an earlier row);
  *   - null ordinates sort first, so a null-ord left row can only match
  *     null-ord right rows — identical to the union sort's placement.
  *
  * Output = left.output ++ (matched?, matchedOrd, matchedPayload); the
  * wrapper in RelOps turns the triple into the payload column,
  * tolerance bound, and `nearest` combination (two merges — the left
  * side's exchange and sort are REUSED by the second merge because this
  * node preserves left partitioning and ordering).
  */
case class AsofMergeJoin(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftOrd: Attribute, rightOrd: Attribute, payload: Attribute,
    forward: Boolean,
    matchedFlag: AttributeReference, matchedOrd: AttributeReference,
    matchedPay: AttributeReference,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ Seq(matchedFlag, matchedOrd, matchedPay)
  // the match triple is GENERATED here, not read from a child — without
  // this, CheckAnalysis counts the three attrs as missing input
  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(matchedFlag, matchedOrd, matchedPay))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofMergeJoin]] to [[AsofMergeJoinExec]]. Registered per
  * session by RelOps (experimental.extraStrategies) and cluster-wide by
  * [[graft.GraftExtensions]] (injectPlannerStrategy). */
class AsofMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case a: AsofMergeJoin =>
      AsofMergeJoinExec(a.leftKeys, a.rightKeys, a.leftOrd, a.rightOrd,
        a.payload, a.forward, a.matchedFlag, a.matchedOrd, a.matchedPay,
        planLater(a.left), planLater(a.right)) :: Nil
    case _ => Nil
  }
}

case class AsofMergeJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftOrd: Attribute, rightOrd: Attribute, payload: Attribute,
    forward: Boolean,
    matchedFlag: AttributeReference, matchedOrd: AttributeReference,
    matchedPay: AttributeReference,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ Seq(matchedFlag, matchedOrd, matchedPay)

  override def producedAttributes: AttributeSet =
    AttributeSet(Seq(matchedFlag, matchedOrd, matchedPay))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightOrd).map(SortOrder(_, Ascending)))

  // one output row per left row, in left order — both properties survive,
  // which is what lets the `nearest` wrapper chain a second merge with no
  // new left-side exchange or sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // locals only — the partition closure must not capture the SparkPlan
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val ordType = leftOrd.dataType
    val payType = payload.dataType
    val lOrdIdx = lOutput.indexWhere(_.exprId == leftOrd.exprId)
    val rOrdIdx = rOutput.indexWhere(_.exprId == rightOrd.exprId)
    val rPayIdx = rOutput.indexWhere(_.exprId == payload.exprId)
    require(lOrdIdx >= 0 && rOrdIdx >= 0 && rPayIdx >= 0,
      "asof merge: ord/payload attribute not found in child output")
    val fwd = forward
    val outAttrs = output
    val matchAttrs = Seq(matchedFlag, matchedOrd, matchedPay)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyProjL = UnsafeProjection.create(lKeys, lOutput)
      val keyProjR = UnsafeProjection.create(rKeys, rOutput)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordOrd = TypeUtils.getInterpretedOrdering(ordType)
      // nulls-first, matching the Ascending sort the children arrive in
      def cmpOrd(a: Any, b: Any): Int =
        if (a == null) { if (b == null) 0 else -1 }
        else if (b == null) 1
        else ordOrd.compare(a, b)

      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val matchRow = new GenericInternalRow(3)
      val outProj = UnsafeProjection.create(outAttrs, lOutput ++ matchAttrs)

      if (!fwd) {
        // backward: consume right rows up to (key, ord], remembering the
        // last one — the sorter reuses row objects, so the remembered
        // (key, ord, payload) values are copied out
        var mKey: UnsafeRow = null
        var mOrd: Any = null
        var mPay: Any = null
        lIter.map { l =>
          val lk = keyProjL(l)
          val lo = if (l.isNullAt(lOrdIdx)) null else l.get(lOrdIdx, ordType)
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            val rk = keyProjR(r)
            val c = keyOrdering.compare(rk, lk)
            if (c < 0) { rBuf.next(); () }
            else if (c == 0) {
              val ro = if (r.isNullAt(rOrdIdx)) null else r.get(rOrdIdx, ordType)
              if (cmpOrd(ro, lo) <= 0) {
                mKey = rk.copy()
                mOrd = InternalRow.copyValue(ro)
                mPay = if (r.isNullAt(rPayIdx)) null
                  else InternalRow.copyValue(r.get(rPayIdx, payType))
                rBuf.next()
              } else continue = false
            } else continue = false
          }
          val hit = mKey != null && keyOrdering.compare(mKey, lk) == 0
          matchRow.update(0, hit)
          matchRow.update(1, if (hit) mOrd else null)
          matchRow.update(2, if (hit) mPay else null)
          numOutputRows += 1
          outProj(joined(l, matchRow))
        }
      } else {
        // forward: discard right rows strictly below (key, ord), then the
        // head — NOT consumed, later left rows may need it — is the match
        lIter.map { l =>
          val lk = keyProjL(l)
          val lo = if (l.isNullAt(lOrdIdx)) null else l.get(lOrdIdx, ordType)
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            val rk = keyProjR(r)
            val c = keyOrdering.compare(rk, lk)
            if (c < 0) { rBuf.next(); () }
            else if (c == 0) {
              val ro = if (r.isNullAt(rOrdIdx)) null else r.get(rOrdIdx, ordType)
              if (cmpOrd(ro, lo) < 0) { rBuf.next(); () } else continue = false
            } else continue = false
          }
          var hit = false
          var o: Any = null
          var p: Any = null
          if (rBuf.hasNext) {
            val r = rBuf.head
            if (keyOrdering.compare(keyProjR(r), lk) == 0) {
              hit = true
              o = if (r.isNullAt(rOrdIdx)) null else r.get(rOrdIdx, ordType)
              p = if (r.isNullAt(rPayIdx)) null else r.get(rPayIdx, payType)
            }
          }
          matchRow.update(0, hit)
          matchRow.update(1, o)
          matchRow.update(2, p)
          numOutputRows += 1
          outProj(joined(l, matchRow))
        }
      }
    }
  }
}
