package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two SORTED-ascending bigint
  * arrays via a linear two-cursor merge — the exact-Jaccard rerank's
  * per-pair hot loop (DedupOps.jaccardOnPairs). `array_intersect` builds
  * a hash set and materializes the intersection ARRAY per call only for
  * its size to be read (measured ~5 µs/pair on 52-element shingle sets);
  * the merge does ~|A|+|B| primitive comparisons with zero allocation
  * and codegens to a tight loop. Inputs are distinct sets (the shingle
  * relation is distinct (id, h) by contract) sorted by `sort_array` at
  * aggregation time, so the merge count IS the set intersection size.
  *
  * Sortedness is the caller's contract (jaccardOnPairs builds both
  * arrays with sort_array); on unsorted input the count would silently
  * undercount, so no other call site may reuse this without sorting.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects array<bigint> inputs, got " +
        s"${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { s += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i  = ctx.freshName("i")
      val j  = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val s  = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $nx = $a.numElements();
        int $ny = $b.numElements();
        int $i = 0; int $j = 0; long $s = 0L;
        while ($i < $nx && $j < $ny) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $s++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-level entry point: |A ∩ B| over sorted-ascending bigint arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
