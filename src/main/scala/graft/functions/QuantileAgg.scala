package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact grouped quantile as a native `TypedImperativeAggregate` — the SQL
  * surface for the engine's quantile kernel (`quantile_agg(v, q, mode)`),
  * with the reference's five interpolation modes
  * (`/root/reference/src/groupby.rs:1532-1660`, same arithmetic as
  * [[graft.ops.QuantileOps.groupedQuantiles]]: NAs dropped, all-NA → NULL,
  * pos = q·(n−1), idx = ⌊pos⌋, frac = pos − idx; `nearest` takes the upper
  * value iff frac > 0.5 ∨ (frac = 0.5 ∧ q > 0.5)).
  *
  * The buffer is a value→count map — the AGGREGATE-FUNCTION form of the
  * counting-sort domain plan: state is O(distinct values per group), not
  * O(rows), it merges associatively so map-side partial aggregation works
  * (each partition ships its domain counts, never its rows), and
  * finalization sorts only the tiny distinct domain. This is why it plans
  * as one ordinary hash aggregation with no fact-table sort — the same
  * scale property the DataFrame path gets from its domain window, in a
  * single SQL-callable expression. Degenerate all-distinct domains degrade
  * to the group's row count in buffer size — the same worst case any exact
  * quantile must pay.
  */
case class QuantileAgg(
    valueExpr: Expression, qExpr: Expression, modeExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]] {

  private lazy val q: Double = qExpr.eval().asInstanceOf[Number].doubleValue
  private lazy val mode: String = modeExpr.eval().toString

  private val Modes = Seq("linear", "lower", "higher", "nearest", "midpoint")

  override def checkInputDataTypes(): TypeCheckResult = {
    if (valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_agg: value must be DOUBLE, got ${valueExpr.dataType.sql}")
    else if (qExpr.dataType != DoubleType || !qExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "quantile_agg: q must be a DOUBLE literal")
    else if (qExpr.eval() == null ||
             q < 0.0 || q > 1.0)
      TypeCheckResult.TypeCheckFailure(
        "quantile_agg: q must be in [0, 1]")
    else if (modeExpr.dataType != StringType || !modeExpr.foldable ||
             modeExpr.eval() == null ||
             !Modes.contains(modeExpr.eval().toString))
      TypeCheckResult.TypeCheckFailure(
        s"quantile_agg: mode must be a literal in ${Modes.mkString("/")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Double, Long],
                      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = valueExpr.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      buf.update(d, buf.getOrElse(d, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Double, Long],
                     other: mutable.HashMap[Double, Long])
      : mutable.HashMap[Double, Long] = {
    other.foreach { case (v, c) => buf.update(v, buf.getOrElse(v, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null // all-NA group, reference `:1594-1604`
    val dom = buf.toArray.sortBy(_._1)
    val n   = dom.iterator.map(_._2).sum
    val pos  = q * (n - 1).toDouble
    val idx  = math.floor(pos).toLong
    val frac = pos - idx
    // walk the cumulative domain to the ranks idx and idx+1
    var cum = 0L
    var i = 0
    var lo = dom(0)._1
    var hi = dom(0)._1
    while (i < dom.length) {
      val prev = cum
      cum += dom(i)._2
      if (prev <= idx && idx < cum) lo = dom(i)._1
      if (prev <= idx + 1 && idx + 1 < cum) hi = dom(i)._1
      i += 1
    }
    if (frac == 0.0) lo
    else mode match {
      case "linear"   => lo + (hi - lo) * frac
      case "lower"    => lo
      case "higher"   => hi
      case "nearest"  => if (frac > 0.5 || (frac == 0.5 && q > 0.5)) hi else lo
      case "midpoint" => (lo + hi) / 2
    }
  }

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (v, c) => bb.putDouble(v); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(valueExpr, qExpr, modeExpr)
  override def prettyName: String = "quantile_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileAgg =
    copy(valueExpr = newChildren(0), qExpr = newChildren(1),
      modeExpr = newChildren(2))
}
