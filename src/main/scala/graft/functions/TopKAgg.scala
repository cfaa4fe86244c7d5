package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a native `TypedImperativeAggregate`: a bounded
  * binary heap of (value, id) pairs per group, mergeable across
  * partitions — so top-k-per-group plans as a plain HASH AGGREGATION
  * (map-side partials included) instead of the window formulation's full
  * (group, value) SORT of the fact table. At 100 TB that replaces an
  * O(n log n) sort-per-partition + per-group scan with O(n log k) heap
  * updates and k-sized shuffle payloads — the same reason
  * TakeOrderedAndProject exists for the global case. The window/rank
  * route (RelOps top-k / WindowGroupLimit) remains when rank semantics
  * (ties, dense) are needed; this is the cheap exact path for
  * "k best rows per key".
  *
  * Determinism: ordering is (value DESC, id ASC) — ties on value resolve
  * to the smallest id, so results are reproducible on any partitioning.
  * Null values (or null ids) are skipped, matching `row_number() OVER
  * (... ORDER BY v DESC, id)` over non-null rows.
  *
  * Values may be BIGINT or DOUBLE. Doubles are stored in the heap as
  * order-preserving sortable long bits (IEEE-754 sign-fold: nonnegative
  * keeps its bit pattern, negative flips the 63 value bits) and decoded
  * bit-exactly on output — so double ordering matches SQL's
  * `ORDER BY v DESC` (NaN greatest) with zero rounding, and the heap /
  * serialization stays a flat (long, long) pair either way.
  */
case class TopKByValue(
    valueExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue

  private lazy val isDouble: Boolean = valueExpr.dataType == DoubleType

  /** Order-preserving double→long: x ≤ y  ⇔  enc(x) ≤ enc(y) (signed),
    * with NaN mapping above +Inf (Spark's sort order). Bit-exact inverse
    * below, so no precision is lost through the heap. */
  private def encode(v: Any): Long =
    if (isDouble) {
      // doubleToLongBits (not Raw): canonicalizes NaN payloads so any NaN
      // compares identically regardless of its bit pattern
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      bits ^ ((bits >> 63) & Long.MaxValue)
    } else v.asInstanceOf[Long]

  private def decode(s: Long): Any =
    if (isDouble) java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
    else s

  // Analysis-time contract: value is BIGINT or DOUBLE, id is BIGINT and
  // k is a literal >= 1 — SQL callers passing an int column or k=0 get a
  // plan-time error instead of a runtime ClassCastException / empty-heap
  // dequeue. (AbstractDataType is private[sql] in Spark 4, so the check
  // is spelled out here rather than via ImplicitCastInputTypes.)
  override def checkInputDataTypes(): TypeCheckResult = {
    if (valueExpr.dataType != LongType && valueExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: value must be BIGINT or DOUBLE, got ${valueExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: id must be BIGINT, got ${idExpr.dataType.sql}")
    else if (!Seq[DataType](IntegerType, LongType, ShortType, ByteType)
               .contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: k must be an integer literal, got ${kExpr.dataType.sql}")
    else if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_agg: k must be a literal")
    else if (kExpr.eval() == null ||
             kExpr.eval().asInstanceOf[Number].intValue < 1)
      TypeCheckResult.TypeCheckFailure("topk_agg: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }

  // scala.PriorityQueue dequeues the MAX under its ordering; key the heap
  // so the WORST kept pair (smallest value, then largest id) is the max
  // and can be evicted in O(log k). Explicit compare (not Ordering.by with
  // negation): -Long.MinValue overflows, which matters now that encoded
  // doubles span the full long range.
  private def worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)],
                    cand: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else {
      val worst = buf.head
      if (cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)) {
        buf.dequeue(); buf.enqueue(cand)
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v  = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      offer(buf, (encode(v), id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    new GenericArrayData(sorted.map(t =>
      new GenericInternalRow(Array[Any](decode(t._1), t._2)): Any))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putLong(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", valueExpr.dataType),
      StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}
