package graft.functions

import java.nio.ByteBuffer

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
  extends TypedImperativeAggregate[LongPairHeap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue

  private lazy val isDouble: Boolean = valueExpr.dataType == DoubleType

  /** Order-preserving double→long: x ≤ y  ⇔  enc(x) ≤ enc(y) (signed),
    * with NaN mapping above +Inf (Spark's sort order). Bit-exact inverse
    * below, so no precision is lost through the heap. */
  private def encode(v: Any): Long =
    if (isDouble) {
      // Canonicalize like Spark's own comparison semantics: -0.0 == 0.0
      // (nanSafeCompareDoubles) and all NaN payloads compare equal
      // (doubleToLongBits, not Raw, collapses them) — otherwise the heap
      // would strict-order pairs Spark's sorts treat as ties.
      val d    = v.asInstanceOf[Double]
      val bits = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
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

  override def createAggregationBuffer(): LongPairHeap = new LongPairHeap(k)

  override def update(buf: LongPairHeap, input: InternalRow): LongPairHeap = {
    val v  = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) buf.offer(encode(v), id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongPairHeap, other: LongPairHeap): LongPairHeap = {
    var i = 0
    while (i < other.size) { buf.offer(other.vs(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: LongPairHeap): Any = {
    val idx = Array.range(0, buf.size).sortWith { (a, b) =>
      buf.vs(a) > buf.vs(b) ||
        (buf.vs(a) == buf.vs(b) && buf.ids(a) < buf.ids(b))
    }
    new GenericArrayData(idx.map(i =>
      new GenericInternalRow(
        Array[Any](decode(buf.vs(i)), buf.ids(i))): Any))
  }

  override def serialize(buf: LongPairHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vs(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongPairHeap = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
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

/** Bounded top-k heap of (value, id) long pairs in two parallel primitive
  * arrays — zero allocation per offer. This is the per-group aggregation
  * buffer: at ANN scale the update path runs once per scored pair
  * (billions of calls), where a boxed `PriorityQueue[(Long, Long)]` costs
  * a Tuple2 + two Long boxes per offer. Heap invariant: the WORST kept
  * pair (smallest value, then largest id) is at the root, so a full heap
  * rejects a non-improving candidate with one comparison and no writes. */
final class LongPairHeap(k: Int) {
  var size: Int = 0
  val vs: Array[Long]  = new Array[Long](k)
  val ids: Array[Long] = new Array[Long](k)

  // "pair a is worse than pair b" under (value desc, id asc) ranking
  @inline private def worse(va: Long, ia: Long, vb: Long, ib: Long): Boolean =
    va < vb || (va == vb && ia > ib)

  def offer(v: Long, id: Long): Unit = {
    if (size < k) {
      var i = size; vs(i) = v; ids(i) = id; size += 1
      // sift up: parent must be worse-or-equal than child
      while (i > 0 && worse(vs(i), ids(i), vs((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        val tv = vs(i); vs(i) = vs(p); vs(p) = tv
        val ti = ids(i); ids(i) = ids(p); ids(p) = ti
        i = p
      }
    } else if (worse(vs(0), ids(0), v, id)) {
      vs(0) = v; ids(0) = id
      // sift down: swap with the worse child while it is worse than us
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < size && worse(vs(l), ids(l), vs(w), ids(w))) w = l
        if (r < size && worse(vs(r), ids(r), vs(w), ids(w))) w = r
        if (w == i) return
        val tv = vs(i); vs(i) = vs(w); vs(w) = tv
        val ti = ids(i); ids(i) = ids(w); ids(w) = ti
        i = w
      }
    }
  }
}
