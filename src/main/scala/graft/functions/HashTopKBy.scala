package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Buffer: up to k (order, value) pairs in a min-heap on `order` (the
  * root is the weakest survivor, evicted first).
  */
final class TopKBuf(val k: Int, ord: Ordering[Any]) {
  val heap = new scala.collection.mutable.PriorityQueue[(Any, Any)]()(Ordering.by[(Any, Any), Any](_._1)(ord.reverse))
  def offer(o: Any, v: Any): Unit =
    if (heap.size < k) heap.enqueue((o, v))
    else if (ord.compare(o, heap.head._1) > 0) { heap.dequeue(); heap.enqueue((o, v)) }
}

/** Bounded-heap top-k aggregation: keeps the k values with the greatest
  * `order` per group, emitted best-first.
  *
  * Why: `row_number() OVER (PARTITION BY g ORDER BY s) <= k` sorts EVERY
  * candidate row of every group; for ANN that is all scored candidates per
  * query. A k-bounded heap does one O(log k) update per row inside
  * `ObjectHashAggregate`, partial-aggregates map-side (only k rows per
  * group per map task shuffle), and never sorts beyond the final k-element
  * drain. The window form only wins when the ordinal of every row (not
  * just the top k) is needed.
  */
case class HashTopKBy(
    valueExpr: Expression,
    orderExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(valueExpr, orderExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(valueExpr.dataType, containsNull = true)
  override def prettyName: String = "graft_top_k_by"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderExpr.dataType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, ordering)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val o = orderExpr.eval(input)
    if (o != null) {
      // copy before heap insert — Spark reuses the input row's backing
      val oc = InternalRow.copyValue(o)
      val v = valueExpr.eval(input)
      buf.offer(oc, if (v == null) null else InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    b2.heap.foreach { case (o, v) => b1.offer(o, v) }
    b1
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.heap.toSeq.sortBy(_._1)(ordering.reverse).map(_._2))

  // (de)serialize as a single-field UnsafeRow holding array<struct<o,v>>
  @transient private lazy val entryType =
    ArrayType(StructType(Seq(StructField("o", orderExpr.dataType), StructField("v", valueExpr.dataType))))
  @transient private lazy val proj = UnsafeProjection.create(Array(
    BoundReference(0, entryType, nullable = false)): Array[Expression])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val arr = new GenericArrayData(buf.heap.toSeq.map { case (o, v) => InternalRow(o, v) })
    proj.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    val st = entryType.elementType.asInstanceOf[StructType]
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.getStruct(i, 2)
      val o = e.get(0, st(0).dataType)
      val v = e.get(1, st(1).dataType)
      buf.offer(
        if (o == null) null else InternalRow.copyValue(o),
        if (v == null) null else InternalRow.copyValue(v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashTopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashTopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderExpr = newChildren(1))
}
