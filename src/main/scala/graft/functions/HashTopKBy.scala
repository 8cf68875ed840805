package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Buffer: up to k (order, tie, value) triples in a min-heap on goodness
  * (the root is the weakest survivor, evicted first). Holds the two
  * scalar orderings directly: the per-row accept check runs millions of
  * times per task and must not allocate (tuple-wrapping the comparands
  * showed up as ~40% of brute-force ANN time at 30× scale).
  */
final class TopKBuf(val k: Int, ordCmp: Ordering[Any], tieCmp: Ordering[Any]) {
  /** greater = better: order desc, then tie asc. */
  private val goodness: Ordering[(Any, Any)] = new Ordering[(Any, Any)] {
    def compare(a: (Any, Any), b: (Any, Any)): Int = {
      val c = ordCmp.compare(a._1, b._1)
      if (c != 0) c else tieCmp.compare(b._2, a._2)
    }
  }
  val heap = new scala.collection.mutable.PriorityQueue[(Any, Any, Any)]()(
    Ordering.by[(Any, Any, Any), (Any, Any)](e => (e._1, e._2))(goodness.reverse))
  /** Would (o, t) make the cut? Callers use this to skip evaluating and
    * copying the VALUE for losing rows — with k « rows, almost all of
    * them — so the steady-state per-row cost is two evals + one or two
    * compares, zero allocation.
    */
  def accepts(o: Any, t: Any): Boolean =
    heap.size < k || {
      val h = heap.head
      val c = ordCmp.compare(o, h._1)
      c > 0 || (c == 0 && tieCmp.compare(h._2, t) > 0)
    }
  def offer(o: Any, t: Any, v: Any): Unit =
    if (heap.size < k) heap.enqueue((o, t, v))
    else if (accepts(o, t)) { heap.dequeue(); heap.enqueue((o, t, v)) }
  /** Best-first drain (order desc, tie asc). */
  def sortedEntries: Seq[(Any, Any, Any)] =
    heap.toSeq.sortBy(e => (e._1, e._2))(goodness.reverse)
}

/** Bounded-heap top-k aggregation: keeps the k values with the greatest
  * `order` per group (ties broken by SMALLEST `tie` — any orderable type,
  * e.g. string ids), emitted best-first.
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
    tieExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(valueExpr, orderExpr, tieExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(valueExpr.dataType, containsNull = true)
  override def prettyName: String = "graft_top_k_by"

  @transient private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(orderExpr.dataType).asInstanceOf[Ordering[Any]]
  @transient private lazy val tieOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(tieExpr.dataType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): TopKBuf =
    new TopKBuf(k, ordOrdering, tieOrdering)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val o = orderExpr.eval(input)
    val t = tieExpr.eval(input)
    if (o != null && t != null && buf.accepts(o, t)) {
      // losing rows never reach here: the value struct is evaluated and
      // copied only for the ≤k current winners (copy before heap insert —
      // Spark reuses the input row's backing)
      val v = valueExpr.eval(input)
      buf.offer(InternalRow.copyValue(o), InternalRow.copyValue(t),
        if (v == null) null else InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    b2.heap.foreach { case (o, t, v) => b1.offer(o, t, v) }
    b1
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sortedEntries.map(_._3))

  // (de)serialize as a single-field UnsafeRow holding array<struct<o,t,v>>
  @transient private lazy val entryStruct = StructType(Seq(
    StructField("o", orderExpr.dataType), StructField("t", tieExpr.dataType),
    StructField("v", valueExpr.dataType)))
  @transient private lazy val proj = UnsafeProjection.create(Array(
    BoundReference(0, ArrayType(entryStruct), nullable = false)): Array[Expression])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val arr = new GenericArrayData(buf.heap.toSeq.map { case (o, t, v) => InternalRow(o, t, v) })
    proj.apply(InternalRow(arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.getStruct(i, 3)
      val o = e.get(0, entryStruct(0).dataType)
      val t = e.get(1, entryStruct(1).dataType)
      val v = e.get(2, entryStruct(2).dataType)
      buf.offer(
        if (o == null) null else InternalRow.copyValue(o),
        if (t == null) null else InternalRow.copyValue(t),
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
    copy(valueExpr = newChildren(0), orderExpr = newChildren(1), tieExpr = newChildren(2))
}
