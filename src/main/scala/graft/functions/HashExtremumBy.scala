package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Mutable buffer: the current best ordering key and its payload. */
final class ExtremumBuf(var order: Any, var value: Any)

/** Hash-aggregable max_by/min_by.
  *
  * Why: Spark's builtin `max_by` is a DeclarativeAggregate whose buffer
  * holds the ordering struct + payload struct; buffers with non-mutable
  * (struct) fields disqualify `HashAggregate`, so every `max_by(struct,
  * struct)` plan silently degrades to `SortAggregate` — a full sort of
  * every map partition and every reduce partition by group key. For
  * keep-latest dedup (the engine's hottest reference operation) that is
  * exactly the per-partition sort the aggregation strategy exists to
  * avoid.
  *
  * A TypedImperativeAggregate runs in `ObjectHashAggregate` instead: one
  * hash map probe per row, no sorts, still partial-aggregating map-side.
  * Semantics match `max_by`/`min_by` with a total-order `order` struct
  * (ties cannot occur when the caller includes a tie-breaker column, same
  * contract as the builtin).
  */
case class HashExtremumBy(
    valueExpr: Expression,
    orderExpr: Expression,
    isMax: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExtremumBuf] {

  override def children: Seq[Expression] = Seq(valueExpr, orderExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = if (isMax) "graft_max_by" else "graft_min_by"

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(orderExpr.dataType)

  private def better(a: Any, b: Any): Boolean = {
    val c = ordering.compare(a, b)
    if (isMax) c > 0 else c < 0
  }

  override def createAggregationBuffer(): ExtremumBuf = new ExtremumBuf(null, null)

  override def update(buf: ExtremumBuf, input: InternalRow): ExtremumBuf = {
    val o = orderExpr.eval(input)
    if (o != null && (buf.order == null || better(o, buf.order))) {
      buf.order = InternalRow.copyValue(o)
      val v = valueExpr.eval(input)
      buf.value = if (v == null) null else InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(b1: ExtremumBuf, b2: ExtremumBuf): ExtremumBuf = {
    if (b2.order != null && (b1.order == null || better(b2.order, b1.order))) {
      b1.order = b2.order
      b1.value = b2.value
    }
    b1
  }

  override def eval(buf: ExtremumBuf): Any = buf.value

  // (de)serialization: pack (order, value) into one UnsafeRow
  @transient private lazy val bufSchema =
    StructType(Seq(StructField("o", orderExpr.dataType), StructField("v", valueExpr.dataType)))
  @transient private lazy val proj = UnsafeProjection.create(Array(
    BoundReference(0, orderExpr.dataType, nullable = true),
    BoundReference(1, valueExpr.dataType, nullable = true)): Array[Expression])

  override def serialize(buf: ExtremumBuf): Array[Byte] =
    proj.apply(InternalRow(buf.order, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ExtremumBuf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val o = row.get(0, orderExpr.dataType)
    val v = row.get(1, valueExpr.dataType)
    // copy out of the byte-array-backed row so the buffer owns its data
    new ExtremumBuf(
      if (o == null) null else InternalRow.copyValue(o),
      if (v == null) null else InternalRow.copyValue(v))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HashExtremumBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HashExtremumBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderExpr = newChildren(1))
}
