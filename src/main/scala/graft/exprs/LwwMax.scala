package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Hash-aggregable last-writer-wins winner: returns the `value` of the row
  * with the greatest `ord` (any orderable type, typically
  * `struct(commit, lsn)`).
  *
  * Why not `max_by`: Spark's MaxBy is a DeclarativeAggregate whose buffer
  * holds the var-length value/ordering, which HashAggregateExec cannot
  * store in its fixed-size UnsafeRow buffer — the planner silently falls
  * back to SortAggregate and SORTS EVERY PARTITION on both sides of the
  * exchange. For a CDC merge that touches every row per batch, that sort is
  * the single largest cost and scales sub-linearly. This
  * TypedImperativeAggregate runs in ObjectHashAggregateExec instead: one
  * object buffer per key, pure hash probing, no sort (raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` above the
  * expected keys-per-partition — default 128 — or the fallback re-sorts).
  *
  * Tie semantics: on equal `ord` the first-seen value is kept — callers
  * guarantee (commit, lsn) uniqueness per key (FIXTURES.md §2), so ties can
  * only be byte-identical redeliveries, where either choice is the same.
  */
case class LwwMax(
    valueExpr: Expression,
    ordExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[LwwMax.Buffer] {

  override def children: Seq[Expression] = Seq(valueExpr, ordExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = "lww_max"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordExpr.dataType)

  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array(ordExpr.dataType, valueExpr.dataType))

  override def createAggregationBuffer(): LwwMax.Buffer = new LwwMax.Buffer(null, null)

  override def update(buf: LwwMax.Buffer, input: InternalRow): LwwMax.Buffer = {
    val o = ordExpr.eval(input)
    if (o != null && (buf.ord == null || ordering.compare(o, buf.ord) > 0)) {
      buf.ord = InternalRow.copyValue(o)
      buf.value = InternalRow.copyValue(valueExpr.eval(input))
    }
    buf
  }

  override def merge(b1: LwwMax.Buffer, b2: LwwMax.Buffer): LwwMax.Buffer = {
    if (b2.ord != null && (b1.ord == null || ordering.compare(b2.ord, b1.ord) > 0)) {
      b1.ord = b2.ord
      b1.value = b2.value
    }
    b1
  }

  override def eval(buf: LwwMax.Buffer): Any = buf.value

  override def serialize(buf: LwwMax.Buffer): Array[Byte] =
    serProj(InternalRow(buf.ord, buf.value)).copy().getBytes

  override def deserialize(bytes: Array[Byte]): LwwMax.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val ord = if (row.isNullAt(0)) null else InternalRow.copyValue(row.get(0, ordExpr.dataType))
    val value = if (row.isNullAt(1)) null else InternalRow.copyValue(row.get(1, valueExpr.dataType))
    new LwwMax.Buffer(ord, value)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LwwMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LwwMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LwwMax =
    copy(valueExpr = newChildren(0), ordExpr = newChildren(1))
}

object LwwMax {
  /** Mutable winner state: current max ordering value + its payload. */
  final class Buffer(var ord: Any, var value: Any)

  /** `lww_max(value, ord)`: value of the row with the greatest ord. */
  def lww_max(value: Column, ord: Column): Column =
    ColumnBridge.toColumn(
      LwwMax(ColumnBridge.toExpression(value), ColumnBridge.toExpression(ord))
        .toAggregateExpression())
}
