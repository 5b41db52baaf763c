package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.types._

/** Collect up to `cap` (doc_id, sz) members of a group; a group that
  * exceeds the cap OVERFLOWS and evaluates to the empty array.
  *
  * This is the degenerate-key guard of the dedup pair-generation path
  * spelled as ONE aggregation: grouping the exploded shingle table by
  * shingle both discovers each shingle's document frequency AND carries
  * the member list needed to emit candidate pairs — so the df cap rides
  * the same shuffle as pair generation, instead of a separate
  * count-aggregate + join-back that re-shuffles the full exploded table
  * twice (the round-14 spelling it replaces; measured ~2x the whole
  * operator's cost at sf0.1).
  *
  * The buffer is BOUNDED at cap+1 entries BY CONSTRUCTION — the moment a
  * partial exceeds the cap it drops its members and keeps only the
  * overflow flag, so a shingle shared by a million documents costs a
  * one-bit buffer, not a million-entry collect_list (the OOM hazard that
  * makes the builtin collect_list unusable as a capped collector).
  * Overflow is sticky under merge, so partial aggregation (map-side
  * combine) stays correct: merge(overflow, xs) = overflow, and
  * merge(xs, ys) overflows iff |xs| + |ys| > cap.
  */
case class BoundedGroupAgg(
    docId: Expression,
    sz: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedGroupAgg.Buf] {

  override def children: Seq[Expression] = Seq(docId, sz)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sz", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_group_agg"

  override def createAggregationBuffer(): BoundedGroupAgg.Buf =
    new BoundedGroupAgg.Buf(false, ArrayBuffer.empty)

  override def update(b: BoundedGroupAgg.Buf, input: InternalRow): BoundedGroupAgg.Buf = {
    if (!b.overflow) {
      val d = docId.eval(input); val z = sz.eval(input)
      if (d != null && z != null) {
        b.items += ((d.asInstanceOf[Long], z.asInstanceOf[Long]))
        if (b.items.length > cap) { b.overflow = true; b.items.clear() }
      }
    }
    b
  }

  override def merge(b1: BoundedGroupAgg.Buf, b2: BoundedGroupAgg.Buf): BoundedGroupAgg.Buf = {
    if (b1.overflow || b2.overflow || b1.items.length + b2.items.length > cap) {
      b1.overflow = true; b1.items.clear()
    } else b1.items ++= b2.items
    b1
  }

  override def eval(b: BoundedGroupAgg.Buf): Any =
    if (b.overflow) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(b.items.map { case (d, z) =>
      InternalRow(d, z) }.toArray[Any])

  override def serialize(b: BoundedGroupAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 16 * b.items.length)
    bb.put(if (b.overflow) 1.toByte else 0.toByte)
    bb.putInt(b.items.length)
    b.items.foreach { case (d, z) => bb.putLong(d); bb.putLong(z) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedGroupAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val overflow = bb.get() == 1.toByte
    val n = bb.getInt()
    val items = ArrayBuffer.fill(n)((bb.getLong(), bb.getLong()))
    new BoundedGroupAgg.Buf(overflow, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedGroupAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedGroupAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedGroupAgg =
    copy(docId = newChildren(0), sz = newChildren(1))
}

object BoundedGroupAgg {
  final class Buf(var overflow: Boolean, val items: ArrayBuffer[(Long, Long)])

  /** Aggregate column: array<struct<doc_id,sz>> of the group's members,
    * or the empty array if the group exceeds `cap`. */
  def boundedGroup(docId: Column, sz: Column, cap: Int): Column =
    GraftShims.column(
      BoundedGroupAgg(GraftShims.expression(docId), GraftShims.expression(sz), cap)
        .toAggregateExpression())
}
