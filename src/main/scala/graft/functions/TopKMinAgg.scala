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

/** The K smallest (key, id) pairs of a group, ordered by (key, id) — the
  * K-heap reduction as an AGGREGATE, which is what lets a consistent
  * sample run over a STREAM: a complete-mode global aggregate whose
  * state is ONE buffer of <= 2K entries whatever the stream volume
  * (contrast a streaming groupBy over ids: O(stream) state). Merge keeps
  * the K smallest of both sides, so the aggregate is commutative and
  * associative — partial aggregation applies in batch, and the
  * accumulated streaming state after any number of micro-batches equals
  * the batch answer over the same slice (the gate's batch-invariance
  * law, BY CONSTRUCTION).
  *
  * The buffer compacts to K whenever it doubles, amortizing the sort;
  * eval emits the final sorted K as array<struct<key, id>>.
  */
case class TopKMinAgg(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_min_agg"

  private def compact(b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    if (b.length > k) {
      val kept = b.sorted.take(k)
      b.clear(); b ++= kept
    }
    b
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

  override def update(b: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val kv = key.eval(input); val iv = id.eval(input)
    if (kv != null && iv != null) {
      b += ((kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
      if (b.length >= 2 * k) compact(b)
    }
    b
  }

  override def merge(b1: ArrayBuffer[(Long, Long)], b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b1 ++= b2
    compact(b1)
  }

  override def eval(b: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(b.sorted.take(k).map { case (kv, iv) =>
      InternalRow(kv, iv) }.toArray[Any])

  override def serialize(b: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    compact(b)
    val bb = ByteBuffer.allocate(4 + 16 * b.length)
    bb.putInt(b.length)
    b.foreach { case (kv, iv) => bb.putLong(kv); bb.putLong(iv) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    ArrayBuffer.fill(n)((bb.getLong(), bb.getLong()))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKMinAgg =
    copy(key = newChildren(0), id = newChildren(1))
}

object TopKMinAgg {
  /** Aggregate column: the K smallest (key, id) pairs as
    * array<struct<key,id>>, ordered by (key, id). */
  def topkMin(key: Column, id: Column, k: Int): Column =
    GraftShims.column(
      TopKMinAgg(GraftShims.expression(key), GraftShims.expression(id), k)
        .toAggregateExpression())
}
