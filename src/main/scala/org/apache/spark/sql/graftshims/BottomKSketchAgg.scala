package org.apache.spark.sql.graftshims

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StructField, StructType}

import scala.collection.mutable

/** Bounded-state bottom-k aggregate — the streaming-capable form of
  * the bottom-k quantile sketch (`graft.operators.Sketches`): per
  * group, retain the k `(h, id, v)` triples with the smallest
  * `(h, id)`. State is a k-capped binary heap however many rows flow
  * through, which is what makes the sketch maintainable by Structured
  * Streaming in complete mode (the CMS/HLL streaming discipline: the
  * aggregate IS the state) — a window-function bottom-k cannot run in
  * a streaming aggregation at all, and `collect_list`-based forms
  * carry O(rows) state.
  *
  * Update is O(log k) against the heap max; merge folds the smaller
  * heap into the larger. The result is the sample SORTED by
  * `(h, id, v)` — `v` as the final tie-break, so when the same id
  * arrives in multiple rows with DIFFERENT values the survivor at the
  * rank-k boundary is still a deterministic pure function of the input
  * SET (an `(h, id)`-only order would keep whichever duplicate arrived
  * first — partition-order-dependent); batch and drained-stream
  * results stay bit-identical and the DuckDB oracle replays them. */
case class BottomKSketchAgg(
    hExpr: Expression, idExpr: Expression, vExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long, Long)]]
  with ExpectsInputTypes {

  require(k > 0, s"k must be > 0, got $k")

  // max-heap on the FULL (h, id, v) triple: head is the current worst
  // survivor, and including v keeps the rank-k boundary deterministic
  // under duplicate ids carrying different values
  private def heapOrdering: Ordering[(Long, Long, Long)] =
    Ordering.by(identity[(Long, Long, Long)])

  override def children: Seq[Expression] = Seq(hExpr, idExpr, vExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bottomk_sketch"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def add(buf: mutable.PriorityQueue[(Long, Long, Long)],
      t: (Long, Long, Long)): Unit =
    if (buf.size < k) buf.enqueue(t)
    else if (heapOrdering.lt(t, buf.head)) { buf.dequeue(); buf.enqueue(t) }

  override def update(buf: mutable.PriorityQueue[(Long, Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long, Long)] = {
    val h = hExpr.eval(input)
    val id = idExpr.eval(input)
    val v = vExpr.eval(input)
    if (h != null && id != null && v != null)
      add(buf, (h.asInstanceOf[Long], id.asInstanceOf[Long],
        v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long, Long)],
      other: mutable.PriorityQueue[(Long, Long, Long)])
      : mutable.PriorityQueue[(Long, Long, Long)] = {
    val (into, from) = if (buf.size >= other.size) (buf, other) else (other, buf)
    from.foreach(add(into, _))
    into
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(heapOrdering)
      .map(t => InternalRow(t._1, t._2, t._3)).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[(Long, Long, Long)])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (h, id, v) => bb.putLong(h); bb.putLong(id); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Long, Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      add(buf, (bb.getLong, bb.getLong, bb.getLong))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hExpr = newChildren(0), idExpr = newChildren(1),
      vExpr = newChildren(2))
}
