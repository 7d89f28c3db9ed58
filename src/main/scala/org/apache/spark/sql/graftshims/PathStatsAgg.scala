package org.apache.spark.sql.graftshims

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}

import scala.collection.mutable

/** Per-path (max version, row count) aggregate — the sidecar coverage
  * summary, computed as an OBSERVED metric of the generation-write job
  * itself ([[graft.delta.Sidecar.swapIn]]) instead of a second pass
  * over the written entry relation. State is file-count-bounded (one
  * map slot per distinct `file_path`), so a 10⁹-entry sidecar carries
  * a ~10⁴-slot map through the write, and publication costs ZERO extra
  * jobs: the narrow re-read + groupBy that used to derive `_coverage`
  * (measured +0.5–1 s per refresh at sf0.1; O(entries) IO at scale)
  * disappears.
  *
  * The row count per path is the log-plane integrity handle: a
  * row-keyed sidecar (LSH/IVF/PQ) must hold EXACTLY ONE entry per
  * logical row of each covered file, so `n == AddFile.numRecords` is
  * checkable from the summary + commit stats with no data read —
  * `GRAFT SHOW INDEXES` surfaces mismatches and refresh treats
  * mismatched files as uncovered (rescan, never serve). */
case class PathStatsAgg(
    pathExpr: Expression, versionExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(pathExpr, versionExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("vmax", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "path_stats"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val p = pathExpr.eval(input)
    val v = versionExpr.eval(input)
    if (p != null && v != null) {
      val key = p.asInstanceOf[UTF8String].toString
      val ver = v.asInstanceOf[Long]
      buf.get(key) match {
        case Some((vm, n)) => buf.update(key, (math.max(vm, ver), n + 1))
        case None => buf.update(key, (ver, 1L))
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)])
      : mutable.HashMap[String, (Long, Long)] = {
    other.foreach { case (k, (vm, n)) =>
      buf.get(k) match {
        case Some((vm0, n0)) => buf.update(k, (math.max(vm0, vm), n0 + n))
        case None => buf.update(k, (vm, n))
      }
    }
    buf
  }

  // sorted by path: the metric value must be a deterministic function
  // of the input SET (merge order varies with task scheduling)
  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any =
    new GenericArrayData(buf.toSeq.sortBy(_._1).map { case (p, (vm, n)) =>
      InternalRow(UTF8String.fromString(p), vm, n)
    }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, (Long, Long)])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, (vm, n)) =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(vm)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, (Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = createAggregationBuffer()
    (0 until size).foreach { _ =>
      val len = in.readInt()
      val pb = new Array[Byte](len)
      in.readFully(pb)
      val p = new String(pb, java.nio.charset.StandardCharsets.UTF_8)
      val vm = in.readLong()
      val n = in.readLong()
      buf.update(p, (vm, n))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PathStatsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PathStatsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pathExpr = newChildren(0), versionExpr = newChildren(1))
}
