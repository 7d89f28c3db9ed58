package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Table-maintenance operations the delta-rs layer gives the reference
  * for free (SURVEY.md §2b) plus the classic lakehouse upkeep trio:
  * checkpointing, small-file compaction, and vacuum.
  */
object Maintenance {

  /** Write a classic single-file checkpoint parquet for the snapshot's
    * version plus the `_last_checkpoint` pointer. Readers (ours and
    * delta-rs) can then bootstrap without replaying the JSON tail.
    *
    * Checkpoint schema follows the corpus shape
    * (`with_checkpoint/.../00000000000000000002.checkpoint.parquet`):
    * nullable top-level structs txn/add/remove/metaData/protocol.
    */
  def checkpoint(log: DeltaLog): Long = {
    val spark = log.spark
    val snap = log.snapshot
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val strMap = MapType(StringType, StringType)
    val addT = StructType(Seq(
      StructField("path", StringType), StructField("partitionValues", strMap),
      StructField("size", LongType), StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType), StructField("stats", StringType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType), StructField("options", strMap)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", strMap),
      StructField("createdTime", LongType)))
    val protoT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val cpSchema = StructType(Seq(
      StructField("add", addT), StructField("metaData", metaT),
      StructField("protocol", protoT)))

    val m = snap.metadata
    val rows = ArrayBuffer[Row](
      Row(null, Row(m.id, Row("parquet", Map.empty[String, String]), m.schemaString,
        m.partitionColumns, m.configuration, m.createdTime.getOrElse(0L)), null),
      Row(null, null, Row(snap.protocol.minReaderVersion, snap.protocol.minWriterVersion)))
    rows ++= snap.activeFiles.map { f =>
      Row(Row(f.path, f.partitionValues, f.size, f.modificationTime, false,
        f.stats.orNull), null, null)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      cpSchema)

    val fs = log.fs
    val tmpDir = new Path(log.logPath, s".cp-${java.util.UUID.randomUUID}")
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
    val target = new Path(log.logPath, f"${snap.version}%020d.checkpoint.parquet")
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(tmpDir, true)

    val lastCp = new Path(log.logPath, "_last_checkpoint")
    val out = fs.create(lastCp, true)
    try out.write(
      s"""{"version":${snap.version},"size":${rows.size}}""".getBytes("UTF-8"))
    finally out.close()
    snap.version
  }

  /** OPTIMIZE-style small-file compaction: rewrite the current snapshot
    * into ~`targetFileBytes` files (per partition for partitioned
    * tables). Data is unchanged — pure file-layout commit. */
  def compact(log: DeltaLog, targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val snap = log.snapshot
    val totalBytes = math.max(snap.activeFiles.map(_.size).sum, 1L)
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = snap.read().repartition(targetFiles)
    TransactionWriter.overwrite(log, df,
      partitionBy = Some(snap.metadata.partitionColumns), operation = "OPTIMIZE")
  }

  /** Delete data files no longer referenced by the current snapshot and
    * older than the retention window (default 0h here — the fixtures
    * are synthetic; production default is 7 days). Returns deleted
    * paths. */
  def vacuum(log: DeltaLog, retentionMs: Long = 0L): Seq[String] = {
    val fs = log.fs
    val snap = log.snapshot
    val active: Set[String] = snap.activeFiles.map { f =>
      fs.makeQualified(new Path(log.rootPath, DeltaLog.decodePath(f.path))).toString
    }.toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val deleted = ArrayBuffer.empty[String]
    val it = fs.listFiles(log.rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val inLog = p.toString.contains("/_delta_log/")
      val isData = p.getName.endsWith(".parquet")
      if (st.isFile && isData && !inLog && !active.contains(fs.makeQualified(p).toString) &&
          st.getModificationTime < cutoff) {
        fs.delete(p, false)
        deleted += p.toString
      }
    }
    deleted.toSeq
  }

  /** Append commit: add new files (with full per-file stats) without
    * removing existing ones. */
  def append(log: DeltaLog, df: org.apache.spark.sql.DataFrame): Long =
    TransactionWriter.append(log, df)
}
