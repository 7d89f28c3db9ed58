package graft.delta

import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Per-commit checksum files — `<version>.crc` next to the commit JSON,
  * the shape delta-spark writes (`VersionChecksum`) and validates for
  * cross-engine trust: one JSON document recording the POST-commit
  * table state (tableSizeBytes, numFiles, metadata, protocol).
  *
  * Maintained INCREMENTALLY: previous version's checksum plus this
  * commit's add/remove sizes — no snapshot computation rides the commit
  * path, so the cost is one tiny file write per commit regardless of
  * table size. The chain starts at version 0; if a link is missing
  * (legacy commits without .crc, a remove without a recorded size) the
  * writer skips silently and the chain restarts at the next
  * reconstructible point. Writing is best-effort by design — a
  * checksum failure must never fail a successful commit.
  *
  * [[validate]] recomputes numFiles/tableSizeBytes from the snapshot's
  * metadata relation (one small Spark agg) and compares; wired into
  * checkpoint creation (which scans the state anyway) rather than every
  * snapshot resolution — at 10⁷ files a per-read count job would cost
  * more than the protection is worth.
  *
  * Reference anchor: delta-rs 0.12 (the reference's engine,
  * levi/__init__.py:1-425) writes no checksum files; this follows the
  * delta-spark protocol surface instead. */
object Checksum {

  final case class TableChecksum(
      tableSizeBytes: Long,
      numFiles: Long,
      metadata: Metadata,
      protocol: Protocol)

  def crcPath(log: DeltaLog, version: Long): Path =
    new Path(log.logPath, f"$version%020d.crc")

  /** Last checksum WRITTEN by this JVM per log path, with the identity
    * (modTime, length) of the `.crc` file it produced. [[write]] runs
    * once per commit and previously re-opened and re-parsed the
    * previous version's `.crc` each time — but in the common
    * single-writer chain the previous checksum is exactly what this
    * JVM just wrote. The memo replaces the read+parse with one
    * getFileStatus identity probe (the [[DeltaLog]] anchor discipline:
    * a foreign writer's rewrite, a deleted link, or a re-created table
    * all change the file identity and fall back to the real read).
    * Bounded by wholesale clear; values are metadata-sized. */
  private val lastWritten = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, TableChecksum, (Long, Long))]()

  private def memoPut(log: DeltaLog, version: Long, cs: TableChecksum): Unit =
    try {
      val st = log.fs.getFileStatus(crcPath(log, version))
      if (lastWritten.size > 128) lastWritten.clear()
      lastWritten.put(log.logPath.toString,
        (version, cs, (st.getModificationTime, st.getLen)))
    } catch { case scala.util.control.NonFatal(_) => () }

  private def memoGet(log: DeltaLog, version: Long): Option[TableChecksum] =
    Option(lastWritten.get(log.logPath.toString))
      .filter(_._1 == version)
      .filter { case (_, _, id) =>
        try {
          val st = log.fs.getFileStatus(crcPath(log, version))
          (st.getModificationTime, st.getLen) == id
        } catch { case scala.util.control.NonFatal(_) => false }
      }
      .map(_._2)

  /** Parse `<version>.crc` if present and well-formed. */
  def read(log: DeltaLog, version: Long): Option[TableChecksum] = try {
    val p = crcPath(log, version)
    if (!log.fs.exists(p)) return None
    val in = log.fs.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val root = JsonUtil.mapper.readTree(body)
    // metadata/protocol are stored in the commit-action spelling, so the
    // existing action parser round-trips them
    val meta = JsonUtil.parseAction(
      JsonUtil.mapper.createObjectNode().set[com.fasterxml.jackson.databind.node.ObjectNode](
        "metaData", root.get("metadata")).toString)
      .collect { case MetadataAction(m) => m }
    val proto = JsonUtil.parseAction(
      JsonUtil.mapper.createObjectNode().set[com.fasterxml.jackson.databind.node.ObjectNode](
        "protocol", root.get("protocol")).toString)
      .collect { case ProtocolAction(p) => p }
    for (m <- meta; pr <- proto) yield TableChecksum(
      root.get("tableSizeBytes").asLong(), root.get("numFiles").asLong(), m, pr)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Write `<version>.crc` from the previous checksum + this commit's
    * actions. Best-effort: any gap (no previous .crc past v0, a remove
    * without size, no metadata/protocol resolvable) skips the write. */
  def write(log: DeltaLog, version: Long, actions: Seq[Action]): Unit = try {
    val adds = actions.collect { case AddAction(a) => a }
    val removes = actions.collect { case RemoveAction(r) => r }
    val metaOpt = actions.collectFirst { case MetadataAction(m) => m }
    val protoOpt = actions.collectFirst { case ProtocolAction(p) => p }
    val prev: Option[TableChecksum] =
      if (version == 0L) Some(TableChecksum(0L, 0L, null, null))
      else memoGet(log, version - 1).orElse(read(log, version - 1))
    prev.foreach { base =>
      if (removes.exists(_.size.isEmpty)) return
      val meta = metaOpt.getOrElse(base.metadata)
      val proto = protoOpt.getOrElse(base.protocol)
      if (meta == null || proto == null) return
      val size = base.tableSizeBytes +
        adds.map(_.size).sum - removes.flatMap(_.size).sum
      val files = base.numFiles + adds.size - removes.size
      val root = JsonUtil.mapper.createObjectNode()
      root.put("tableSizeBytes", size)
      root.put("numFiles", files)
      root.put("numMetadata", 1L)
      root.put("numProtocol", 1L)
      root.set[com.fasterxml.jackson.databind.node.ObjectNode]("metadata",
        JsonUtil.mapper.readTree(JsonUtil.renderAction(MetadataAction(meta)))
          .get("metaData"))
      root.set[com.fasterxml.jackson.databind.node.ObjectNode]("protocol",
        JsonUtil.mapper.readTree(JsonUtil.renderAction(ProtocolAction(proto)))
          .get("protocol"))
      // last-writer-wins overwrite: the commit itself is the atomicity
      // point; the checksum is derived state
      val out = log.fs.create(crcPath(log, version), true)
      try out.write(JsonUtil.mapper.writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      memoPut(log, version, TableChecksum(size, files, meta, proto))
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Write `<version>.crc` from the version's ACTUAL replayed state
    * (one Spark agg over the metadata relation). Used by the commits
    * whose incremental delta is not derivable from their actions alone:
    * RESTORE and row-tracking backfill RE-ADD live paths without
    * emitting removes (newest-add-wins replay supersedes in place), so
    * counting their adds would drift the chain. */
  def recompute(log: DeltaLog, version: Long): Unit = try {
    val snap = log.snapshotAt(version)
    import org.apache.spark.sql.functions.{count, lit, sum}
    val r = snap.adds.agg(
      count(lit(1)).as("n"), sum("size_bytes").as("b")).collect()(0)
    val root = JsonUtil.mapper.createObjectNode()
    root.put("tableSizeBytes", if (r.isNullAt(1)) 0L else r.getLong(1))
    root.put("numFiles", r.getLong(0))
    root.put("numMetadata", 1L)
    root.put("numProtocol", 1L)
    root.set[com.fasterxml.jackson.databind.node.ObjectNode]("metadata",
      JsonUtil.mapper.readTree(JsonUtil.renderAction(MetadataAction(snap.metadata)))
        .get("metaData"))
    root.set[com.fasterxml.jackson.databind.node.ObjectNode]("protocol",
      JsonUtil.mapper.readTree(JsonUtil.renderAction(ProtocolAction(snap.protocol)))
        .get("protocol"))
    val out = log.fs.create(crcPath(log, version), true)
    try out.write(JsonUtil.mapper.writeValueAsString(root)
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    memoPut(log, version, TableChecksum(
      if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(0),
      snap.metadata, snap.protocol))
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Recompute numFiles/tableSizeBytes from the version's snapshot (one
    * Spark agg over the metadata relation) and compare with its .crc.
    * Returns None when no checksum exists; Some(error) on mismatch. */
  def validate(log: DeltaLog, version: Long): Option[String] =
    read(log, version).flatMap { crc =>
      val snap = log.snapshotAt(version)
      import org.apache.spark.sql.functions.{count, lit, sum}
      val r = snap.adds.agg(
        count(lit(1)).as("n"), sum("size_bytes").as("b")).collect()(0)
      val n = r.getLong(0)
      val b = if (r.isNullAt(1)) 0L else r.getLong(1)
      if (n == crc.numFiles && b == crc.tableSizeBytes) None
      else Some(s"checksum mismatch at version $version: " +
        s".crc says numFiles=${crc.numFiles} tableSizeBytes=${crc.tableSizeBytes}, " +
        s"log replay says numFiles=$n tableSizeBytes=$b")
    }
}
