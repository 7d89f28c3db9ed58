package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata => _, _}
import scala.collection.mutable.ArrayBuffer

/** Transactional Delta writes with Spark primitives (no delta-spark).
  *
  * Overwrite commit shape pinned by the reference corpus
  * (`with_checkpoint/.../00000000000000000003.json`): `add` for each new
  * file (with per-file numRecords/min/max/nullCount stats), `remove` for
  * every previously-active file, plus `commitInfo` — the same effect the
  * reference gets from `write_deltalake(mode="overwrite")`
  * (/root/reference/levi/__init__.py:347-351).
  *
  * Scale posture: data lands via a normal distributed `df.write.parquet`
  * into a staging dir under the table root, files are renamed into place
  * (same filesystem → metadata-only), and stats come from ONE extra
  * Spark pass grouped by file. Only the commit JSON itself is
  * driver-side.
  */
object TransactionWriter {

  /** Full-table overwrite (also creates the table at version 0). Returns
    * the committed version. */
  def overwrite(
      log: DeltaLog,
      df: DataFrame,
      partitionBy: Option[Seq[String]] = None,
      configuration: Map[String, String] = Map.empty,
      operation: String = "WRITE",
      dataChange: Boolean = true): Long = {
    val prev: Option[Snapshot] =
      if (log.fs.exists(log.logPath) &&
          { val (c, p) = log.listLog(); c.nonEmpty || p.nonEmpty })
        Some(log.snapshot)
      else None
    writeAndCommit(log, df, prev,
      removes = prev.toSeq.flatMap(_.activeFiles),
      partitionBy = partitionBy, configuration = configuration,
      operation = operation,
      mode = if (prev.isEmpty) "ErrorIfExists" else "Overwrite",
      dataChange = dataChange)
  }

  /** Append commit: add new files (with full per-file stats) without
    * removing any existing ones. */
  def append(
      log: DeltaLog,
      df: DataFrame,
      partitionBy: Option[Seq[String]] = None,
      operation: String = "WRITE"): Long = {
    val prev = Some(log.snapshot)
    writeAndCommit(log, df, prev, removes = Nil,
      partitionBy = partitionBy, configuration = Map.empty,
      operation = operation, mode = "Append")
  }

  /** Schema-evolution append (delta mergeSchema): new columns in `df`
    * are added to the table schema (nullable); existing files read them
    * as null through the schema-driven scan. Overlapping columns must
    * keep their types — widening/retyping still requires an overwrite.
    * The commit carries the merged metaData alongside the adds. */
  def appendMergeSchema(
      log: DeltaLog,
      df: DataFrame,
      partitionBy: Option[Seq[String]] = None): Long = {
    val prev = log.snapshot
    val existing = prev.metadata.schema
    val incoming = df.schema
    val incompatible = incoming.fields.flatMap { f =>
      existing.fields.find(_.name == f.name)
        .filter(e => forceNullable(e.dataType) != forceNullable(f.dataType))
        .map(e => s"${f.name}: table ${e.dataType.simpleString} vs incoming ${f.dataType.simpleString}")
    }
    require(incompatible.isEmpty,
      s"mergeSchema cannot change column types (${incompatible.mkString("; ")}); " +
        "use overwrite to retype")
    val newFields = incoming.fields.filterNot(f => existing.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    val merged = StructType(existing.fields ++ newFields)
    val shaped = df.select(merged.fields.map { f =>
      if (incoming.fieldNames.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    writeAndCommit(log, shaped, Some(prev), removes = Nil,
      partitionBy = partitionBy, configuration = Map.empty,
      operation = "WRITE", mode = "AppendEvolve",
      // the committed metaData must carry the MERGED schema (existing
      // fields keep their declared nullability) — the runtime schema of
      // `shaped` could silently flip a nullable column to non-nullable
      declaredSchema = Some(merged))
  }

  /** Append with optimistic-concurrency retry: a blind append conflicts
    * with NOTHING (it removes no files and reads no prior state), so on
    * a lost commit race the only correction needed is re-resolving the
    * next version — the Delta conflict matrix's always-safe cell.
    * Overwrites/rewrites are NOT auto-retried: they must re-validate
    * that their removed files are still active. */
  def appendWithRetry(
      log: DeltaLog,
      df: DataFrame,
      partitionBy: Option[Seq[String]] = None,
      maxRetries: Int = 3): Long = {
    var attempt = 0
    while (true) {
      try return append(log, df, partitionBy)
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Idempotent append: rides a `txn` action (appId, version) in the
    * same commit. If the snapshot already records `version` (or later)
    * for `appId`, the batch was committed before — skip. This is the
    * exactly-once contract streaming sinks need across retries
    * (Delta spec: SetTransaction). Returns the committed (or
    * already-committed) table version. */
  def appendWithTxn(
      log: DeltaLog,
      df: DataFrame,
      appId: String,
      txnVersion: Long,
      partitionBy: Option[Seq[String]] = None): Long = {
    val snap = log.snapshot
    val already = snap.setTransactions.get(appId).exists(_.version >= txnVersion)
    if (already) snap.version
    else writeAndCommit(log, df, Some(snap), removes = Nil,
      partitionBy = partitionBy, configuration = Map.empty,
      operation = "STREAMING UPDATE", mode = "Append",
      txn = Some(SetTransaction(appId, txnVersion,
        Some(System.currentTimeMillis()))))
  }

  /** MERGE-style targeted rewrite: replace only `touched` files with
    * `replacement` rows; every other active file stays untouched in the
    * log. This is what keeps mutations affordable at scale — a dedup
    * that touches 0.1% of files rewrites 0.1% of the table. */
  def rewriteFiles(
      log: DeltaLog,
      snap: Snapshot,
      touched: Seq[AddFile],
      replacement: DataFrame,
      operation: String,
      dataChange: Boolean = true): Long =
    writeAndCommit(log, replacement, Some(snap), removes = touched,
      partitionBy = Some(snap.metadata.partitionColumns),
      configuration = Map.empty, operation = operation, mode = "Rewrite",
      dataChange = dataChange)

  /** Structural schema equality ignoring nullability, field order, and
    * metadata — what matters for whether existing + new files can be
    * read under one declared schema. */
  private def forceNullable(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        StructField(f.name, forceNullable(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(forceNullable(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(forceNullable(m.keyType), forceNullable(m.valueType),
        valueContainsNull = true)
    case other => other
  }

  private def normalizedFields(st: StructType): Seq[(String, DataType)] =
    st.fields.toSeq.map(f => (f.name, forceNullable(f.dataType))).sortBy(_._1)

  private def writeAndCommit(
      log: DeltaLog,
      df: DataFrame,
      prev: Option[Snapshot],
      removes: Seq[AddFile],
      partitionBy: Option[Seq[String]],
      configuration: Map[String, String],
      operation: String,
      mode: String,
      txn: Option[SetTransaction] = None,
      declaredSchema: Option[StructType] = None,
      dataChange: Boolean = true): Long = {
    val spark = log.spark
    val fs = log.fs
    val partCols: Seq[String] =
      partitionBy.orElse(prev.map(_.metadata.partitionColumns)).getOrElse(Nil)
    val schema = df.schema
    require(partCols.forall(schema.fieldNames.contains),
      s"partition columns $partCols missing from ${schema.fieldNames.toSeq}")

    // Writer protocol gates: this writer emits LOGICAL column names, so
    // writing to a column-mapped table would corrupt it (files/adds must
    // use physical names there); delta.appendOnly forbids removing files.
    prev.foreach { s =>
      require(s.columnMappingMode == "none",
        s"cannot write to ${log.tablePath}: table uses column mapping " +
          s"(mode=${s.columnMappingMode}) and this writer emits logical names " +
          "— writing would corrupt it")
      // minWriterVersion > 2 tables carry writer-enforced features this
      // writer does not implement (CHECK constraints, generated columns,
      // ...) — writing while ignoring them silently violates the table's
      // invariants, so refuse, as the spec requires. Exception: writer
      // v7 whose listed features are all ones this writer honors —
      // deletionVectors (reads are DV-aware and rewrites remove the
      // whole (file, DV) pair), appendOnly (enforced above via the
      // table property), invariants (vacuous unless declared),
      // inCommitTimestamp (every commit path stamps a monotonic ICT —
      // see DeltaLog.commit), v2Checkpoint (checkpoint layout only,
      // commits are unaffected).
      val supportedWriterFeatures = Set(
        "deletionVectors", "appendOnly", "invariants",
        "inCommitTimestamp", "v2Checkpoint")
      val unsupportedW = s.protocol.writerFeatures.diff(supportedWriterFeatures)
      require(s.protocol.minWriterVersion <= 2 ||
          (s.protocol.minWriterVersion == 7 && unsupportedW.isEmpty),
        s"cannot write to ${log.tablePath}: table requires " +
          s"minWriterVersion=${s.protocol.minWriterVersion}" +
          (if (unsupportedW.nonEmpty) s" with writer features $unsupportedW" else "") +
          s" (supported: <= 2, or 7 with features within $supportedWriterFeatures); " +
          "refusing to write rather than ignore writer-enforced features")
      require(removes.isEmpty ||
          !s.metadata.configuration.get("delta.appendOnly").contains("true"),
        s"cannot remove files from ${log.tablePath}: table is delta.appendOnly")
    }

    // Schema ENFORCEMENT (Delta writer invariant): appends and targeted
    // rewrites must match the table schema — silently swapping the
    // metaData would re-type every existing file. Only a full overwrite
    // may change the schema (the `with_schema_change` corpus shape /
    // delta-rs overwrite_schema).
    if (mode == "Append" || mode == "Rewrite") prev.foreach { s =>
      require(normalizedFields(schema) == normalizedFields(s.metadata.schema),
        s"schema mismatch: cannot $mode ${schema.simpleString} into table " +
          s"with schema ${s.metadata.schema.simpleString}; use overwrite to " +
          "change the schema, or appendMergeSchema to add columns")
    }
    // AppendEvolve: df is pre-shaped to the merged schema by
    // appendMergeSchema (existing-compatible, new columns nullable);
    // metaChanged below emits the merged metaData.

    // 1. Materialize data into a staging dir under the table root.
    val staging = new Path(log.rootPath, s".graft-staging-${java.util.UUID.randomUUID}")
    try {
      val w = df.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
        .parquet(staging.toString)

      // 2. Rename staged part files into place (keeps partition subdirs).
      val staged = listParquet(fs, staging)
      val moved: Seq[MovedFile] = staged.map { st =>
        val rel = relativize(staging, st.getPath)
        val dest = new Path(log.rootPath, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(st.getPath, dest))
          throw new java.io.IOException(s"rename ${st.getPath} -> $dest failed")
        val status = fs.getFileStatus(dest)
        MovedFile(rel, dest, status.getLen, status.getModificationTime,
          partitionValuesOf(rel))
      }

      // 3. Per-file stats in one grouped pass over the written files.
      val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
      val stats = computeStats(log, dataSchema, moved)

      // 4. Commit.
      val version = prev.map(_.version + 1).getOrElse(0L)
      val now = System.currentTimeMillis()
      // Append/Rewrite never change table metadata (enforced equal up to
      // order/nullability above — re-emitting the df's variant would
      // churn the declared field order).
      val metaChanged = mode != "Append" && mode != "Rewrite" && prev.forall { s =>
        s.metadata.schemaString != schema.json ||
          s.metadata.partitionColumns != partCols ||
          (configuration.nonEmpty && s.metadata.configuration != configuration)
      }
      val actions = ArrayBuffer.empty[Action]
      actions += CommitInfoAction(CommitInfo(now, operation,
        Map("mode" -> mode,
          "partitionBy" -> partCols.mkString("[\"", "\",\"", "\"]"))))
      txn.foreach(t => actions += TxnAction(t))
      if (prev.isEmpty) actions += ProtocolAction(Protocol())
      if (metaChanged) actions += MetadataAction(Metadata(
        id = prev.map(_.metadata.id)
          .getOrElse(java.util.UUID.randomUUID.toString),
        schemaString = declaredSchema.getOrElse(schema).json,
        partitionColumns = partCols,
        configuration =
          if (configuration.nonEmpty) configuration
          else prev.map(_.metadata.configuration).getOrElse(Map.empty),
        createdTime = Some(prev.flatMap(_.metadata.createdTime).getOrElse(now))))
      actions ++= moved.map { m =>
        AddAction(AddFile(DeltaLog.encodePath(m.rel), m.partitionValues,
          m.size, m.modificationTime, dataChange = dataChange,
          stats = stats.get(m.rel)))
      }
      actions ++= removes.map { f =>
        RemoveAction(RemoveFile(f.path, now, dataChange = dataChange,
          partitionValues = f.partitionValues, size = Some(f.size),
          deletionVector = f.deletionVector))
      }
      val effectiveConf =
        if (configuration.nonEmpty) configuration
        else prev.map(_.metadata.configuration).getOrElse(Map.empty)
      val ict = effectiveConf.get("delta.enableInCommitTimestamps").contains("true")
      // Appends rebase unconditionally (blind append conflicts with
      // nothing); targeted rewrites rebase after a logical conflict
      // check; overwrites abort (their read set is the whole table).
      val rebasable = mode == "Append" || mode == "AppendEvolve" || mode == "Rewrite"
      val committed =
        if (rebasable)
          commitWithRebase(log, version, actions.toSeq,
            touchedPaths = removes.map(_.path).toSet, ictEnabled = ict)
        else { log.commit(version, actions.toSeq, ictEnabled = ict); version }
      spark.catalog.clearCache()
      // delta.checkpointInterval: periodic checkpoints keep snapshot
      // resolution O(tail) forever (delta-spark defaults to every 10
      // commits; here opt-in via table property).
      effectiveConf.get("delta.checkpointInterval")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .filter(_ > 0)
        .foreach { n =>
          if (committed > 0 && committed % n == 0) {
            // delta.checkpointPolicy=v2 selects the manifest+sidecar layout
            if (effectiveConf.get("delta.checkpointPolicy").contains("v2"))
              Maintenance.checkpointV2(log)
            else Maintenance.checkpoint(log)
          }
        }
      committed
    } finally fs.delete(staging, true)
  }

  /** Commit with optimistic-concurrency REBASE (the Delta conflict
    * protocol delta-rs and delta-spark implement, restricted to the
    * always-decidable cells of the matrix): when the target version is
    * taken, read the commits that won the race and re-check the logical
    * conflict rules —
    *
    *  - a concurrent metaData or protocol change aborts (our actions
    *    were validated against the old table definition);
    *  - for a targeted rewrite, any winner add/remove touching one of
    *    OUR touched paths aborts (the winner saw — or rewrote — files
    *    this transaction also read and replaced; committing anyway
    *    would resurrect or double-apply rows);
    *  - otherwise the file sets are disjoint and the same actions are
    *    safe at the next version (a blind append always is).
    *
    * Data files are already on disk at this point, so a rebase costs
    * one commit-JSON attempt — no data is rewritten. */
  private[graft] def commitWithRebase(
      log: DeltaLog,
      firstVersion: Long,
      actions: Seq[Action],
      touchedPaths: Set[String],
      maxRetries: Int = 5,
      ictEnabled: Boolean = false): Long = {
    var version = firstVersion
    var attempts = 0
    while (true) {
      try {
        log.commit(version, actions, ictEnabled = ictEnabled)
        return version
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (attempts > maxRetries) throw e
          val latest = log.latestVersion()
          val concurrent = (version to latest).flatMap(log.commitActions)
          val defChanged = concurrent.exists {
            case MetadataAction(_) | ProtocolAction(_) => true
            case _ => false
          }
          if (defChanged) throw new java.util.ConcurrentModificationException(
            s"commit $version of ${log.tablePath} lost the race to a " +
              "concurrent metaData/protocol change; cannot rebase — rerun " +
              "the operation against the new table definition")
          if (touchedPaths.nonEmpty) {
            val winnerPaths = concurrent.collect {
              case AddAction(a) => a.path
              case RemoveAction(r) => r.path
            }.toSet
            val overlap = winnerPaths.intersect(touchedPaths)
            if (overlap.nonEmpty) throw new java.util.ConcurrentModificationException(
              s"commit $version of ${log.tablePath} conflicts with a " +
                s"concurrent commit on ${overlap.size} file(s) (e.g. " +
                s"${overlap.take(3).mkString(", ")}); rerun the operation " +
                "against the current snapshot")
          }
          version = latest + 1
      }
    }
    -1L // unreachable
  }

  private final case class MovedFile(
      rel: String, abs: Path, size: Long, modificationTime: Long,
      partitionValues: Map[String, String])

  private def listParquet(fs: FileSystem, dir: Path) = {
    val out = ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) out += st
    }
    out.toSeq
  }

  private def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/") + "/"
    val s = p.toUri.getPath
    require(s.startsWith(b), s"$p not under $base")
    s.drop(b.length)
  }

  /** Hive-style partition dir segments (`k=v/...`) → raw partition
    * values (unescape %XX; `__HIVE_DEFAULT_PARTITION__` → null). */
  def partitionValuesOf(rel: String): Map[String, String] = {
    rel.split('/').dropRight(1).iterator.map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"unexpected non-partition dir segment '$seg'")
      val k = unescapePathName(seg.substring(0, i))
      val v = unescapePathName(seg.substring(i + 1))
      k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null else v)
    }.toMap
  }

  /** Inverse of Hive's escapePathName: %XX → char. (Hive escapes
    * single ASCII chars only; multi-byte chars are stored raw.) */
  def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** numRecords / per-leaf min / max / nullCount for each written file,
    * rendered as the `add.stats` JSON string. One Spark job grouped by
    * `input_file_name()`. */
  private def computeStats(
      log: DeltaLog, dataSchema: StructType, moved: Seq[MovedFile]): Map[String, String] = {
    if (moved.isEmpty) return Map.empty
    val leaves = statLeaves(dataSchema)
    val aggs =
      count(lit(1)).as("__num") +:
        leaves.zipWithIndex.flatMap { case ((p, _), i) =>
          Seq(min(col(p)).as(s"__min_$i"), max(col(p)).as(s"__max_$i"),
            sum(col(p).isNull.cast("long")).as(s"__nc_$i"))
        }
    val rows = log.spark.read.schema(dataSchema)
      .parquet(moved.map(_.abs.toString): _*)
      .groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val byRel: Map[String, Row] = rows.flatMap { r =>
      val f = DeltaLog.decodePath(r.getAs[String]("__file"))
      moved.find(m => f.endsWith("/" + m.rel) || f == m.rel).map(_.rel -> r)
    }.toMap
    moved.map { m =>
      val stats = byRel.get(m.rel) match {
        case None => """{"numRecords":0}"""
        case Some(r) => renderStats(r, leaves)
      }
      m.rel -> stats
    }.toMap
  }

  /** Atomic leaf columns eligible for min/max stats, as (dotted path,
    * type); arrays/maps/binary carry no stats (see Snapshot.statsSchema). */
  private def statLeaves(schema: StructType, prefix: String = ""): Seq[(String, DataType)] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => statLeaves(s, p)
        case _: ArrayType | _: MapType | BinaryType => Nil
        case dt => Seq((p, dt))
      }
    }

  private def renderStats(r: Row, leaves: Seq[(String, DataType)]): String = {
    val m = JsonUtil.mapper
    val root = m.createObjectNode()
    root.put("numRecords", r.getAs[Long]("__num"))
    def objFor(parent: com.fasterxml.jackson.databind.node.ObjectNode, path: Seq[String]) =
      path.foldLeft(parent) { (o, seg) =>
        if (o.has(seg)) o.get(seg).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        else o.putObject(seg)
      }
    def putVal(o: com.fasterxml.jackson.databind.node.ObjectNode, name: String, v: Any): Unit =
      v match {
        case null => o.putNull(name)
        case x: Long => o.put(name, x)
        case x: Int => o.put(name, x)
        case x: Short => o.put(name, x.toInt)
        case x: Byte => o.put(name, x.toInt)
        case x: Double => o.put(name, x)
        case x: Float => o.put(name, x)
        case x: Boolean => o.put(name, x)
        case x: java.math.BigDecimal => o.put(name, x)
        case x: BigDecimal => o.put(name, x.underlying)
        case x: java.sql.Timestamp => o.put(name, x.toInstant.toString)
        case x: java.sql.Date => o.put(name, x.toString)
        case x: java.time.Instant => o.put(name, x.toString)
        case x: java.time.LocalDate => o.put(name, x.toString)
        case x => o.put(name, x.toString)
      }
    for ((section, sel) <- Seq(
        ("minValues", (i: Int) => r.get(r.fieldIndex(s"__min_$i"))),
        ("maxValues", (i: Int) => r.get(r.fieldIndex(s"__max_$i"))),
        ("nullCount", (i: Int) => r.get(r.fieldIndex(s"__nc_$i"))))) {
      val sec = root.putObject(section)
      leaves.zipWithIndex.foreach { case ((p, _), i) =>
        val segs = p.split('.').toSeq
        putVal(objFor(sec, segs.dropRight(1)), segs.last, sel(i))
      }
    }
    m.writeValueAsString(root)
  }
}
