package graft.delta

import org.apache.hadoop.fs.Path

/** Shallow CLONE (delta-spark `CREATE TABLE ... SHALLOW CLONE src`):
  * a new table whose version-0 log references the SOURCE table's data
  * files by absolute path — zero data copied, metadata-only commit.
  * The clone then evolves independently: appends land under the clone
  * root, targeted rewrites remove absolute-path entries and add local
  * ones, and vacuuming the CLONE never deletes source files (its
  * candidate listing is rooted under the clone). The standing hazard
  * delta-spark documents applies equally: VACUUM on the SOURCE can
  * reclaim files the clone still references.
  *
  * Deletion vectors survive cloning: relative (`u`) descriptors are
  * rewritten as absolute (`p`) descriptors pointing into the source
  * tree, so the cloned scan applies the same row filter.
  */
object Clone {

  /** Create `targetPath` as a shallow clone of `src`'s current
    * snapshot (or of `version` when given). Returns the clone's
    * committed version (always 0). */
  def shallow(src: DeltaLog, targetPath: String, version: Option[Long] = None): Long = {
    val snap = version.map(src.snapshotAt).getOrElse(src.snapshot)
    val dst = DeltaLog.forPath(src.spark, targetPath)
    require(!dst.fs.exists(dst.logPath) ||
        { val (c, p) = dst.listLog(); c.isEmpty && p.isEmpty },
      s"cannot clone into $targetPath: a Delta table already exists there")
    val srcRoot = src.fs.makeQualified(src.rootPath)

    def absolutize(rel: String): String = {
      // store the FULLY QUALIFIED URI (scheme + authority + path), the
      // same spelling the 'p' DV descriptor below uses: a clone created
      // under a different filesystem/bucket must resolve the source's
      // paths against the SOURCE's filesystem, and a bare /path would
      // re-root on the clone's (s3a://other-bucket/path — wrong data).
      val abs = new Path(srcRoot, DeltaLog.decodePath(rel))
      DeltaLog.encodePath(abs.toString)
    }

    // Stream the source's add entries straight into the clone's commit
    // file (one Spark partition on the driver at a time): cloning a
    // 10⁷-file table never materializes the file list — the stats JSON
    // (KBs/file) must be carried VERBATIM into the clone, which is
    // exactly what makes the collected form expensive.
    val adds: Iterator[Action] = snap.iterateAddFiles().map { f =>
      val dv = f.deletionVector.map { d =>
        if (d.storageType == "u")
          d.copy(storageType = "p",
            pathOrInlineDv = DeletionVectors.filePath(srcRoot, d).toString,
            offset = d.offset)
        else d
      }
      AddAction(f.copy(path = absolutize(f.path), deletionVector = dv))
    }
    val now = System.currentTimeMillis()
    val meta = snap.metadata.copy(
      id = java.util.UUID.randomUUID.toString,
      createdTime = Some(now))
    dst.commitStreamed(0L, Seq(
      CommitInfoAction(CommitInfo(now, "CLONE",
        Map("source" -> src.tablePath, "sourceVersion" -> snap.version.toString))),
      ProtocolAction(snap.protocol),
      MetadataAction(meta)), adds)
    0L
  }
}
