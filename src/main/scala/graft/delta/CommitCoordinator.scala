package graft.delta

import org.apache.hadoop.fs.Path

/** Pluggable commit publication — the seam that makes the single-writer
  * guarantee portable across storage systems (the role delta-spark
  * gives `LogStore` and the coordinated-commits table feature).
  *
  * `TransactionWriter`/`DeltaLog.commit` write the commit body to a
  * durable hidden tmp file, then ask the coordinator to PUBLISH it as
  * `<version>.json`. The coordinator's single obligation: exactly one
  * of two racing publishers of the same version may succeed; the loser
  * must see `ConcurrentModificationException` (and its tmp cleaned up).
  *
  * Selection: `spark.graft.commitCoordinator` =
  *   - `rename` (default) — atomic no-clobber rename; correct on
  *     HDFS/ABFS/GCS-style stores whose rename is atomic.
  *   - `locking` — serializes publication through a JVM-wide per-table
  *     mutex + existence check before a plain copy: the
  *     single-process answer for stores WITHOUT atomic rename
  *     (S3-before-conditional-puts), same shape as delta's
  *     S3SingleDriverLogStore.
  *   - any fully-qualified class name implementing
  *     [[CommitCoordinator]] with a no-arg constructor — e.g. a
  *     DynamoDB/conditional-put coordinator for multi-process S3
  *     writers (docs/SCALE.md §commit-coordination).
  */
trait CommitCoordinator {
  /** Publish `tmp` (durable, fully written) as `target`. Throws
    * `java.util.ConcurrentModificationException` if `target` already
    * exists; must delete `tmp` on failure. */
  def publish(log: DeltaLog, version: Long, tmp: Path, target: Path): Unit
}

/** Atomic no-clobber rename via FileContext (Rename.NONE). */
object RenameCommitCoordinator extends CommitCoordinator {
  override def publish(
      log: DeltaLog, version: Long, tmp: Path, target: Path): Unit = {
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, log.spark.sessionState.newHadoopConf())
    try fc.rename(tmp, target) // default Rename.NONE: fail if target exists
    catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        log.fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"commit $version already exists (${e.getMessage})")
      case e: java.io.IOException if log.fs.exists(target) =>
        // Some FileContext impls surface the clobber as a plain IOException.
        log.fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"commit $version already exists (${e.getMessage})")
    }
  }
}

/** Existence-check + rename under a JVM-wide per-table lock: safe on
  * stores whose rename CLOBBERS (no atomic no-clobber primitive), as
  * long as all writers share this process — the S3SingleDriverLogStore
  * contract. Multi-process S3 coordination needs an external mutex
  * (conditional put / DynamoDB); plug it in via the FQCN conf. */
object LockingCommitCoordinator extends CommitCoordinator {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def publish(
      log: DeltaLog, version: Long, tmp: Path, target: Path): Unit = {
    val lock = locks.computeIfAbsent(
      target.toString, _ => new Object)
    lock.synchronized {
      if (log.fs.exists(target)) {
        log.fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"commit $version already exists in ${target.getParent}")
      }
      if (!log.fs.rename(tmp, target)) {
        log.fs.delete(tmp, false)
        throw new java.io.IOException(
          s"failed to publish commit $version to $target")
      }
    }
  }
}

object CommitCoordinator {
  /** Resolve the session's coordinator (see trait doc for values).
    *
    * Unset defaults BY SCHEME: `file:` tables get the locking
    * coordinator — the local filesystem's FileContext rename is
    * check-then-act, NOT atomic no-clobber, so two same-version racers
    * can both pass the existence check and the second rename(2)
    * clobbers the first (observed as a torn commit json / checksum
    * mismatch under concurrent appenders). Every other scheme keeps
    * the rename coordinator (atomic on HDFS/ABFS/GCS-style stores).
    * An explicit `rename` setting still forces it. */
  def forLog(log: DeltaLog): CommitCoordinator =
    log.spark.conf.getOption("spark.graft.commitCoordinator") match {
      case None =>
        if (log.fs.getUri.getScheme == "file") LockingCommitCoordinator
        else RenameCommitCoordinator
      case Some("rename") => RenameCommitCoordinator
      case Some("locking") => LockingCommitCoordinator
      case Some(fqcn) =>
        Class.forName(fqcn).getDeclaredConstructor()
          .newInstance().asInstanceOf[CommitCoordinator]
    }
}
