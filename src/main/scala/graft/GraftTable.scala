package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.delta.{ChangeDataFeed, Constraints, DeltaLog, Maintenance, Merge, Mutations, SchemaEvolution, Skipping, Snapshot, TransactionWriter}

/** User-facing handle over one Delta table — the ergonomic equivalent of
  * the reference's `DeltaTable(path)` + levi module functions
  * (/root/reference/levi/__init__.py), binding graft's whole surface to
  * a path: reads (batch, time travel, pruned scans, streaming), the 10
  * levi analytics/mutations, general MERGE, and maintenance.
  *
  * {{{
  * val t = GraftTable(spark, "/data/events")
  * t.read().where(...)                       // batch scan
  * t.skippedStats(Seq(("ts", ">=", x)))      // log-plane analytics
  * t.dropDuplicatesPkey("id", Seq("payload"))
  * t.merge(updates, col("t.id") === col("s.id"))
  *   .whenMatchedUpdate(Map("v" -> col("s.v"))).execute()
  * t.zorder(Seq("user_id", "ts")); t.vacuum()
  * spark.readStream.format(classOf[graft.sources.DeltaSourceProvider].getName)
  *   .option("path", t.path).load()          // streaming source
  * }}}
  */
final case class GraftTable(spark: SparkSession, path: String) {

  val log: DeltaLog = DeltaLog.forPath(spark, path)

  // ---- reads ---------------------------------------------------------------
  def snapshot: Snapshot = log.snapshot
  def read(): DataFrame = log.snapshot.read()
  def readAt(version: Long): DataFrame = log.snapshotAt(version).read()
  def readAsOf(ts: java.time.Instant): DataFrame = log.snapshotAsOf(ts).read()
  /** Stats-pruned scan: file skipping + pushed row predicate. */
  def readWhere(filters: Seq[(String, String, Any)]): DataFrame =
    Skipping.readWhere(log.snapshot, filters)

  // ---- levi analytics ------------------------------------------------------
  def version: Long = Levi.latestVersion(log)
  /** Exact COUNT(*) from log stats (no data scan); None if a file
    * lacks numRecords — see [[Levi.rowCountFromLog]]. */
  def rowCount(): Option[Long] = Levi.rowCountFromLog(log.snapshot)
  def skippedStats(filters: Seq[(String, String, Any)]): Map[String, Long] =
    Levi.skippedStats(log.snapshot, filters)
  def fileSizes(boundaries: Seq[String] = Levi.DefaultBoundaries): Map[String, Long] =
    Levi.deltaFileSizes(log.snapshot, boundaries)
  def updatedPartitions(
      start: Option[java.time.Instant] = None,
      end: Option[java.time.Instant] = None): Seq[Map[String, String]] =
    Levi.updatedPartitions(log.snapshot, start, end)
  def history(): DataFrame = Maintenance.history(log)

  // ---- writes / mutations --------------------------------------------------
  def overwrite(df: DataFrame, partitionBy: Option[Seq[String]] = None): Long =
    TransactionWriter.overwrite(log, df, partitionBy)
  def append(df: DataFrame): Long = TransactionWriter.append(log, df)
  def killDuplicates(cols: Seq[String]): Long = Mutations.killDuplicates(log, cols)
  def dropDuplicates(cols: Seq[String], orderBy: Seq[String]): Long =
    Mutations.dropDuplicatesOrdered(log, cols, orderBy)
  def dropDuplicatesPkey(pkey: String, cols: Seq[String]): Long =
    Mutations.dropDuplicatesPkey(log, pkey, cols)
  def type2ScdUpsert(
      updates: DataFrame, primaryKey: String, attrs: Seq[String],
      isCurrentCol: String = "is_current",
      effectiveTimeCol: String = "effective_time",
      endTimeCol: String = "end_time"): Long =
    Mutations.type2ScdUpsert(log, updates, primaryKey, attrs,
      isCurrentCol, effectiveTimeCol, endTimeCol)
  def merge(source: DataFrame, condition: Column): Merge =
    Merge.into(log, source, condition)
  /** DELETE by targeted rewrite (large deletes); see also
    * [[deleteWithDv]] for selective deletes with no data rewrite. */
  def delete(predicate: Column): Long = Mutations.delete(log, predicate)
  /** DELETE via deletion vectors: marks rows in a roaring bitmap,
    * rewrites no data files. */
  def deleteWithDv(predicate: Column): Long = Mutations.deleteWithDv(log, predicate)
  /** UPDATE by targeted rewrite: SET columns on matching rows. */
  def update(predicate: Column, set: Map[String, Column]): Long =
    Mutations.update(log, predicate, set)
  /** UPDATE via deletion vectors: marks old row versions in a bitmap
    * and appends only the updated rows — no file rewrite. */
  def updateWithDv(predicate: Column, set: Map[String, Column]): Long =
    Mutations.updateWithDv(log, predicate, set)

  /** SET TBLPROPERTIES delta.enableChangeDataFeed=true: mutation
    * commits start carrying row-level change files. */
  def enableChangeDataFeed(): Long = ChangeDataFeed.enable(log)
  /** The row-level change feed of versions [from, to] (delta-spark's
    * `table_changes`): current table columns + `_change_type`,
    * `_commit_version`, `_commit_timestamp`. */
  def changeFeed(from: Long, to: Option[Long] = None): DataFrame =
    ChangeDataFeed.tableChanges(log, from, to)
  /** The change feed selected by commit TIMESTAMP (ICT-aware). */
  def changeFeedByTimestamp(
      startTs: java.time.Instant,
      endTs: Option[java.time.Instant] = None): DataFrame =
    ChangeDataFeed.tableChangesByTimestamp(log, startTs, endTs)

  /** Upgrade to name-mode column mapping in place (metadata-only);
    * unlocks free column rename/drop. */
  def enableColumnMapping(): Long = SchemaEvolution.enableColumnMapping(log)
  /** ALTER TABLE RENAME COLUMN — metadata-only (requires mapping). */
  def renameColumn(oldName: String, newName: String): Long =
    SchemaEvolution.renameColumn(log, oldName, newName)
  /** ALTER TABLE DROP COLUMN — metadata-only (requires mapping). */
  def dropColumn(name: String): Long = SchemaEvolution.dropColumn(log, name)
  /** ALTER TABLE ADD COLUMN (nullable; existing rows read null). */
  def addColumn(name: String, dataType: org.apache.spark.sql.types.DataType): Long =
    SchemaEvolution.addColumn(log, name, dataType)

  /** ALTER TABLE ADD CONSTRAINT <name> CHECK (<sqlExpr>): validates
    * existing rows, then enforces on every future write. */
  def addCheckConstraint(name: String, sqlExpr: String): Long =
    Constraints.addCheckConstraint(log, name, sqlExpr)
  /** ALTER TABLE DROP CONSTRAINT <name>. */
  def dropCheckConstraint(name: String): Long =
    Constraints.dropCheckConstraint(log, name)

  /** CREATE TABLE <target> SHALLOW CLONE this: metadata-only copy
    * referencing this table's files by absolute path. */
  def shallowCloneTo(targetPath: String, version: Option[Long] = None): GraftTable = {
    graft.delta.Clone.shallow(log, targetPath, version)
    GraftTable(spark, targetPath)
  }

  // ---- maintenance ---------------------------------------------------------
  def checkpoint(): Long = Maintenance.checkpoint(log)
  /** V2 checkpoint (manifest + sidecars under `_delta_log/_sidecars/`). */
  def checkpointV2(sidecarParts: Int = 1, jsonManifest: Boolean = false): Long =
    Maintenance.checkpointV2(log, sidecarParts, jsonManifest)
  /** Turn on monotonic in-commit timestamps (writer feature). */
  def enableInCommitTimestamps(): Long = Maintenance.enableInCommitTimestamps(log)
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): Long =
    Maintenance.compact(log, targetFileBytes)
  def zorder(cols: Seq[String], targetFileBytes: Long = 128L * 1024 * 1024): Long =
    Maintenance.zorder(log, cols, targetFileBytes)
  /** REORG TABLE ... APPLY (PURGE): rewrite only DV-carrying files,
    * retiring deletion-vector debt; orphaned DVs become vacuumable. */
  def purgeDeletionVectors(targetFileBytes: Long = 128L * 1024 * 1024): Long =
    Maintenance.purgeDeletionVectors(log, targetFileBytes)

  /** ALTER TABLE ... CLUSTER BY: declare clustering columns
    * (metadata-only; [[compact]] / GRAFT OPTIMIZE then Z-orders along
    * them). */
  def clusterBy(cols: Seq[String]): Long = graft.delta.Clustering.clusterBy(log, cols)
  def clusteringColumns: Seq[String] =
    graft.delta.Clustering.clusteringColumns(log.snapshot)
  def removeClustering(): Long = graft.delta.Clustering.removeClustering(log)

  /** Row tracking: fresh row ids (`baseRowId + row_index`) on every
    * file; [[enableRowTracking]] backfills existing files without a
    * data rewrite, [[readWithRowIds]] attaches `_row_id` /
    * `_row_commit_version`. DV-based mutations preserve ids. */
  def enableRowTracking(): Long = graft.delta.RowTracking.enable(log)
  def readWithRowIds(): DataFrame =
    graft.delta.RowTracking.readWithRowIds(log.snapshot)

  /** Domain metadata: set/get/remove a named metadata domain
    * (`domainMetadata` writer feature). */
  def setDomainMetadata(domain: String, configuration: String): Long =
    graft.delta.Domains.set(log, domain, configuration)
  def domainMetadata(domain: String): Option[String] =
    graft.delta.Domains.get(log.snapshot, domain)
  def removeDomainMetadata(domain: String): Long =
    graft.delta.Domains.remove(log, domain)
  def vacuum(retentionMs: Long = Maintenance.DefaultVacuumRetentionMs,
      allowZeroRetention: Boolean = false, distributed: Boolean = false): Seq[String] =
    Maintenance.vacuum(log, retentionMs, allowZeroRetention, distributed)
  def restore(version: Long): Long = Maintenance.restore(log, version)
  /** FSCK: drop log entries for data files missing from storage. */
  def fsck(dryRun: Boolean = false): Seq[String] = Maintenance.fsck(log, dryRun)

  /** Rows appended in `(fromVersionExclusive, toInclusive]` (latest when
    * omitted) — incremental-ETL reads without a full snapshot scan. */
  def readChanges(fromVersionExclusive: Long, toVersionInclusive: Long = -1L) =
    log.readChanges(fromVersionExclusive, toVersionInclusive)
}
