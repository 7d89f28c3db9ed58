package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row tracking (Delta protocol "Row Tracking", writer feature
  * `rowTracking` on top of `domainMetadata`): every physical row gets a
  * fresh row id `add.baseRowId + row_index`, with ids allocated from
  * the monotonic high-water mark in the `delta.rowTracking` domain
  * (`{"rowIdHighWaterMark":N}`), and a row commit version from
  * `add.defaultRowCommitVersion`.
  *
  * What this engine guarantees once [[enable]]d:
  *  - every commit allocates disjoint fresh ids (the domain bump rides
  *    the same commit; concurrent allocators conflict on the domain and
  *    abort — see TransactionWriter's rebase rules);
  *  - DV-based DELETE/UPDATE preserve ids exactly (the files — and so
  *    `baseRowId` — are untouched; only the bitmap changes);
  *  - row-preserving REWRITES keep ids: OPTIMIZE (compact /
  *    compactSmall / zorder), REORG PURGE, and targeted DELETE/UPDATE
  *    write the current ids into MATERIALIZED columns (physical names
  *    recorded in the table config at enable time), and reads prefer a
  *    materialized id over the fresh `baseRowId + row_index`
  *    derivation;
  *  - ids survive checkpoints, time travel, and clone.
  *
  * Documented divergence from delta-spark: the reshaping mutations
  * (dedup survivors, SCD2 closes, general MERGE projections)
  * re-assign fresh ids to rewritten rows — their operator pipelines
  * (windows, aggregations) don't carry the materialized columns
  * through. Materialized preservation is also skipped on column-mapped
  * tables (fresh ids there).
  */
object RowTracking {

  val Domain = "delta.rowTracking"
  val MatIdKey = "delta.rowTracking.materializedRowIdColumnName"
  val MatVerKey = "delta.rowTracking.materializedRowCommitVersionColumnName"

  def supported(p: Protocol): Boolean =
    p.minWriterVersion >= 7 && p.writerFeatures.contains("rowTracking")

  /** The physical names of the materialized row-id / row-commit-version
    * columns (assigned at [[enable]] time, delta-spark's convention). */
  def materializedCols(snap: Snapshot): Option[(String, String)] =
    for {
      id <- snap.metadata.configuration.get(MatIdKey)
      ver <- snap.metadata.configuration.get(MatVerKey)
    } yield (id, ver)

  /** Highest allocated row id, -1 when none allocated yet. */
  def highWaterMark(snap: Snapshot): Long =
    Domains.get(snap, Domain).map { cfg =>
      JsonUtil.mapper.readTree(cfg).get("rowIdHighWaterMark").asLong(-1L)
    }.getOrElse(-1L)

  private[delta] def domainAction(newHwm: Long): DomainMetadataAction =
    DomainMetadataAction(DomainMetadata(Domain,
      s"""{"rowIdHighWaterMark":$newHwm}"""))

  /** Rows recorded in a file per its stats (`numRecords`); row tracking
    * cannot allocate without it. */
  private[delta] def numRecords(f: AddFile): Long =
    f.stats.map(s => JsonUtil.mapper.readTree(s).path("numRecords").asLong(-1L))
      .filter(_ >= 0)
      .getOrElse(throw new IllegalStateException(
        s"row tracking needs numRecords stats on ${f.path}"))

  /** Turn row tracking on: upgrade the protocol (v7 +
    * rowTracking/domainMetadata) and BACKFILL — one metadata-only
    * commit re-adds every active file with an assigned `baseRowId`
    * (no data rewrite), so existing rows get ids too. Returns the
    * committed version; no-op when already enabled. */
  def enable(log: DeltaLog): Long = {
    val snap = log.snapshot
    if (supported(snap.protocol) &&
        snap.adds.where(org.apache.spark.sql.functions
          .col("base_row_id").isNull).isEmpty) return snap.version
    val v = snap.version + 1
    var next = highWaterMark(snap) + 1
    // Deterministic id assignment (path order), STREAMED: the prefix
    // sum over numRecords is inherently sequential, but the driver only
    // holds one partition of the path-sorted adds relation at a time —
    // a 10⁷-file backfill never materializes the file list.
    import scala.jdk.CollectionConverters._
    val backfilled: Iterator[Action] =
      snap.adds.orderBy("path").toLocalIterator().asScala
        .map(snap.rowToAddFile)
        .flatMap { f =>
          if (f.baseRowId.nonEmpty) None
          else {
            val base = next
            next += numRecords(f)
            Some(AddAction(f.copy(dataChange = false, baseRowId = Some(base),
              defaultRowCommitVersion = Some(v))))
          }
        }
    // Materialized column names (stable, uuid-suffixed so they can
    // never collide with user columns) — rewrites write current ids
    // under these physical names to carry them across file boundaries.
    val m = snap.metadata
    val conf2 = m.configuration +
      (MatIdKey -> m.configuration.getOrElse(MatIdKey,
        s"_row-id-col-${java.util.UUID.randomUUID}")) +
      (MatVerKey -> m.configuration.getOrElse(MatVerKey,
        s"_row-commit-version-col-${java.util.UUID.randomUUID}"))
    val head =
      Seq(CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "ENABLE ROW TRACKING")),
        MetadataAction(m.copy(configuration = conf2))) ++
        Domains.featureUpgrade(snap, Set("rowTracking", "domainMetadata"))
    // the hwm domain action trails the stream: Iterator.++'s by-name
    // argument evaluates AFTER the backfill is fully consumed, so
    // `next` holds the final high-water mark by then. commitStreamed
    // recomputes the checksum (the backfill re-adds every live path
    // without removes — an incremental delta would double-count).
    log.commitStreamed(v, head,
      backfilled ++ Iterator.single(domainAction(next - 1)),
      ictEnabled = m.configuration
        .get("delta.enableInCommitTimestamps").contains("true"))
    v
  }

  /** The table with `_row_id` and `_row_commit_version` columns
    * attached. Per row, a MATERIALIZED id (written by a preserving
    * rewrite into the configured physical columns) wins over the fresh
    * derivation `baseRowId + row_index` — that precedence is what
    * makes ids stable across OPTIMIZE/REORG. Deletion vectors are
    * honored (a DV-deleted row's id is simply absent). */
  def readWithRowIds(snap: Snapshot): DataFrame = {
    require(supported(snap.protocol),
      s"row tracking is not enabled on ${snap.log.tablePath}")
    readWithRowIds(snap, snap.planFiles())
  }

  /** [[readWithRowIds]] restricted to a file subset. */
  private[delta] def readWithRowIds(
      snap: Snapshot, files: Seq[AddFile]): DataFrame = {
    val missing = files.filterNot(_.baseRowId.nonEmpty)
    require(missing.isEmpty,
      s"${missing.size} file(s) lack baseRowId (foreign writer without " +
        "row tracking?); run RowTracking.enable to backfill")
    val spark = snap.log.spark
    import spark.implicits._
    if (files.isEmpty) {
      val withIds = org.apache.spark.sql.types.StructType(snap.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_row_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_row_commit_version",
          org.apache.spark.sql.types.LongType)))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withIds)
    }
    // (file-path spelling → baseRowId, dcv) broadcast-joined against
    // the lineage scan — same path-candidate trick as the DV filter.
    val lookup = files.flatMap(f => snap.pathCandidates(f).map(p =>
      (p, f.baseRowId.get, f.defaultRowCommitVersion.getOrElse(-1L))))
      .toDF("__rt_path", "__rt_base", "__rt_dcv")
    val extraCols = materializedCols(snap).toSeq.flatMap { case (idC, verC) =>
      Seq(org.apache.spark.sql.types.StructField(idC,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(verC,
            org.apache.spark.sql.types.LongType))
    }
    val scanned = snap.readFilesLineage(files, extraCols)
      .join(broadcast(lookup), col("__file") === col("__rt_path"))
    val (ridCol, rverCol) = materializedCols(snap) match {
      case Some((idC, verC)) =>
        (coalesce(col(s"`$idC`"), col("__rt_base") + col("__row")),
         coalesce(col(s"`$verC`"), col("__rt_dcv")))
      case None =>
        (col("__rt_base") + col("__row"), col("__rt_dcv"))
    }
    scanned.select(snap.schema.fieldNames.map(col).toSeq ++ Seq(
      ridCol.as("_row_id"), rverCol.as("_row_commit_version")): _*)
  }

  /** The table rows of `files` with the CURRENT row ids attached under
    * the table's MATERIALIZED column names — the input a row-preserving
    * rewrite (OPTIMIZE / REORG / filter-shaped mutation) feeds to the
    * writer (with `preservedCols` naming the two columns) so the
    * rewritten files carry the ids forward. */
  private[delta] def withMaterializedRowIds(
      snap: Snapshot, files: Seq[AddFile]): (DataFrame, Seq[String]) = {
    val (idC, verC) = materializedCols(snap).getOrElse(
      throw new IllegalStateException(
        s"row tracking not fully enabled on ${snap.log.tablePath} " +
          "(no materialized column names); run RowTracking.enable"))
    (readWithRowIds(snap, files)
      .withColumnRenamed("_row_id", idC)
      .withColumnRenamed("_row_commit_version", verC),
      Seq(idC, verC))
  }

  /** The scan a row-preserving rewrite should start from: when row
    * tracking is fully on (and unmapped — materialized columns are not
    * supported under column mapping), the rows come with their current
    * ids attached under the materialized names, and the caller passes
    * the returned names as the writer's `preservedCols`; otherwise a
    * plain scan with no preservation. */
  private[graft] def preservingScan(
      snap: Snapshot, files: Seq[AddFile]): (DataFrame, Seq[String]) =
    if (supported(snap.protocol) && materializedCols(snap).nonEmpty &&
        snap.columnMappingMode == "none" &&
        files.forall(_.baseRowId.nonEmpty))
      withMaterializedRowIds(snap, files)
    else (snap.readFiles(files), Nil)
}
