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
  *  - ids survive checkpoints, time travel, and clone.
  *
  * Documented divergence from delta-spark: REWRITE commits (OPTIMIZE /
  * REORG / targeted mutations) re-assign fresh ids to the rewritten
  * rows instead of carrying them through materialized id columns —
  * tracking across rewrites needs the materialized-column machinery
  * this engine does not implement yet. Readers needing stable
  * identity across rewrites should pin versions (time travel) or use
  * DV-based mutations, which preserve ids.
  */
object RowTracking {

  val Domain = "delta.rowTracking"

  def supported(p: Protocol): Boolean =
    p.minWriterVersion >= 7 && p.writerFeatures.contains("rowTracking")

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
        snap.activeFiles.forall(_.baseRowId.nonEmpty)) return snap.version
    val v = snap.version + 1
    var next = highWaterMark(snap) + 1
    val backfilled = snap.activeFiles.sortBy(_.path).flatMap { f =>
      if (f.baseRowId.nonEmpty) None
      else {
        val base = next
        next += numRecords(f)
        Some(AddAction(f.copy(dataChange = false, baseRowId = Some(base),
          defaultRowCommitVersion = Some(v))))
      }
    }
    val actions =
      Seq(CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "ENABLE ROW TRACKING"))) ++
        Domains.featureUpgrade(snap, Set("rowTracking", "domainMetadata")) ++
        backfilled :+ domainAction(next - 1)
    log.commit(v, actions, ictEnabled = snap.metadata.configuration
      .get("delta.enableInCommitTimestamps").contains("true"))
    v
  }

  /** The table with `_row_id` and `_row_commit_version` columns
    * attached (fresh derivation: `baseRowId + row_index`, honoring
    * deletion vectors — a DV-deleted row's id is simply absent, and
    * surviving rows keep theirs). */
  def readWithRowIds(snap: Snapshot): DataFrame = {
    require(supported(snap.protocol),
      s"row tracking is not enabled on ${snap.log.tablePath}")
    val files = snap.activeFiles
    val missing = files.filterNot(_.baseRowId.nonEmpty)
    require(missing.isEmpty,
      s"${missing.size} file(s) lack baseRowId (foreign writer without " +
        "row tracking?); run RowTracking.enable to backfill")
    if (files.isEmpty) {
      val spark = snap.log.spark
      val withIds = org.apache.spark.sql.types.StructType(snap.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_row_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_row_commit_version",
          org.apache.spark.sql.types.LongType)))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), withIds)
    }
    // (file-path spelling → baseRowId, dcv) broadcast-joined against the
    // lineage scan — same path-candidate trick as the DV filter.
    val spark = snap.log.spark
    import spark.implicits._
    val lookup = files.flatMap(f => snap.pathCandidates(f).map(p =>
      (p, f.baseRowId.get, f.defaultRowCommitVersion.getOrElse(-1L))))
      .toDF("__rt_path", "__rt_base", "__rt_dcv")
    snap.readFilesLineage(files)
      .join(broadcast(lookup), col("__file") === col("__rt_path"))
      .select(snap.schema.fieldNames.map(col).toSeq ++ Seq(
        (col("__rt_base") + col("__row")).as("_row_id"),
        col("__rt_dcv").as("_row_commit_version")): _*)
  }
}
