package graft.delta

import org.apache.spark.sql.types.{DataType, StructType}

/** Delta transaction-log action model.
  *
  * Shapes follow the open Delta protocol as exercised by the reference's
  * reader corpus (e.g.
  * tests/reader_tests/generated/basic_append/delta/_delta_log/00000000000000000000.json
  * and the checkpoint parquet schema of
  * with_checkpoint/delta/_delta_log/00000000000000000002.checkpoint.parquet):
  * top-level keys `protocol | metaData | add | remove | commitInfo`, one
  * JSON object per line.
  */
final case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 2,
    readerFeatures: Set[String] = Set.empty,
    writerFeatures: Set[String] = Set.empty)

/** Reference to a deletion vector attached to a data file (Delta
  * protocol "Deletion Vector Descriptor Schema"). `storageType`:
  * `"u"` = relative file named by a z85-encoded UUID (with optional
  * random prefix), `"i"` = bitmap inlined z85 in `pathOrInlineDv`,
  * `"p"` = absolute file path. `offset` is the byte position of the
  * DV's length header inside the file (absent for inline). */
final case class DeletionVectorDescriptor(
    storageType: String,
    pathOrInlineDv: String,
    offset: Option[Int],
    sizeInBytes: Int,
    cardinality: Long)

final case class Metadata(
    id: String,
    schemaString: String,
    partitionColumns: Seq[String],
    configuration: Map[String, String],
    createdTime: Option[Long]) {
  /** `schemaString` is byte-compatible with Spark's `StructType.json`. */
  lazy val schema: StructType =
    DataType.fromJson(schemaString).asInstanceOf[StructType]
}

/** One active data file. `path` is relative to the table root and
  * percent-encoded per the Delta spec; `partitionValues` holds the raw
  * (decoded) string-encoded partition values, with `null` for the
  * `__HIVE_DEFAULT_PARTITION__` case.
  */
final case class AddFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    modificationTime: Long,
    dataChange: Boolean = true,
    stats: Option[String] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None,
    /** Row tracking (writer feature `rowTracking`): the file's rows
      * carry fresh row ids `baseRowId + row_index`; assigned from the
      * `delta.rowTracking` domain's high-water mark at commit. */
    baseRowId: Option[Long] = None,
    /** The commit version stamped on this file's rows as their default
      * row commit version (row tracking). */
    defaultRowCommitVersion: Option[Long] = None,
    /** `stats.numRecords` pre-extracted during SLIM planning
      * ([[Snapshot.planFiles]] nulls the KB-sized stats JSON for driver
      * memory; this keeps the one 8-byte figure integrity checks need —
      * the sidecar entry-count invariant). Never serialized. */
    numRecordsStat: Option[Long] = None)

final case class RemoveFile(
    path: String,
    deletionTimestamp: Long,
    dataChange: Boolean = true,
    partitionValues: Map[String, String] = Map.empty,
    size: Option[Long] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None)

final case class CommitInfo(
    timestamp: Long,
    operation: String,
    operationParameters: Map[String, String] = Map.empty,
    /** Monotonic commit timestamp (ms) per the in-commit-timestamps
      * writer feature; when present it — not the commit file's
      * modification time — is the table's time-travel clock. */
    inCommitTimestamp: Option[Long] = None)

/** V2-checkpoint manifest marker (Delta spec "V2 spec checkpoints"):
  * the top-level checkpoint file carries exactly one of these; its
  * `version` must equal the checkpoint's version. */
final case class CheckpointMetadata(
    version: Long,
    tags: Map[String, String] = Map.empty)

/** Reference from a v2 checkpoint manifest to a sidecar parquet file
  * holding add/remove actions. `path` is either a bare file name
  * (resolved under `_delta_log/_sidecars/`) or an absolute URI. */
final case class SidecarFile(
    path: String,
    sizeInBytes: Option[Long] = None,
    modificationTime: Option[Long] = None)

/** Idempotent-writer state: the highest `version` an application
  * (streaming query, external loader) has committed. Checkpoints must
  * preserve these (Delta checkpoint spec) or replaying engines lose
  * exactly-once guarantees. */
final case class SetTransaction(
    appId: String,
    version: Long,
    lastUpdated: Option[Long] = None)

/** Change-data file of one commit (Delta protocol "Add CDC File"):
  * holds the change rows (table columns + `_change_type`) of a
  * DELETE/UPDATE/MERGE when the table has
  * `delta.enableChangeDataFeed=true`. CDC files never affect the table
  * state — replay ignores them; only [[DeltaLog.tableChanges]] reads
  * them. `dataChange` is always false per the spec. */
final case class AddCDCFile(
    path: String,
    partitionValues: Map[String, String],
    size: Long,
    dataChange: Boolean = false)

/** Named metadata domain of the table (Delta protocol "Domain
  * Metadata"): `configuration` is an arbitrary (usually JSON) string
  * owned by the domain; replay keeps the LATEST action per domain;
  * `removed = true` is a tombstone that deletes the domain. Requires
  * the `domainMetadata` writer feature. System domains (`delta.*`,
  * e.g. `delta.clustering`) are controlled by their features; user
  * domains are free-form. */
final case class DomainMetadata(
    domain: String,
    configuration: String,
    removed: Boolean = false)

/** Sum type for everything a commit line can carry. */
sealed trait Action
final case class ProtocolAction(p: Protocol) extends Action
final case class MetadataAction(m: Metadata) extends Action
final case class AddAction(a: AddFile) extends Action
final case class RemoveAction(r: RemoveFile) extends Action
final case class CommitInfoAction(c: CommitInfo) extends Action
final case class TxnAction(t: SetTransaction) extends Action
final case class CheckpointMetadataAction(cm: CheckpointMetadata) extends Action
final case class SidecarAction(s: SidecarFile) extends Action
final case class CdcAction(cdc: AddCDCFile) extends Action
final case class DomainMetadataAction(d: DomainMetadata) extends Action
