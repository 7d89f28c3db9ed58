package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Targeted (MERGE-style) Delta mutations: instead of rewriting the
  * whole table, identify the files that actually contain affected rows
  * and rewrite ONLY those — the move that keeps a dedup touching 0.1%
  * of a 100 TB table from rewriting 100 TB. The reference gets this
  * from delta-rs MERGE (levi/__init__.py:157-166); here it is two
  * passes:
  *  1. a key-finding pass that attributes affected rows to files via
  *     `input_file_name()`;
  *  2. a re-scan of ONLY the touched files, with the plain dedup
  *     operator applied and the result committed as adds(touched') +
  *     removes(touched).
  *
  * Correctness hinge: every member of a duplicate group lives in a
  * touched file (a file containing any member is touched), so group
  * counts/ranks computed over the touched-file scan equal the global
  * ones, and untouched files hold only singleton groups.
  */
object Mutations {

  /** Normalize an `input_file_name()` URI to the qualified-path form. */
  private def normalize(s: String): String =
    try new org.apache.hadoop.fs.Path(new java.net.URI(s)).toString
    catch { case _: Exception => s }

  private def qualified(log: DeltaLog, snap: Snapshot, f: AddFile): String =
    normalize(log.fs.makeQualified(
      new org.apache.hadoop.fs.Path(snap.absolutePath(f))).toString)

  /** Files whose rows (optionally pre-filtered) satisfy a semi-join
    * against `keys` on `cols`. */
  private def touchedFiles(
      log: DeltaLog, snap: Snapshot, keys: DataFrame, cols: Seq[String],
      rowFilter: org.apache.spark.sql.Column = lit(true)): Seq[AddFile] = {
    val taggedScan = snap.readFiles(snap.activeFiles)
      .withColumn("__file", input_file_name())
      .where(rowFilter)
    val idx: Map[String, AddFile] =
      snap.activeFiles.map(f => qualified(log, snap, f) -> f).toMap
    taggedScan.join(keys, cols, "left_semi")
      .select("__file").distinct().collect()
      .map(r => normalize(r.getString(0)))
      .flatMap(idx.get)
      .toSeq
  }

  /** kill_duplicates with targeted rewrite. Returns the committed
    * version (current version when nothing matched). */
  def killDuplicates(log: DeltaLog, duplicationColumns: Seq[String]): Long = {
    val snap = log.snapshot
    Dedup.requireCols(snap.read(), duplicationColumns, "duplication_columns")
    val dupKeys = snap.read()
      .groupBy(duplicationColumns.map(col): _*)
      .agg(count(lit(1)).as("__cnt")).where(col("__cnt") > 1)
      .select(duplicationColumns.map(col): _*)
    val touched = touchedFiles(log, snap, dupKeys, duplicationColumns)
    if (touched.isEmpty) return snap.version
    val replacement = Dedup.killDuplicates(snap.readFiles(touched), duplicationColumns)
    TransactionWriter.rewriteFiles(log, snap, touched, replacement, "DELETE")
  }

  /** drop_duplicates (ordered survivor) with targeted rewrite.
    * `salts > 1` routes survivor selection through the skew-hardened
    * two-phase plan ([[Dedup.dropDuplicatesOrderedSalted]]) — use when a
    * dup group can be hot; requires `orderBy` to be a total order. */
  def dropDuplicatesOrdered(
      log: DeltaLog, duplicationColumns: Seq[String], orderBy: Seq[String],
      salts: Int = 0): Long = {
    val snap = log.snapshot
    val data = snap.read()
    Dedup.requireCols(data, duplicationColumns, "duplication_columns")
    require(orderBy.nonEmpty, "orderBy must be non-empty for a deterministic survivor")
    val dupKeys = data.groupBy(duplicationColumns.map(col): _*)
      .agg(count(lit(1)).as("__cnt")).where(col("__cnt") > 1)
      .select(duplicationColumns.map(col): _*)
    val touched = touchedFiles(log, snap, dupKeys, duplicationColumns)
    if (touched.isEmpty) return snap.version
    val scan = snap.readFiles(touched)
    val replacement =
      if (salts > 1)
        Dedup.dropDuplicatesOrderedSalted(scan, duplicationColumns,
          orderBy.map(col(_).asc), salts)
      else
        Dedup.dropDuplicatesOrdered(scan, duplicationColumns, orderBy.map(col(_).asc))
    TransactionWriter.rewriteFiles(log, snap, touched, replacement, "DELETE")
  }

  /** drop_duplicates_pkey with targeted rewrite (pkey must be unique —
    * full validation set of the reference, levi/__init__.py:372-397). */
  def dropDuplicatesPkey(
      log: DeltaLog, primaryKey: String, duplicationColumns: Seq[String]): Long = {
    val snap = log.snapshot
    // runs every validation eagerly (incl. the uniqueness count guard)
    Dedup.dropDuplicatesPkey(snap.read(), primaryKey, duplicationColumns)
    dropDuplicatesOrdered(log, duplicationColumns, Seq(primaryKey))
  }

  /** SCD2 upsert with targeted rewrite: only files holding a CURRENT
    * row of a changed key are rewritten; inserts ride the same commit
    * as new files. History files and files of unchanged keys keep their
    * add paths. */
  def type2ScdUpsert(
      log: DeltaLog,
      updates: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String = "is_current",
      effectiveTimeColName: String = "effective_time",
      endTimeColName: String = "end_time"): Long = {
    val snap = log.snapshot
    val base = snap.read()
    val plan = graft.operators.Scd2.plan(base, updates, primaryKey, attrColNames,
      isCurrentColName, effectiveTimeColName, endTimeColName)
    val changedKeys = plan.changedKeys.cache()
    val touched = touchedFiles(log, snap, changedKeys.select(primaryKey),
      Seq(primaryKey), rowFilter = col(isCurrentColName))
    val inserts = plan.inserts
    if (touched.isEmpty && inserts.isEmpty) return snap.version
    val closedTouched = graft.operators.Scd2.applyCloses(
      snap.readFiles(touched), changedKeys, primaryKey,
      isCurrentColName, endTimeColName)
    val replacement = closedTouched.unionByName(inserts)
    TransactionWriter.rewriteFiles(log, snap, touched, replacement, "MERGE")
  }
}
