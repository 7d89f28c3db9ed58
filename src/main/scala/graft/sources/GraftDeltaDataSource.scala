package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.delta.{DeltaLog, Skipping, Snapshot, TransactionWriter}

/** `spark.read.format("graftdelta")` / `df.write.format("graftdelta")`
  * / `spark.readStream.format("graftdelta")` — the standard Spark
  * data-source surface over the native Delta implementation (the same
  * DSv1 relation shape delta-spark exposes for batch reads):
  *
  * {{{
  * spark.read.format("graftdelta").load(tablePath)                  // latest
  * spark.read.format("graftdelta").option("versionAsOf", 2).load(p) // time travel
  * spark.read.format("graftdelta").option("timestampAsOf", "2024-01-01T00:00:00Z").load(p)
  * df.write.format("graftdelta").mode("append"|"overwrite").save(p)
  * df.write.format("graftdelta").partitionBy("dt").mode("overwrite").save(p)
  * }}}
  *
  * Reads go through [[graft.delta.Skipping.readWhere]], so pushed-down
  * comparison filters drive partition pruning + min/max stats file
  * skipping BEFORE any parquet IO, then reach the parquet reader as
  * row-group predicates; column pruning reaches the scan via
  * `requiredColumns`. Writes are full transactional commits (stats
  * collection, schema enforcement, atomic no-clobber commit files).
  */
class GraftDeltaDataSource extends DeltaSourceProvider
    with RelationProvider with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graftdelta"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path (use .load(path)/.save(path))"))

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val log = DeltaLog.forPath(sqlContext.sparkSession, tablePath(parameters))
    parameters.get("readChangesFrom") match {
      case Some(from) =>
        // incremental read: rows appended in (from, readChangesTo]
        val to = parameters.get("readChangesTo").map(_.toLong).getOrElse(-1L)
        val df = log.readChanges(from.toLong, to)
        return DataFrameRelation(sqlContext, df)
      case None =>
        require(!parameters.contains("readChangesTo"),
          "readChangesTo requires readChangesFrom — without it the read " +
            "would silently return the full table")
    }
    (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(v), None) =>
        GraftDeltaRelation(sqlContext, log.snapshotAt(v.toLong), pinned = true)
      case (None, Some(ts)) =>
        GraftDeltaRelation(sqlContext,
          log.snapshotAsOf(java.time.Instant.parse(ts)), pinned = true)
      case (None, None) =>
        // latest-version relations re-resolve at SCAN time: a relation
        // cached by the session catalog (name-addressed tables) keeps
        // seeing new commits without a REFRESH TABLE
        GraftDeltaRelation(sqlContext, log.snapshot, pinned = false)
      case _ => throw new IllegalArgumentException(
        "specify at most one of versionAsOf / timestampAsOf")
    }
  }

  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val log = DeltaLog.forPath(sqlContext.sparkSession, tablePath(parameters))
    val partitionBy = parameters.get("__partition_columns").map(parsePartitionColumns)
    val exists = log.fs.exists(log.logPath) &&
      { val (c, p) = log.listLog(); c.nonEmpty || p.nonEmpty }
    mode match {
      case SaveMode.Append =>
        if (exists) TransactionWriter.append(log, data, partitionBy)
        else TransactionWriter.overwrite(log, data, partitionBy)
      case SaveMode.Overwrite =>
        // .option("replaceWhere", "<predicate>"): predicate-scoped
        // atomic overwrite instead of a full-table replace (the Delta
        // writer contract) — only meaningful on an existing table
        // .option("partitionOverwriteMode", "dynamic") — or the
        // standard session conf spark.sql.sources.partitionOverwriteMode,
        // which Spark jobs set globally expecting exactly this behavior
        // (a full-table overwrite instead would silently drop every
        // untouched partition). The option wins over the conf; dynamic
        // only applies to an existing PARTITIONED table (Spark's own
        // semantics: dynamic on an unpartitioned table is a plain
        // overwrite).
        val dynamicMode = parameters.get("partitionOverwriteMode")
          .orElse(Option(sqlContext.sparkSession.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")))
          .exists(_.equalsIgnoreCase("dynamic"))
        parameters.get("replaceWhere").filter(_ => exists) match {
          case Some(p) => graft.delta.Mutations.replaceWhere(
            log, data, org.apache.spark.sql.functions.expr(p))
          case None if exists && dynamicMode &&
              log.snapshot.metadata.partitionColumns.nonEmpty =>
            graft.delta.Mutations.overwriteDynamic(log, data)
          case None => TransactionWriter.overwrite(log, data, partitionBy)
        }
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graftdelta table already exists at ${log.tablePath} (mode ErrorIfExists)")
        TransactionWriter.overwrite(log, data, partitionBy)
      case SaveMode.Ignore =>
        if (!exists) TransactionWriter.overwrite(log, data, partitionBy)
    }
    GraftDeltaRelation(sqlContext, log.snapshot, pinned = false)
  }

  /** DataFrameWriter.partitionBy serializes to a JSON string array under
    * `__partition_columns` (the DSv1 contract delta-spark also parses). */
  private def parsePartitionColumns(json: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    graft.delta.JsonUtil.mapper.readTree(json).elements().asScala
      .map(_.asText()).toSeq
  }
}

/** Relation over an already-built DataFrame (the incremental
  * `readChangesFrom` path — the file set is fixed by the commit range,
  * so there is nothing further to prune at this layer). */
case class DataFrameRelation(
    sqlContext: SQLContext, df: org.apache.spark.sql.DataFrame)
    extends BaseRelation with TableScan {
  override val schema: StructType = df.schema
  override val needConversion: Boolean = false
  override def buildScan(): RDD[Row] =
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

/** Batch relation: schema from the snapshot, scans through the pruned
  * stats-skipping read path, rows handed back as InternalRow
  * (`needConversion = false`) so no external-Row round-trip is paid.
  *
  * [[InsertableRelation]] makes NAME-ADDRESSED tables writable: after
  * `CREATE TABLE t USING graftdelta LOCATION '<path>'` (the session
  * catalog resolves the registered short name), `INSERT INTO t ...`
  * lands as a transactional graft commit. Reads via the name go
  * through this same relation, so plain `SELECT ... FROM t` needs no
  * temp view; `pinned = false` (every non-time-travel read) resolves
  * the CURRENT snapshot at scan time, so the catalog-cached relation
  * keeps seeing new commits — including out-of-band GRAFT mutations —
  * without a REFRESH TABLE. Time-travel relations stay pinned to
  * their resolved version. */
case class GraftDeltaRelation(
    sqlContext: SQLContext, snap: Snapshot, pinned: Boolean = true)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def scanSnap: Snapshot = if (pinned) snap else snap.log.snapshot

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val log = snap.log
    if (overwrite) TransactionWriter.overwrite(log, data)
    else TransactionWriter.append(log, data)
  }

  override val schema: StructType = snap.schema
  override val needConversion: Boolean = false

  /** Comparison filters become (col, op, value) triples for file
    * skipping; everything else is left for Spark's post-scan Filter
    * (`unhandledFilters` default keeps every filter, so correctness
    * never depends on the translation). */
  private def toTriple(f: Filter): Option[(String, String, Any)] = f match {
    case EqualTo(a, v) => Some((a, "=", v))
    case GreaterThan(a, v) => Some((a, ">", v))
    case GreaterThanOrEqual(a, v) => Some((a, ">=", v))
    case LessThan(a, v) => Some((a, "<", v))
    case LessThanOrEqual(a, v) => Some((a, "<=", v))
    case _ => None
  }

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val triples = filters.flatMap(toTriple).toSeq
    val pruned = Skipping.readWhere(scanSnap, triples)
    val projected =
      if (requiredColumns.isEmpty) pruned.select()
      else pruned.select(requiredColumns.map(col).toSeq: _*)
    // needConversion=false contract: the RDD actually carries InternalRow
    projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}
