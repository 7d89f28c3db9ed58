package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshims.SqlShims
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType
import graft.delta.{AddAction, ChangeDataFeed, DeltaLog, RemoveAction}

/** Structured-Streaming SOURCE over a graft Delta table: offsets are
  * table versions; each micro-batch reads the files ADDED by the commit
  * range (start, end]. The first batch loads the full snapshot (delta's
  * default initial-load behavior). Append-only contract: a dataChange
  * remove inside the range fails the stream rather than silently
  * re-emitting or dropping rows (same default as delta-spark without
  * ignoreChanges).
  *
  * With `.option("readChangeFeed", "true")` the source emits the
  * row-level CHANGE FEED instead (delta-spark's streaming CDF): table
  * columns + `_change_type` / `_commit_version` / `_commit_timestamp`,
  * the initial snapshot surfacing as `insert` rows and each commit
  * range reading [[ChangeDataFeed.tableChanges]] — mutation commits
  * (DELETE/UPDATE, DV or rewrite) stream their changed rows rather
  * than failing the append-only contract.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format(classOf[graft.sources.DeltaSourceProvider].getName)
  *   .option("path", tablePath)
  *   .load()
  * }}}
  */
class DeltaSourceProvider extends StreamSourceProvider {

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta source requires option 'path'"))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").contains("true")

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val base = DeltaLog
      .forPath(sqlContext.sparkSession, path(parameters)).snapshot.schema
    ("graft-delta",
      if (cdf(parameters)) DeltaStreamSource.withCdfColumns(base) else base)
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toLong).filter(_ > 0),
      readChangeFeed = cdf(parameters),
      maxBytesPerTrigger =
        parameters.get("maxBytesPerTrigger").map(_.toLong).filter(_ > 0))
}

object DeltaStreamSource {
  private[sources] def withCdfColumns(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        ChangeDataFeed.ChangeTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        ChangeDataFeed.CommitVersionCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        ChangeDataFeed.CommitTimestampCol, org.apache.spark.sql.types.TimestampType)))
}

class DeltaStreamSource(
    spark: SparkSession, tablePath: String,
    maxCommitsPerTrigger: Option[Long] = None,
    readChangeFeed: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None) extends Source {

  private val log = DeltaLog.forPath(spark, tablePath)

  /** Added bytes per commit (log-plane, cached — each commit JSON is
    * read once per source lifetime for admission control). */
  private val commitBytes =
    scala.collection.mutable.LongMap.empty[Long]
  private def bytesOf(v: Long): Long =
    commitBytes.getOrElseUpdate(v,
      log.commitActions(v).collect {
        case graft.delta.AddAction(a) => a.size
      }.sum)

  override val schema: StructType = {
    val base = log.snapshot.schema
    if (readChangeFeed) DeltaStreamSource.withCdfColumns(base) else base
  }

  /** Highest offset already handed to the engine (advanced by getBatch
    * too, so rate limiting stays correct across restarts). */
  private var lastOffered: Option[Long] = None

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    val latest = log.latestVersion()
    // Backfill control: with a rate limit, the first offer is the
    // earliest reconstructible version (small initial snapshot), then at
    // most maxCommitsPerTrigger versions per trigger. getBatch raises
    // lastOffered to any checkpoint-recovered position, so a stale first
    // offer after restart only yields one empty catch-up batch.
    val commitCapped = (maxCommitsPerTrigger, lastOffered) match {
      case (Some(n), Some(lo)) => math.min(latest, lo + n)
      case (Some(_), None) =>
        val (commits, cps) = log.listLog()
        math.min(latest, (commits ++ cps).min)
      case _ => latest
    }
    // byte-based admission: extend from a start version while the
    // cumulative ADDED bytes stay under the cap — always at least one
    // commit so the stream can't starve on a single large commit. The
    // start is the next unoffered version, or — on the first offer with
    // ONLY the byte cap configured — the earliest reconstructible
    // version (otherwise commitCapped = latest and the entire table
    // history would be admitted as one batch, defeating admission
    // control exactly when the backlog is largest). ONE shared walk: a
    // future admission-control fix must not have two copies to diverge.
    def byteWalk(cap: Long, startV: Long): Long = {
      var v = startV
      var cum = bytesOf(v)
      while (v < commitCapped && cum + bytesOf(v + 1) <= cap) {
        v += 1; cum += bytesOf(v)
      }
      v
    }
    val target = (maxBytesPerTrigger, lastOffered) match {
      case (Some(cap), Some(lo)) if commitCapped > lo => byteWalk(cap, lo + 1)
      case (Some(cap), None) if maxCommitsPerTrigger.isEmpty =>
        val (commits, cps) = log.listLog()
        byteWalk(cap, math.min(latest, (commits ++ cps).min))
      case _ => commitCapped
    }
    lastOffered = Some(math.max(target, lastOffered.getOrElse(-1L)))
    Some(LongOffset(lastOffered.get))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // raise past BOTH bounds: after a restart the checkpoint-recovered
    // start may exceed a stale first offer; regressing below it would
    // re-emit already-processed commits
    lastOffered = Some((Seq(lastOffered.getOrElse(-1L), endV) ++
      start.map(versionOf)).max)
    val snap = log.snapshotAt(endV)
    import org.apache.spark.sql.functions.lit
    val batch = (start, readChangeFeed) match {
      case (None, false) =>
        // initial load: the whole snapshot at the end offset
        snap.read()
      case (None, true) =>
        // CDF initial load: the snapshot surfaces as insert rows
        // stamped with the end-offset version (delta-spark's
        // streaming-CDF initial-snapshot shape)
        snap.read()
          .withColumn(ChangeDataFeed.ChangeTypeCol, lit("insert"))
          .withColumn(ChangeDataFeed.CommitVersionCol, lit(endV))
          .withColumn(ChangeDataFeed.CommitTimestampCol,
            lit(new java.sql.Timestamp(log.inCommitTimestampOf(endV).getOrElse(
              System.currentTimeMillis()))))
      case (Some(s), true) =>
        val sv = versionOf(s)
        if (sv >= endV) // restart catch-up with no new commits
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else ChangeDataFeed.tableChanges(log, sv + 1, Some(endV))
      case (Some(s), false) =>
        val startV = versionOf(s)
        val versions = (startV + 1) to endV
        val actions = versions.flatMap(log.commitActions)
        actions.collect {
          case RemoveAction(r) if r.dataChange =>
            throw new IllegalStateException(
              s"graft-delta source: commit range ($startV, $endV] of " +
                s"$tablePath contains a dataChange remove (${r.path}) — " +
                "the stream is append-only; restart from a fresh checkpoint " +
                "for a full refresh")
        }
        // dataChange=false adds are pure layout rewrites (OPTIMIZE):
        // their rows were already emitted from the original files
        val adds = actions.collect { case AddAction(a) if a.dataChange => a }
        snap.readFiles(adds)
    }
    SqlShims.asStreamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}
