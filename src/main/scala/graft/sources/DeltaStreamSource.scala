package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshims.SqlShims
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType
import graft.delta.{AddAction, DeltaLog, RemoveAction}

/** Structured-Streaming SOURCE over a graft Delta table: offsets are
  * table versions; each micro-batch reads the files ADDED by the commit
  * range (start, end]. The first batch loads the full snapshot (delta's
  * default initial-load behavior). Append-only contract: a dataChange
  * remove inside the range fails the stream rather than silently
  * re-emitting or dropping rows (same default as delta-spark without
  * ignoreChanges).
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

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-delta",
      DeltaLog.forPath(sqlContext.sparkSession, path(parameters)).snapshot.schema)

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toLong).filter(_ > 0))
}

class DeltaStreamSource(
    spark: SparkSession, tablePath: String,
    maxCommitsPerTrigger: Option[Long] = None) extends Source {

  private val log = DeltaLog.forPath(spark, tablePath)

  override val schema: StructType = log.snapshot.schema

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
    val target = (maxCommitsPerTrigger, lastOffered) match {
      case (Some(n), Some(lo)) => math.min(latest, lo + n)
      case (Some(_), None) =>
        val (commits, cps) = log.listLog()
        math.min(latest, (commits ++ cps).min)
      case _ => latest
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
    val batch = start match {
      case None =>
        // initial load: the whole snapshot at the end offset
        snap.read()
      case Some(s) =>
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
