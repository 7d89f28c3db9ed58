package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted incremental MATERIALIZED VIEWS: a rollup Delta table that
  * knows its source, definition, and refresh watermark, and refreshes
  * for the cost of the source's CHANGES (the productized form of
  * [[graft.operators.IncrementalAgg]] — what DLT calls a materialized
  * view and delta-spark leaves to the orchestrator).
  *
  * Where state lives — all of it in the VIEW table, so definition,
  * data, and watermark travel together and survive any session:
  *  - definition: `graft.matview.*` keys in the view's metadata
  *    configuration (source path, key columns, value column);
  *  - watermark: the `graft.matview.state` metadata domain holds the
  *    last folded source version;
  *  - replay protection: each refresh MERGE carries a
  *    (`graft.matview`, sourceVersion) txn marker INSIDE the merge
  *    commit, so a refresh that crashed between its merge and its
  *    watermark commit re-runs as a no-op instead of double-counting
  *    (the watermark is then repaired).
  *
  * Scale shape per refresh: one CDF read bounded by the change window,
  * one signed per-key aggregation of that slice, one MERGE keyed on
  * the rollup keys — O(changes + changed keys), never a source rescan.
  */
object MatView {

  private[delta] val StateDomain = "graft.matview.state"
  private val TxnApp = "graft.matview"

  /** Create the view: full initial rollup of the source at its current
    * version, definition + watermark persisted on the view table.
    * The source must have CDF enabled (refresh reads its change feed).
    * Returns the source version the view is consistent with. */
  def create(spark: SparkSession, viewPath: String, sourcePath: String,
      keyCols: Seq[String], valueCol: String): Long = {
    require(keyCols.nonEmpty, "matview needs at least one key column")
    val src = DeltaLog.forPath(spark, sourcePath)
    val srcSnap = src.snapshot
    require(ChangeDataFeed.enabled(srcSnap),
      s"source $sourcePath must have change data feed enabled")
    val v = srcSnap.version
    val base = srcSnap.read()
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"))
    val viewLog = DeltaLog.forPath(spark, viewPath)
    // the txn appId is scoped to THIS incarnation of the view: Delta
    // replay preserves SetTransaction markers across an overwrite, so
    // a re-created view at the same path would otherwise inherit the
    // old incarnation's marker and skip folding real changes
    TransactionWriter.overwrite(viewLog, base,
      configuration = Map(
        "graft.matview.source" -> sourcePath,
        "graft.matview.keyCols" -> keyCols.mkString(","),
        "graft.matview.valueCol" -> valueCol,
        "graft.matview.instance" -> java.util.UUID.randomUUID().toString))
    Domains.set(DeltaLog.forPath(spark, viewPath), StateDomain,
      s"""{"sourceVersion":$v}""")
    v
  }

  /** The view's definition + watermark: (source path, key columns,
    * value column, last folded source version). */
  def describe(spark: SparkSession,
      viewPath: String): (String, Seq[String], String, Long) = {
    val snap = DeltaLog.forPath(spark, viewPath).snapshot
    val conf = snap.metadata.configuration
    val src = conf.getOrElse("graft.matview.source",
      throw new IllegalArgumentException(s"$viewPath is not a matview"))
    val wm = Domains.get(snap, StateDomain)
      .map(s => JsonUtil.mapper.readTree(s).path("sourceVersion").asLong())
      .getOrElse(-1L)
    (src, conf("graft.matview.keyCols").split(",").toSeq,
      conf("graft.matview.valueCol"), wm)
  }

  /** Incremental refresh: fold the source's change feed since the
    * watermark into the view (signed per-key delta + MERGE), then
    * advance the watermark. Idempotent under replay. Returns the new
    * watermark (source version). */
  def refresh(spark: SparkSession, viewPath: String): Long = {
    val viewLog = DeltaLog.forPath(spark, viewPath)
    val snap = viewLog.snapshot
    val conf = snap.metadata.configuration
    val sourcePath = conf.getOrElse("graft.matview.source",
      throw new IllegalArgumentException(s"$viewPath is not a matview"))
    val keyCols = conf("graft.matview.keyCols").split(",").toSeq
    val valueCol = conf("graft.matview.valueCol")
    val txnApp = conf.get("graft.matview.instance")
      .map(i => s"$TxnApp|$i").getOrElse(TxnApp)
    val last = Domains.get(snap, StateDomain)
      .map(s => JsonUtil.mapper.readTree(s).path("sourceVersion").asLong())
      .getOrElse(throw new IllegalStateException(
        s"matview $viewPath has no ${StateDomain} domain"))
    val src = DeltaLog.forPath(spark, sourcePath)
    val cur = src.latestVersion()
    // Crash repair: the view's txn marker records the last MERGED
    // source version, riding INSIDE the merge commit — the watermark
    // domain is committed after. A refresh that died in between leaves
    // marker > watermark; folding from the stale watermark would
    // double-count the already-merged window, so the fold always
    // starts from max(watermark, marker), and the merge is skipped
    // entirely when even that is current (pure watermark repair).
    val merged = snap.setTransactions
      .get(txnApp).map(_.version).getOrElse(Long.MinValue)
    val effLast = math.max(last, merged)
    if (cur > effLast) {
      val delta = graft.operators.IncrementalAgg.aggDelta(
        ChangeDataFeed.tableChanges(src, effLast + 1, Some(cur)),
        keyCols, valueCol)
      graft.operators.IncrementalAgg.mergeDelta(
        viewLog, delta, keyCols, "n_rows", "sum_value",
        txn = Some((txnApp, cur)))
    }
    val wm = math.max(cur, effLast)
    if (wm != last)
      Domains.set(DeltaLog.forPath(spark, viewPath), StateDomain,
        s"""{"sourceVersion":$wm}""")
    wm
  }
}
