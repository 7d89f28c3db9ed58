package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming counterparts of the batch operators: the same
  * declarative transforms applied to an unbounded `readStream` frame.
  * The reference has no streaming surface (SURVEY.md §2c) — these are
  * part of the training-pipeline extension: continuous ingestion dedup
  * and windowed quality monitoring.
  */
object StreamingOps {

  /** Exact streaming dedup on a fingerprint column: state-backed
    * `dropDuplicates` scoped by watermark so state is bounded (late
    * duplicates beyond the watermark are the at-least-once tradeoff). */
  def streamingExactDedup(
      stream: DataFrame, tsCol: String, fingerprintCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicates(fingerprintCol, tsCol)

  /** EXACT continuous-ingestion dedup of a document STREAM against a
    * STATIC prior corpus — the streaming face of
    * [[graft.operators.Dedup.dedupAgainstCorpus]]. A bloom filter over
    * the prior's content hashes (built ONCE at stream setup, shipped as
    * a literal in the plan) splits each micro-batch map-only:
    * bloom-negative rows are definitely novel and bypass the join
    * entirely; only bloom-positive candidates (true dups + ~fpp) run
    * the stream-static anti-join against the prior hash set, which
    * removes the false positives — exact output, stateless operators,
    * no watermark needed. Intra-stream duplicates are NOT collapsed
    * (chain [[streamingExactDedup]]). */
  def streamDedupAgainstCorpus(
      stream: DataFrame, prior: DataFrame, textCol: String,
      expectedPriorItems: Long = 0L): DataFrame = {
    import org.apache.spark.sql.graftshims.SqlShims
    val h = xxhash64(col(textCol))
    val priorItems =
      if (expectedPriorItems > 0) expectedPriorItems
      else math.max(64L, prior.count())
    val priorBloom = prior
      .select(SqlShims.bloomFilterAgg(h, priorItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (priorBloom == null) return stream // empty prior: all novel
    val clean = stream.where(!SqlShims.mightContain(priorBloom, h))
    val priorHashes = prior.select(md5(col(textCol)).as("__graft_prior_h")).distinct()
    val survivors = stream.where(SqlShims.mightContain(priorBloom, h))
      .join(priorHashes, md5(col(textCol)) === col("__graft_prior_h"), "left_anti")
    clean.unionByName(survivors)
  }

  /** One user's open session while the stream runs. */
  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

  /** A closed session emitted downstream. */
  final case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

  /** Streaming sessionization with custom state: the streaming
    * counterpart of the batch `q_sessionize` gap-window query.
    * `flatMapGroupsWithState` keeps one [[SessionState]] per user;
    * a session closes (and is emitted) when the gap exceeds
    * `gapUs` within a batch or the event-time timeout fires after the
    * watermark passes `lastUs + gapUs`. State is bounded: one small
    * struct per ACTIVE user, expired by timeout — the shape that
    * survives an unbounded user population. Input: (user_id, ts,
    * event_us) where `ts` is the watermark column. */
  def streamingSessionize(
      events: Dataset[(Long, java.sql.Timestamp, Long)],
      gapUs: Long = 30L * 60 * 1000 * 1000,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.toDF("user_id", "ts", "event_us")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.startUs, s.lastUs, s.nEvents))
          } else {
            val sorted = rows.map(_._3).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { us =>
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  // allowed-late events (earlier micro-batch boundary) must
                  // widen, never regress, the session bounds
                  cur = Some(s.copy(
                    startUs = math.min(s.startUs, us),
                    lastUs = math.max(s.lastUs, us),
                    nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.startUs, s.lastUs, s.nEvents)
                  cur = Some(SessionState(us, us, 1L))
                case None =>
                  cur = Some(SessionState(us, us, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via timeout once the watermark passes the gap end
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Exactly-once streaming sink into a graft Delta table: each
    * micro-batch appends under a `txn` (appId, batchId) action, so a
    * replayed batch (restart between commit and checkpoint advance) is
    * detected from the snapshot's SetTransaction state and skipped —
    * the idempotent-writer contract the Delta spec defines for
    * streaming. One Delta commit per micro-batch. */
  def deltaAppendSink(
      stream: DataFrame,
      log: graft.delta.DeltaLog,
      appId: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.delta.TransactionWriter.appendWithTxn(log, batch, appId, batchId)
        ()
      }
      .start()

  /** Apply one change-data-feed batch onto a target table (the unit of
    * [[deltaCdcApplySink]], also usable for batch backfills): reduce
    * the batch to the NEWEST change per key (`update_preimage` rows
    * dropped, `_commit_version` orders — the CDF contract emits at most
    * one effective change per key per commit), then MERGE — delete
    * rows delete, everything else upserts. Returns the target version.
    *
    * Restart contract: when `appId` is set, a batch at or below the
    * recorded txn version is skipped; the marker is recorded AFTER the
    * merge commit, and a crash between the two re-applies the same
    * reduced batch — idempotent by key (same terminal state), so the
    * target converges exactly-once even though work may repeat. */
  def applyCdcBatch(
      target: graft.delta.DeltaLog,
      batch: DataFrame,
      keyCols: Seq[String],
      appId: Option[String] = None,
      batchId: Long = -1L): Long = {
    require(keyCols.nonEmpty, "applyCdcBatch needs at least one key column")
    val snap = target.snapshot
    val applied = appId.exists(a =>
      snap.setTransactions.get(a).exists(_.version >= batchId))
    if (applied) return snap.version
    val dataCols = snap.schema.fieldNames.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(desc("_commit_version"))
    val reduced = batch
      .where(col("_change_type") =!= "update_preimage")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val cond = keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val sets = dataCols.map(c => c -> col(s"s.$c")).toMap
    val notDelete = col("s._change_type") =!= "delete"
    val v = graft.delta.Merge.into(target, reduced, cond)
      .whenMatchedDelete(Some(col("s._change_type") === "delete"))
      .whenMatchedUpdate(sets, Some(notDelete))
      .whenNotMatchedInsert(sets, Some(notDelete))
      .execute()
    appId.foreach(a =>
      graft.delta.TransactionWriter.recordTxn(target, a, batchId))
    v
  }

  /** Continuously APPLY a change-data-feed stream onto a target table —
    * the streaming-CDC materialization pattern (DLT `apply_changes` /
    * "merge into" foreachBatch idiom): each micro-batch of CDF rows is
    * reduced per key and MERGEd into the target via [[applyCdcBatch]].
    * Pair with the Delta source's `readChangeFeed` option to replicate
    * one table's mutations into another incrementally. */
  def deltaCdcApplySink(
      changes: DataFrame,
      target: graft.delta.DeltaLog,
      keyCols: Seq[String],
      appId: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCdcBatch(target, batch, keyCols, Some(appId), batchId)
        ()
      }
      .start()

  /** Continuously-maintained materialized rollup: each micro-batch of
    * CDF rows (from the Delta source's `readChangeFeed`) reduces to a
    * signed per-key delta and MERGEs into the rollup Delta table —
    * the streaming face of [[graft.operators.IncrementalAgg]], keeping
    * a 100 TB table's aggregate fresh for O(changes per trigger) +
    * O(changed keys) merge work. A txn (appId, batchId) marker makes
    * replayed batches no-ops, so the rollup converges exactly-once
    * across restarts. */
  def incrementalAggSink(
      changes: DataFrame,
      aggLog: graft.delta.DeltaLog,
      keyCols: Seq[String],
      valueCol: String,
      countCol: String,
      sumCol: String,
      appId: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = aggLog.snapshot.setTransactions
          .get(appId).exists(_.version >= batchId)
        if (!applied) {
          val delta = graft.operators.IncrementalAgg
            .aggDelta(batch, keyCols, valueCol)
          // The (appId, batchId) marker rides INSIDE the merge commit:
          // a signed-delta fold is additive, not idempotent, so a
          // separate marker commit would leave a crash window in which
          // a restart re-applies the already-committed batch.
          graft.operators.IncrementalAgg.mergeDelta(
            aggLog, delta, keyCols, countCol, sumCol,
            txn = Some((appId, batchId)))
        }
        ()
      }
      .start()

  /** CONTINUOUS materialized-view maintenance: each micro-batch of the
    * source's change feed triggers [[graft.delta.MatView.refresh]] on
    * the persisted view — the streaming face of GRAFT CREATE MATVIEW,
    * covering EVERY view definition (a lone SUM folds signed deltas;
    * MIN/MAX re-derive changed keys), unlike [[incrementalAggSink]]
    * whose inline fold is SUM-only.
    *
    * The batch ROWS are deliberately ignored: refresh() reads its own
    * CDF window from the view's watermark, so the stream contributes
    * triggering and backpressure while correctness rests on the view's
    * own machinery — the (instance, sourceVersion) txn marker inside
    * each refresh merge makes replayed/overlapping triggers no-ops and
    * concurrent refreshers mutually exclusive, so the sink is
    * exactly-once by construction even across checkpoint loss (a
    * stronger restart contract than batchId-keyed sinks). */
  def matviewRefreshSink(
      spark: org.apache.spark.sql.SparkSession,
      sourceChanges: DataFrame,
      viewPath: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery =
    sourceChanges.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        // A concurrent refresher (another stream, a manual GRAFT
        // REFRESH) losing the same-window txn race is BY DESIGN a safe
        // no-op to retry — the next trigger re-reads from the advanced
        // watermark. Propagating it would permanently fail the
        // streaming query over a benign collision.
        try graft.delta.MatView.refresh(spark, viewPath)
        catch {
          case e: java.util.ConcurrentModificationException =>
            println(s"graft matview refresh sink: batch $batchId lost a " +
              s"concurrent-refresh race on $viewPath, skipping (${e.getMessage})")
        }
        ()
      }
      .start()

  /** Watermarked stream-stream INNER interval join: left rows match
    * right rows with the same key whose event time falls in
    * `[leftTs, leftTs + maxSpan]`. Both sides carry a watermark and the
    * join condition bounds the time range in BOTH directions, so Spark
    * derives state-eviction watermarks for each side — buffered state
    * is O(rows inside the watermark+span window), not O(stream). The
    * columns of the two inputs must be disjoint (rename before calling,
    * as with any self-join). */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTsCol: String, rightTsCol: String,
      maxSpan: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTsCol) >= col(leftTsCol) &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $maxSpan"))
  }

  /** Stream-static enrichment join: each micro-batch of the stream
    * joins a bounded dimension frame that is explicitly BROADCAST, so
    * the stream side never shuffles — the classic "enrich events with
    * the dimension table" pattern. The dim is re-planned per batch
    * (Structured Streaming re-executes the static side), which is what
    * makes slowly-changing dims pick up updates between batches; for a
    * 100 TB/day stream the only requirement is that the dim stays
    * broadcast-sized, exactly as in the batch join. Inner join by
    * default: unmatched events drop (use "left_outer" to keep them). */
  def enrichWithDim(
      stream: DataFrame, dim: DataFrame,
      joinExpr: org.apache.spark.sql.Column,
      joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), joinExpr, joinType)

  /** Tumbling-window per-type event counts with late-data handling. */
  def windowedEventCounts(
      stream: DataFrame, tsCol: String, typeCol: String,
      windowLen: String = "1 minute", watermark: String = "5 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n_events"))
}
