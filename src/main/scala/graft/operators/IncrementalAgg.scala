package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over a change feed —
  * the pattern that keeps a 100 TB table's rollups fresh for the cost
  * of the CHANGES, not the table: recompute the base aggregate once
  * (or read it from the last maintenance run), then fold each change
  * batch's signed per-key delta into it. `count` and `sum` are
  * self-inverse under insert/delete signing, so a delete retracts
  * exactly what its insert contributed and update pre/post-image pairs
  * cancel to the net effect; the same shape extends to any
  * commutative-group aggregate.
  *
  * Scale shape: the delta aggregation shuffles only the change slice
  * (bounded by write volume between maintenance runs); the merge joins
  * two aggregate relations, both bounded by key cardinality. Nothing
  * rescans the table.
  */
object IncrementalAgg {

  /** Per-key signed (row-count, sum-of-`valueCol`) delta of a
    * change-feed slice (columns: table schema + `_change_type` as
    * produced by `ChangeDataFeed.tableChanges`). Inserts and update
    * post-images count +1, deletes and update pre-images -1. */
  def aggDelta(
      changes: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(lit(0L))
    changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("__d_n"),
        sum(sign * col(valueCol)).as("__d_sum"))
  }

  /** [[aggDelta]] plus a signed NON-NULL-VALUE count (`__d_sc`) — the
    * delta for rollups that maintain a hidden per-SUM non-null count
    * so full retraction folds back to NULL exactly like a direct SUM
    * (see [[mergeDeltaMulti]]'s `sumNnCols`). */
  def aggDeltaExact(
      changes: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(lit(0L))
    changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("__d_n"),
        sum(sign * col(valueCol)).as("__d_sum"),
        sum(sign * when(col(valueCol).isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("__d_sc"))
  }

  /** MERGE a signed delta into a rollup stored as a Delta table —
    * the persistent form of [[applyDelta]], O(changed keys) per fold:
    * matched keys update in place (and drop when their count reaches
    * zero), new keys insert. The target must exist with schema
    * `(keys..., countCol, sumCol)`; seed it with an empty or initial
    * rollup. A signed-delta fold is NOT idempotent, so replay
    * protection must be atomic with the data: pass `txn` to ride the
    * (appId, batchId) marker inside the merge commit itself (see
    * `StreamingOps.incrementalAggSink`) — a separate marker commit
    * would leave a crash window that double-applies the batch. */
  def mergeDelta(
      aggLog: graft.delta.DeltaLog, delta: DataFrame, keyCols: Seq[String],
      countCol: String, sumCol: String,
      txn: Option[(String, Long)] = None,
      domains: Seq[(String, String)] = Nil): Long =
    mergeDeltaMulti(aggLog, delta, keyCols, countCol,
      Seq(sumCol -> "__d_sum"), txn, domains)

  /** [[mergeDelta]] for ANY number of maintained sums: `sumCols` maps
    * each rollup column to its signed-delta column in `delta`.
    * `domains` optionally rides domain-metadata writes (e.g. the
    * refresh watermark) INSIDE the merge commit — atomic with the fold
    * and conflict-checked against concurrent refreshers
    * ([[graft.delta.Merge.withDomain]]), which subsumes the txn
    * marker's crash-repair role when the watermark travels with the
    * data.
    *
    * `avgCols` maintains DERIVED average columns: each
    * `(avgCol, sumHelperCol, countHelperCol)` names a visible average
    * plus its hidden running (sum, non-null count) pair — the pair
    * itself folds through `sumCols` as usual, and the average is
    * recomputed from the pair's POST-fold values inside the same
    * merge (NULL when the non-null count reaches zero, matching a
    * direct AVG over an all-null group).
    *
    * `sumNnCols` maps a VISIBLE sum column to a hidden non-null-value
    * count column (itself folded through `sumCols`, zero-identity like
    * the AVG pair): the visible sum is then derived EXACTLY — NULL
    * whenever the non-null count is zero, the zero-identity fold
    * otherwise. This closes the pair-less signed fold's one residue
    * (retracting the last non-null row of a mixed group left 0 where
    * a direct SUM reports NULL) at the cost of one long column. Sums
    * WITHOUT an entry keep the legacy NULL-as-identity fold. */
  def mergeDeltaMulti(
      aggLog: graft.delta.DeltaLog, delta: DataFrame, keyCols: Seq[String],
      countCol: String, sumCols: Seq[(String, String)],
      txn: Option[(String, Long)] = None,
      domains: Seq[(String, String)] = Nil,
      avgCols: Seq[(String, String, String)] = Nil,
      sumNnCols: Seq[(String, String)] = Nil): Long = {
    val cond = keyCols.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val newCount = col(s"t.$countCol") + col(s"s.__d_n")
    val sumDelta = sumCols.toMap
    val nnOf = sumNnCols.toMap
    // hidden avg helper pairs carry ZERO (not NULL) through an all-null
    // slice: the visible average derives from the pair, so mirroring
    // SUM's null semantics would only poison it — a key whose FIRST
    // slice is all-null would store a NULL running sum and every later
    // fold (t + coalesce(delta, 0)) would stay NULL forever, freezing
    // avg at NULL after non-null rows arrive.
    //
    // VISIBLE sums fold with NULL as the IDENTITY element, not the
    // absorbing one — so a key born from an all-null slice stores NULL
    // (matching a direct SUM) and heals to the true sum when values
    // arrive (t+coalesce alone would freeze it at NULL forever).
    // Known residue, inherent to pair-less invertible SUM: RETRACTING
    // the last non-null row of a mixed group leaves 0 where a direct
    // SUM over the remaining all-null rows is NULL — detecting that
    // needs a per-sum non-null count (the AVG hidden pair keeps one;
    // plain SUM views deliberately do not pay that column).
    val hiddenPair = avgCols.flatMap { case (_, sc, cc) => Seq(sc, cc) }.toSet ++
      sumNnCols.map(_._2)
    def folded(vc: String): org.apache.spark.sql.Column = {
      val t = col(s"t.$vc")
      val d = col(s"s.${sumDelta(vc)}")
      if (hiddenPair(vc)) coalesce(t, lit(0L)) + coalesce(d, lit(0L))
      else nnOf.get(vc) match {
        // nn-tracked sum: EXACT recompute semantics from the hidden
        // count — NULL when no non-null value remains in the group
        // (including the full-retraction case the identity fold
        // cannot see), the plain zero-identity fold otherwise
        case Some(nn) => when(folded(nn) > 0,
          coalesce(t, lit(0L)) + coalesce(d, lit(0L))).otherwise(lit(null))
        case None => when(t.isNull && d.isNull, d)
          .otherwise(coalesce(t, lit(0L)) + coalesce(d, lit(0L)))
      }
    }
    val avgUpdates = avgCols.map { case (ac, sc, cc) =>
      ac -> when(folded(cc) > 0,
        folded(sc).cast("double") / folded(cc)).otherwise(lit(null)) }
    val avgInserts = avgCols.map { case (ac, sc, cc) =>
      ac -> when(coalesce(col(s"s.${sumDelta(cc)}"), lit(0L)) > 0,
        col(s"s.${sumDelta(sc)}").cast("double") /
          col(s"s.${sumDelta(cc)}")).otherwise(lit(null)) }
    // the delta is one row per key BY CONTRACT (a groupBy output), so
    // the merge skips its multi-match guard pass (withUniqueSource)
    val m0 = graft.delta.Merge.into(aggLog, delta, cond).withUniqueSource()
    val m1 = txn.fold(m0) { case (a, v) => m0.withTxn(a, v) }
    domains.foldLeft(m1) { case (m, (d, c)) => m.withDomain(d, c) }
      .whenMatchedDelete(Some(newCount <= 0))
      .whenMatchedUpdate(
        // a slice whose values for some sum are ALL NULL aggregates a
        // NULL delta (sum skips nulls) — that must leave the running
        // sum alone, not null it out
        (Seq(countCol -> newCount) ++ sumCols.map { case (vc, _) =>
          vc -> folded(vc) } ++ avgUpdates).toMap,
        Some(newCount > 0))
      .whenNotMatchedInsert(
        (keyCols.map(k => k -> col(s"s.$k")) ++
          Seq(countCol -> col(s"s.__d_n")) ++
          sumCols.map { case (vc, dc) => vc ->
            (if (hiddenPair(vc)) coalesce(col(s"s.$dc"), lit(0L))
             else nnOf.get(vc) match {
               // a freshly inserted key can still carry a zero non-null
               // count with a NON-null sum delta (same-slice insert +
               // delete cancel to 0 while a null-valued insert
               // survives) — the hidden count, not the delta's
               // nullness, decides
               case Some(nn) => when(
                 coalesce(col(s"s.${sumDelta(nn)}"), lit(0L)) > 0,
                 coalesce(col(s"s.$dc"), lit(0L))).otherwise(lit(null))
               case None => col(s"s.$dc")
             }) } ++
          avgInserts).toMap,
        Some(col("s.__d_n") > 0))
      .execute()
  }

  /** Fold a signed delta into a base aggregate `(keys..., countCol,
    * sumCol)`: full-outer join on the keys (new keys appear, retracted
    * keys leave when their count reaches zero). */
  def applyDelta(
      base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      countCol: String, sumCol: String): DataFrame =
    base.join(delta, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countCol), lit(0L)) +
          coalesce(col("__d_n"), lit(0L))).as(countCol),
        // NULL as identity, matching mergeDeltaMulti: the sum is NULL
        // only when both the running value and the delta are (an
        // all-null group), never poisoned by a null-born key
        when(col(sumCol).isNull && col("__d_sum").isNull, col("__d_sum"))
          .otherwise(coalesce(col(sumCol), lit(0L)) +
            coalesce(col("__d_sum"), lit(0L))).as(sumCol)): _*)
      .where(col(countCol) > 0)

  /** Delta-key RECOMPUTE — incremental maintenance for aggregates with
    * no inverse (MIN/MAX, countDistinct, percentiles): a deleted row
    * cannot be retracted from a running MIN, so the keys the change
    * slice touches are re-aggregated FROM THE SOURCE and swapped into
    * the rollup wholesale. Still O(rows of changed keys), never a
    * table rescan: the source pass is a semi-join against the (small)
    * changed-key set — at 100 TB a rollup key that's also the table's
    * partition/cluster key makes that pass partition-pruned.
    *
    * `aggs` are ordinary aggregate Columns (already aliased); keys
    * that vanish from the source drop from the rollup (the semi-join
    * yields no row). Returns the maintained rollup. */
  def rederiveKeys(
      base: DataFrame, source: DataFrame, changes: DataFrame,
      keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    // null-safe (<=>) key equality throughout: groupBy keeps a NULL-key
    // group, so a change touching it must both re-derive it (semi) and
    // evict the stale base row (anti) — plain = matches neither
    val changedKeys = changes.select(
      keyCols.map(k => col(k).as(s"__ck_$k")): _*).distinct()
    val on = keyCols.map(k => col(k) <=> col(s"__ck_$k")).reduce(_ && _)
    val recomputed = source
      .join(changedKeys, on, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    base.join(changedKeys, on, "left_anti")
      .unionByName(recomputed)
  }

  /** Persisted form of [[rederiveKeys]]: MERGE the re-aggregated
    * changed keys into a rollup Delta table whose schema is
    * `(keys..., countCol, agg columns...)`. One row per changed key is
    * merged — keys still present in the source update in place (or
    * insert), keys that vanished carry a NULL count and delete their
    * rollup row. Unlike the signed fold this is idempotent (it
    * recomputes FROM the source), but the `txn` marker still rides
    * inside the merge commit so replay protection and concurrent-
    * refresh conflict detection (same appId ⇒ rebase abort) work the
    * same way as [[mergeDelta]].
    *
    * Scale shape: the source pass is semi-join-pruned to the changed
    * keys; merge work is O(changed keys). Never a rollup rebuild. */
  def rederiveMerge(
      viewLog: graft.delta.DeltaLog, source: DataFrame, changes: DataFrame,
      keyCols: Seq[String], countCol: String, aggs: Seq[Column],
      txn: Option[(String, Long)] = None,
      domains: Seq[(String, String)] = Nil): Long = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val changedKeys = changes.select(
      keyCols.map(k => col(k).as(s"__ck_$k")): _*).distinct()
    val on = keyCols.map(k => col(k) <=> col(s"__ck_$k")).reduce(_ && _)
    val recomputed = source
      .join(changedKeys, on, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(countCol), aggs: _*)
    val outCols = recomputed.columns.filterNot(keyCols.contains).toSeq
    // one merge-source row per changed key; a key with no surviving
    // source rows left-joins to NULLs (countCol is NULL ⇔ vanished)
    val mergeSrc = changedKeys.join(recomputed, on, "left")
      .select(keyCols.map(k => col(s"__ck_$k").as(k)) ++
        outCols.map(col): _*)
    val cond = keyCols.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    // one merge-source row per changed key by construction (distinct
    // keys left-joined to a grouped recompute) — guard pass skipped
    val m0 = graft.delta.Merge.into(viewLog, mergeSrc, cond).withUniqueSource()
    val m = txn.fold(m0) { case (a, v) => m0.withTxn(a, v) }
    domains.foldLeft(m) { case (mm, (d, c)) => mm.withDomain(d, c) }
      .whenMatchedDelete(Some(col(s"s.$countCol").isNull))
      .whenMatchedUpdate(
        outCols.map(c => c -> col(s"s.$c")).toMap,
        Some(col(s"s.$countCol").isNotNull))
      .whenNotMatchedInsert(
        (keyCols ++ outCols).map(c => c -> col(s"s.$c")).toMap,
        Some(col(s"s.$countCol").isNotNull))
      .execute()
  }
}
