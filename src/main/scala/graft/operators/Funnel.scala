package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel completion counts — the product-analytics staple:
  * how many users performed stage 1, then stage 2 STRICTLY after
  * SOME stage-1 event, then stage 3 after that, … A user completes
  * stage k iff there EXISTS a chain e₁ < e₂ < … < e_k of events of
  * the stage types (existential semantics — with a conversion window
  * this is strictly stronger than the greedy earliest-anchor funnel,
  * which undercounts users whose converting chain hangs off a LATER
  * occurrence of an earlier stage).
  *
  * Computed as a per-event feasibility DP over each user's timeline:
  * an event at time t is stage-k-feasible iff the latest
  * stage-(k−1)-feasible time s < t also satisfies s ≥ t − window
  * (no window ⇒ any s < t). One carry-forward window pass per stage.
  *
  * Scale shape: ONE scan of events (pruned to the stage types), ONE
  * user-keyed shuffle; all k window passes and the per-user rollup
  * share that partitioning, so a user-bucketed events table pays no
  * shuffle at all. Timestamps compare as epoch-µs int64 — no float,
  * engine-exact.
  */
object Funnel {

  /** Per-stage user counts for `stages` event types: returns
    * (stage, step, n_users), stage 1-based in the given order.
    * `events` needs (userCol, tsUsCol: LONG epoch-µs, typeCol).
    * `maxSpanUs` (optional) is the CONVERSION WINDOW: each stage-k
    * event must land within that many µs after SOME feasible
    * stage-(k−1) event, not merely after it — the product-metric
    * variant ("purchased within an hour of viewing"). */
  def funnelCounts(
      events: DataFrame, userCol: String, tsUsCol: String, typeCol: String,
      stages: Seq[String], maxSpanUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    require(maxSpanUs.forall(_ > 0), s"maxSpanUs must be positive: $maxSpanUs")
    // project to exactly the needed columns first (an input carrying a
    // __-prefixed name would make later references ambiguous), and
    // prune the timeline to the stage types — other events can never
    // advance or block the funnel
    val ev = events.select(col(userCol).as("__eu"),
      col(tsUsCol).as("__ets"), col(typeCol).as("__etype"))
      .where(col("__etype").isin(stages: _*))
    // RANGE … AND -1: strictly-earlier events only, exact under ties
    val prevFrame = Window.partitionBy("__eu").orderBy("__ets")
      .rangeBetween(Window.unboundedPreceding, -1)
    val withFeasible = stages.zipWithIndex.tail.foldLeft(
      ev.withColumn("__f1",
        when(col("__etype") === stages.head, col("__ets")))) {
      case (df, (stage, i)) =>
        val m = max(col(s"__f$i")).over(prevFrame)
        val reachable = maxSpanUs match {
          case Some(w) => m >= col("__ets") - w
          case None => m.isNotNull
        }
        df.withColumn(s"__f${i + 1}",
          when(col("__etype") === stage && reachable, col("__ets")))
    }
    // one user rollup (same key as the window — no extra shuffle),
    // then one scalar aggregation per stage over the tiny per-user
    // completion relation
    val hCols = stages.indices.map(i =>
      max(col(s"__f${i + 1}").isNotNull.cast("long")).as(s"__h${i + 1}"))
    val perUser = withFeasible.groupBy("__eu").agg(hCols.head, hCols.tail: _*)
    stages.zipWithIndex.map { case (step, i) =>
      perUser.agg(lit(i + 1L).as("stage"), lit(step).as("step"),
        coalesce(sum(col(s"__h${i + 1}")), lit(0L)).as("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Top-k session paths — the "what do users do" product query: events
    * sessionize on a `gapUs` inactivity gap, each session renders as
    * its ordered event-type sequence ("view>click>purchase"), and the
    * most common sequences are counted. Tie-safe: events sharing a
    * timestamp order by event type, so the path string is the same on
    * any engine; same-ts events always land in the same session
    * regardless of engine ordering (a boundary can only sit between
    * DISTINCT timestamps).
    *
    * Scale shape: one user-keyed shuffle drives the session windows
    * AND the per-session rollup; the path-frequency aggregation runs
    * on the session relation (≪ events) with map-side combine, and
    * top-k is a TakeOrdered, not a global sort.
    * Returns (path, n_sessions). */
  def sessionPaths(
      events: DataFrame, userCol: String, tsUsCol: String, typeCol: String,
      gapUs: Long = 1800000000L, topK: Int = 25): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    require(topK > 0, s"topK must be positive, got $topK")
    val ev = events.select(col(userCol).as("__u"),
      col(tsUsCol).as("__t"), col(typeCol).as("__et"))
    val byUser = Window.partitionBy("__u").orderBy("__t", "__et")
    val sess = ev
      .withColumn("__new",
        when(lag(col("__t"), 1).over(byUser).isNull ||
          col("__t") - lag(col("__t"), 1).over(byUser) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__s", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy("__u", "__s")
      .agg(concat_ws(">", expr(
        "transform(array_sort(collect_list(struct(__t, __et))), x -> x.__et)"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Recency-weighted engagement in FIXED POINT: each event weighs
    * 2^(horizonDays − age) where age = (max ts − ts) DIV day — an
    * exponential half-life-one-day decay scaled by 2^horizonDays so
    * every weight is an exact integer power of two (events older than
    * the horizon weigh 0). The per-user sum is pure int64 — order-free
    * and engine-exact, unlike a float exp() decay. Ceiling: the total
    * is < n_events·2^horizonDays, so horizon 30 holds ~2^33 events per
    * user. One scalar max + one map-only pass + one user aggregation.
    * Returns (user, score, n_events_in_horizon). */
  def decayedEngagement(
      events: DataFrame, userCol: String, tsUsCol: String,
      horizonDays: Int = 30, dayUs: Long = 86400000000L): DataFrame = {
    require(horizonDays >= 0 && horizonDays <= 60,
      s"horizonDays must be in [0, 60], got $horizonDays")
    val ev = events.select(col(userCol).as("__u"), col(tsUsCol).as("__t"))
    val maxTs = ev.agg(max(col("__t")).as("__mx"))
    ev.crossJoin(broadcast(maxTs))
      .withColumn("__age", expr("(__mx - __t) DIV " + dayUs + "L"))
      .where(col("__age") <= horizonDays)
      .withColumn("__w",
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($horizonDays - __age AS INT))"))
      .groupBy(col("__u").as("user"))
      .agg(sum(col("__w")).as("score"),
        count(lit(1)).as("n_events_in_horizon"))
  }

  /** Retention cohorts: users cohorted by the day of their first
    * `cohortType` event; for each (cohort day, offset k ≤ maxOffset)
    * the count of cohort users with ANY event k days later. Day =
    * epoch-µs integer division (exact, engine-portable). The
    * (user, day) activity relation is DISTINCT first, so the final
    * count needs no countDistinct — each user contributes at most one
    * row per (cohort, k). Two user-keyed aggregations + one user-keyed
    * join: a table bucketed by user pays one shuffle total.
    * Returns (cohort_day, k, n_users). */
  def retentionCohorts(
      events: DataFrame, userCol: String, tsUsCol: String, typeCol: String,
      cohortType: String, maxOffset: Int = 7,
      dayUs: Long = 86400000000L): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    // int64 DIV, not a double division: epoch-µs values near 2^53
    // would lose bits through a DOUBLE intermediate
    val cohorts = events.where(col(typeCol) === cohortType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsUsCol)).as("__mt"))
      .select(col("__u"), expr(s"__mt DIV ${dayUs}L").as("cohort_day"))
    val activity = events
      .select(col(userCol).as("__u"),
        expr(s"$tsUsCol DIV ${dayUs}L").as("__d"))
      .distinct()
    activity.join(cohorts, "__u")
      .select(col("cohort_day"), (col("__d") - col("cohort_day")).as("k"))
      .where(col("k") >= 0 && col("k") <= maxOffset)
      .groupBy("cohort_day", "k")
      .agg(count(lit(1)).as("n_users"))
  }
}
