package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel completion counts — the product-analytics staple:
  * how many users performed stage 1, then stage 2 STRICTLY after
  * their earliest stage-1 completion, then stage 3 after that, …
  * ("earliest-completion" semantics: a user advances at the first
  * moment each stage could have been satisfied, the standard greedy
  * funnel that is order-deterministic and join-expressible).
  *
  * Scale shape: stage 1 is one user-keyed aggregation; every later
  * stage is a join + MIN aggregation on the SAME user key, so a
  * pre-partitioned/bucketed events table pays one shuffle total and
  * the per-stage relations shrink monotonically (stage k's build side
  * is only the users still in the funnel). Timestamps compare as
  * epoch-µs int64 — no float, engine-exact.
  */
object Funnel {

  /** Per-stage user counts for `stages` event types: returns
    * (stage, step, n_users), stage 1-based in the given order.
    * `events` needs (userCol, tsUsCol: LONG epoch-µs, typeCol).
    * `maxSpanUs` (optional) is the CONVERSION WINDOW: each stage-k
    * event must land within that many µs after the stage-(k−1)
    * completion, not merely after it — the product-metric variant
    * ("purchased within an hour of viewing"). */
  def funnelCounts(
      events: DataFrame, userCol: String, tsUsCol: String, typeCol: String,
      stages: Seq[String], maxSpanUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    require(maxSpanUs.forall(_ > 0), s"maxSpanUs must be positive: $maxSpanUs")
    // project to exactly the needed columns first: an input that
    // happens to carry a column named __u/__t would otherwise make the
    // post-join references ambiguous
    val ev = events.select(col(userCol).as("__eu"),
      col(tsUsCol).as("__ets"), col(typeCol).as("__etype"))
    val first = ev.where(col("__etype") === stages.head)
      .groupBy(col("__eu").as("__u"))
      .agg(min(col("__ets")).as("__t"))
    val inWindow = maxSpanUs match {
      case Some(w) => col("__ets") > col("__t") && col("__ets") <= col("__t") + w
      case None => col("__ets") > col("__t")
    }
    val perStage = stages.tail.scanLeft(first) { (prev, stage) =>
      ev.where(col("__etype") === stage)
        .join(prev, col("__eu") === col("__u"))
        .where(inWindow)
        .groupBy(col("__u"))
        .agg(min(col("__ets")).as("__t"))
        .select(col("__u"), col("__t"))
    }
    perStage.zip(stages).zipWithIndex.map { case ((df, step), i) =>
      df.agg(lit(i + 1L).as("stage"), lit(step).as("step"),
        count(lit(1)).as("n_users"))
    }.reduce(_ unionByName _)
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
