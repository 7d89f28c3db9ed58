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
    * `events` needs (userCol, tsUsCol: LONG epoch-µs, typeCol). */
  def funnelCounts(
      events: DataFrame, userCol: String, tsUsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got $stages")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsUsCol)).as("__t"))
    val perStage = stages.tail.scanLeft(first) { (prev, stage) =>
      events.where(col(typeCol) === stage)
        .join(prev, col(userCol) === col("__u"))
        .where(col(tsUsCol) > col("__t"))
        .groupBy(col("__u"))
        .agg(min(col(tsUsCol)).as("__t"))
        .select(col("__u"), col("__t"))
    }
    perStage.zip(stages).zipWithIndex.map { case ((df, step), i) =>
      df.agg(lit(i + 1L).as("stage"), lit(step).as("step"),
        count(lit(1)).as("n_users"))
    }.reduce(_ unionByName _)
  }
}
