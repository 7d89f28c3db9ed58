package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist a stage consumed by multiple branches of one plan, with a
  * one-shot listener that unpersists it after the first completed
  * action on the session — the operator-layer cache idiom for
  * two-consumer shapes (two-phase prefix sums, rank+census exports),
  * shared so the subtle async-bus handling lives in ONE place. */
object CacheHygiene {

  /** Persist `df` and register a one-shot listener that unpersists it
    * after the first completed action on the session — so an operator
    * whose plan consumes an expensive stage twice computes it once,
    * without leaving the caller a pinned `InMemoryRelation` after the
    * result is consumed. An unrelated action firing first merely
    * unpersists early (the stage recomputes — correct, just slower).
    *
    * Caveat: if the caller builds the plan but NEVER runs an action on
    * the session, the pinned relation and the listener live until the
    * session ends — the price of not owning the action. Callers that
    * only want the plan (explain/analysis) should avoid the cached
    * entry points. */
  def selfUnpersisting(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    df.persist()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      // async bus: ignore events from actions that STARTED before this
      // listener existed — they would unpersist the stage before the
      // operator's own consuming action runs (recompute, not wrong, but
      // exactly the double-compute this cache exists to avoid).
      private val registeredAtMs = System.currentTimeMillis()
      private def stale(qe: org.apache.spark.sql.execution.QueryExecution): Boolean =
        try {
          val phases = qe.tracker.phases
          phases.nonEmpty && phases.values.map(_.startTimeMs).min < registeredAtMs
        } catch { case _: Throwable => false }
      private def fire(): Unit =
        if (done.compareAndSet(false, true)) {
          if (!spark.sparkContext.isStopped)
            try df.unpersist(false) catch { case _: Throwable => () }
          try spark.listenerManager.unregister(this)
          catch { case _: Throwable => () }
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = if (!stale(qe)) fire()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = if (!stale(qe)) fire()
    }
    spark.listenerManager.register(listener)
    df
  }
}
