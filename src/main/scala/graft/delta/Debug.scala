package graft.delta

import org.apache.spark.sql.SparkSession

/** Conf-gated phase timing for the write/commit hot path — the hook
  * the profiling tools (MvJoinProfile, DvProfile) flip on to attribute
  * a lifecycle gate's wall-clock to its commits' internal phases.
  * Off (the default) this is one conf lookup per phase — no strings
  * built, nothing printed. */
private[graft] object Debug {
  def timed[A](spark: SparkSession, label: String)(f: => A): A =
    if (!spark.conf.get("spark.graft.debug.refreshTiming", "false").toBoolean) f
    else {
      val t0 = System.nanoTime(); val r = f
      println(f"[commit]    $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
}
