package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch profiler: run one named SparkEntry query N times in the same
  * session and print per-iteration wall time split into DataFrame build,
  * physical planning, and execution — plus the summed executor task time
  * per iteration, which separates driver-side planning pathologies from
  * genuinely slow tasks.
  * Usage: runMain graft.tools.ProfileQuery <queryName> [iters]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      // compile-cache sized for a many-query catalog (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CONSTRAINTS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskTime.addAndGet(t.taskMetrics.executorRunTime)
          perStage.computeIfAbsent(t.stageId,
            _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
            .add(t.taskMetrics.executorRunTime)
        }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val rt = info.taskMetrics.executorRunTime
        val cpu = info.taskMetrics.executorCpuTime / 1e6 // ns → ms
        val deser = info.taskMetrics.executorDeserializeTime
        val gc = info.taskMetrics.jvmGCTime
        if (rt > 1000) {
          val ts = Option(perStage.get(info.stageId))
            .map(_.toArray(new Array[java.lang.Long](0)).map(_.longValue).sorted)
            .getOrElse(Array.empty[Long])
          val dist = if (ts.isEmpty) "" else
            f" taskMs[min/med/max]=${ts.head}/${ts(ts.length / 2)}/${ts.last}"
          println(f"[stage] id=${info.stageId} tasks=${info.numTasks} " +
            f"runTime=${rt / 1e3}%.1fs cpu=${cpu / 1e3}%.1fs deser=${deser / 1e3}%.1fs " +
            f"gc=${gc / 1e3}%.1fs$dist name=${info.name.take(60)}")
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      taskTime.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      // Forces analysis + optimization + physical planning (the count()
      // below plans its own Aggregate-on-top tree, but shares the cost
      // profile; this isolates driver-side plan work for THIS tree).
      df.queryExecution.executedPlan
      val tPlan = System.nanoTime()
      val n = df.count()
      val tExec = System.nanoTime()
      Thread.sleep(200) // let listener events drain
      println(f"[profile] $name iter $i: build=${(tBuild - t0) / 1e9}%.2fs " +
        f"plan=${(tPlan - tBuild) / 1e9}%.2fs exec=${(tExec - tPlan) / 1e9}%.2fs " +
        f"taskTime=${taskTime.get() / 1e3}%.2fs rows=$n")
    }
    spark.stop()
  }
}
