package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for DRIVER-bound lifecycle queries: run one named
  * SparkEntry query N times and log every Spark job's wall-clock span
  * (start→end) plus its call site, then print the per-iteration job
  * count, summed job wall, and the "gap" (wall time where NO job was
  * running — pure driver work: planning, commit I/O, log replay).
  * The matview/stream/index gates spend most of their time off the
  * executors (round-13 profile: q_matview_join 6.7 s wall vs 3.9 s
  * executor task time), so the job WALL timeline — not task time — is
  * what localizes their cost.
  * Usage: runMain graft.tools.JobTrace <queryName> [iters] [minMs]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
    val minMs = if (args.length > 2) args(2).toLong else 50L
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      // compile-cache sized for a many-query catalog (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, t0: Long, var t1: Long, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[J]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val site = Option(s.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(s.stageInfos.lastOption.map(si =>
            s"${si.name.take(70)} (${si.numTasks}t)"))
          .getOrElse("?")
        val j = J(s.jobId, System.nanoTime(), -1L, site)
        jobs.put(s.jobId, j); order.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = System.nanoTime()
      }
    })

    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)

    // 10 ms stack sampler over the MAIN thread: attributes the no-job
    // "gap" time to driver code (analysis/optimization/commit I/O/log
    // replay) by histogramming the deepest interesting frame.
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { e =>
            val c = e.getClassName
            (c.startsWith("graft.") ||
             c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
             c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
             c.startsWith("org.apache.spark.sql.catalyst.rules") ||
             c.startsWith("org.apache.spark.sql.execution") ||
             c.startsWith("org.apache.spark.sql.classic")) &&
            !c.contains("JobTrace")
          }.map(e => s"${e.getClassName.split('.').takeRight(2).mkString(".")}.${e.getMethodName}")
            .getOrElse(st.drop(2).headOption.map(e =>
              s"${e.getClassName.split('.').takeRight(1).mkString}.${e.getMethodName}").getOrElse("?"))
          hist.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    (1 to iters).foreach { i =>
      order.clear(); jobs.clear()
      if (i == iters) { hist.clear(); sampling = true }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      sampling = false
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshims.SqlShims.drainListenerBus(spark.sparkContext)
      val snap = order.toArray(new Array[J](0)).filter(_.t1 > 0)
        .filter(j => j.t0 >= t0).sortBy(_.t0)
      // union of job intervals → busy time; wall - busy = driver gap
      var busy = 0L
      var cursor = t0
      snap.foreach { j =>
        val s0 = math.max(j.t0, cursor)
        if (j.t1 > s0) { busy += j.t1 - s0; cursor = j.t1 }
        else if (j.t1 > cursor) cursor = j.t1
      }
      println(f"[trace] $name iter $i: wall=$wall%.2fs jobs=${snap.length} " +
        f"busy=${busy / 1e9}%.2fs gap=${(wall - busy / 1e9)}%.2fs rows=$n")
      if (i == iters) {
        println("[trace] jobs over " + minMs + " ms, in order:")
        snap.foreach { j =>
          val ms = (j.t1 - j.t0) / 1e6
          if (ms >= minMs)
            println(f"[trace]   +${(j.t0 - t0) / 1e6}%6.0f ms  ${ms}%7.1f ms  ${j.site}")
        }
        println("[trace] main-thread sample histogram (10 ms samples):")
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, c) =>
          println(f"[trace]   ${c * 10}%6d ms  $f")
        }
      }
    }
    spark.stop()
  }
}
