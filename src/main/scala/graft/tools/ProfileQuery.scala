package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run one named SparkEntry query N times in the same
  * session and print per-iteration wall time — separates one-off
  * planning/codegen cost from steady-state execution.
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      val n = df.count()
      val tExec = System.nanoTime()
      println(f"[profile] $name iter $i: build=${(tPlan - t0) / 1e9}%.2fs exec=${(tExec - tPlan) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
