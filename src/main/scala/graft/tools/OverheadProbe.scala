package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the per-ACTION fixed costs that dominate the
  * lifecycle gates (43 sequential jobs × fixed cost each): times warm
  * (a) a no-shuffle count, (b) a tiny shuffle+AQE count, (c) a tiny
  * broadcast join, (d) a 32-partition localCheckpoint, (e) a tiny
  * parquet write+read roundtrip — with and without AQE for (b)/(c). */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time(tag: String, n: Int = 20)(f: => Unit): Unit = {
      f; f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[oh] $tag%-44s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_oh_").toString

    time("RDD parallelize(1,1).count  (no SQL)")(
      s.sparkContext.parallelize(Seq(1), 1).count())
    time("RDD reuse .count (cached rdd)") {
      val r = s.sparkContext.parallelize(Seq(1), 1); r.count(); r.count()
    }
    time("plan-only: range(1).queryExecution")(
      s.range(1, 2, 1, 1).groupBy().count().queryExecution.executedPlan)
    time("range(1,2,1,1 slice).count")(s.range(1, 2, 1, 1).count())
    time("range(1,2,1,4 slices).count")(s.range(1, 2, 1, 4).count())
    time("range(1,2,1,8 slices).count")(s.range(1, 2, 1, 8).count())
    time("range(1).count  (32 slices)")(s.range(1).count())
    time("range(10k) groupBy mod 7 count  (shuffle+AQE)")(
      s.range(10000).groupBy(expr("id % 7")).count().count())
    s.conf.set("spark.sql.adaptive.enabled", "false")
    time("same shuffle, AQE OFF")(
      s.range(10000).groupBy(expr("id % 7")).count().count())
    s.conf.set("spark.sql.adaptive.enabled", "true")
    time("tiny broadcast join")(
      s.range(10000).join(broadcast(s.range(100)), "id").count())
    time("localCheckpoint 32p of range(10k)")(
      s.range(10000).repartition(32).localCheckpoint().count())
    var i = 0
    time("parquet write roundtrip (tiny)", 10) {
      i += 1
      s.range(1000).write.mode("overwrite").parquet(s"$tmp/t$i")
      s.read.parquet(s"$tmp/t$i").count()
    }
    time("analyze-only: 3-join plan .queryExecution", 20) {
      val a = s.range(1000).toDF("x")
      val p = a.join(a, "x").join(a, "x").groupBy("x").count()
      p.queryExecution.executedPlan
    }
    s.stop()
  }
}
