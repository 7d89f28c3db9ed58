package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q_update_dv phases (not part of the public
  * surface; used to attribute mutation-path latency). */
object DvProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Queries.registerViews(spark, sfDir)
    // warm
    spark.table("orders").count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dvprofile] $tag%-22s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val tmp = java.nio.file.Files.createTempDirectory("graft_dvp_").resolve("t").toString
      val log = graft.delta.DeltaLog.forPath(spark, tmp)
      val src = spark.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
      t("overwrite")(graft.delta.TransactionWriter.overwrite(log, src))
      t("updateWithDv")(graft.delta.Mutations.updateWithDv(log, col("o_orderkey") % 13 === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 2))))
      t("readback")(log.snapshot.read().count())
    }
    spark.stop()
  }
}
