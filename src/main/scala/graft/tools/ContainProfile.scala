package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.MinHashLsh

/** Scratch micro-profiler for the containment pipeline's stages: times
  * each building block in isolation (noop-style count over the
  * materialized block) so the dominant cost is attributable — kernel,
  * anchor explode, candidate join, verify. */
object ContainProfile {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.queries.Queries.registerViews(s, sf)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cp] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = s.table("documents").select(col("doc_id"), col("text"))
    (1 to 3).foreach { it =>
      println(s"--- iter $it")
      val hashed = time("kernel: hashedShingles+checkpoint") {
        MinHashLsh.hashedShingles(docs, "doc_id", "text").localCheckpoint()
      }
      time("kernel count")(hashed.count())
      val bS = time("bShingles distinct") {
        hashed.select(explode(col("hs")).as("h")).distinct().count()
      }
      println(s"    distinct shingles = $bS")
      val priorE0 = time("priorE0 explode+anchor+semijoin+ckpt") {
        hashed
          .select(col("doc_id").as("__pid"), explode(col("hs")).as("h"),
            MinHashLsh.bottomK(col("hs"), 8).as("__ank"))
          .withColumn("__pa", array_contains(col("__ank"), col("h")))
          .drop("__ank")
          .join(broadcast(hashed.select(explode(col("hs")).as("h")).distinct()),
            Seq("h"), "left_semi")
          .localCheckpoint()
      }
      time("priorE0 count")(priorE0.count())
      val sigd = time("signatures+bandkeys explode") {
        val sigCol = graft.functions.VectorExpressions.minhashSignatures(
          col("hs"), graft.queries.Queries.MinhashA,
          graft.queries.Queries.MinhashB, graft.queries.Queries.MinhashP)
        hashed.select(col("doc_id"), col("hs"),
          posexplode(MinHashLsh.bandKeysOf(sigCol)).as(Seq("band", "k")))
          .localCheckpoint()
      }
      time("priorBands count")(sigd.count())
    }
    s.stop()
  }
}
