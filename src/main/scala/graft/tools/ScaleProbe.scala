package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling curves for the dedup stack — the direct answer to
  * "would this hold at 100×": synthesize 1×/2×/4×/8× corpora from the
  * sf documents table (each copy's text character-rotated so copies
  * are NOT near-dups of each other — duplicate structure scales with
  * the corpus instead of exploding quadratically) and time exact
  * dedup, MinHash-LSH dedup, and SimHash fingerprinting at each
  * factor. Near-linear wall-clock across factors = the shuffles are
  * keyed on bounded values and nothing degenerates toward all-pairs.
  * `runMain graft.tools.ScaleProbe [sfDir] [maxFactor]` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxFactor = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Queries.registerViews(spark, sfDir)
    val docs = spark.table("documents")
      .select("doc_id", "text", "lang", "source", "n_chars")

    // copy i rotates the alphabet by i so shingle sets across copies
    // are disjoint-ish: duplicates stay within-copy, so the TRUE dup
    // structure (and thus LSH candidate volume) scales linearly
    def scaled(f: Int): DataFrame = (0 until f).map { i =>
      val rot = ('a' to 'z').map(c => (((c - 'a' + i) % 26) + 'a').toChar).mkString
      docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        translate(col("text"), ('a' to 'z').mkString, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"${"factor"}%7s ${"rows"}%9s ${"exact(s)"}%9s ${"lsh(s)"}%9s ${"simhash(s)"}%11s ${"lsh_survivors"}%14s")
    for (f <- Seq(1, 2, 4, maxFactor).distinct.filter(_ <= maxFactor)) {
      val corpus = scaled(f).localCheckpoint() // pre-materialized input
      val rows = corpus.count()
      val (tExact, _) = time {
        graft.operators.Dedup.killDuplicates(corpus, Seq("text")).count()
      }
      val (tLsh, nLsh) = time {
        graft.operators.MinHashLsh.dedup(corpus, "doc_id", "text").count() match { case n => n }
      }
      val (tSim, _) = time {
        graft.operators.MinHashLsh.hashedShingles(corpus, "doc_id", "text")
          .select(col("doc_id"),
            graft.functions.TextFunctions.simhash16(col("hs")).as("s"))
          .groupBy("s").count().count()
      }
      println(f"$f%7d $rows%9d $tExact%9.2f $tLsh%9.2f $tSim%11.2f $nLsh%14d")
      corpus.unpersist(false)
    }
    spark.stop()
  }
}
