package graft.tools

import org.apache.spark.sql.functions._

/** Scratch per-step timing of the q_containment_indexed lifecycle —
  * same steps as the gate, each timed, to attribute its ~10 s warm
  * wall between corpus write / index create / refresh / indexed probe
  * / direct operator / equivalence compare. */
object ContainGateProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cg] $tag%-38s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { it =>
      println(s"--- iter $it")
      graft.queries.Queries.registerViews(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_lshp_")
        .resolve("corpus").toString
      val log = graft.delta.DeltaLog.forPath(s, tmp)
      val docs = s.table("documents")
      val prior = docs.where(col("doc_id") % 5 =!= 0)
        .select("doc_id", "lang", "source", "text")
      time("overwrite corpus")(
        graft.delta.TransactionWriter.overwrite(log,
          prior.where(col("doc_id") % 7 =!= 3).repartition(8, col("doc_id"))))
      time("CREATE LSH INDEX")(
        graft.plans.GraftSqlParser.run(s,
          s"GRAFT CREATE LSH INDEX ON '$tmp' (doc_id, text)").collect())
      time("entries collect (before)")(
        graft.delta.LshIndex.entries(log, "doc_id", "text").get
          .select("file_path", "version").distinct().collect())
      time("append")(
        graft.delta.TransactionWriter.append(log,
          prior.where(col("doc_id") % 7 === 3).repartition(2, col("doc_id"))))
      time("REFRESH LSH INDEX")(
        graft.plans.GraftSqlParser.run(s,
          s"GRAFT REFRESH LSH INDEX ON '$tmp' (doc_id, text)").collect())
      time("entries collect (after)")(
        graft.delta.LshIndex.entries(log, "doc_id", "text").get
          .select("file_path", "version").distinct().collect())
      val batch = docs.where(col("doc_id") % 5 === 0).select("doc_id", "text")
      val freshLog = graft.delta.DeltaLog.forPath(s, tmp)
      val viaIndex = time("containmentBatch (indexed)")(
        graft.delta.LshIndex.containmentBatch(
          freshLog, batch, "doc_id", "text", threshold = 0.9)
          .localCheckpoint())
      time("viaIndex count")(viaIndex.count())
      val direct = time("containmentAgainstCorpus (direct)")(
        graft.operators.MinHashLsh.containmentAgainstCorpus(
          batch, freshLog.snapshot.read(), "doc_id", "text", threshold = 0.9)
          .localCheckpoint())
      time("direct count")(direct.count())
      time("exceptAll both ways")(
        viaIndex.exceptAll(direct).isEmpty && direct.exceptAll(viaIndex).isEmpty)
    }
    s.stop()
  }
}
