package graft.delta

import graft.SparkTestBase

class AnalyzeSpec extends SparkTestBase {
  import spark.implicits._

  test("ANALYZE backfills capped stats log-only and enables pruning") {
    val path = java.nio.file.Files.createTempDirectory("graft-analyze")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // two files, stats capped to the first leaf: c3 cannot prune
    TransactionWriter.overwrite(log,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("c1", "c2", "c3")
        .repartition(2, org.apache.spark.sql.functions.col("c1")),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "1"))
    val before = DeltaLog.forPath(spark, path).snapshot
    val pathsBefore = before.planFiles().map(_.path).toSet
    assert(Skipping.prunedFiles(before, Seq(("c3", ">", 15.0))).size ==
      pathsBefore.size, "capped stats must not prune on c3")

    val v = graft.plans.GraftSqlParser.run(spark, s"GRAFT ANALYZE '$path'")
      .collect()(0).getLong(0)
    val after = DeltaLog.forPath(spark, path).snapshot
    assert(after.version == v && v == before.version + 1)
    // log-only: the same physical files, now fully covered
    assert(after.planFiles().map(_.path).toSet == pathsBefore)
    assert(after.activeFiles.forall(_.stats.exists(_.contains("\"c3\""))))
    // pruning now works on the backfilled column; content unchanged
    assert(Skipping.prunedFiles(after, Seq(("c3", ">", 15.0))).size == 1)
    assert(after.read().as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 10.0), (2L, "b", 20.0)))
    // already covered: ANALYZE is a no-op (no new commit)
    assert(Maintenance.analyze(DeltaLog.forPath(spark, path)) == v)
  }

  test("ANALYZE stamps numRecords:0 on truly empty stats-less files") {
    val base = java.nio.file.Files.createTempDirectory("graft-analyze-e")
    val path = base.resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, 2L)).toDF("a", "b"))                                 // v0
    // hand-commit a genuinely empty parquet file with NO stats — the
    // shape a foreign writer (or a failed stats pass) leaves behind
    val edir = base.resolve("empty").toString
    Seq.empty[(Long, Long)].toDF("a", "b").coalesce(1)
      .write.parquet(edir)
    val src = java.nio.file.Files.list(java.nio.file.Paths.get(edir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dst = java.nio.file.Paths.get(path).resolve("empty.parquet")
    java.nio.file.Files.copy(src, dst)
    log.commit(1L, Seq(
      CommitInfoAction(CommitInfo(System.currentTimeMillis(), "WRITE", Map())),
      AddAction(AddFile("empty.parquet", Map.empty,
        java.nio.file.Files.size(dst), System.currentTimeMillis()))))
    val v = Maintenance.analyze(log)
    assert(v == 2L, "analyze must commit stats for the empty file")
    val after = DeltaLog.forPath(spark, path).snapshot
    val empty = after.activeFiles.find(_.path == "empty.parquet").get
    assert(empty.stats.exists(_.contains("\"numRecords\":0")),
      s"empty file must claim numRecords:0, got ${empty.stats}")
    assert(after.read().count() == 1L)
    // the file left the needy set: a second ANALYZE is a no-op
    assert(Maintenance.analyze(DeltaLog.forPath(spark, path)) == v)
  }

  test("ANALYZE covers partitioned tables (partition cols excluded)") {
    val path = java.nio.file.Files.createTempDirectory("graft-analyze-p")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "x", 5L), (2L, "y", 9L)).toDF("id", "p", "v"),
      partitionBy = Some(Seq("p")),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    val before = DeltaLog.forPath(spark, path).snapshot
    assert(before.activeFiles.forall(f =>
      !f.stats.exists(_.contains("\"v\""))),
      "precondition: capped stats must not cover v")
    Maintenance.analyze(log)
    val after = DeltaLog.forPath(spark, path).snapshot
    assert(after.activeFiles.forall(_.stats.exists(_.contains("\"v\""))))
    assert(Skipping.prunedFiles(after, Seq(("v", ">", 6L))).size == 1)
    assert(after.read().count() == 2L)
  }
}
