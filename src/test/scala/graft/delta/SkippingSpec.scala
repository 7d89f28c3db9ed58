package graft.delta

import java.nio.file.Files
import graft.SparkTestBase

/** File-level stats pruning promoted from simulation to execution:
  * prunedFiles must drop non-overlapping files, readWhere must still
  * return exactly the matching rows, and row-level predicates must
  * reach the parquet scan (PushedFilters). */
class SkippingSpec extends SparkTestBase {
  import spark.implicits._

  def makeTable(): DeltaLog = {
    val path = Files.createTempDirectory("graft-skip").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // three files with disjoint n ranges
    TransactionWriter.overwrite(log, Seq((1L, "a"), (2L, "b")).toDF("n", "s").coalesce(1))
    Maintenance.append(log, Seq((10L, "c"), (20L, "d")).toDF("n", "s").coalesce(1))
    Maintenance.append(log, Seq((100L, "e"), (200L, "f")).toDF("n", "s").coalesce(1))
    log
  }

  test("dataSkippingNumIndexedCols limits stats to the first N leaves") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-nidx")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("c1", "c2", "c3").coalesce(1),
      configuration = Map("delta.dataSkippingNumIndexedCols" -> "1"))
    val statsJson = log.snapshot.activeFiles.head.stats.get
    val node = JsonUtil.mapper.readTree(statsJson)
    assert(node.path("numRecords").asLong() == 2L)
    assert(node.path("minValues").has("c1") && !node.path("minValues").has("c2")
      && !node.path("minValues").has("c3"), s"stats: $statsJson")
    // un-indexed columns can't prune but still read correctly
    assert(Skipping.readWhere(log.snapshot, Seq(("c3", ">", 15.0))).count() == 1L)
    assert(Skipping.prunedFiles(log.snapshot, Seq(("c3", ">", 15.0))).size == 1,
      "a file without stats on the predicate column must be kept")
  }

  test("partition predicates prune exactly on partitionValues") {
    val path = Files.createTempDirectory("graft-skip").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      (1L to 30L).map(i => (i, (i % 3).toString)).toDF("n", "p").coalesce(1),
      partitionBy = Some(Seq("p")))
    val snap = log.snapshot
    assert(snap.activeFiles.size == 3)
    // pure partition filter: exact pruning, no stats involved
    val pruned = Skipping.prunedFiles(snap, Seq(("p", "=", "1")))
    assert(pruned.size == 1, s"expected the p=1 file only, got ${pruned.map(_.path)}")
    assert(pruned.head.partitionValues("p") == "1")
    // combined partition + stats filter
    val both = Skipping.prunedFiles(snap, Seq(("p", "=", "1"), ("n", ">=", 1000)))
    assert(both.isEmpty, "stats filter should eliminate the remaining file")
    // readWhere returns exactly the partition's rows
    val rows = Skipping.readWhere(snap, Seq(("p", "=", "1")))
    assert(rows.count() == 10L)
  }

  test("prunedFiles keeps only stats-overlapping files") {
    val log = makeTable()
    val snap = log.snapshot
    assert(snap.activeFiles.size == 3)
    val pruned = Skipping.prunedFiles(snap, Seq(("n", "=", 15)))
    assert(pruned.size == 1, s"expected 1 surviving file, got ${pruned.map(_.path)}")
    val pruned2 = Skipping.prunedFiles(snap, Seq(("n", ">", 50)))
    assert(pruned2.size == 1)
    val pruned3 = Skipping.prunedFiles(snap, Seq(("n", "<=", 20)))
    assert(pruned3.size == 2)
  }

  test("readWhere returns exactly the matching rows off the pruned scan") {
    val log = makeTable()
    val snap = log.snapshot
    assertSameRows(Skipping.readWhere(snap, Seq(("n", ">=", 10), ("n", "<", 150))),
      Seq((10L, "c"), (20L, "d"), (100L, "e")).toDF("n", "s"))
  }

  test("row-level predicate is pushed to the parquet scan") {
    val log = makeTable()
    val snap = log.snapshot
    val plan = Skipping.readWhere(snap, Seq(("n", ">", 5)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n), GreaterThan(n,5)"),
      s"expected pushed filters in plan:\n$plan")
  }

  test("skippedStats agrees with the executed pruning") {
    val log = makeTable()
    val snap = log.snapshot
    val stats = graft.Levi.skippedStats(snap, Seq(("n", "=", 15)))
    assert(stats("num_files") == 3L)
    assert(stats("num_files_skipped") == 2L)
    assert(stats("num_bytes_skipped") ==
      snap.activeFiles.map(_.size).sum -
      Skipping.prunedFiles(snap, Seq(("n", "=", 15))).map(_.size).sum)
  }
}
