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
