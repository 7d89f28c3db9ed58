package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** Minor log compaction (`<x>.<y>.compacted.json`): writer
  * reconciliation, reader splicing, auto-interval trigger, and log
  * cleanup of dead ranges. */
class LogCompactionSpec extends SparkTestBase {
  import spark.implicits._

  def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-logcompact").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  /** v0 overwrite, v1..v3 appends, v4 targeted delete (remove +
    * rewrite), v5 domain metadata + txn-free append. */
  private def buildTable(log: DeltaLog): Unit = {
    TransactionWriter.overwrite(log,
      (1L to 10L).map(i => (i, s"v$i")).toDF("n", "s"))            // v0
    (1 to 3).foreach(i => Maintenance.append(log,
      Seq((100L + i, s"a$i")).toDF("n", "s")))                     // v1..v3
    Mutations.delete(log, org.apache.spark.sql.functions.col("n") === 2L) // v4
    Domains.set(log, "app.test", """{"k":"v"}""")                  // v5
  }

  test("compacted replay equals per-commit replay") {
    val log = freshLog()
    buildTable(log)
    val before = log.snapshot
    val expected = before.read().collect().toSet

    val name = Maintenance.compactLog(log, 1, 4)
    assert(name == f"${1L}%020d.${4L}%020d.compacted.json")
    assert(log.fs.exists(new Path(log.logPath, name)))

    val after = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(after.version == before.version)
    assert(after.read().collect().toSet == expected)
    assert(Domains.get(after, "app.test").contains("""{"k":"v"}"""))
    // the removed-then-rewritten v4 file set reconciled: same active paths
    assert(after.activeFiles.map(_.path).toSet ==
      before.activeFiles.map(_.path).toSet)
    // idempotent: a second call returns without rewriting
    assert(Maintenance.compactLog(log, 1, 4) == name)
  }

  test("replay reads the compacted file, not the covered commits") {
    val log = freshLog()
    buildTable(log)
    val expected = log.snapshot.read().collect().toSet
    Maintenance.compactLog(log, 1, 4)
    // Blank out a covered commit: if replay still opened it, the
    // snapshot would lose v2's rows (or fail); via the compacted file
    // the bytes are never read.
    val v2 = new Path(log.logPath, f"${2L}%020d.json")
    val out = log.fs.create(v2, true)
    out.close()
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.read().collect().toSet == expected)
    // time travel BELOW the range still reads per-commit files
    assert(DeltaLog.forPath(spark, log.tablePath).snapshotAt(1).read().count() == 11)
  }

  test("remove tombstones survive compaction") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (1L to 4L).map(i => (i, s"v$i")).toDF("n", "s").repartition(2)) // v0
    TransactionWriter.overwrite(log, Seq((9L, "z")).toDF("n", "s"))   // v1: removes v0 files
    Maintenance.append(log, Seq((10L, "y")).toDF("n", "s"))           // v2
    Maintenance.compactLog(log, 1, 2)
    val acts = log.compactedActions(1, 2)
    val removes = acts.collect { case RemoveAction(r) => r.path }
    assert(removes.size == 2, s"expected v0's two tombstones, got $acts")
    assert(acts.collect { case AddAction(a) => a }.size == 2)
    // and no commitInfo is carried
    assert(!acts.exists(_.isInstanceOf[CommitInfoAction]))
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.read().collect().toSet ==
      Set(org.apache.spark.sql.Row(9L, "z"), org.apache.spark.sql.Row(10L, "y")))
  }

  test("graft.logCompaction.interval auto-writes ranges") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "a")).toDF("n", "s"),
      configuration = Map("graft.logCompaction.interval" -> "3"))    // v0
    (1 to 5).foreach(i => Maintenance.append(log,
      Seq((10L + i, s"b$i")).toDF("n", "s")))                        // v1..v5
    // intervals of 3: [0,2] at v2, [3,5] at v5
    assert(log.compactedRanges() == Seq((0L, 2L), (3L, 5L)))
    assert(log.snapshot.read().count() == 6)
  }

  test("cleanupLog deletes ranges at or below the anchor") {
    val log = freshLog()
    buildTable(log)                       // v0..v5
    Maintenance.compactLog(log, 1, 2)
    Maintenance.compactLog(log, 4, 5)
    Maintenance.checkpoint(log)           // checkpoint @ v5
    Maintenance.append(log, Seq((999L, "w")).toDF("n", "s")) // v6
    val deleted = Maintenance.cleanupLog(log)
    // [1,2] starts below the anchor (5) -> dead; [4,5] also starts below
    assert(log.compactedRanges().isEmpty, s"deleted=$deleted")
    assert(deleted.exists(_.endsWith(".compacted.json")))
    // 10 initial + 3 appends - 1 delete + 1 append
    assert(log.snapshot.read().count() == 13)
  }
}
