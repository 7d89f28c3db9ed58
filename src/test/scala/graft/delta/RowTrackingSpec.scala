package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Row tracking: backfill-on-enable, fresh allocation per commit from
  * the domain high-water mark, id preservation under DV mutations,
  * checkpoint/time-travel survival, and uniqueness. */
class RowTrackingSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-rt").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  private def ids(log: DeltaLog) =
    RowTracking.readWithRowIds(log.snapshot)
      .select("id", "_row_id", "_row_commit_version")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("enable backfills, appends allocate fresh disjoint ids") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2)) // v0
    RowTracking.enable(log)                                               // v1
    assert(log.snapshot.protocol.writerFeatures.contains("rowTracking"))
    assert(RowTracking.highWaterMark(log.snapshot) == 9L)
    val initial = ids(log)
    assert(initial.map(_._2).distinct.size == 10, "row ids must be unique")
    assert(initial.map(_._2).toSet == (0L until 10L).toSet)
    assert(initial.forall(_._3 == 1L), "backfill stamps the enable version")
    // enable is idempotent
    assert(RowTracking.enable(log) == 1L)

    TransactionWriter.append(log,
      Seq((100L, "new"), (101L, "new2")).toDF("id", "v").coalesce(1))     // v2
    assert(RowTracking.highWaterMark(log.snapshot) == 11L)
    val after = ids(log)
    assert(after.map(_._2).distinct.size == 12)
    val newRows = after.filter(_._1 >= 100L)
    assert(newRows.map(_._2).toSet == Set(10L, 11L), s"fresh ids: $newRows")
    assert(newRows.forall(_._3 == 2L))
    // old rows keep their ids and commit version
    assert(after.filter(_._1 < 10L).map(r => (r._1, r._2)).toMap ==
      initial.map(r => (r._1, r._2)).toMap)
  }

  test("DV delete preserves ids; checkpoint and time travel keep them") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    RowTracking.enable(log)
    val before = ids(log).map { case (k, v, _) => k -> v }.toMap

    Mutations.deleteWithDv(log, col("id") < 5L)
    val after = ids(log)
    assert(after.map(_._1).toSet == (5L until 20L).toSet)
    // every surviving row keeps exactly its old id (file untouched)
    after.foreach { case (id, rid, _) => assert(before(id) == rid) }

    // ids visible at a prior version via time travel
    val atEnable = RowTracking.readWithRowIds(log.snapshotAt(1))
    assert(atEnable.count() == 20L)

    Maintenance.checkpoint(log)
    Maintenance.cleanupLog(log)
    val fresh = DeltaLog.forPath(spark, log.tablePath)
    val bootstrapped = ids(fresh)
    assert(bootstrapped == after, "ids must survive checkpoint bootstrap")
    assert(RowTracking.highWaterMark(fresh.snapshot) == 19L)
  }

  test("rewrites reallocate (documented); unenabled tables refuse") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 8L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))
    intercept[IllegalArgumentException] {
      RowTracking.readWithRowIds(log.snapshot)
    }
    RowTracking.enable(log)
    Maintenance.compact(log)
    val after = ids(log)
    // fresh ids, still unique, hwm advanced past both generations
    assert(after.map(_._2).distinct.size == 8)
    assert(after.map(_._2).forall(_ >= 8L))
    assert(RowTracking.highWaterMark(log.snapshot) == 15L)
  }
}
