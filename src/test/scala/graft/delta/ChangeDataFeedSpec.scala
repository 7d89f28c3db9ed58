package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Change Data Feed: cdc actions on mutation commits, derived
  * insert/delete for plain appends/removes, and the versioned feed
  * reader. */
class ChangeDataFeedSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-cdf").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  private def feed(log: DeltaLog, from: Long, to: Long) =
    ChangeDataFeed.tableChanges(log, from, Some(to))
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq.sorted

  test("targeted DELETE and UPDATE write row-level cdc; feed reads them") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))
    ChangeDataFeed.enable(log)                       // v1
    assert(log.snapshot.protocol.minWriterVersion >= 4)

    Mutations.delete(log, col("id") === 3L)          // v2: cdc delete
    Mutations.update(log, col("id") === 4L,          // v3: cdc pre+post
      Map("v" -> lit("updated")))

    // the delete commit carries ONLY the one deleted row as change data
    val v2 = ChangeDataFeed.tableChanges(log, 2, Some(2))
    assert(v2.select("_change_type").as[String].collect().toSeq == Seq("delete"))
    assert(v2.select("id").as[Long].head() == 3L)

    val v3 = feed(log, 3, 3)
    assert(v3 == Seq(
      (4L, "updated", "update_postimage", 3L),
      (4L, "v4", "update_preimage", 3L)))

    // the table itself is correct after both mutations
    assert(log.snapshot.read().count() == 9)
    assert(log.snapshot.read().where(col("v") === "updated").count() == 1)
  }

  test("appends derive inserts; DV mutations write cdc; range unions") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)) // v0
    ChangeDataFeed.enable(log)                                         // v1
    TransactionWriter.append(log, Seq((6L, "v6")).toDF("id", "v"))     // v2
    Mutations.deleteWithDv(log, col("id") === 0L)                      // v3
    Mutations.updateWithDv(log, col("id") === 6L,
      Map("v" -> lit("U6")))                                           // v4

    // v0 (before CDF): derived insert of the initial rows still works
    val v0 = feed(log, 0, 0)
    assert(v0.map(_._3).distinct == Seq("insert") && v0.size == 6)

    // v2 derived insert, v3 cdc delete (NOT whole-file derived pairs),
    // v4 cdc update pre+post
    assert(feed(log, 2, 2) == Seq((6L, "v6", "insert", 2L)))
    assert(feed(log, 3, 3) == Seq((0L, "v0", "delete", 3L)))
    assert(feed(log, 4, 4) == Seq(
      (6L, "U6", "update_postimage", 4L),
      (6L, "v6", "update_preimage", 4L)))

    // full range unions with commit timestamps attached
    val all = ChangeDataFeed.tableChanges(log, 0, Some(4))
    assert(all.where(col("_commit_timestamp").isNull).count() == 0)
    assert(all.count() == 6 + 1 + 1 + 2)

    // OPTIMIZE (dataChange=false) contributes nothing to the feed
    Maintenance.compact(log)                                           // v5
    assert(ChangeDataFeed.tableChanges(log, 5, Some(5)).count() == 0)

    // table state is unaffected by cdc plumbing
    assert(log.snapshot.read().orderBy("id").select("v").as[String]
      .collect().toSeq == Seq("v1", "v2", "v3", "v4", "v5", "U6"))
  }

  test("dedup and SCD2 mutations write exact row-level cdc") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "dup"), (2L, "dup"), (3L, "keep"), (4L, "x"), (5L, "x"))
        .toDF("id", "v").coalesce(1))                                 // v0
    ChangeDataFeed.enable(log)                                        // v1
    Mutations.killDuplicates(log, Seq("v"))                           // v2
    // all members of both dup groups are deletes — nothing else
    assert(feed(log, 2, 2) == Seq(
      (1L, "dup", "delete", 2L), (2L, "dup", "delete", 2L),
      (4L, "x", "delete", 2L), (5L, "x", "delete", 2L)))
    assert(log.snapshot.read().count() == 1)

    // dropDuplicatesOrdered: only NON-SURVIVORS are deletes
    val log2 = freshLog()
    TransactionWriter.overwrite(log2,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "v").coalesce(1))
    ChangeDataFeed.enable(log2)
    Mutations.dropDuplicatesOrdered(log2, Seq("v"), Seq("id"))        // keeps min id
    assert(feed(log2, 2, 2) == Seq((2L, "a", "delete", 2L)))

    // SCD2: closed row as update pre/post + the new version as insert
    val log3 = freshLog()
    TransactionWriter.overwrite(log3,
      Seq((10L, "old", true, 100L, Option.empty[Long]))
        .toDF("pk", "attr", "is_current", "effective_time", "end_time")
        .coalesce(1))
    ChangeDataFeed.enable(log3)
    Mutations.type2ScdUpsert(log3,
      Seq((10L, "new", 200L)).toDF("pk", "attr", "effective_time"),
      "pk", Seq("attr"))
    val v2 = ChangeDataFeed.tableChanges(log3, 2, Some(2))
      .select("pk", "attr", "is_current", "_change_type")
      .as[(Long, String, Boolean, String)].collect().toSet
    assert(v2 == Set(
      (10L, "old", true, "update_preimage"),
      (10L, "old", false, "update_postimage"),
      (10L, "new", true, "insert")))
  }

  test("general MERGE writes row-level cdc for all three clause kinds") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
        .toDF("id", "v").coalesce(1))                                  // v0
    ChangeDataFeed.enable(log)                                        // v1
    val source = Seq((1L, "A"), (2L, "del"), (9L, "new")).toDF("sid", "sv")
    Merge.into(log, source, col("t.id") === col("s.sid"))
      .whenMatchedDelete(Some(col("s.sv") === "del"))
      .whenMatchedUpdate(Map("v" -> col("s.sv")))
      .whenNotMatchedInsert(Map("id" -> col("s.sid"), "v" -> col("s.sv")))
      .execute()                                                      // v2
    assert(feed(log, 2, 2) == Seq(
      (1L, "A", "update_postimage", 2L),
      (1L, "a", "update_preimage", 2L),
      (2L, "b", "delete", 2L),
      (9L, "new", "insert", 2L)))
    // table state agrees with the feed
    assert(log.snapshot.read().orderBy("id").as[(Long, String)].collect().toSeq
      == Seq((1L, "A"), (3L, "c"), (4L, "d"), (9L, "new")))

    // insert-only merge: no cdc files, derivation covers it
    Merge.into(log, Seq((7L, "x")).toDF("sid", "sv"),
        col("t.id") === col("s.sid"))
      .whenNotMatchedInsert(Map("id" -> col("s.sid"), "v" -> col("s.sv")))
      .execute()                                                      // v3
    assert(log.commitActions(3).collect { case CdcAction(c) => c }.isEmpty)
    assert(feed(log, 3, 3) == Seq((7L, "x", "insert", 3L)))
  }

  test("overwrite-without-cdc derives file-level insert+delete pairs") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))   // v0
    TransactionWriter.overwrite(log, Seq((2L, "b")).toDF("id", "v"))   // v1
    val v1 = feed(log, 1, 1)
    assert(v1 == Seq((1L, "a", "delete", 1L), (2L, "b", "insert", 1L)))
  }

  test("feed survives a fresh log handle and vacuum keeps cdc files") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ChangeDataFeed.enable(log)
    Mutations.delete(log, col("id") === 2L)
    Maintenance.vacuum(log, retentionMs = 0L, allowZeroRetention = true)
    val fresh = DeltaLog.forPath(spark, log.tablePath)
    assert(feed(fresh, 2, 2) == Seq((2L, "v2", "delete", 2L)))
  }

  test("timestamp-ranged feed selects commits by ICT") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))   // v0
    Maintenance.enableInCommitTimestamps(log)                          // v1
    ChangeDataFeed.enable(log)                                         // v2
    TransactionWriter.append(log, Seq((2L, "b")).toDF("id", "v"))      // v3
    val t3 = log.inCommitTimestampOf(3).get
    TransactionWriter.append(log, Seq((3L, "c")).toDF("id", "v"))      // v4
    val t4 = log.inCommitTimestampOf(4).get
    // window covering exactly v3
    val only3 = ChangeDataFeed.tableChangesByTimestamp(log,
      java.time.Instant.ofEpochMilli(t3),
      Some(java.time.Instant.ofEpochMilli(math.max(t3, t4 - 1))))
    if (t4 > t3) {
      assert(only3.select("id").as[Long].collect().toSeq == Seq(2L))
    }
    // window covering v3..v4
    val both = ChangeDataFeed.tableChangesByTimestamp(log,
      java.time.Instant.ofEpochMilli(t3), Some(java.time.Instant.ofEpochMilli(t4)))
    assert(both.select("id").as[Long].collect().toSet == Set(2L, 3L))
    // empty window: typed empty frame
    val none = ChangeDataFeed.tableChangesByTimestamp(log,
      java.time.Instant.ofEpochMilli(t4 + 60000),
      Some(java.time.Instant.ofEpochMilli(t4 + 120000)))
    assert(none.count() == 0L && none.columns.contains("_change_type"))
  }

  test("bad ranges refuse; empty range yields empty typed frame") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      ChangeDataFeed.tableChanges(log, 2, Some(3))
    }
    intercept[IllegalArgumentException] {
      ChangeDataFeed.tableChanges(log, 1, Some(0))
    }
  }
}
