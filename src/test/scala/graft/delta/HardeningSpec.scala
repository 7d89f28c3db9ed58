package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkTestBase

/** Protocol enforcement, checkpoint completeness (remove/txn actions),
  * commit atomicity, and vacuum safety rails. */
class HardeningSpec extends SparkTestBase {
  import spark.implicits._

  def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-hard").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  private val simpleSchema =
    StructType(Seq(StructField("n", LongType), StructField("s", StringType)))

  private def meta() = Metadata(
    id = java.util.UUID.randomUUID.toString,
    schemaString = simpleSchema.json,
    partitionColumns = Nil,
    configuration = Map.empty,
    createdTime = Some(0L))

  test("unsupported reader protocol is rejected, not silently misread") {
    // v3 is accepted only when every listed reader feature is one we
    // implement (deletionVectors / columnMapping / timestampNtz /
    // v2Checkpoint — DeletionVectorSpec and CheckpointV2Spec cover the
    // accept side); an unknown feature must refuse. v2 is allowed only
    // for column mapping modes (ColumnMappingSpec covers the v2 matrix).
    val log = freshLog()
    log.commit(0, Seq(
      ProtocolAction(Protocol(minReaderVersion = 3, minWriterVersion = 7,
        readerFeatures = Set("variantType-preview"),
        writerFeatures = Set("variantType-preview"))),
      MetadataAction(meta()),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    val e = intercept[IllegalArgumentException](log.snapshot)
    assert(e.getMessage.contains("unsupported Delta protocol"))
    assert(e.getMessage.contains("variantType-preview"))
  }

  test("interleaved targeted rewrites on disjoint files both land (rebase)") {
    import org.apache.spark.sql.functions._
    val log = freshLog()
    // partition a: dup id 1; partition b: dup id 10 — separate files
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (10L, "b"), (10L, "b"), (20L, "b"))
      .toDF("id", "p")
    TransactionWriter.overwrite(log, df.repartition(col("p")), partitionBy = Some(Seq("p")))
    val stale = log.snapshot // BOTH rewrites plan against v0
    val filesA = stale.activeFiles.filter(_.partitionValues.get("p").contains("a"))
    val filesB = stale.activeFiles.filter(_.partitionValues.get("p").contains("b"))
    assert(filesA.nonEmpty && filesB.nonEmpty)
    val dedupA = graft.operators.Dedup.dropDuplicatesOrdered(
      stale.readFiles(filesA), Seq("id"), Seq(col("id").asc))
    val dedupB = graft.operators.Dedup.dropDuplicatesOrdered(
      stale.readFiles(filesB), Seq("id"), Seq(col("id").asc))
    val v1 = TransactionWriter.rewriteFiles(log, stale, filesA, dedupA, "DELETE")
    // second rewrite still holds the v0 snapshot: its commit 1 loses the
    // race, the conflict check sees disjoint file sets, and it rebases
    val v2 = TransactionWriter.rewriteFiles(log, stale, filesB, dedupB, "DELETE")
    assert(v1 == 1L && v2 == 2L, s"both mutations must land, got v1=$v1 v2=$v2")
    val got = log.snapshot.read().select("id", "p").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "a"), (10L, "b"), (20L, "b")))

    // OVERLAPPING rewrite from the same stale snapshot must abort loudly
    val e = intercept[java.util.ConcurrentModificationException] {
      TransactionWriter.rewriteFiles(log, stale, filesA, dedupA, "DELETE")
    }
    assert(e.getMessage.contains("conflicts with a concurrent commit"))

    // a concurrent metaData change aborts a rebase (stale append)
    val stale2 = log.snapshot
    TransactionWriter.overwrite(log,
      Seq((1L, "a", "x")).toDF("id", "p", "extra"), partitionBy = Some(Seq("p")))
    val e2 = intercept[Exception] {
      TransactionWriter.rewriteFiles(log, stale2,
        stale2.activeFiles.filter(_.partitionValues.get("p").contains("b")),
        dedupB, "DELETE")
    }
    assert(e2.isInstanceOf[java.util.ConcurrentModificationException] ||
      e2.isInstanceOf[IllegalArgumentException]) // schema gate may fire first
  }

  test("interleaved DV deletes on disjoint files both land") {
    import org.apache.spark.sql.functions._
    val log = freshLog()
    val df = (1L to 100L).map(i => (i, if (i <= 50) "a" else "b")).toDF("id", "p")
    TransactionWriter.overwrite(log, df.repartition(col("p")), partitionBy = Some(Seq("p")))
    // two DV deletes racing from the same snapshot, touching different partitions
    val snapStale = log.snapshot
    // first wins normally
    Mutations.deleteWithDv(log, col("p") === "a" && col("id") % 5 === 0)
    // second planned pre-race: drive it manually from the stale snapshot
    // via the public API (deleteWithDv re-resolves, so emulate the race
    // by committing an unrelated append between resolve and commit is
    // not possible without hooks; instead verify the post-race state
    // composes correctly by a second delete on the other partition)
    Mutations.deleteWithDv(log, col("p") === "b" && col("id") % 5 === 0)
    val got = log.snapshot.read().select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (1L to 100L).filter(_ % 5 != 0))
  }

  test("checkpoint preserves remove tombstones and txn state") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    TransactionWriter.overwrite(log, Seq((3L, "c")).toDF("n", "s")) // v1: removes v0 files
    log.commit(2, Seq(
      TxnAction(SetTransaction("app-etl", 42L, Some(1234L))),
      CommitInfoAction(CommitInfo(0L, "TXN"))))
    assert(log.snapshot.setTransactions("app-etl").version == 42L)
    assert(log.snapshot.tombstones.count() >= 1L)

    Maintenance.checkpoint(log)
    // delete every JSON commit: state must survive via checkpoint alone
    (0L to 2L).foreach { v =>
      log.fs.delete(new Path(log.logPath, f"$v%020d.json"), false)
    }
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.version == 2L)
    assertSameRows(snap.read(), Seq((3L, "c")).toDF("n", "s"))
    assert(snap.setTransactions("app-etl") ==
      SetTransaction("app-etl", 42L, Some(1234L)))
    assert(snap.tombstones.count() >= 1L,
      "remove tombstones must survive checkpointing (vacuum safety)")
  }

  test("multi-part checkpoint round-trips") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (1L to 40L).map(i => (i, s"v$i")).toDF("n", "s").repartition(4))
    assert(log.snapshot.numFiles == 4L)
    Maintenance.checkpointMultiPart(log, parts = 3)
    val cpFiles = log.checkpointFiles(0L)
    assert(cpFiles.length == 3, s"expected 3 checkpoint parts, got $cpFiles")
    log.fs.delete(new Path(log.logPath, f"${0L}%020d.json"), false)
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.checkpointVersion.contains(0L))
    assertSameRows(snap.read(), (1L to 40L).map(i => (i, s"v$i")).toDF("n", "s"))
  }

  test("incomplete multi-part checkpoint is ignored") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Maintenance.checkpointMultiPart(log, parts = 2)
    // drop one part: the set is no longer a usable checkpoint
    val part = log.checkpointFiles(0L).head
    log.fs.delete(new Path(part), false)
    // commit 0 json still present → replay from json succeeds
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.checkpointVersion.isEmpty)
    assertSameRows(snap.read(), Seq((1L, "a")).toDF("n", "s"))
  }

  test("vacuum refuses zero retention without explicit opt-in") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    val e = intercept[IllegalArgumentException](Maintenance.vacuum(log, 0L))
    assert(e.getMessage.contains("allowZeroRetention"))
  }

  test("vacuum never touches staging or hidden directories") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    TransactionWriter.overwrite(log, Seq((2L, "b")).toDF("n", "s")) // orphans v0 file
    // a concurrent writer's staged-but-uncommitted parquet
    val staged = new Path(log.rootPath, ".graft-staging-test/part-0000.parquet")
    val out = log.fs.create(staged, true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val deleted = Maintenance.vacuum(log, retentionMs = 0L, allowZeroRetention = true)
    assert(deleted.length == 1, s"expected only the orphan deleted, got $deleted")
    assert(log.fs.exists(staged), "staged file of an in-flight commit was deleted")
  }

  test("snapshot bootstraps from _last_checkpoint without a full log listing") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))
    Maintenance.checkpoint(log) // pointer at v1
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s")) // tail past checkpoint
    // Plant a far-future orphan commit: a full-listing resolution would
    // see version 999999 and fail on the gap; the _last_checkpoint
    // bootstrap probes sequentially from v1 and never sees it.
    log.commit(999999L, Seq(CommitInfoAction(CommitInfo(0L, "GARBAGE"))))
    intercept[IllegalArgumentException] { log.snapshotAt(log.latestVersion()) }
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.version == 2L)
    assert(snap.checkpointVersion.contains(1L))
    assertSameRows(snap.read(),
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("n", "s"))
  }

  test("stale _last_checkpoint falls back to full listing") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Maintenance.checkpoint(log)
    // delete the checkpoint parquet but keep the pointer → stale
    log.fs.delete(new Path(log.logPath, f"${0L}%020d.checkpoint.parquet"), false)
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.checkpointVersion.isEmpty)
    assertSameRows(snap.read(), Seq((1L, "a")).toDF("n", "s"))
  }

  test("append and targeted rewrite enforce the table schema") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    // extra column → reject
    intercept[IllegalArgumentException] {
      TransactionWriter.append(log, Seq((2L, "b", 1)).toDF("n", "s", "extra"))
    }
    // type change → reject
    intercept[IllegalArgumentException] {
      TransactionWriter.append(log, Seq((2, "b")).toDF("n", "s")) // n is int
    }
    // column order / nullability difference → fine, metadata untouched
    val metaBefore = log.snapshot.metadata.schemaString
    TransactionWriter.append(log, Seq(("b", 2L)).toDF("s", "n"))
    assert(log.snapshot.metadata.schemaString == metaBefore)
    assertSameRows(log.snapshot.read(), Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    // overwrite MAY change the schema (with_schema_change corpus shape)
    TransactionWriter.overwrite(log, Seq((1L, 2L)).toDF("x", "y"))
    assert(log.snapshot.schema.fieldNames.toSeq == Seq("x", "y"))
  }

  test("writer gates: mapped appends allowed, declared constraints enforced") {
    // column-mapped table: the writer now emits PHYSICAL names, so an
    // append succeeds and lands under the mapping (ColumnMappingSpec
    // covers the full matrix)
    val cmPath = Files.createTempDirectory("graft-hard").resolve("t").toString
    val cmLog = DeltaLog.forPath(spark, cmPath)
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.columnMapping.physicalName", "col-x").putLong("delta.columnMapping.id", 1)
      .build()
    val cmSchema = StructType(Seq(StructField("n", LongType, nullable = true, mb)))
    cmLog.commit(0, Seq(
      ProtocolAction(Protocol(2, 5)),
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, cmSchema.json,
        Nil, Map("delta.columnMapping.mode" -> "name"), Some(0L))),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    TransactionWriter.append(cmLog, Seq(1L).toDF("n"))
    val cmSnap = cmLog.snapshot
    assert(cmSnap.read().select("n").as[Long].head() == 1L)
    assert(cmSnap.activeFiles.head.stats.exists(_.contains("\"col-x\"")))

    // appendOnly table: append fine, overwrite (removes) refused
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"),
      configuration = Map("delta.appendOnly" -> "true"))
    TransactionWriter.append(log, Seq((2L, "b")).toDF("n", "s"))
    val e2 = intercept[IllegalArgumentException](
      TransactionWriter.overwrite(log, Seq((9L, "z")).toDF("n", "s")))
    assert(e2.getMessage.contains("appendOnly"))

    // writer-version gate: legacy versions 3..6 are fine while their
    // enforcement features are vacuous — and a DECLARED CHECK
    // constraint is ENFORCED (Constraints.enforced), not refused
    val wvPath = Files.createTempDirectory("graft-hard").resolve("t").toString
    val wvLog = DeltaLog.forPath(spark, wvPath)
    val wvSchema = StructType(Seq(StructField("n", LongType)))
    wvLog.commit(0, Seq(
      ProtocolAction(Protocol(1, 4)),
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, wvSchema.json,
        Nil, Map.empty, Some(0L))),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    TransactionWriter.append(wvLog, Seq(1L).toDF("n")) // vacuous v4: ok
    assert(wvLog.snapshot.read().count() == 1L)
    wvLog.commit(2L, Seq(
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, wvSchema.json,
        Nil, Map("delta.constraints.positive" -> "n > 0"), Some(0L))),
      CommitInfoAction(CommitInfo(0L, "ADD CONSTRAINT"))))
    TransactionWriter.append(wvLog, Seq(2L).toDF("n")) // satisfies n > 0
    assert(wvLog.snapshot.read().count() == 2L)
    val vBefore = wvLog.latestVersion()
    intercept[Exception](
      TransactionWriter.append(wvLog, Seq(-2L).toDF("n")))
    assert(wvLog.latestVersion() == vBefore,
      "violating append must not commit")

    // declared generated column is enforced: a consistent explicit
    // value lands, an inconsistent one aborts (GeneratedColumnsSpec
    // covers the full matrix incl. omission-fill)
    val gcPath = Files.createTempDirectory("graft-hard").resolve("t").toString
    val gcLog = DeltaLog.forPath(spark, gcPath)
    val gcMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.generationExpression", "n + 1").build()
    val gcSchema = StructType(Seq(
      StructField("n", LongType),
      StructField("n1", LongType, nullable = true, gcMeta)))
    gcLog.commit(0, Seq(
      ProtocolAction(Protocol(1, 4)),
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, gcSchema.json,
        Nil, Map.empty, Some(0L))),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    TransactionWriter.append(gcLog, Seq((1L, 2L)).toDF("n", "n1"))
    assert(gcLog.snapshot.read().count() == 1L)
    intercept[Exception](
      TransactionWriter.append(gcLog, Seq((5L, 99L)).toDF("n", "n1")))
    assert(gcLog.snapshot.read().count() == 1L,
      "inconsistent generated value must not commit")
    // identity columns: explicit values refuse (GENERATED ALWAYS),
    // omitted values generate — full semantics in IdentityColumnsSpec
    val idPath = Files.createTempDirectory("graft-hard").resolve("t").toString
    val idLog = DeltaLog.forPath(spark, idPath)
    val idMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("delta.identity.start", 1L).build()
    val idSchema = StructType(Seq(
      StructField("n", LongType, nullable = true, idMeta),
      StructField("s", StringType)))
    idLog.commit(0, Seq(
      ProtocolAction(Protocol(1, 6)),
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, idSchema.json,
        Nil, Map.empty, Some(0L))),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    val e4 = intercept[IllegalArgumentException](
      TransactionWriter.append(idLog, Seq((1L, "a")).toDF("n", "s")))
    assert(e4.getMessage.contains("identity column n"))
    TransactionWriter.append(idLog, Seq("a", "b").toDF("s").coalesce(1))
    assert(idLog.snapshot.read().select("n").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("delta.checkpointInterval writes periodic checkpoints") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"),
      configuration = Map("delta.checkpointInterval" -> "2"))
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s")) // v1
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s")) // v2 → checkpoint
    Maintenance.append(log, Seq((4L, "d")).toDF("n", "s")) // v3
    assert(log.checkpointFiles(2L).nonEmpty, "checkpoint at v2 expected")
    assert(log.checkpointFiles(3L).isEmpty)
    assert(log.lastCheckpointHint().map(_._1).contains(2L))
    // bootstrap path reads it
    assert(DeltaLog.forPath(spark, log.tablePath).snapshot.checkpointVersion.contains(2L))
  }

  test("snapshotAsOf picks the latest version at or before the timestamp") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Thread.sleep(30)
    val betweenCommits = java.time.Instant.now()
    Thread.sleep(30)
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))
    assert(log.snapshotAsOf(betweenCommits).version == 0L)
    assert(log.snapshotAsOf(java.time.Instant.now()).version == 1L)
    intercept[IllegalArgumentException] {
      log.snapshotAsOf(java.time.Instant.ofEpochMilli(1000L)) // before creation
    }
  }

  test("log cleanup keeps everything reconstructible from the checkpoint") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))
    Maintenance.checkpoint(log) // at v2
    Maintenance.append(log, Seq((4L, "d")).toDF("n", "s")) // v3 tail
    val deleted = Maintenance.cleanupLog(log)
    assert(deleted.toSet == Set(f"${0L}%020d.json", f"${1L}%020d.json"), deleted)
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.version == 3L)
    assert(snap.read().count() == 4L)
    // v2 (the checkpoint) and v3 still time-travelable; v0 is gone
    assert(log.snapshotAt(2L).read().count() == 3L)
    intercept[IllegalArgumentException](log.snapshotAt(0L))
  }

  test("appendMergeSchema adds columns; old files read them as null") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    TransactionWriter.appendMergeSchema(log,
      Seq((2L, "b", 3.5)).toDF("n", "s", "score"))
    val snap = log.snapshot
    assert(snap.schema.fieldNames.toSeq == Seq("n", "s", "score"))
    assertSameRows(snap.read(),
      Seq((1L, "a", null.asInstanceOf[java.lang.Double]),
        (2L, "b", java.lang.Double.valueOf(3.5))).toDF("n", "s", "score"))
    // retyping an existing column is still refused
    val e = intercept[IllegalArgumentException](
      TransactionWriter.appendMergeSchema(log, Seq(("x", "y")).toDF("n", "s")))
    assert(e.getMessage.contains("cannot change column types"))
  }

  test("cleanupLog with retainVersions anchors at a real checkpoint") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s")) // v0
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s")) // v1
    Maintenance.checkpoint(log) // cp at v1
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s")) // v2
    Maintenance.append(log, Seq((4L, "d")).toDF("n", "s")) // v3
    Maintenance.checkpoint(log) // cp at v3
    // retain 2 versions back from cp v3 → horizon v1; anchor = cp v1;
    // only commits < v1 may go, and v1..v3 must stay reconstructible
    val deleted = Maintenance.cleanupLog(log, retainVersions = 2L)
    assert(deleted == Seq(f"${0L}%020d.json"), deleted)
    assert(log.snapshotAt(1L).read().count() == 2L)
    assert(log.snapshotAt(2L).read().count() == 3L)
    assert(log.snapshotAt(3L).read().count() == 4L)
  }

  test("appendMergeSchema keeps existing columns' declared nullability") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    assert(log.snapshot.schema("s").nullable)
    // incoming df's columns are non-nullable (primitive Seq) — the
    // committed schema must NOT flip existing columns to non-nullable
    TransactionWriter.appendMergeSchema(log, Seq((2L, "b", 5L)).toDF("n", "s", "x"))
    val schema = log.snapshot.schema
    assert(schema("s").nullable, "existing nullability must be preserved")
    assert(schema("x").nullable, "new columns must be nullable")
  }

  test("append retries through a lost commit race") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    // first commit attempt loses the race (injected); the retry
    // re-resolves the snapshot and succeeds
    var injected = 1
    val flaky = new DeltaLog(spark, log.tablePath) {
      override def commit(version: Long, actions: Seq[Action],
          ictEnabled: Boolean, recomputeChecksum: Boolean): Unit = {
        if (injected > 0) {
          injected -= 1
          // the racing writer takes this version for real...
          super.commit(version, Seq(CommitInfoAction(CommitInfo(0L, "RACER"))))
          // ...so our attempt hits the conflict
          throw new java.util.ConcurrentModificationException("lost race (injected)")
        }
        super.commit(version, actions, ictEnabled, recomputeChecksum)
      }
    }
    val v = TransactionWriter.appendWithRetry(flaky, Seq((2L, "b")).toDF("n", "s"))
    assert(injected == 0 && v == 2L)
    assertSameRows(log.snapshot.read(), Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
  }

  test("racing commits to the same version: exactly one wins") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    log.commit(1, Seq(CommitInfoAction(CommitInfo(0L, "A"))))
    intercept[java.util.ConcurrentModificationException] {
      log.commit(1, Seq(CommitInfoAction(CommitInfo(0L, "B"))))
    }
    // the first commit's content survived
    assert(log.latestVersion() == 1L)
  }

  test("snapshotAt reuses the pinned-version cache; both caches survive recreation") {
    val log = freshLog()
    val path = log.tablePath
    TransactionWriter.overwrite(log, Seq((1L, "old")).toDF("n", "s")) // v0
    TransactionWriter.append(log, Seq((2L, "old")).toDF("n", "s"))    // v1
    val s1a = log.snapshotAt(1L)
    // a later commit does not invalidate a pinned version: the second
    // resolution is served from the cache (same instance — no re-list)
    TransactionWriter.append(log, Seq((3L, "old")).toDF("n", "s"))    // v2
    val s1b = DeltaLog.forPath(spark, path).snapshotAt(1L)
    assert(s1b eq s1a, "pinned snapshot must be served from the cache")
    assert(log.snapshot.read().count() == 3L) // populate the latest cache
    // DELETE the table and re-create a DIFFERENT history at the same
    // path, reaching the same version numbers — existence probes alone
    // would serve stale snapshots; the anchor-file identity must not
    val fs = log.fs
    fs.delete(new Path(path), true)
    val log2 = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log2,
      Seq((10L, "new"), (11L, "new")).toDF("n", "s"))                 // v0
    TransactionWriter.append(log2,
      Seq((12L, "new"), (13L, "new"), (14L, "new")).toDF("n", "s"))   // v1
    TransactionWriter.append(log2, Seq((15L, "new")).toDF("n", "s"))  // v2
    // latest snapshot: same version (2), same _last_checkpoint state
    // (none) — only the anchor identity distinguishes the histories
    val latest = DeltaLog.forPath(spark, path).snapshot
    assert(latest.read().count() == 6L,
      "recreated table's latest snapshot must reflect the new history")
    val s1new = DeltaLog.forPath(spark, path).snapshotAt(1L)
    assert(s1new.read().count() == 5L,
      "pinned snapshot of a recreated history must be re-resolved")
  }
}
