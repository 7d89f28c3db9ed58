package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** V2 checkpoints (manifest + sidecar layout): write, read back, and
  * interop details — JSON and parquet manifests, multi-sidecar shards,
  * deletion-vector survival, `_last_checkpoint` bootstrap, shared-
  * sidecar-safe log cleanup, and foreign-layout manifests.
  */
class CheckpointV2Spec extends SparkTestBase {
  import spark.implicits._

  def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-cp2").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  /** Build a 3-commit table: overwrite, append-with-txn, append. */
  def seed(log: DeltaLog): Unit = {
    TransactionWriter.overwrite(log,
      (1L to 50L).map(i => (i, s"v$i")).toDF("n", "s"))               // v0
    TransactionWriter.appendWithTxn(log,
      Seq((100L, "x")).toDF("n", "s"), "app-1", 7L)                   // v1
    Maintenance.append(log, Seq((200L, "y")).toDF("n", "s"))          // v2
  }

  /** Delete the pre-checkpoint commit JSONs so any successful read MUST
    * have come from the checkpoint. */
  def dropCommitsThrough(log: DeltaLog, v: Long): Unit =
    (0L to v).foreach { i =>
      log.fs.delete(new Path(log.logPath, f"$i%020d.json"), false)
    }

  for (json <- Seq(false, true)) {
    val label = if (json) "json manifest" else "parquet manifest"

    test(s"v2 checkpoint round trip ($label)") {
      val log = freshLog()
      seed(log)
      val v = Maintenance.checkpointV2(log, sidecarParts = 2, jsonManifest = json)
      assert(v == 2L)
      // manifest + 2 sidecars on disk, no classic checkpoint file
      val names = log.fs.listStatus(log.logPath).map(_.getPath.getName)
      assert(names.count(_.matches("""\d{20}\.checkpoint\.[^.]+\.(json|parquet)""")) == 1)
      assert(!names.exists(_.matches("""\d{20}\.checkpoint\.parquet""")))
      assert(log.fs.listStatus(new Path(log.logPath, "_sidecars"))
        .count(_.getPath.getName.endsWith(".parquet")) == 2)
      dropCommitsThrough(log, 2L)
      val snap = log.snapshot
      assert(snap.version == 2L)
      assertSameRows(snap.read(),
        ((1L to 50L).map(i => (i, s"v$i")) ++ Seq((100L, "x"), (200L, "y"))).toDF("n", "s"))
      // txn state survives the manifest
      assert(snap.setTransactions.get("app-1").map(_.version).contains(7L))
      // stats survive the sidecars (addsFlat sees numRecords)
      assert(snap.addsFlat.selectExpr("sum(num_records)").as[Long].head() == 52L)
    }

    test(s"v2 checkpoint + post-checkpoint tail ($label)") {
      val log = freshLog()
      seed(log)
      Maintenance.checkpointV2(log, jsonManifest = json)
      Maintenance.append(log, Seq((300L, "z")).toDF("n", "s"))        // v3
      dropCommitsThrough(log, 2L)
      val snap = log.snapshot
      assert(snap.version == 3L)
      assert(snap.read().count() == 53L)
      assert(snap.checkpointVersion.contains(2L))
    }
  }

  test("deletion vectors survive a v2 checkpoint") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (1L to 100L).map(i => (i, s"v$i")).toDF("n", "s").coalesce(1))
    val committedV = Mutations.deleteWithDv(log, org.apache.spark.sql.functions.col("n") <= 10L)
    assert(committedV == 1L)
    Maintenance.checkpointV2(log)
    dropCommitsThrough(log, 1L)
    val snap = log.snapshot
    assert(snap.read().count() == 90L)
    assert(snap.read().agg(org.apache.spark.sql.functions.min("n")).as[Long].head() == 11L)
  }

  test("_last_checkpoint bootstrap resolves a v2 checkpoint") {
    val log = freshLog()
    seed(log)
    Maintenance.checkpointV2(log)
    Maintenance.append(log, Seq((300L, "z")).toDF("n", "s"))          // v3
    // bootstrap path: pointer at v2, forward-probe finds v3
    val snap = log.snapshot
    assert(snap.version == 3L && snap.checkpointVersion.contains(2L))
    assert(snap.read().count() == 53L)
  }

  test("cleanupLog removes dead v2 sidecars but keeps shared/live ones") {
    val log = freshLog()
    seed(log)
    Maintenance.checkpointV2(log)                                     // cp @ v2
    Maintenance.append(log, Seq((300L, "z")).toDF("n", "s"))          // v3
    Maintenance.checkpointV2(log)                                     // cp @ v3
    val sidecarsBefore = log.fs.listStatus(new Path(log.logPath, "_sidecars"))
      .map(_.getPath.getName).toSet
    assert(sidecarsBefore.size == 2)
    val deleted = Maintenance.cleanupLog(log)
    // cp@v2's manifest and its (unshared) sidecar are gone; cp@v3 intact
    assert(deleted.exists(_.contains(".checkpoint.")))
    val sidecarsAfter = log.fs.listStatus(new Path(log.logPath, "_sidecars"))
      .map(_.getPath.getName).toSet
    assert(sidecarsAfter.size == 1)
    assert(sidecarsAfter.subsetOf(sidecarsBefore))
    assert(log.snapshot.read().count() == 53L)
  }

  test("foreign v2 JSON manifest with unusual field order and tags reads") {
    val log = freshLog()
    seed(log)                                                         // v0..v2
    // Write sidecar + manifest BY HAND (not via checkpointV2) to mimic
    // another engine's layout: tags on checkpointMetadata, sizeInBytes
    // omitted on the sidecar ref, actions in a different order.
    val snap0 = log.snapshot
    val fs = log.fs
    val sidecarDir = new Path(log.logPath, "_sidecars")
    fs.mkdirs(sidecarDir)
    Maintenance.checkpointV2(log) // produce a sidecar we can reuse…
    val producedSidecar = fs.listStatus(sidecarDir).map(_.getPath.getName)
      .find(_.endsWith(".parquet")).get
    // …then replace the manifest with a hand-written JSON one.
    fs.listStatus(log.logPath).map(_.getPath)
      .filter(_.getName.matches("""\d{20}\.checkpoint\..*"""))
      .foreach(fs.delete(_, false))
    val m = snap0.metadata
    val lines = Seq(
      s"""{"sidecar":{"path":"$producedSidecar"}}""",
      s"""{"metaData":{"id":"${m.id}","format":{"provider":"parquet","options":{}},"schemaString":${JsonUtil.mapper.writeValueAsString(m.schemaString)},"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"checkpointMetadata":{"version":2,"tags":{"writer":"foreign-engine"}}}""")
    val target = new Path(log.logPath,
      f"${2L}%020d.checkpoint.3a0d65cd-4056-49b8-937b-95f9e3ee90b5.json")
    val out = fs.create(target, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    dropCommitsThrough(log, 2L)
    // kill the _last_checkpoint pointer to force full-listing resolution
    fs.delete(new Path(log.logPath, "_last_checkpoint"), false)
    val snap = log.snapshot
    assert(snap.version == 2L)
    assert(snap.read().count() == 52L)
  }

  test("v2 manifest declaring the wrong version is refused") {
    val log = freshLog()
    seed(log)
    Maintenance.checkpointV2(log, jsonManifest = true)
    // corrupt: rewrite the manifest's checkpointMetadata version
    val fs = log.fs
    val manifest = fs.listStatus(log.logPath).map(_.getPath)
      .find(_.getName.matches("""\d{20}\.checkpoint\.[^.]+\.json""")).get
    val text = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(manifest), "UTF-8"))
      try Iterator.continually(in.readLine()).takeWhile(_ != null).mkString("\n")
      finally in.close()
    }
    val out = fs.create(manifest, true)
    try out.write(text.replace(""""version":2""", """"version":9""").getBytes("UTF-8"))
    finally out.close()
    dropCommitsThrough(log, 2L)
    fs.delete(new Path(log.logPath, "_last_checkpoint"), false)
    val e = intercept[IllegalArgumentException](log.snapshot.read())
    assert(e.getMessage.contains("declares version"))
  }

  test("delta.checkpointPolicy=v2 makes the auto-checkpoint write v2 layout") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"),
      configuration = Map(
        "delta.checkpointInterval" -> "2", "delta.checkpointPolicy" -> "v2"))
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v1
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))            // v2 -> auto-cp
    val names = log.fs.listStatus(log.logPath).map(_.getPath.getName)
    assert(names.exists(_.matches("""0*2\.checkpoint\.[^.]+\.parquet""")),
      s"expected a v2 checkpoint at version 2, log contains: ${names.mkString(", ")}")
    assert(!names.exists(_.matches("""\d{20}\.checkpoint\.parquet""")))
    assert(log.snapshot.read().count() == 3L)
  }

  test("requireReadable accepts reader v3 with the v2Checkpoint feature") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    // upgrade the protocol to table features with v2Checkpoint listed
    log.commit(1L, Seq(
      ProtocolAction(Protocol(3, 7, Set("v2Checkpoint"), Set("v2Checkpoint")))))
    assert(log.snapshot.read().count() == 1L)
    // …but an unknown reader feature still refuses
    log.commit(2L, Seq(
      ProtocolAction(Protocol(3, 7, Set("someFutureFeature"), Set()))))
    val e = intercept[IllegalArgumentException](log.snapshot)
    assert(e.getMessage.contains("someFutureFeature"))
  }
}
