package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkTestBase

/** In-commit timestamps (writer feature): enablement, monotonic
  * stamping as the FIRST commit action, ICT-based time travel that
  * ignores file modification times, and clock-skew behavior. */
class InCommitTimestampSpec extends SparkTestBase {
  import spark.implicits._

  def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-ict").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  def rawFirstLine(log: DeltaLog, v: Long): String = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      log.fs.open(new Path(log.logPath, f"$v%020d.json")), "UTF-8"))
    try in.readLine() finally in.close()
  }

  test("enablement upgrades protocol and pins enablement properties") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    val v = Maintenance.enableInCommitTimestamps(log)                 // v1
    assert(v == 1L)
    val snap = log.snapshot
    assert(snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.writerFeatures.contains("inCommitTimestamp"))
    val conf = snap.metadata.configuration
    assert(conf.get("delta.enableInCommitTimestamps").contains("true"))
    assert(conf.get("delta.inCommitTimestampEnablementVersion").contains("1"))
    val pinned = conf("delta.inCommitTimestampEnablementTimestamp").toLong
    assert(log.inCommitTimestampOf(1L).contains(pinned))
    // idempotent
    assert(Maintenance.enableInCommitTimestamps(log) == 1L)
    assert(log.latestVersion() == 1L)
  }

  test("subsequent commits carry strictly increasing ICTs as the first action") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    Maintenance.enableInCommitTimestamps(log)                         // v1
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v2
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))            // v3
    Mutations.deleteWithDv(log, org.apache.spark.sql.functions.col("n") === 2L) // v4
    val icts = (1L to 4L).map(v => log.inCommitTimestampOf(v))
    assert(icts.forall(_.isDefined), s"every post-enablement commit must carry an ICT: $icts")
    assert(icts.flatten.sliding(2).forall { case Seq(a, b) => a < b },
      s"ICTs must be strictly increasing: ${icts.flatten}")
    // spec: the stamped commitInfo must be the FIRST action line
    (1L to 4L).foreach { v =>
      assert(rawFirstLine(log, v).contains("\"inCommitTimestamp\""),
        s"commit $v first line must be the ICT commitInfo")
    }
    // pre-enablement commit has none
    assert(log.inCommitTimestampOf(0L).isEmpty)
  }

  test("snapshotAsOf uses ICT, not file modification times") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    Maintenance.enableInCommitTimestamps(log)                         // v1
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v2
    Thread.sleep(15)
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))            // v3
    val ict2 = log.inCommitTimestampOf(2L).get
    val ict3 = log.inCommitTimestampOf(3L).get
    assert(ict2 < ict3)
    // Sabotage every commit file's mtime to 1970: an mtime-based reader
    // would now resolve any timestamp to the LATEST version.
    (0L to 3L).foreach { v =>
      log.fs.setTimes(new Path(log.logPath, f"$v%020d.json"), 1000L, -1)
    }
    val atIct2 = log.snapshotAsOf(java.time.Instant.ofEpochMilli(ict2))
    assert(atIct2.version == 2L,
      s"expected version 2 at ict2=$ict2, got ${atIct2.version}")
    assert(atIct2.read().count() == 2L)
    val between = log.snapshotAsOf(java.time.Instant.ofEpochMilli(ict3 - 1))
    assert(between.version == 2L)
    assert(log.snapshotAsOf(
      java.time.Instant.ofEpochMilli(ict3)).version == 3L)
  }

  test("pre-enablement range still time-travels by modification time") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v1
    // distinct, sane mtimes for the pre-ICT range
    log.fs.setTimes(new Path(log.logPath, f"${0L}%020d.json"), 100000L, -1)
    log.fs.setTimes(new Path(log.logPath, f"${1L}%020d.json"), 200000L, -1)
    Maintenance.enableInCommitTimestamps(log)                         // v2
    Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))            // v3
    assert(log.snapshotAsOf(java.time.Instant.ofEpochMilli(100000L)).version == 0L)
    assert(log.snapshotAsOf(java.time.Instant.ofEpochMilli(250000L)).version == 1L)
    // post-enablement instants resolve by ICT
    val ict3 = log.inCommitTimestampOf(3L).get
    assert(log.snapshotAsOf(java.time.Instant.ofEpochMilli(ict3)).version == 3L)
  }

  test("monotonicity survives a backwards wall clock") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    Maintenance.enableInCommitTimestamps(log)                         // v1
    // Simulate a clock far in the future having stamped v2: hand-commit
    // with a caller-chosen monotone ICT (commit() keeps it).
    val future = System.currentTimeMillis() + 86400000L
    log.commit(2L, Seq(
      CommitInfoAction(CommitInfo(future, "MANUAL", Map.empty,
        inCommitTimestamp = Some(future)))), ictEnabled = true)
    assert(log.inCommitTimestampOf(2L).contains(future))
    // The next real commit's clock (now) is BEHIND v2's ICT: the stamp
    // must still advance, not regress.
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v3
    assert(log.inCommitTimestampOf(3L).contains(future + 1))
  }

  test("history surfaces the ICT as the commit timestamp") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))   // v0
    Maintenance.enableInCommitTimestamps(log)                         // v1
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))            // v2
    val ict2 = log.inCommitTimestampOf(2L).get
    val ts = Maintenance.history(log)
      .where(org.apache.spark.sql.functions.col("version") === 2L)
      .select("timestamp").as[java.sql.Timestamp].head()
    assert(ts.getTime == ict2)
  }
}
