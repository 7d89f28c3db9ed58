package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** `<version>.crc` checksum files: incremental maintenance across the
  * commit paths, replay validation, and tamper detection. */
class ChecksumSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-crc").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  private def crcText(log: DeltaLog, v: Long): String = {
    val in = log.fs.open(Checksum.crcPath(log, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("every commit path writes a .crc that matches replay") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (1L to 10L).map(i => (i, s"v$i")).toDF("n", "s").repartition(2)) // v0
    TransactionWriter.append(log, Seq((11L, "x")).toDF("n", "s"))      // v1
    Mutations.delete(log, col("n") === 1L)                              // v2: rewrite
    Mutations.deleteWithDv(log, col("n") === 2L)                        // v3: DV (net 0 files)
    (0L to 3L).foreach { v =>
      assert(log.fs.exists(Checksum.crcPath(log, v)), s"missing $v.crc")
      assert(Checksum.validate(log, v).isEmpty,
        s"v$v: ${Checksum.validate(log, v)}")
    }
    // the recorded state is the delta-spark VersionChecksum shape
    val parsed = JsonUtil.mapper.readTree(crcText(log, 3L))
    assert(parsed.get("numFiles").asLong() == log.snapshot.numFiles)
    assert(parsed.get("metadata").get("schemaString") != null)
    assert(parsed.get("protocol").get("minReaderVersion") != null)
  }

  test("a tampered .crc fails validation and blocks checkpointing") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    val crc = Checksum.read(log, 0L).get
    val bad = JsonUtil.mapper.readTree(crcText(log, 0L))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    bad.put("numFiles", crc.numFiles + 7)
    val out = log.fs.create(Checksum.crcPath(log, 0L), true)
    try out.write(bad.toString.getBytes("UTF-8")) finally out.close()
    assert(Checksum.validate(log, 0L).exists(_.contains("mismatch")))
    val e = intercept[IllegalStateException](Maintenance.checkpoint(log))
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("a broken chain skips silently and never fails commits") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))    // v0
    log.fs.delete(Checksum.crcPath(log, 0L), false)
    TransactionWriter.append(log, Seq((2L, "b")).toDF("n", "s"))       // v1: no prev
    assert(!log.fs.exists(Checksum.crcPath(log, 1L)),
      "v1 crc must be skipped when v0's is missing")
    assert(Checksum.validate(log, 1L).isEmpty, "missing crc validates vacuously")
    assert(log.snapshot.read().count() == 2L)
    // checkpointing is unaffected by an absent chain
    assert(Maintenance.checkpoint(log) == 1L)
  }
}
