package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Variant columns (`variantType` reader+writer feature): write, read,
  * shred with variant_get, survive append/DV-delete, and force the
  * feature-list protocol so unaware readers refuse instead of
  * mis-decoding. */
class VariantSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-variant").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("variant column round-trips through the delta layer") {
    val log = freshLog()
    val df = Seq(
      (1L, """{"kind": "img", "w": 640}"""),
      (2L, """{"kind": "txt", "len": 9000}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("meta"))
    TransactionWriter.overwrite(log, df)
    val snap = log.snapshot
    assert(snap.protocol.minReaderVersion == 3 &&
      snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.contains("variantType"))
    assert(snap.protocol.writerFeatures.contains("variantType"))
    assert(snap.metadata.schema("meta").dataType.typeName == "variant")
    val kinds = snap.read()
      .select(expr("variant_get(meta, '$.kind', 'string')").as("k"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kinds == Seq("img", "txt"))
  }

  test("appends and DV deletes work on variant tables") {
    val log = freshLog()
    def mk(rows: (Long, String)*) = rows.toSeq.toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("meta"))
    TransactionWriter.overwrite(log, mk(1L -> """{"a": 1}""", 2L -> """{"a": 2}"""))
    TransactionWriter.append(log, mk(3L -> """{"a": 3}"""))
    Mutations.deleteWithDv(log, col("id") === 2L)
    val out = log.snapshot.read()
      .select(col("id"), expr("variant_get(meta, '$.a', 'long')").as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((1L, 1L), (3L, 3L)))
  }

  test("writing a variant into an existing plain table upgrades the protocol") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "x")).toDF("id", "s"))
    assert(log.snapshot.protocol.minWriterVersion < 7)
    TransactionWriter.overwrite(log,
      Seq((1L, """{"v": 1}""")).toDF("id", "j")
        .select(col("id"), parse_json(col("j")).as("meta")))
    val p = log.snapshot.protocol
    assert(p.readerFeatures.contains("variantType"), p.toString)
    assert(p.writerFeatures.contains("variantType"))
  }

  test("stats plane stays usable: pruning and addsFlat on variant tables") {
    val log = freshLog()
    val df = Seq((1L, """{"a": 1}"""), (2L, """{"a": 2}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("meta"))
    TransactionWriter.overwrite(log, df)
    val snap = log.snapshot
    // id still carries min/max; meta has none but must not break parse
    val flat = snap.addsFlat.select("num_records", "min.id", "max.id").collect()
    assert(flat.nonEmpty && flat.map(_.getLong(0)).sum == 2L)
    val pruned = snap.planFilesForPredicate(col("id") === 1L)
    assert(pruned.nonEmpty)
    assert(graft.Levi.rowCountFromLog(snap).contains(2L))
  }
}
