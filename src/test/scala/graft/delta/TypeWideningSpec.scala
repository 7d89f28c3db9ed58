package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Type widening (`typeWidening` reader+writer feature): ALTER COLUMN
  * TYPE to a wider type is metadata-only — old narrow parquet files are
  * not rewritten, reads upcast them under the widened schema, appends
  * write the wide type, and the field metadata records each change. */
class TypeWideningSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-widen").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("widen int->long: old files upcast, new files append wide") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1, 10), (2, 20)).toDF("k", "v"))
    val preFiles = log.snapshot.numFiles

    Maintenance.widenColumnType(log, "v", "long")
    val snap = log.snapshot
    assert(snap.metadata.schema("v").dataType == LongType)
    assert(snap.numFiles == preFiles, "widening must not rewrite files")
    assert(snap.protocol.minReaderVersion == 3 &&
      snap.protocol.minWriterVersion == 7)
    assert(snap.protocol.readerFeatures.contains("typeWidening"))
    assert(snap.protocol.writerFeatures.contains("typeWidening"))

    // typeChanges metadata records the change
    val tc = snap.metadata.schema("v").metadata
      .getMetadataArray("delta.typeChanges")
    assert(tc.length == 1)
    assert(tc(0).getString("fromType") == "integer")
    assert(tc(0).getString("toType") == "long")

    // append a genuinely-long value alongside the narrow files
    TransactionWriter.append(log,
      Seq((3, 5000000000L)).toDF("k", "v")
        .select(col("k").cast("int").as("k"), col("v")))
    val out = log.snapshot.read().orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 10L), (2, 20L), (3, 5000000000L)))
  }

  test("widen float->double and chained widenings accumulate metadata") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "f")
        .select(col("k").cast("short").as("k"), col("f")))
    Maintenance.widenColumnType(log, "f", "double")
    Maintenance.widenColumnType(log, "k", "int")
    Maintenance.widenColumnType(log, "k", "long")
    val snap = log.snapshot
    assert(snap.metadata.schema("f").dataType == DoubleType)
    assert(snap.metadata.schema("k").dataType == LongType)
    val tc = snap.metadata.schema("k").metadata
      .getMetadataArray("delta.typeChanges")
    assert(tc.map(c => (c.getString("fromType"), c.getString("toType"))).toSeq ==
      Seq(("short", "integer"), ("integer", "long")))
    val out = snap.read().orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
  }

  test("narrowing and unsupported changes are refused") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "x")).toDF("k", "s"))
    intercept[IllegalArgumentException] {
      Maintenance.widenColumnType(log, "k", "int") // narrowing
    }
    intercept[IllegalArgumentException] {
      Maintenance.widenColumnType(log, "s", "long") // string -> long
    }
  }

  test("stats-based pruning still works across widened files") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1, 10), (2, 20)).toDF("k", "v"))
    Maintenance.widenColumnType(log, "v", "long")
    TransactionWriter.append(log, Seq((3L, 30L)).toDF("k", "v")
      .select(col("k").cast("int").as("k"), col("v")))
    // predicate typed long against files whose stats were written int
    val out = log.snapshot.read().where(col("v") >= 20L).collect()
    assert(out.length == 2)
  }

  // the GRAFT SQL surface for widening is covered in ExtensionsSpec
  // (needs the extension-enabled session)
}
