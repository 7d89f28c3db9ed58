package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.SparkTestBase

/** ALTER-style schema evolution over column mapping: upgrade in place,
  * rename/drop/add as metadata-only commits, old data still resolving. */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-evolve").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("enable mapping in place; rename keeps old files readable") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "score"))
    val filesBefore = log.snapshot.activeFiles.map(_.path).toSet

    SchemaEvolution.enableColumnMapping(log)
    assert(log.snapshot.columnMappingMode == "name")
    assert(log.snapshot.protocol.minReaderVersion >= 2)
    // upgrade is metadata-only and the table still reads
    assert(log.snapshot.activeFiles.map(_.path).toSet == filesBefore)
    assertSameRows(log.snapshot.read(),
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "score"))

    SchemaEvolution.renameColumn(log, "score", "points")
    assert(log.snapshot.activeFiles.map(_.path).toSet == filesBefore)
    assertSameRows(log.snapshot.read(),
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "points"))
    // physical name stays pinned to the original logical name
    assert(log.snapshot.physicalNameOf("points") == "score")

    // appends under the new logical name land under the old physical
    TransactionWriter.append(log,
      Seq((3L, "c", 30L)).toDF("id", "name", "points"))
    assert(log.snapshot.read().where(col("points") === 30L).count() == 1)

    // stats pruning still prunes on the renamed column
    val pruned = Skipping.prunedFiles(log.snapshot, Seq(("points", ">", 25L)))
    assert(pruned.size < log.snapshot.activeFiles.size)

    // mutations work across the rename
    Mutations.update(log, col("points") === 10L, Map("points" -> lit(11L)))
    assert(log.snapshot.read().where(col("points") === 11L).count() == 1)
  }

  test("drop hides a column; re-add surfaces nulls, not old bytes") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "secret", 1L), (2L, "hidden", 2L)).toDF("id", "payload", "v"))
    SchemaEvolution.enableColumnMapping(log)
    SchemaEvolution.dropColumn(log, "payload")
    assert(log.snapshot.schema.fieldNames.toSeq == Seq("id", "v"))
    assertSameRows(log.snapshot.read(), Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))

    // re-adding the same logical name gets a FRESH physical name: the
    // dropped column's bytes must NOT resurface
    SchemaEvolution.addColumn(log, "payload", StringType)
    val got = log.snapshot.read().select("payload").collect()
    assert(got.forall(_.isNullAt(0)), "old bytes must not resurface")
    assert(log.snapshot.physicalNameOf("payload") != "payload")
  }

  test("add column on an unmapped table; guards refuse bad alters") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))
    SchemaEvolution.addColumn(log, "extra", LongType)
    assert(log.snapshot.read().select("extra").collect().forall(_.isNullAt(0)))
    TransactionWriter.append(log,
      Seq((2L, "b", Option(7L))).toDF("id", "v", "extra"))
    assert(log.snapshot.read().where(col("extra") === 7L).count() == 1)

    // rename/drop need mapping
    intercept[IllegalArgumentException](SchemaEvolution.renameColumn(log, "v", "w"))
    intercept[IllegalArgumentException](SchemaEvolution.dropColumn(log, "v"))
    SchemaEvolution.enableColumnMapping(log)
    // partition-col drop, duplicate add, missing rename still refuse
    intercept[IllegalArgumentException](SchemaEvolution.addColumn(log, "id", LongType))
    intercept[IllegalArgumentException](SchemaEvolution.renameColumn(log, "nope", "x"))
    intercept[IllegalArgumentException](SchemaEvolution.renameColumn(log, "v", "id"))
  }

  test("partitioned table: rename of a partition column updates metadata") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "part"),
      partitionBy = Some(Seq("part")))
    SchemaEvolution.enableColumnMapping(log)
    SchemaEvolution.renameColumn(log, "part", "bucket")
    assert(log.snapshot.metadata.partitionColumns == Seq("bucket"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "bucket"))
    // dropping the (renamed) partition column refuses
    intercept[IllegalArgumentException](SchemaEvolution.dropColumn(log, "bucket"))
    // appends still route partition values correctly
    TransactionWriter.append(log, Seq((3L, "z", "p1")).toDF("id", "v", "bucket"))
    assert(log.snapshot.read().where(col("bucket") === "p1").count() == 2)
  }

  test("mapped upgrade composes with DV delete and time travel") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    SchemaEvolution.enableColumnMapping(log)
    SchemaEvolution.renameColumn(log, "v", "val")
    Mutations.deleteWithDv(log, col("id") % 5 === 0)
    val got = log.snapshot.read().select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 20L).filter(_ % 5 != 0))
    // time travel to before the upgrade shows the original schema
    assert(log.snapshotAt(0).schema.fieldNames.toSeq == Seq("id", "v"))
    assert(log.snapshotAt(0).read().count() == 20)
  }
}
