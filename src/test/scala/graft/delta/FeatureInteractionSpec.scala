package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Kitchen-sink interaction: one table accumulating column mapping,
  * CDF, row tracking, ICT, deletion vectors, clustering, constraints,
  * type widening, checksums, and a v2 checkpoint — then mutations,
  * OPTIMIZE, RESTORE, and replay-from-checkpoint must all still agree.
  * Feature pairs are individually tested elsewhere; this guards the
  * n-way combinations a long-lived production table actually reaches. */
class FeatureInteractionSpec extends SparkTestBase {
  import spark.implicits._

  test("all features on one table: mutate, widen, checkpoint, restore, replay") {
    val path = Files.createTempDirectory("graft-kitchen").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)

    // v0: column-mapped create with data
    TransactionWriter.overwrite(log,
      (1L to 100L).map(i => (i, i * 10, s"r$i")).toDF("id", "v", "s")
        .select(col("id"), col("v").cast("int").as("v"), col("s")),
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    // features pile on
    RowTracking.enable(log)
    Maintenance.enableInCommitTimestamps(log)
    Constraints.addCheckConstraint(log, "v_pos", "v > 0")
    Clustering.clusterBy(log, Seq("v"))
    Maintenance.widenColumnType(log, "v", "long")

    // mutations across the stack
    Mutations.deleteWithDv(log, col("id") % 10 === 0)          // DV
    Mutations.update(log, col("id") === 7L,                    // rewrite
      Map("s" -> lit("updated")))
    val preRestoreVersion = log.snapshot.version
    val preRestoreRows = log.snapshot.read().count()
    assert(preRestoreRows == 90L)

    // constraint still enforced through every feature layer
    intercept[Exception] {
      TransactionWriter.append(log,
        Seq((999L, -5L, "bad")).toDF("id", "v", "s"))
    }

    // OPTIMIZE (clustered -> zorder) keeps rows + row tracking
    Maintenance.compact(log, targetFileBytes = 1L << 20)
    assert(log.snapshot.read().count() == 90L)
    assert(log.snapshot.activeFiles.forall(_.baseRowId.nonEmpty))

    // v2 checkpoint + replay from it
    Maintenance.checkpointV2(log)
    val fresh = DeltaLog.forPath(spark, path)
    assert(fresh.snapshot.read().count() == 90L)
    assert(fresh.snapshot.metadata.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    val feats = fresh.snapshot.protocol.readerFeatures ++
      fresh.snapshot.protocol.writerFeatures
    Seq("columnMapping", "changeDataFeed", "rowTracking",
      "inCommitTimestamp", "checkConstraints", "clustering",
      "typeWidening", "deletionVectors", "domainMetadata")
      .foreach(f => assert(feats.contains(f), s"missing feature $f in $feats"))

    // CDF across the whole run: deletes from the DV commit visible
    val changes = ChangeDataFeed.tableChanges(fresh, 0L, None)
    assert(changes.where(col("_change_type") === "delete").count() == 10L)

    // restore to the pre-mutation version and read through again
    Maintenance.restore(fresh, preRestoreVersion)
    assert(fresh.snapshot.read().count() == 90L)
    assert(fresh.snapshot.read().where(col("s") === "updated").count() == 1L)

    // checksum chain validates at the head
    assert(Checksum.read(fresh, fresh.snapshot.version).nonEmpty)
  }

  test("identity + first variant in ONE write emit ONE combined ProtocolAction (round-6 advice)") {
    import org.apache.spark.sql.types._
    val path = Files.createTempDirectory("graft-proto2").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // plain table, legacy protocol, no identity / variant features
    TransactionWriter.overwrite(log, Seq((1L, "x")).toDF("k", "s"))
    assert(log.snapshot.protocol.minWriterVersion < 6)

    // one write that BOTH declares an identity column on the existing
    // table AND introduces the first variant column: the two upgrades
    // must accumulate into a single ProtocolAction (two actions would
    // drop identityColumns on last-wins replay)
    val declared = StructType(Seq(
      IdentityColumns.field("id"),
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("meta", VariantType)))
    TransactionWriter.overwriteWithSchema(log,
      Seq((2L, "y", """{"a": 1}""")).toDF("k", "s", "j")
        .select(col("k"), col("s"), parse_json(col("j")).as("meta")),
      declared)
    val v = log.latestVersion()
    val protoActions = log.commitActions(v).collect {
      case ProtocolAction(p) => p
    }
    assert(protoActions.size == 1,
      s"expected ONE ProtocolAction, got ${protoActions.size}")
    val p = log.snapshot.protocol
    assert(p.writerFeatures.contains("identityColumns"), p.toString)
    assert(p.writerFeatures.contains("variantType"), p.toString)
    assert(p.readerFeatures.contains("variantType"), p.toString)
  }
}
