package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Domain metadata: set/replace/remove replay, checkpoint persistence
  * (classic + v2), protocol upgrades, foreign-line parsing — and the
  * clustered-table domain driving OPTIMIZE. */
class DomainMetadataSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-dm").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("set/replace/remove with latest-wins replay and protocol upgrade") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))   // v0
    assert(log.snapshot.domainMetadata.isEmpty)

    Domains.set(log, "app.retention", """{"days":30}""")              // v1
    val p = log.snapshot.protocol
    assert(p.minWriterVersion == 7 && p.writerFeatures.contains("domainMetadata"))
    assert(Domains.get(log.snapshot, "app.retention").contains("""{"days":30}"""))

    Domains.set(log, "app.retention", """{"days":7}""")               // v2: replace
    Domains.set(log, "app.other", "x")                                // v3
    assert(Domains.get(log.snapshot, "app.retention").contains("""{"days":7}"""))
    assert(log.snapshot.domainMetadata.keySet == Set("app.retention", "app.other"))

    Domains.remove(log, "app.other")                                  // v4: tombstone
    assert(log.snapshot.domainMetadata.keySet == Set("app.retention"))
    // no-op remove: no commit
    assert(Domains.remove(log, "app.other") == log.latestVersion())

    // time travel sees the historical domain state
    assert(log.snapshotAt(3).domainMetadata.keySet ==
      Set("app.retention", "app.other"))
    // table data is untouched by domain commits
    assert(log.snapshot.read().count() == 1L)
  }

  test("domains survive classic and v2 checkpoints") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))
    Domains.set(log, "keep.me", "cfg1")
    Domains.set(log, "drop.me", "cfg2")
    Domains.remove(log, "drop.me")
    Maintenance.checkpoint(log)
    Maintenance.cleanupLog(log)   // force bootstrap from the checkpoint
    val fresh = DeltaLog.forPath(spark, log.tablePath)
    assert(fresh.snapshot.domainMetadata.keySet == Set("keep.me"),
      s"live domains only: ${fresh.snapshot.domainMetadata}")
    assert(Domains.get(fresh.snapshot, "keep.me").contains("cfg1"))

    // v2 checkpoint (parquet manifest) carries the domain too
    Domains.set(fresh, "second.domain", "cfg3")
    Maintenance.checkpointV2(fresh)
    Maintenance.cleanupLog(fresh)
    val fresh2 = DeltaLog.forPath(spark, log.tablePath)
    assert(fresh2.snapshot.domainMetadata.keySet == Set("keep.me", "second.domain"))

    // v2 JSON manifest round trip
    Domains.set(fresh2, "third.domain", "cfg4")
    Maintenance.checkpointV2(fresh2, jsonManifest = true)
    Maintenance.cleanupLog(fresh2)
    val fresh3 = DeltaLog.forPath(spark, log.tablePath)
    assert(fresh3.snapshot.domainMetadata.keySet ==
      Set("keep.me", "second.domain", "third.domain"))
  }

  test("clusterBy records physical paths; OPTIMIZE z-orders along them") {
    val log = freshLog()
    val rows = (1 to 4096).map { i =>
      (i.toLong, (i % 64).toLong, ((i * 2654435761L) % 64))
    }
    TransactionWriter.overwrite(log, rows.toDF("id", "n1", "n2").repartition(8))
    Clustering.clusterBy(log, Seq("n1", "n2"))
    assert(log.snapshot.protocol.writerFeatures.contains("clustering"))
    assert(Clustering.clusteringColumns(log.snapshot) == Seq("n1", "n2"))
    assert(Domains.get(log.snapshot, "delta.clustering")
      .contains("""{"clusteringColumns":[["n1"],["n2"]]}"""))

    val corner = Seq(("n1", "<", 8), ("n2", "<", 8))
    val before = graft.Levi.skippedStats(log.snapshot, corner)
    val perFile = math.max(log.snapshot.activeFiles.map(_.size).sum / 8, 1L)
    // plain OPTIMIZE on a clustered table must Z-order, not round-robin
    Maintenance.compact(log, targetFileBytes = perFile)
    val after = graft.Levi.skippedStats(log.snapshot, corner)
    assert(after("num_files_skipped") > before("num_files_skipped"),
      s"clustered OPTIMIZE should improve pruning: before=$before after=$after")
    assertSameRows(log.snapshot.read(), rows.toDF("id", "n1", "n2"))

    // guards: unknown / partition columns refuse
    intercept[IllegalArgumentException] {
      Clustering.clusterBy(log, Seq("nope"))
    }
    // un-cluster: OPTIMIZE reverts to plain compaction
    Clustering.removeClustering(log)
    assert(Clustering.clusteringColumns(log.snapshot).isEmpty)
  }

  test("second OPTIMIZE on a clustered table is INCREMENTAL (liquid posture)") {
    val log = freshLog()
    val rows = (1 to 4096).map { i =>
      (i.toLong, (i % 64).toLong, ((i * 2654435761L) % 64))
    }
    TransactionWriter.overwrite(log, rows.toDF("id", "n1", "n2").repartition(8))
    Clustering.clusterBy(log, Seq("n1", "n2"))
    val perFile = math.max(log.snapshot.activeFiles.map(_.size).sum / 8, 1L)
    // first OPTIMIZE: no persisted state yet → full z-order, persists it
    Maintenance.compact(log, targetFileBytes = perFile)
    val clustered = log.snapshot.planFiles().map(_.path).toSet
    assert(clustered.size > 1)
    TransactionWriter.append(log,
      (4097 to 4608).map(i => (i.toLong, (i % 64).toLong,
        ((i * 2654435761L) % 64))).toDF("id", "n1", "n2"))
    // second OPTIMIZE: state matches the clustering columns → only the
    // appended files are rewritten, the clustered set keeps its adds
    Maintenance.compact(log, targetFileBytes = perFile)
    val after = log.snapshot.planFiles().map(_.path).toSet
    assert(clustered.subsetOf(after),
      s"liquid OPTIMIZE touched clustered files: ${clustered -- after}")
    assert(log.snapshot.read().count() == 4608L)
    // changing the clustering columns invalidates the state → the next
    // OPTIMIZE falls back to a full re-cluster under the new definition
    Clustering.clusterBy(log, Seq("n2", "n1"))
    Maintenance.compact(log, targetFileBytes = perFile)
    val recl = log.snapshot.planFiles().map(_.path).toSet
    assert(recl.intersect(after).isEmpty,
      "changed clustering definition must trigger a full re-cluster")
    assertSameRows(log.snapshot.read().where(col("id") <= 4096),
      rows.toDF("id", "n1", "n2"))
  }

  test("plain OPTIMIZE keeps the PERSISTED curve: hilbert stays hilbert") {
    val log = freshLog()
    TransactionWriter.overwrite(log,
      (0L until 2048L).map(i => (i % 64L, i / 64L, i)).toDF("a", "b", "id")
        .repartition(8, org.apache.spark.sql.functions.expr("hash(id)")))
    Clustering.clusterBy(log, Seq("a", "b"))
    // explicit HILBERT pass persists curve=hilbert for these columns
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 8192L)
    val clustered = log.snapshot.planFiles().map(_.path).toSet
    // in-bounds append (b stays in the persisted [0,32) range): a
    // wholesale-drifted append would now legitimately route to a FULL
    // pass via the drift gauge — covered by HilbertSpec's drift test
    TransactionWriter.append(log,
      (2048L until 2304L).map(i => (i % 64L, (i / 64L) % 32L, i))
        .toDF("a", "b", "id"))
    // plain OPTIMIZE must maintain INCREMENTALLY under the persisted
    // HILBERT curve — not silently full-re-cluster to z-order
    Maintenance.compact(log, targetFileBytes = 8192L)
    assert(clustered.subsetOf(log.snapshot.planFiles().map(_.path).toSet),
      "plain OPTIMIZE re-clustered a hilbert-maintained table")
    val st = Domains.get(log.snapshot, Maintenance.ClusterStateDomain).get
    assert(JsonUtil.mapper.readTree(st).path("curve").asText() == "hilbert",
      s"persisted curve flipped: $st")
    assert(log.snapshot.read().count() == 2304L)
  }

  test("clustering columns resolve through column mapping") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, 2L)).toDF("a", "b"))
    SchemaEvolution.enableColumnMapping(log)
    Clustering.clusterBy(log, Seq("b"))
    // in-place mapping upgrade assigns physicalName = current name (no
    // file rewrite), so the stored path is "b" — but it is the PHYSICAL
    // "b": renaming the logical column keeps clustering attached
    assert(Clustering.clusteringColumns(log.snapshot) == Seq("b"))
    SchemaEvolution.renameColumn(log, "b", "renamed")
    val cfg = Domains.get(log.snapshot, "delta.clustering").get
    assert(cfg.contains("\"b\""), s"physical path unchanged by rename: $cfg")
    assert(Clustering.clusteringColumns(log.snapshot) == Seq("renamed"))
  }

  test("foreign domainMetadata commit lines parse and replay") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("id", "v"))
    val v = log.latestVersion() + 1
    // hand-written line in another engine's field order + extra field
    val line =
      """{"domainMetadata":{"removed":false,"domain":"ext.engine","configuration":"{\"k\":1}","extra":"ignored"}}"""
    val target = new org.apache.hadoop.fs.Path(log.logPath, f"$v%020d.json")
    val out = log.fs.create(target, false)
    try out.write((line + "\n").getBytes("UTF-8")) finally out.close()
    assert(Domains.get(log.snapshot, "ext.engine").contains("""{"k":1}"""))
  }
}
