package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def scratch(): (DeltaLog, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomidx_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    // 200 high-cardinality keys scattered over 8 files: every file's
    // [min, max] interval covers nearly the whole key space, so stats
    // skipping cannot prune a point probe — the Bloom index must
    val rows = (0L until 200L).map(i => (i, s"key_${i * 7919 % 200}"))
      .toDF("id", "k")
      .repartition(8, col("id"))
    TransactionWriter.overwrite(log, rows)
    (log, dir)
  }

  test("point lookup matches the full-scan filter and prunes files") {
    val (log, _) = scratch()
    BloomIndex.build(log, "k")
    val expected = log.snapshot.read().where($"k" === "key_42")
      .collect().map(_.getLong(0)).sorted
    val (files, pruned) = BloomIndex.candidateFiles(log, "k", Seq("key_42"))
    assert(pruned > 0, "index pruned nothing on a needle probe")
    assert(files.size + pruned == log.snapshot.planFiles().size)
    val got = BloomIndex.readIn(log, "k", Seq("key_42"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == expected.toSeq, s"pruned read lost/added rows")
  }

  test("absent value returns empty; multi-value probe unions candidates") {
    val (log, _) = scratch()
    BloomIndex.build(log, "k")
    assert(BloomIndex.readIn(log, "k", Seq("no_such_key")).isEmpty)
    val got = BloomIndex.readIn(log, "k", Seq("key_1", "key_2"))
      .select("k").distinct().as[String].collect().sorted
    assert(got.toSeq == Seq("key_1", "key_2"))
  }

  test("files appended after the build are conservatively scanned") {
    val (log, _) = scratch()
    BloomIndex.build(log, "k")
    TransactionWriter.append(log,
      Seq((9999L, "only_in_new_file")).toDF("id", "k"))
    val freshLog = DeltaLog.forPath(spark, log.tablePath)
    val got = BloomIndex.readIn(freshLog, "k", Seq("only_in_new_file"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(9999L),
      "a stale index must never hide rows in uncovered files")
  }

  test("GRAFT SQL surface: CREATE/DROP BLOOM INDEX round-trip") {
    val (log, dir) = scratch()
    val v = graft.plans.GraftSqlParser.run(spark,
      s"GRAFT CREATE BLOOM INDEX ON '$dir' (k)").collect()(0).getLong(0)
    assert(v == log.snapshot.version)
    val (_, pruned) = BloomIndex.candidateFiles(log, "k", Seq("key_42"))
    assert(pruned > 0)
    val dropped = graft.plans.GraftSqlParser.run(spark,
      s"GRAFT DROP BLOOM INDEX ON '$dir' (k)").collect()(0).getLong(0)
    assert(dropped == 1L)
    val (files2, pruned2) = BloomIndex.candidateFiles(log, "k", Seq("key_42"))
    assert(pruned2 == 0 && files2.size == log.snapshot.planFiles().size)
  }

  test("unindexed table falls back to the full candidate set") {
    val (log, _) = scratch()
    val (files, pruned) = BloomIndex.candidateFiles(log, "k", Seq("key_0"))
    assert(pruned == 0 && files.size == log.snapshot.planFiles().size)
  }
}
