package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LshIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again"
  private val tweaked =
    "the quick brown fox jumps over the lazy dog again and then"
  private val fresh =
    "completely different content with no overlap whatsoever in any gram here"
  private val other =
    "other prior text entirely unrelated to anything else written here today"

  private def scratch(): (DeltaLog, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    val rows = Seq((100L, base), (101L, other))
      .toDF("id", "text").repartition(2, col("id"))
    TransactionWriter.overwrite(log, rows)
    (log, dir)
  }

  private def batch() = Seq(
    (1L, base),     // exact dup of prior 100
    (2L, tweaked),  // near-dup of prior 100
    (3L, fresh), (4L, fresh) // intra-batch dups survive (cross only)
  ).toDF("id", "text")

  test("indexed dedup ≡ direct dedupAgainstCorpus; no index degrades to direct") {
    val (log, _) = scratch()
    // no index yet: degrade to the direct operator
    val noIdx = LshIndex.dedupBatch(log, batch(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(noIdx == Seq(3L, 4L), s"got $noIdx")
    LshIndex.build(log, "id", "text")
    val viaIdx = LshIndex.dedupBatch(log, batch(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val direct = graft.operators.MinHashLsh
      .dedupAgainstCorpus(batch(), log.snapshot.read(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaIdx == direct && viaIdx == Seq(3L, 4L), s"idx=$viaIdx direct=$direct")
  }

  test("indexed containment ≡ direct containmentAgainstCorpus; covered + live files; no index degrades") {
    val (log, _) = scratch()
    val bigPrior = (0 until 300).map(j => s"w${j}_alpha").mkString(" ")
    TransactionWriter.append(log,
      Seq((102L, bigPrior)).toDF("id", "text"))
    val cBatch = Seq(
      (1L, (0 until 9).map(j => s"w${j}_alpha").mkString(" ")), // tiny prefix of 102
      (2L, base),                                               // exact dup of 100
      (3L, fresh))                                              // unrelated
      .toDF("id", "text")
    def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select("id_new", "id_prior").as[(Long, Long)].collect().sorted.toSeq
    // no index: degrade to the direct operator
    val noIdx = pairsOf(LshIndex.containmentBatch(log, cBatch, "id", "text", 0.9))
    assert(noIdx == Seq((1L, 102L), (2L, 100L)), s"got $noIdx")
    LshIndex.build(log, "id", "text")
    // append an UNCOVERED prior file after the build: the probe must
    // union the live pipeline for it
    TransactionWriter.append(log,
      Seq((103L, (0 until 300).map(j => s"u${j}_live").mkString(" ")))
        .toDF("id", "text"))
    val freshLog = DeltaLog.forPath(spark, log.tablePath)
    val liveBatch = cBatch.unionByName(Seq(
      (4L, (0 until 9).map(j => s"u${j}_live").mkString(" ")))
      .toDF("id", "text"))
    val viaIdx = pairsOf(LshIndex.containmentBatch(
      freshLog, liveBatch, "id", "text", 0.9))
    val direct = pairsOf(graft.operators.MinHashLsh.containmentAgainstCorpus(
      liveBatch, freshLog.snapshot.read(), "id", "text", 0.9))
    assert(viaIdx == direct, s"idx=$viaIdx direct=$direct")
    assert(viaIdx == Seq((1L, 102L), (2L, 100L), (4L, 103L)), s"got $viaIdx")
  }

  test("refresh scans ONLY uncovered files (old entries verbatim) and is idle-free") {
    val (log, _) = scratch()
    LshIndex.build(log, "id", "text")
    val before = LshIndex.entries(log, "id", "text").get
      .select("file_path", "version").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // new corpus file containing a doc the batch near-duplicates
    TransactionWriter.append(log,
      Seq((200L, fresh)).toDF("id", "text"))
    val freshLog = DeltaLog.forPath(spark, log.tablePath)
    LshIndex.refresh(freshLog, "id", "text")
    val after = LshIndex.entries(log, "id", "text").get
      .select("file_path", "version").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (p, v) =>
      assert(after.get(p).contains(v), s"entry $p was rebuilt or lost") }
    assert(after.size > before.size, "appended file not covered")
    // the refreshed index now drops batch doc 3/4 (dup of new prior 200)
    val got = LshIndex.dedupBatch(freshLog, batch(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got.isEmpty, s"got $got")
    // idle refresh publishes nothing: the generation pointer is stable
    val dir = new org.apache.hadoop.fs.Path(
      LshIndex.indexDir(log, "id", "text"), "_current")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pointer(): String = {
      val in = fs.open(dir)
      try scala.io.Source.fromInputStream(in).mkString finally in.close()
    }
    val p0 = pointer()
    LshIndex.refresh(DeltaLog.forPath(spark, log.tablePath), "id", "text")
    assert(pointer() == p0, "idle refresh must not publish a new generation")
  }

  test("a DV'd file leaves coverage: deleted prior docs stop killing batch docs") {
    val (log, _) = scratch()
    LshIndex.build(log, "id", "text")
    // delete prior doc 100 via a deletion vector: its FILE stays, its
    // index entries go stale — dedup must fall back to the file's
    // LOGICAL rows, so batch docs 1/2 (dups of the deleted 100) SURVIVE
    Mutations.deleteWithDv(log, col("id") === 100L)
    val freshLog = DeltaLog.forPath(spark, log.tablePath)
    val got = LshIndex.dedupBatch(freshLog, batch(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val direct = graft.operators.MinHashLsh
      .dedupAgainstCorpus(batch(), freshLog.snapshot.read(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == direct && got == Seq(1L, 2L, 3L, 4L), s"got $got direct=$direct")
    // refresh drops the stale entries (DV'd file is not coverable)
    LshIndex.refresh(freshLog, "id", "text")
    val paths = LshIndex.entries(log, "id", "text").get
      .select("file_path").distinct().collect().map(_.getString(0)).toSet
    val dved = freshLog.snapshot.planFiles()
      .filter(_.deletionVector.exists(_.cardinality > 0))
      .flatMap(f => freshLog.snapshot.pathCandidates(f).map(Mutations.normalize))
      .toSet
    assert(paths.forall(p => !dved.contains(Mutations.normalize(p))),
      "stale entries of a DV'd file must be dropped at refresh")
  }

  test("compaction invalidates old entries; refresh re-covers the new files") {
    val (log, _) = scratch()
    LshIndex.build(log, "id", "text")
    Maintenance.compact(log)
    val freshLog = DeltaLog.forPath(spark, log.tablePath)
    // pre-refresh: old entries unusable (their files left the active
    // set) — the probe computes everything live, result still exact
    val got = LshIndex.dedupBatch(freshLog, batch(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 4L), s"got $got")
    LshIndex.refresh(freshLog, "id", "text")
    val entryPaths = LshIndex.entries(log, "id", "text").get
      .select("file_path").distinct().collect().map(_.getString(0)).toSet
    val activeNorm = freshLog.snapshot.planFiles()
      .flatMap(f => freshLog.snapshot.pathCandidates(f).map(Mutations.normalize))
      .toSet
    assert(entryPaths.nonEmpty &&
      entryPaths.forall(p => activeNorm.contains(Mutations.normalize(p))),
      "refresh must drop dead entries and cover the rewritten files")
  }

  test("validation: partition/text-type/missing columns refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx_v_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      Seq((1L, "a", "x y z")).toDF("id", "part", "text"),
      partitionBy = Some(Seq("part")))
    intercept[IllegalArgumentException] {
      LshIndex.build(log, "id", "part") }
    intercept[IllegalArgumentException] {
      LshIndex.build(log, "id", "nope") }
    intercept[IllegalArgumentException] {
      LshIndex.build(log, "id", "id") } // non-string text column
  }
}
