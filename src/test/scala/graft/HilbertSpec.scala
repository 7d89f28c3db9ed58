package graft

import graft.functions.Hilbert
import graft.delta.{DeltaLog, Maintenance, TransactionWriter}
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkTestBase {
  import spark.implicits._

  test("index2 expression matches the reference walk on a full grid") {
    val bits = 5
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val got = grid.select($"x", $"y",
        Hilbert.index2($"x", $"y", bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0L until n; y <- 0L until n)
      assert(got((x, y)) == Hilbert.xy2d(bits, x, y), s"mismatch at ($x,$y)")
  }

  test("the curve is a bijection and every step is grid-adjacent") {
    // the defining Hilbert property — this self-validates the bit
    // twiddling: any error in quadrant digits or rotation breaks
    // adjacency somewhere on the grid
    val bits = 5
    val n = 1 << bits
    val byD = (0L until n).flatMap(x => (0L until n).map(y =>
      Hilbert.xy2d(bits, x, y) -> ((x, y)))).toMap
    assert(byD.size == n * n, "not a bijection")
    for (d <- 0L until (n * n - 1L)) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d ($x1,$y1) and d=${d + 1} ($x2,$y2)")
    }
  }

  test("hilbertCluster preserves content and tightens 2-D file boxes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbert_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    // 64x64 grid scattered randomly (by hash) over 16 files: before
    // clustering every file's (a, b) box covers ~the whole plane
    val rows = (0L until 4096L).map(i => (i % 64L, i / 64L, i))
      .toDF("a", "b", "id")
      .repartition(16, expr("hash(id)"))
    TransactionWriter.overwrite(log, rows)
    val before = DeltaLog.forPath(spark, dir).snapshot
    val boxFilters = Seq(("a", ">=", 0L), ("a", "<", 16L),
      ("b", ">=", 0L), ("b", "<", 16L))
    val beforePruned = graft.delta.Skipping.prunedFiles(before, boxFilters).size
    // small target size keeps ~the same file count, isolating the
    // LAYOUT effect from compaction
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 4096L)
    val after = DeltaLog.forPath(spark, dir).snapshot
    // content identical
    assert(after.read().agg(count(lit(1)), sum("id")).head ==
      before.read().agg(count(lit(1)), sum("id")).head)
    // a 16x16 corner box (1/16 of the plane) must scan FEWER files
    // than the scatter layout (which cannot prune at all)
    val afterPruned = graft.delta.Skipping.prunedFiles(after, boxFilters).size
    assert(beforePruned == before.planFiles().size,
      s"scatter layout unexpectedly prunable ($beforePruned)")
    assert(afterPruned < after.planFiles().size,
      s"hilbert layout did not prune: $afterPruned of ${after.planFiles().size}")
  }

  test("date columns cluster through unix_date (DATE can't cast to DOUBLE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbdate_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0 until 50).map(i => (java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i)), i.toLong))
        .toDF("d", "v"))
    Maintenance.hilbertCluster(log, Seq("d", "v"))
    val got = DeltaLog.forPath(spark, dir).snapshot.read()
      .agg(count(lit(1)), sum("v")).head
    assert(got.getLong(0) == 50L && got.getLong(1) == 1225L)
  }

  test("GRAFT OPTIMIZE HILBERT BY parses and preserves content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hilbsql_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 100L).map(i => (i, i * 3 % 17)).toDF("a", "b"))
    val v = graft.plans.GraftSqlParser.run(spark,
      s"GRAFT OPTIMIZE '$dir' HILBERT BY (a, b)").collect()(0).getLong(0)
    assert(v >= 1L)
    val got = DeltaLog.forPath(spark, dir).snapshot.read()
      .agg(count(lit(1)), sum("a")).head
    assert(got.getLong(0) == 100L && got.getLong(1) == 4950L)
  }
}
