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

  test("axesToIndex is a bijection with grid-adjacent steps in 3-D and 4-D") {
    // the defining Hilbert property, now in d dims: every consecutive
    // pair of indices maps to cells exactly one grid step apart — any
    // error in Skilling's exchange/invert or the Gray correction
    // breaks adjacency somewhere
    for (d <- Seq(3, 4)) {
      val bits = if (d == 3) 3 else 2
      val n = 1 << bits
      val cells = Iterator.fill(d)(0 until n).toList
        .foldLeft(Seq(Seq.empty[Long])) { (acc, r) =>
          acc.flatMap(pre => r.map(v => pre :+ v.toLong))
        }
      val byIdx = cells.map(c => Hilbert.axesToIndex(bits, c) -> c).toMap
      val total = math.pow(n, d).toLong
      assert(byIdx.size == total, s"d=$d not a bijection")
      assert(byIdx.keys.min == 0L && byIdx.keys.max == total - 1)
      for (k <- 0L until total - 1) {
        val a = byIdx(k); val b = byIdx(k + 1)
        val dist = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(dist == 1, s"d=$d jump between $k ($a) and ${k + 1} ($b)")
      }
    }
  }

  test("indexD expression matches the driver reference on a 3-D grid") {
    val bits = 3
    val n = 1 << bits
    val grid = (for (x <- 0L until n; y <- 0L until n; z <- 0L until n)
      yield (x, y, z)).toDF("x", "y", "z")
    val got = grid.select($"x", $"y", $"z",
        Hilbert.indexD(Seq($"x", $"y", $"z"), bits).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    for (x <- 0L until n; y <- 0L until n; z <- 0L until n)
      assert(got((x, y, z)) == Hilbert.axesToIndex(bits, Seq(x, y, z)),
        s"mismatch at ($x,$y,$z)")
  }

  test("native codegen kernel ≡ HOF forms ≡ driver reference on fuzzed grids") {
    // the compiled HilbertIndexExpr replaced the interpreted
    // aggregate-HOF walk on the clustering hot path — prove all three
    // spellings agree bit-for-bit, across dimensions and bit widths,
    // in BOTH evaluation modes (whole-stage codegen on, and the
    // interpreted eval() path via a codegen-hostile wrapping is
    // covered by the fallback config in SparkTestBase runs)
    val rnd = new scala.util.Random(991)
    for ((d, bits) <- Seq((2, 5), (2, 16), (3, 3), (3, 10), (4, 7), (6, 10))) {
      val n = 1L << bits
      val pts = Seq.fill(200)(Seq.fill(d)(math.abs(rnd.nextLong()) % n))
      val df = pts.map(p => Tuple1(p)).toDF("c")
        .select((0 until d).map(i => element_at($"c", i + 1).as(s"c$i")): _*)
      val cols = (0 until d).map(i => col(s"c$i"))
      val native = graft.functions.VectorExpressions.hilbertIndex(cols, bits)
      val hof = if (d == 2) Hilbert.index2(cols(0), cols(1), bits)
        else Hilbert.indexD(cols, bits)
      val rows = df.select(struct(cols: _*).as("p"),
          native.as("nat"), hof.as("hof")).collect()
      rows.foreach { r =>
        val p = (0 until d).map(i => r.getStruct(0).getLong(i))
        val ref = Hilbert.axesToIndex(bits, p)
        val xy = if (d == 2) Hilbert.xy2d(bits, p(0), p(1)) else ref
        assert(r.getLong(1) == xy && r.getLong(2) == xy,
          s"d=$d bits=$bits at $p: native=${r.getLong(1)} hof=${r.getLong(2)} ref=$xy" +
            (if (d == 2) s" (skilling ref would be $ref)" else ""))
      }
    }
  }

  test("native kernel null semantics: any null coordinate → null") {
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("x", "y")
    val got = df.select(graft.functions.VectorExpressions
        .hilbertIndex(Seq($"x", $"y"), 8).as("h")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("3-D hilbert layout prunes a box probe at least as well as z-order") {
    // same data, same file count, two layouts — the 3-D-box pruning
    // comparison that motivates OPTIMIZE HILBERT BY on 3+ columns
    def layout(cluster: (graft.delta.DeltaLog, Seq[String]) => Unit)
        : (Int, Int) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_h3_")
        .resolve("t").toString
      val log = DeltaLog.forPath(spark, dir)
      val rows = (0L until 4096L).map { i =>
        (i % 16L, (i / 16L) % 16L, i / 256L, i)
      }.toDF("a", "b", "c", "id").repartition(16, expr("hash(id)"))
      TransactionWriter.overwrite(log, rows)
      cluster(log, Seq("a", "b", "c"))
      val snap = DeltaLog.forPath(spark, dir).snapshot
      assert(snap.read().agg(sum("id")).head.getLong(0) ==
        4096L * 4095L / 2, "content must be preserved")
      val box = Seq(("a", "<", 4L), ("b", "<", 4L), ("c", "<", 4L))
      // prunedFiles returns the SURVIVORS (files the scan must read)
      (graft.delta.Skipping.prunedFiles(snap, box).size,
        snap.planFiles().size)
    }
    val (hScan, hf) = layout((l, c) =>
      Maintenance.hilbertCluster(l, c, targetFileBytes = 4096L))
    val (zScan, zf) = layout((l, c) =>
      Maintenance.zorder(l, c, targetFileBytes = 4096L))
    assert(hScan < hf, s"hilbert layout did not prune ($hScan of $hf)")
    assert(hScan.toDouble / hf <= zScan.toDouble / zf,
      s"hilbert scans $hScan/$hf, z-order $zScan/$zf — the locality-" +
        "optimal curve must not lose to the morton interleave on a " +
        "corner box")
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

  test("incremental clustering rewrites ONLY files added since the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hinc_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    val rows = (0L until 4096L).map(i => (i % 64L, i / 64L, i))
      .toDF("a", "b", "id").repartition(16, expr("hash(id)"))
    TransactionWriter.overwrite(log, rows)
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 4096L)
    val full = DeltaLog.forPath(spark, dir).snapshot
    val clustered = full.planFiles().map(_.path).toSet
    assert(clustered.size > 1, "need several clustered files for the test")
    // append ~12% new rows, INCLUDING values past the old bounds (a=80
    // exceeds the persisted max of 63 — must clamp, not crash)
    TransactionWriter.append(log,
      (4096L until 4608L).map(i => (if (i % 7 == 0) 80L else i % 64L,
        i / 64L % 64L, i)).toDF("a", "b", "id")
        .repartition(4, expr("hash(id)")))
    val appended = DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet -- clustered
    assert(appended.size == 4)
    Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L)
    val after = DeltaLog.forPath(spark, dir).snapshot
    val finalPaths = after.planFiles().map(_.path).toSet
    // previously-clustered files keep their add entries untouched;
    // every appended file was swapped for curve-ordered replacements
    assert(clustered.subsetOf(finalPaths),
      s"incremental pass touched ${clustered -- finalPaths}")
    assert(appended.intersect(finalPaths).isEmpty,
      s"appended files survived unclustered: ${appended.intersect(finalPaths)}")
    // content preserved
    assert(after.read().agg(count(lit(1)), sum("id")).head ==
      Seq(4608L).map(n => (n, n * (n - 1) / 2)).map(t =>
        org.apache.spark.sql.Row(t._1, t._2)).head)
    // nothing new → NO commit at all (a scheduled idle run is free)
    val before2 = after.planFiles().map(_.path).toSet
    val vIdle = DeltaLog.forPath(spark, dir).snapshot.version
    Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert")
    assert(DeltaLog.forPath(spark, dir).snapshot.version == vIdle,
      "idle incremental pass must not commit")
    assert(DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet == before2)
    // round 2: a SECOND append + incremental must not touch the files
    // the FIRST incremental pass wrote (its adds are excluded from the
    // window by their clustering operation name, not by watermark
    // arithmetic — the concurrency-safe contract)
    TransactionWriter.append(log,
      (4608L until 4864L).map(i => (i % 64L, i / 64L % 64L, i))
        .toDF("a", "b", "id").repartition(2, expr("hash(id)")))
    Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L)
    val after2 = DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet
    assert(before2.subsetOf(after2),
      s"round-2 incremental touched round-1 outputs: ${before2 -- after2}")
    assert(DeltaLog.forPath(spark, dir).snapshot.read().count() == 4864L)
    // definition drift is refused (run a full pass instead)
    val err = intercept[IllegalArgumentException] {
      Maintenance.clusterIncremental(log, Seq("b", "a"), "hilbert")
    }
    assert(err.getMessage.contains("full pass"))
    val err2 = intercept[IllegalArgumentException] {
      Maintenance.clusterIncremental(log, Seq("a", "b"), "zorder")
    }
    assert(err2.getMessage.contains("full pass"))
  }

  test("incremental layout preserves box-probe pruning quality") {
    // after a full pass + append + incremental, a corner-box probe
    // must still prune: the new files were curve-ordered under the
    // PERSISTED bounds, so their min/max boxes are tight like the old
    // ones (a naive append with no recluster cannot prune at all)
    val dir = java.nio.file.Files.createTempDirectory("graft_hincq_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 4096L).map(i => (i % 64L, i / 64L, i)).toDF("a", "b", "id")
        .repartition(16, expr("hash(id)")))
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 4096L)
    // append a SCATTERED 25% (random over the full grid, several files)
    TransactionWriter.append(log,
      (4096L until 5120L).map(i => ((i * 2654435761L) % 64L,
        (i * 40503L) % 64L, i)).toDF("a", "b", "id")
        .repartition(4, expr("hash(id)")))
    Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L)
    val snap = DeltaLog.forPath(spark, dir).snapshot
    val box = Seq(("a", ">=", 0L), ("a", "<", 16L),
      ("b", ">=", 0L), ("b", "<", 16L))
    val survivors = graft.delta.Skipping.prunedFiles(snap, box).size
    val total = snap.planFiles().size
    assert(survivors < total,
      s"incremental layout lost data skipping: $survivors of $total scanned")
    // and the probe is CORRECT through the pruned scan
    val got = snap.readFiles(graft.delta.Skipping.prunedFiles(snap, box))
      .where(col("a") < 16L && col("b") < 16L).count()
    val want = snap.read().where(col("a") < 16L && col("b") < 16L).count()
    assert(got == want)
  }

  test("drift gauge: shifted append routes to a full pass that re-derives bounds") {
    // the grid drifts wholesale: every appended row lives OUTSIDE the
    // persisted bounds (a,b in [64,128) vs persisted [0,64)). Forced
    // incremental (threshold 1.0) must clamp everything into the edge
    // cell — box-probe pruning over the NEW region collapses — while
    // the default gauge routes the same pass to a FULL re-cluster,
    // which re-derives bounds and restores pruning.
    def mkTable(): DeltaLog = {
      val dir = java.nio.file.Files.createTempDirectory("graft_hdrift_")
        .resolve("t").toString
      val log = DeltaLog.forPath(spark, dir)
      TransactionWriter.overwrite(log,
        (0L until 4096L).map(i => (i % 64L, i / 64L, i)).toDF("a", "b", "id")
          .repartition(16, expr("hash(id)")))
      Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 4096L)
      TransactionWriter.append(log,
        (4096L until 8192L).map(i => (64L + i % 64L, 64L + (i / 64L) % 64L, i))
          .toDF("a", "b", "id").repartition(16, expr("hash(id)")))
      DeltaLog.forPath(spark, log.tablePath)
    }
    val box = Seq(("a", ">=", 64L), ("a", "<", 80L),
      ("b", ">=", 64L), ("b", "<", 80L))
    // the honest probe metric is ROWS SCANNED, not surviving-file
    // count: everything-clamped-into-one-cell lays the whole drifted
    // half into ONE huge file, which "prunes" to one file that still
    // holds every drifted row
    def rowsScanned(log: DeltaLog): Long = {
      val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
      snap.readFiles(graft.delta.Skipping.prunedFiles(snap, box)).count()
    }
    // forced incremental: 100% drift clamps the whole append into the
    // top cell — every post-append file straddles the probe box
    val forced = mkTable()
    Maintenance.clusterIncremental(forced, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L, driftThreshold = 1.0)
    val stForced = graft.delta.Domains.get(
      DeltaLog.forPath(spark, forced.tablePath).snapshot,
      Maintenance.ClusterStateDomain).get
    val driftForced = graft.delta.JsonUtil.mapper
      .readTree(stForced).path("drift").asDouble()
    assert(driftForced == 1.0, s"persisted drift should be 1.0, got $driftForced")
    val scannedForced = rowsScanned(forced)
    // default gauge (conf 0.25): the SAME call routes to a full pass
    val routed = mkTable()
    val vBefore = DeltaLog.forPath(spark, routed.tablePath).snapshot.version
    Maintenance.clusterIncremental(routed, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L)
    val snap = DeltaLog.forPath(spark, routed.tablePath).snapshot
    // the routed pass ran as a FULL re-cluster: operation name + bounds
    val ops = ((vBefore + 1) to snap.version).map(v =>
      routed.commitActions(v).collectFirst {
        case graft.delta.CommitInfoAction(ci) => ci.operation }.get)
    assert(ops.contains("OPTIMIZE HILBERT BY") &&
      !ops.contains("OPTIMIZE HILBERT BY INCREMENTAL"), s"ops were $ops")
    val st = graft.delta.Domains.get(snap, Maintenance.ClusterStateDomain).get
    val node = graft.delta.JsonUtil.mapper.readTree(st)
    assert(node.path("maxs").get(0).asDouble() == 127.0,
      s"full pass must re-derive bounds, got ${node.path("maxs")}")
    assert(node.path("drift").asDouble() == 0.0)
    val scannedRouted = rowsScanned(routed)
    // the clamped layout piles the whole drifted half (4096 rows) into
    // edge-cell files, so the box probe scans (nearly) all of it; the
    // routed full pass re-derives bounds and scans a fraction
    assert(scannedRouted * 2 < scannedForced,
      s"routing must beat clamped incremental: routed scans $scannedRouted " +
        s"rows vs forced $scannedForced")
    // correctness through the pruned scan
    val got = snap.readFiles(graft.delta.Skipping.prunedFiles(snap, box))
      .where(col("a").between(64L, 79L) && col("b").between(64L, 79L)).count()
    val want = snap.read()
      .where(col("a").between(64L, 79L) && col("b").between(64L, 79L)).count()
    assert(got == want && want > 0)
  }

  test("incremental clustering on a PARTITIONED table keeps partition layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hincp_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    val rows = (0L until 2048L).map(i => (i % 4L, i % 64L, i / 64L, i))
      .toDF("p", "a", "b", "id").repartition(8, expr("hash(id)"))
    TransactionWriter.overwrite(log, rows, partitionBy = Some(Seq("p")))
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 4096L)
    val clustered = DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet
    TransactionWriter.append(log,
      (2048L until 2304L).map(i => (i % 4L, i % 64L, (i / 64L) % 32L, i))
        .toDF("p", "a", "b", "id"))
    Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert",
      targetFileBytes = 4096L)
    val snap = DeltaLog.forPath(spark, dir).snapshot
    assert(clustered.subsetOf(snap.planFiles().map(_.path).toSet))
    // every add keeps a partition value, and partition pruning still works
    assert(snap.planFiles().forall(_.partitionValues.contains("p")))
    val one = snap.planFiles(Some(
      element_at(col("partition_values"), "p") === "2"))
    assert(one.nonEmpty && one.size < snap.planFiles().size,
      "partition pruning must survive the incremental pass")
    val got = snap.read().agg(count(lit(1)), sum("id")).head
    assert(got.getLong(0) == 2304L && got.getLong(1) == 2304L * 2303L / 2)
  }

  test("incremental clustering rewrites DV'd new files to their LIVE rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hincdv_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 1024L).map(i => (i % 64L, i / 64L, i)).toDF("a", "b", "id")
        .repartition(4, expr("hash(id)")),
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    Maintenance.hilbertCluster(log, Seq("a", "b"), targetFileBytes = 8192L)
    val clustered = DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet
    TransactionWriter.append(log,
      (1024L until 1280L).map(i => (i % 64L, (i / 64L) % 16L, i))
        .toDF("a", "b", "id"))
    // DV-delete rows in the APPENDED window, then recluster it: the
    // replacement files must carry only the live rows (the DV'd file
    // and its bitmap leave the log together)
    graft.delta.Mutations.deleteWithDv(log,
      col("id") >= 1024L && col("id") % 3 === 0L)
    Maintenance.clusterIncremental(log, Seq("a", "b"),
      "hilbert", targetFileBytes = 8192L)
    val snap = DeltaLog.forPath(spark, dir).snapshot
    assert(clustered.subsetOf(snap.planFiles().map(_.path).toSet))
    assert(!snap.planFiles().exists(f =>
      f.deletionVector.exists(_.cardinality > 0)),
      "incremental recluster must materialize DV survivors")
    val want = (0L until 1280L).filterNot(i => i >= 1024L && i % 3 == 0)
    val got = snap.read().agg(count(lit(1)), sum("id")).head
    assert(got.getLong(0) == want.size.toLong && got.getLong(1) == want.sum)
  }

  test("incremental clustering without a prior full pass is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hinc0_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 100L).map(i => (i, i)).toDF("a", "b"))
    val err = intercept[IllegalStateException] {
      Maintenance.clusterIncremental(log, Seq("a", "b"), "hilbert")
    }
    assert(err.getMessage.contains("run a full"))
  }

  test("zorder incremental via GRAFT SQL: old files kept, content preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zinc_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 2048L).map(i => (i % 64L, i / 64L, i)).toDF("a", "b", "id")
        .repartition(8, expr("hash(id)")))
    graft.plans.GraftSqlParser.run(spark,
      s"GRAFT OPTIMIZE '$dir' ZORDER BY (a, b)").collect()
    val clustered = DeltaLog.forPath(spark, dir).snapshot
      .planFiles().map(_.path).toSet
    TransactionWriter.append(log,
      (2048L until 2304L).map(i => (i % 64L, (i / 64L) % 32L, i))
        .toDF("a", "b", "id"))
    graft.plans.GraftSqlParser.run(spark,
      s"GRAFT OPTIMIZE '$dir' ZORDER BY (a, b) INCREMENTAL").collect()
    val after = DeltaLog.forPath(spark, dir).snapshot
    assert(clustered.subsetOf(after.planFiles().map(_.path).toSet))
    val got = after.read().agg(count(lit(1)), sum("id")).head
    assert(got.getLong(0) == 2304L && got.getLong(1) == 2304L * 2303L / 2)
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
