package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  test("aggDelta signs inserts, deletes, and update image pairs") {
    val changes = Seq(
      ("s1", 10L, "insert"),
      ("s1", 5L, "insert"),
      ("s1", 10L, "delete"),
      ("s2", 7L, "update_preimage"),
      ("s2", 9L, "update_postimage"))
      .toDF("source", "n_chars", "_change_type")
    val d = IncrementalAgg.aggDelta(changes, Seq("source"), "n_chars")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // s1: +1 +1 -1 rows = 1; +10 +5 -10 = 5. s2: pre/post cancel rows; sum +2.
    assert(d == Map("s1" -> ((1L, 5L)), "s2" -> ((0L, 2L))))
  }

  test("applyDelta folds deltas, adds new keys, retracts emptied keys") {
    val base = Seq(("s1", 2L, 30L), ("s3", 1L, 4L)).toDF("source", "n", "s")
    val delta = Seq(
      ("s1", 1L, 5L),    // existing key grows
      ("s2", 2L, 9L),    // new key appears
      ("s3", -1L, -4L))  // key fully retracted
      .toDF("source", "__d_n", "__d_sum")
    val out = IncrementalAgg.applyDelta(base, delta, Seq("source"), "n", "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("s1" -> ((3L, 35L)), "s2" -> ((2L, 9L))))
  }

  test("mergeDelta updates, inserts, and retracts keys in the Delta rollup") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_iam_spec_")
      .resolve("agg").toString
    val log = graft.delta.DeltaLog.forPath(spark, tmp)
    graft.delta.TransactionWriter.overwrite(log,
      Seq(("s1", 2L, 30L), ("s3", 1L, 4L)).toDF("source", "n", "s"))
    val delta = Seq(
      ("s1", 1L, 5L), ("s2", 2L, 9L), ("s3", -1L, -4L))
      .toDF("source", "__d_n", "__d_sum")
    IncrementalAgg.mergeDelta(log, delta, Seq("source"), "n", "s")
    val out = log.snapshot.read()
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("s1" -> ((3L, 35L)), "s2" -> ((2L, 9L))))
  }

  test("mergeDelta rides the txn marker inside the merge commit itself") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_iam_txn_")
      .resolve("agg").toString
    val log = graft.delta.DeltaLog.forPath(spark, tmp)
    graft.delta.TransactionWriter.overwrite(log,
      Seq(("s1", 2L, 30L)).toDF("source", "n", "s"))
    val before = log.latestVersion()
    val delta = Seq(("s1", 1L, 5L)).toDF("source", "__d_n", "__d_sum")
    val v = IncrementalAgg.mergeDelta(log, delta, Seq("source"), "n", "s",
      txn = Some(("app_x", 7L)))
    // ONE commit carries both the fold and the marker: a separate
    // marker commit would leave a crash window that double-applies the
    // (non-idempotent) signed delta on restart.
    assert(v == before + 1, s"expected one commit, got ${v - before}")
    assert(log.snapshot.setTransactions.get("app_x").exists(_.version == 7L))
    // A no-op fold (empty delta) still records its marker.
    val v2 = IncrementalAgg.mergeDelta(log, delta.limit(0),
      Seq("source"), "n", "s", txn = Some(("app_x", 8L)))
    assert(v2 > v &&
      log.snapshot.setTransactions.get("app_x").exists(_.version == 8L))
  }

  test("txn marker survives the DV fast path's insert-only branch") {
    // A DV-enabled rollup whose batch contains ONLY new keys routes
    // through executeDvPath's DvNoMatch branch — the marker must ride
    // in that insert commit too, or restarts double-apply the batch.
    val tmp = java.nio.file.Files.createTempDirectory("graft_iam_dvtxn_")
      .resolve("agg").toString
    val log = graft.delta.DeltaLog.forPath(spark, tmp)
    graft.delta.TransactionWriter.overwrite(log,
      Seq(("s1", 2L, 30L)).toDF("source", "n", "s"),
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val before = log.latestVersion()
    val delta = Seq(("s_new", 1L, 7L)).toDF("source", "__d_n", "__d_sum")
    val v = IncrementalAgg.mergeDelta(log, delta, Seq("source"), "n", "s",
      txn = Some(("app_dv", 3L)))
    assert(v == before + 1, s"expected one commit, got ${v - before}")
    assert(log.snapshot.setTransactions.get("app_dv").exists(_.version == 3L),
      "marker missing after insert-only DV-path merge")
    assert(log.snapshot.read().count() == 2)
  }

  test("incrementalAggSink maintains the rollup from a CDF stream") {
    val base = java.nio.file.Files.createTempDirectory("graft_sia_spec_")
    val src = graft.delta.DeltaLog.forPath(spark, base.resolve("t").toString)
    val rows = (0L until 30L).map(i => (i, s"s${i % 3}", i))
      .toDF("id", "source", "v")
    graft.delta.TransactionWriter.overwrite(src, rows)         // v0
    graft.delta.ChangeDataFeed.enable(src)                     // v1
    val agg = graft.delta.DeltaLog.forPath(spark, base.resolve("agg").toString)
    graft.delta.TransactionWriter.overwrite(agg,
      rows.select(col("source"), lit(0L).as("n"), lit(0L).as("s")).limit(0))
    val q = graft.streaming.StreamingOps.incrementalAggSink(
      spark.readStream
        .format(classOf[graft.sources.DeltaSourceProvider].getName)
        .option("path", src.tablePath)
        .option("readChangeFeed", "true").load(),
      agg, Seq("source"), "v", "n", "s",
      appId = "sia_spec", checkpointLocation = base.resolve("cp").toString)
    try {
      q.processAllAvailable()
      graft.delta.Mutations.delete(src, col("id") % 2 === 0)   // v2
      graft.delta.Mutations.update(src, col("id") === 1L,
        Map("v" -> lit(1000L)))                                // v3
      q.processAllAvailable()
    } finally q.stop()
    assertSameRows(
      agg.snapshot.read(),
      src.snapshot.read().groupBy("source")
        .agg(count(lit(1)).as("n"), sum("v").as("s")),
      "streamed rollup vs full recompute")
  }

  test("matviewRefreshSink maintains a MIN/MAX view; checkpoint loss cannot double-apply") {
    val base = java.nio.file.Files.createTempDirectory("graft_smv_spec_")
    val srcPath = base.resolve("t").toString
    val viewPath = base.resolve("view").toString
    val src = graft.delta.DeltaLog.forPath(spark, srcPath)
    val rows = (0L until 30L).map(i => (i, s"s${i % 3}", i)).toDF("id", "source", "v")
    graft.delta.TransactionWriter.overwrite(src, rows)         // v0
    graft.delta.ChangeDataFeed.enable(src)                     // v1
    graft.delta.MatView.create(spark, viewPath, srcPath,
      Seq("source"), Seq("sum" -> "v", "min" -> "v", "max" -> "v"))
    def stream(cp: String) = graft.streaming.StreamingOps.matviewRefreshSink(
      spark,
      spark.readStream
        .format(classOf[graft.sources.DeltaSourceProvider].getName)
        .option("path", src.tablePath)
        .option("readChangeFeed", "true").load(),
      viewPath, cp)
    val q = stream(base.resolve("cp1").toString)
    try {
      q.processAllAvailable()
      graft.delta.Mutations.delete(src, col("v") >= 27L)       // v2: group maxima
      graft.delta.Mutations.update(src, col("id") === 1L,
        Map("v" -> lit(1000L)))                                // v3: moves a max
      q.processAllAvailable()
    } finally q.stop()
    def recompute() = src.snapshot.read().groupBy("source")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
    assertSameRows(graft.delta.DeltaLog.forPath(spark, viewPath).snapshot.read(),
      recompute(), "streamed matview vs full recompute")
    // restart from a FRESH checkpoint (total checkpoint loss): the CDF
    // stream replays from scratch, but exactly-once rests on the
    // view's own txn markers — the replayed triggers must all no-op
    val q2 = stream(base.resolve("cp2").toString)
    try q2.processAllAvailable() finally q2.stop()
    assertSameRows(graft.delta.DeltaLog.forPath(spark, viewPath).snapshot.read(),
      recompute(), "checkpoint loss must not double-apply any window")
  }

  test("matviewRefreshSink composes with JOIN views: fact stream keeps it fresh") {
    // MatView.refresh dispatches on the view kind, so the SAME sink
    // maintains a JOIN view continuously — a fact CDF stream triggers
    // refresh per micro-batch, which also folds any dim changes that
    // landed since (the dim needs no stream of its own)
    val base = java.nio.file.Files.createTempDirectory("graft_smvj_spec_")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("v").toString
    val fact = graft.delta.DeltaLog.forPath(spark, factPath)
    val dim = graft.delta.DeltaLog.forPath(spark, dimPath)
    graft.delta.TransactionWriter.overwrite(fact,
      (0L until 60L).map(i => (i, i % 6, i * 10)).toDF("pk", "fk", "x"))
    graft.delta.ChangeDataFeed.enable(fact)
    graft.delta.TransactionWriter.overwrite(dim,
      (0L until 6L).map(i => (i, s"d$i")).toDF("dk", "name"))
    graft.delta.ChangeDataFeed.enable(dim)
    graft.delta.MatView.createJoin(spark, viewPath, factPath, dimPath,
      Seq("pk"), "fk", "dk", Seq("name"))
    val q = graft.streaming.StreamingOps.matviewRefreshSink(
      spark,
      spark.readStream
        .format(classOf[graft.sources.DeltaSourceProvider].getName)
        .option("path", fact.tablePath)
        .option("readChangeFeed", "true").load(),
      viewPath, base.resolve("cp").toString)
    try {
      q.processAllAvailable()
      graft.delta.TransactionWriter.append(fact,
        (60L until 80L).map(i => (i, i % 6, i * 10)).toDF("pk", "fk", "x"))
      graft.delta.Mutations.delete(fact, col("pk") % 5 === 0)
      // dim-side change with NO dim stream: the next fact-triggered
      // refresh folds it (dual watermarks advance together)
      graft.delta.Mutations.delete(dim, col("dk") === 2L)
      graft.delta.TransactionWriter.append(fact,
        Seq((999L, 3L, 0L)).toDF("pk", "fk", "x"))
      q.processAllAvailable()
    } finally q.stop()
    val want = fact.snapshot.read().join(
      dim.snapshot.read().select(col("dk").as("fk"), col("name")), Seq("fk"))
    assertSameRows(
      graft.delta.DeltaLog.forPath(spark, viewPath).snapshot.read(), want,
      "streamed join view vs full recompute")
  }

  test("base + change feed equals a full recompute (end-to-end Delta)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ia_spec_")
      .resolve("t").toString
    val log = graft.delta.DeltaLog.forPath(spark, tmp)
    val rows = (0L until 40L).map(i => (i, s"s${i % 3}", i * 10))
      .toDF("id", "source", "v")
    graft.delta.TransactionWriter.overwrite(log, rows.where(col("id") < 30)) // v0
    graft.delta.ChangeDataFeed.enable(log)                                   // v1
    graft.delta.TransactionWriter.append(log, rows.where(col("id") >= 30))   // v2
    graft.delta.Mutations.delete(log, col("id") % 4 === 0)                   // v3
    graft.delta.Mutations.update(log, col("id") % 5 === 1,
      Map("v" -> lit(0L)))                                                   // v4

    val base = log.snapshotAt(1).read()
      .groupBy("source").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val delta = IncrementalAgg.aggDelta(
      graft.delta.ChangeDataFeed.tableChanges(log, 2), Seq("source"), "v")
    val maintained = IncrementalAgg.applyDelta(
      base, delta, Seq("source"), "n", "s")

    val full = log.snapshot.read()
      .groupBy("source").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assertSameRows(maintained, full, "incremental vs full recompute")
  }

  test("rederiveKeys maintains MIN/MAX through max-killing deletes") {
    import spark.implicits._
    // base rollup over (k, v); then delete the max of group a and ALL
    // of group b, insert a new min into group c — every case a signed
    // fold cannot express for MIN/MAX
    val source0 = Seq(("a", 10L), ("a", 50L), ("b", 5L), ("c", 20L))
      .toDF("k", "v")
    val base = source0.groupBy("k")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
    val sourceNew = Seq(("a", 10L), ("c", 20L), ("c", 1L)).toDF("k", "v")
    val changes = Seq(
      ("a", 50L, "delete"), ("b", 5L, "delete"), ("c", 1L, "insert"))
      .toDF("k", "v", "_change_type")
    val got = IncrementalAgg.rederiveKeys(
        base, sourceNew, changes, Seq("k"),
        Seq(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "a" -> ((1L, 10L, 10L)),   // max retracted, re-derived
      "c" -> ((2L, 1L, 20L))),   // new min folded in; b vanished
      s"got $got")
  }
}
