package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Structured Streaming ops driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("streaming exact dedup drops in-window duplicate fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingOps.streamingExactDedup(
      input.toDF().toDF("ts", "fp"), "ts", "fp")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "a"), (ts(0), "a"), (ts(1), "b"))
      q.processAllAvailable()
      input.addData((ts(0), "a"), (ts(2), "c")) // dup of a within state
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 3, rows.mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join matches in-window pairs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]   // (user, event, ts)
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.intervalJoin(
      views.toDF().toDF("user_id", "view_event", "view_ts"),
      clicks.toDF().toDF("c_user_id", "click_event", "click_ts"),
      "user_id", "c_user_id", "view_ts", "click_ts",
      maxSpan = "10 minutes", watermark = "0 seconds")
      .select("user_id", "view_event", "click_event")
    val q = joined.writeStream.format("memory").queryName("join_out")
      .outputMode("append").start()
    try {
      views.addData((1L, 100L, ts(0)), (2L, 101L, ts(0)))
      q.processAllAvailable()
      // click for user 1 inside the window arrives a LATER batch — the
      // buffered view row must still match it
      clicks.addData((1L, 200L, ts(5)))
      q.processAllAvailable()
      // outside the 10-minute span: no match; wrong user: no match
      clicks.addData((1L, 201L, ts(20)), (3L, 202L, ts(1)))
      q.processAllAvailable()
      val rows = spark.table("join_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 200L)), rows.mkString(","))
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    def us(m: Int): Long = ts(m).getTime * 1000L
    val input = MemoryStream[(Long, Timestamp, Long)]
    val sessions = StreamingOps.streamingSessionize(
      input.toDS(), gapUs = 5L * 60 * 1000 * 1000, watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 2min apart (one session), then a 10min gap
      input.addData((1L, ts(0), us(0)), (1L, ts(2), us(2)))
      q.processAllAvailable()
      input.addData((1L, ts(12), us(12))) // gap > 5min → closes first session
      q.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData((2L, ts(59), us(59)))
      q.processAllAvailable()
      input.addData((2L, ts(59), us(59)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows.contains((1L, us(0), us(2), 2L)), rows.mkString(","))
      assert(rows.contains((1L, us(12), us(12), 1L)), rows.mkString(","))
    } finally q.stop()
  }

  test("delta sink appends exactly-once per micro-batch") {
    import graft.delta.{DeltaLog, TransactionWriter}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((0L, "seed")).toDF("n", "s"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.deltaAppendSink(
      input.toDF().toDF("n", "s"), log, "app-test", dir.resolve("cp").toString)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assertSameRows(log.snapshot.read(),
        Seq((0L, "seed"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("n", "s"))
      assert(log.snapshot.setTransactions("app-test").version == 1L)
      // replaying an already-committed batch is a no-op (exactly-once)
      val vBefore = log.latestVersion()
      TransactionWriter.appendWithTxn(log, Seq((9L, "dup")).toDF("n", "s"),
        "app-test", 1L)
      assert(log.latestVersion() == vBefore, "replayed batch must not commit")
      // a NEW batch id commits
      TransactionWriter.appendWithTxn(log, Seq((4L, "d")).toDF("n", "s"),
        "app-test", 2L)
      assert(log.snapshot.setTransactions("app-test").version == 2L)
      assert(log.snapshot.read().count() == 5L)
    } finally q.stop()
  }

  test("CDC apply sink replicates mutations; replays converge exactly-once") {
    import graft.delta.{DeltaLog, TransactionWriter, Mutations, ChangeDataFeed}
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft-cdcapply")
    val src = DeltaLog.forPath(spark, dir.resolve("src").toString)
    TransactionWriter.overwrite(src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))           // v0
    ChangeDataFeed.enable(src)                                       // v1
    val tgt = DeltaLog.forPath(spark, dir.resolve("tgt").toString)
    TransactionWriter.overwrite(tgt, Seq.empty[(Long, String)].toDF("k", "v"))
    val changes = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", src.tablePath)
      .option("readChangeFeed", "true")
      .load()
    val q = StreamingOps.deltaCdcApplySink(
      changes, tgt, Seq("k"), "cdc-app", dir.resolve("cp").toString)
    try {
      q.processAllAvailable() // initial snapshot as inserts
      assertSameRows(DeltaLog.forPath(spark, tgt.tablePath).snapshot.read(),
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
      Mutations.delete(src, col("k") === 2L)
      Mutations.update(src, col("k") === 3L, Map("v" -> lit("c2")))
      TransactionWriter.append(src, Seq((4L, "d")).toDF("k", "v"))
      q.processAllAvailable()
      val expect = Seq((1L, "a"), (3L, "c2"), (4L, "d")).toDF("k", "v")
      assertSameRows(DeltaLog.forPath(spark, tgt.tablePath).snapshot.read(), expect)
    } finally q.stop()
    // replay an already-applied batch id -> marker skips, no commit
    val tgt2 = DeltaLog.forPath(spark, tgt.tablePath)
    val applied = tgt2.snapshot.setTransactions("cdc-app").version
    val vBefore = tgt2.latestVersion()
    val replay = Seq((2L, "b", "insert", 1L))
      .toDF("k", "v", "_change_type", "_commit_version")
    StreamingOps.applyCdcBatch(tgt2, replay, Seq("k"), Some("cdc-app"), applied)
    assert(tgt2.latestVersion() == vBefore, "replayed batch must be skipped")
    // crash-sim: the same batch WITHOUT a marker re-applies idempotently
    val batch = Seq(
      (5L, "e", "insert", 9L),
      (5L, "e2", "update_postimage", 10L),  // newest change per key wins
      (1L, "a", "delete", 9L))
      .toDF("k", "v", "_change_type", "_commit_version")
    StreamingOps.applyCdcBatch(tgt2, batch, Seq("k"))
    StreamingOps.applyCdcBatch(DeltaLog.forPath(spark, tgt2.tablePath),
      batch, Seq("k"))
    assertSameRows(DeltaLog.forPath(spark, tgt2.tablePath).snapshot.read(),
      Seq((3L, "c2"), (4L, "d"), (5L, "e2")).toDF("k", "v"))
  }

  test("delta streaming source reads the snapshot then incremental appends") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-src")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    val stream = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath)
      .load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("delta_src_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("delta_src_out").count() == 2L) // initial snapshot
      Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))
      q.processAllAvailable()
      assertSameRows(spark.table("delta_src_out"),
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("n", "s"))
      Maintenance.append(log, Seq((4L, "d")).toDF("n", "s"))
      q.processAllAvailable()
      assert(spark.table("delta_src_out").count() == 4L)
    } finally q.stop()
  }

  test("delta source resumes from the checkpoint after a restart") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-restart")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def startQuery() = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath).load()
      .writeStream
      // memory sink cannot recover from a checkpoint; foreachBatch can
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => received.add((r.getLong(0), r.getString(1))))
        ()
      }
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(received.size == 1)
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))
    // a NEW source instance recovers the serialized offset from the
    // checkpoint (exercises versionOf on SerializedOffset) and must emit
    // ONLY the new commit — no snapshot re-read, no duplicates
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(received.toArray.toSet ==
        Set((1L, "a"), (2L, "b")), received.toArray.mkString(","))
    } finally q2.stop()
  }

  test("delta source readChangeFeed streams row-level changes") {
    import graft.delta.{ChangeDataFeed, DeltaLog, Maintenance, Mutations, TransactionWriter}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfsrc")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    ChangeDataFeed.enable(log)
    val stream = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath)
      .option("readChangeFeed", "true")
      .load()
    assert(stream.columns.toSeq ==
      Seq("n", "s", "_change_type", "_commit_version", "_commit_timestamp"))
    val q = stream.writeStream.format("memory").queryName("cdf_src_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      // initial snapshot surfaces as inserts
      assert(spark.table("cdf_src_out")
        .where(col("_change_type") === "insert").count() == 2L)
      // a mutation streams its changed rows instead of failing the
      // append-only contract
      Mutations.update(log, col("n") === 1L, Map("s" -> lit("A")))
      Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))
      q.processAllAvailable()
      val got = spark.table("cdf_src_out")
        .select("n", "s", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(got == Set(
        (1L, "a", "insert"), (2L, "b", "insert"),
        (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
        (3L, "c", "insert")))
      assert(spark.table("cdf_src_out")
        .where(col("_commit_timestamp").isNull).count() == 0L)
    } finally q.stop()
  }

  test("delta source survives OPTIMIZE (dataChange=false rewrite)") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-opt")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("n", "s"))
    Maintenance.append(log, Seq((2L, "b")).toDF("n", "s"))
    val q = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath).load()
      .writeStream.format("memory").queryName("opt_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("opt_out").count() == 2L)
      Maintenance.compact(log) // layout-only rewrite mid-stream
      Maintenance.append(log, Seq((3L, "c")).toDF("n", "s"))
      q.processAllAvailable() // must neither fail nor re-emit rows 1-2
      assertSameRows(spark.table("opt_out"),
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("n", "s"))
    } finally q.stop()
  }

  test("delta source rate limit advances one commit per trigger") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-rate")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((0L, "seed")).toDF("n", "s"))
    (1L to 3L).foreach(i => Maintenance.append(log, Seq((i, s"v$i")).toDF("n", "s")))
    val stream = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath)
      .option("maxCommitsPerTrigger", "1")
      .load()
    val q = stream.writeStream.format("memory").queryName("rate_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      // all rows arrive, spread over >= 3 micro-batches (initial snapshot
      // at the first offered offset, then one commit per trigger)
      assert(spark.table("rate_out").count() == 4L)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected >=3 rate-limited batches, got $batches")
    } finally q.stop()
  }

  test("delta source maxBytesPerTrigger paces batches by added bytes") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    val dir = java.nio.file.Files.createTempDirectory("graft-bytes")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((0L, "seed")).toDF("n", "s"))
    (1L to 4L).foreach(i => Maintenance.append(log, Seq((i, s"v$i")).toDF("n", "s")))
    // each commit's file is ~1 KB parquet; cap of 1 byte forces the
    // one-commit-minimum path every trigger (no starvation)
    val stream = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath)
      .option("maxCommitsPerTrigger", "10")
      .option("maxBytesPerTrigger", "1")
      .load()
    val q = stream.writeStream.format("memory").queryName("bytes_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("bytes_out").count() == 5L)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected >=4 byte-capped batches, got $batches")
    } finally q.stop()

    // a generous cap drains everything in one follow-up batch
    val dir2 = java.nio.file.Files.createTempDirectory("graft-bytes2")
    val log2 = DeltaLog.forPath(spark, dir2.resolve("t").toString)
    TransactionWriter.overwrite(log2, Seq((0L, "seed")).toDF("n", "s"))
    (1L to 3L).foreach(i => Maintenance.append(log2, Seq((i, s"v$i")).toDF("n", "s")))
    val q2 = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log2.tablePath)
      .option("maxBytesPerTrigger", (64L * 1024 * 1024).toString)
      .load()
      .writeStream.format("memory").queryName("bytes_out2")
      .outputMode("append")
      .option("checkpointLocation", dir2.resolve("cp").toString)
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("bytes_out2").count() == 4L)
    } finally q2.stop()
  }

  test("byte cap ALONE paces the FIRST batch too (round-6 advice: backlog admission)") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    // only maxBytesPerTrigger configured, with a pre-existing backlog of
    // 5 commits: before the fix the first getOffset admitted the whole
    // history as one batch — exactly when the backlog is largest
    val dir = java.nio.file.Files.createTempDirectory("graft-bytes-first")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((0L, "seed")).toDF("n", "s"))
    (1L to 4L).foreach(i => Maintenance.append(log, Seq((i, s"v$i")).toDF("n", "s")))
    val q = spark.readStream
      .format(classOf[graft.sources.DeltaSourceProvider].getName)
      .option("path", log.tablePath)
      .option("maxBytesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("bytes_first_out")
      .outputMode("append")
      .option("checkpointLocation", dir.resolve("cp").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("bytes_first_out").count() == 5L)
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4,
        s"first batch must respect the byte cap: got $batches batches")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the delta source and terminates") {
    import graft.delta.{DeltaLog, TransactionWriter, Maintenance}
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow")
    val log = DeltaLog.forPath(spark, dir.resolve("t").toString)
    TransactionWriter.overwrite(log, Seq((0L, "seed")).toDF("n", "s"))
    (1L to 3L).foreach(i => Maintenance.append(log, Seq((i, s"v$i")).toDF("n", "s")))
    // NOTE: no rate limit here — AvailableNow fixes its end offset at
    // the FIRST getOffset, so a rate-limited first offer (backfill
    // control) would cap the drain at one commit. Rate limits are for
    // continuous streams; one-shot drains omit them.
    val outDir = dir.resolve("out").toString
    def drainOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[graft.sources.DeltaSourceProvider].getName)
        .option("path", log.tablePath)
        .load()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", dir.resolve("cp").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      // AvailableNow must terminate ON ITS OWN once caught up
      assert(q.awaitTermination(120000),
        "AvailableNow query did not self-terminate")
    }
    drainOnce()
    assert(spark.read.parquet(outDir).count() == 4L)
    // a second AvailableNow run picks up ONLY the new commit
    Maintenance.append(log, Seq((9L, "late")).toDF("n", "s"))
    drainOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 5L,
      "restart from the checkpoint must append only the new commit")
    assert(out.where(col("n") === 9L).count() == 1L)
  }

  test("windowed event counts aggregate per tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.windowedEventCounts(
      input.toDF().toDF("ts", "etype"), "ts", "etype")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      input.addData((ts(0), "x"), (ts(0), "x"), (ts(1), "y"), (ts(2), "x"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("etype", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      // 1-minute windows: x@10:00 ×2, y@10:01, x@10:02
      assert(rows == Set(("x", 2L), ("y", 1L), ("x", 1L)) ||
        rows.map(_._1).toSeq.sorted == Seq("x", "x", "y"))
    } finally q.stop()
  }
}
