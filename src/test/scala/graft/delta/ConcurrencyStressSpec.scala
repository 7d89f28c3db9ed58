package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Many-writer stress: the multi-executor story a 1000-node cluster
  * depends on — concurrent blind appends racing on one table must ALL
  * land (appendWithRetry re-resolves the version on a lost race; a
  * blind append conflicts with nothing), with contiguous versions and
  * no lost or duplicated rows. */
class ConcurrencyStressSpec extends SparkTestBase {
  import spark.implicits._

  test("12 concurrent appenders all land, versions contiguous, no lost rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stress_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, tmp)
    TransactionWriter.overwrite(log,
      Seq((-1L, -1L)).toDF("writer", "row"))                       // v0

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = 12
    val rowsPer = 5
    Await.result(
      Future.sequence((0 until writers).map { w =>
        Future {
          TransactionWriter.appendWithRetry(log,
            (0 until rowsPer).map(i => (w.toLong, i.toLong))
              .toDF("writer", "row"))
        }
      }), 180.seconds)

    val snap = log.snapshot
    assert(snap.version == writers.toLong,
      s"expected ${writers} append commits after v0, got ${snap.version}")
    val rows = snap.read().where(col("writer") >= 0)
    assert(rows.count() == writers.toLong * rowsPer)
    // every writer's full batch is present exactly once
    val perWriter = rows.groupBy("writer").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perWriter == (0 until writers).map(_.toLong -> rowsPer.toLong).toMap)
    // the log replays cleanly from scratch (no torn commits)
    val fresh = DeltaLog.forPath(spark, tmp)
    assert(fresh.snapshot.read().count() == writers.toLong * rowsPer + 1)
  }

  test("concurrent marker-carrying merges: every fold lands WITH its marker") {
    // Eight insert-only signed-delta folds (disjoint new keys, distinct
    // appIds) race into one DV-enabled rollup — each rides its
    // (appId, batch) marker inside its own merge commit. The invariant
    // that matters for exactly-once: after the dust settles, every
    // writer's data AND marker are present together (a marker without
    // its fold, or a fold without its marker, is the crash-window bug
    // the riding-marker design exists to prevent).
    val tmp = java.nio.file.Files.createTempDirectory("graft_txnrace_")
      .resolve("agg").toString
    val log = DeltaLog.forPath(spark, tmp)
    TransactionWriter.overwrite(log,
      Seq(("seed", 1L, 1L)).toDF("source", "n", "s"),
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = 8
    Await.result(
      Future.sequence((0 until writers).map { w =>
        Future {
          val delta = Seq((s"w$w", 1L, 10L + w))
            .toDF("source", "__d_n", "__d_sum")
          graft.operators.IncrementalAgg.mergeDelta(
            log, delta, Seq("source"), "n", "s",
            txn = Some((s"app$w", 1L)))
        }
      }), 180.seconds)
    val snap = DeltaLog.forPath(spark, tmp).snapshot // fresh replay
    val rows = snap.read().collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    (0 until writers).foreach { w =>
      assert(rows.get(s"w$w").contains(10L + w), s"writer $w fold lost")
      assert(snap.setTransactions.get(s"app$w").exists(_.version == 1L),
        s"writer $w marker lost")
    }
  }

  test("rebase aborts when a concurrent commit advanced the SAME txn appId") {
    // Two writers folding the same batch window under one appId (e.g.
    // two concurrent MatView.refresh calls) must NOT both land — the
    // loser's rebase has to detect the winner's marker and abort, or
    // the window double-applies.
    val tmp = java.nio.file.Files.createTempDirectory("graft_txnconf_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, tmp)
    TransactionWriter.overwrite(log, Seq((1L, 1L)).toDF("k", "v"))  // v0
    def actions(app: String, batch: Long) = Seq(
      CommitInfoAction(CommitInfo(System.currentTimeMillis(), "TEST", Map())),
      TxnAction(SetTransaction(app, batch, None)))
    // the "winner" lands at v1 with (app, 1)
    log.commit(1L, actions("app", 1L))
    // the "loser" prepared the same window against v0 and tries v1
    intercept[java.util.ConcurrentModificationException] {
      TransactionWriter.commitWithRebase(log, 1L,
        actions("app", 1L), touchedPaths = Set.empty)
    }
    // a DIFFERENT appId is no conflict: rebases cleanly to v2
    assert(TransactionWriter.commitWithRebase(log, 1L,
      actions("other", 1L), touchedPaths = Set.empty) == 2L)
  }

  test("concurrent join-view refreshes converge: same window, one correct view") {
    // the createJoin doc claims a concurrent refresher "either rebases
    // cleanly (identical content) or is rejected by the file-level
    // conflict check" — race two refreshes of the SAME window and
    // assert the view ends correct either way (the absolute-row apply
    // makes a double-apply content-idempotent)
    val base = java.nio.file.Files.createTempDirectory("graft_mvjrace_")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("v").toString
    val fact = DeltaLog.forPath(spark, factPath)
    val dim = DeltaLog.forPath(spark, dimPath)
    TransactionWriter.overwrite(fact,
      (0L until 500L).map(i => (i, i % 50, i * 2)).toDF("pk", "fk", "x"))
    ChangeDataFeed.enable(fact)
    TransactionWriter.overwrite(dim,
      (0L until 50L).map(i => (i, s"d$i")).toDF("dk", "name"))
    ChangeDataFeed.enable(dim)
    MatView.createJoin(spark, viewPath, factPath, dimPath,
      Seq("pk"), "fk", "dk", Seq("name"))
    TransactionWriter.append(fact,
      (500L until 700L).map(i => (i, i % 50, i * 2)).toDF("pk", "fk", "x"))
    Mutations.delete(fact, col("pk") % 7 === 0)
    Mutations.update(dim, col("dk") % 5 === 3, Map("name" -> lit("Z")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((0 until 2).map { _ =>
      Future {
        try Right(MatView.refresh(spark, viewPath))
        catch { case e: java.util.ConcurrentModificationException => Left(e) }
      }
    }), 5.minutes)
    assert(results.exists(_.isRight), "at least one refresh must land")
    val want = fact.snapshot.read().join(
      dim.snapshot.read().select(col("dk").as("fk"), col("name")), Seq("fk"))
    assertSameRows(DeltaLog.forPath(spark, viewPath).snapshot.read(), want,
      s"view after racing refreshes (outcomes: $results)")
    // a follow-up refresh with nothing new stays a no-op
    MatView.refresh(spark, viewPath)
    assertSameRows(DeltaLog.forPath(spark, viewPath).snapshot.read(), want,
      "post-race no-op refresh")
  }

  test("hard-delete pipeline: DELETE + REORG PURGE + VACUUM erases rows physically") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gdpr_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, tmp)
    val users = (0L until 200L).map(i => (i, s"user$i", s"payload$i"))
      .toDF("uid", "name", "blob").repartition(4)
    TransactionWriter.overwrite(log, users)

    // logical erasure first (DV delete: fast, O(matched rows))...
    Mutations.deleteWithDv(log, col("uid") % 10 === 3)
    assert(log.snapshot.read().where(col("uid") % 10 === 3).count() == 0)

    // ...then physical: PURGE materializes DV survivors into clean
    // files, VACUUM(0) reclaims the originals + orphaned DV bitmaps.
    Maintenance.purgeDeletionVectors(log)
    Maintenance.vacuum(log, retentionMs = 0L, allowZeroRetention = true)

    // read EVERY parquet file still on disk, bypassing the log: the
    // deleted users must be gone from storage, not just from the scan.
    val dataFiles = log.fs.listStatus(new org.apache.hadoop.fs.Path(log.tablePath))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(dataFiles.nonEmpty)
    val raw = spark.read.parquet(dataFiles: _*)
    assert(raw.where(col("uid") % 10 === 3).count() == 0,
      "deleted rows still physically present after PURGE + VACUUM")
    assert(raw.count() == 180)
    assert(log.snapshot.read().count() == 180)
  }

  test("concurrent replaceWhere on DISJOINT partitions: both land via rebase") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rwrace_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, tmp)
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "g"),
      partitionBy = Some(Seq("g")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two predicate-scoped overwrites of different partitions race;
    // their touched-path sets are disjoint, so the loser must REBASE
    // and land, never abort or clobber
    Await.result(Future.sequence(Seq(
      Future(Mutations.replaceWhere(DeltaLog.forPath(spark, tmp),
        Seq((10L, "a")).toDF("k", "g"), col("g") === "a")),
      Future(Mutations.replaceWhere(DeltaLog.forPath(spark, tmp),
        Seq((20L, "b")).toDF("k", "g"), col("g") === "b")))),
      120.seconds)
    val snap = DeltaLog.forPath(spark, tmp).snapshot
    assert(snap.version == 2L, s"both swaps must commit, got v${snap.version}")
    assertSameRows(snap.read(),
      Seq((3L, "c"), (10L, "a"), (20L, "b")).toDF("k", "g"))
  }

  test("concurrent replaceWhere on the SAME partition: one rebases out") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rwrace2_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, tmp)
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b")).toDF("k", "g"),
      partitionBy = Some(Seq("g")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // both swaps touch partition a's file — the race loser saw (and
    // removed) a file the winner also rewrote; committing anyway would
    // resurrect/double rows, so exactly one must fail the logical check
    val results = Await.result(Future.sequence(Seq(10L, 11L).map(v =>
      Future(
        try Right(Mutations.replaceWhere(DeltaLog.forPath(spark, tmp),
          Seq((v, "a")).toDF("k", "g"), col("g") === "a"))
        catch { case e: Exception => Left(e.getMessage) }))),
      120.seconds)
    val wins = results.count(_.isRight)
    // serialized-by-luck schedules can let both land (the second saw
    // the first's commit before planning); a true race lands exactly 1
    assert(wins >= 1, s"at least one swap must land: $results")
    val rows = DeltaLog.forPath(spark, tmp).snapshot.read()
      .where(col("g") === "a").collect().map(_.getLong(0)).toSeq
    assert(rows.size == 1 && Seq(10L, 11L).contains(rows.head),
      s"partition a must hold exactly one winner row, got $rows")
  }
}
