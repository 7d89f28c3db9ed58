package graft.delta

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** RACING index refreshes — the gap ConcurrencyStressSpec (commit
  * plane) left open: an explicit REFRESH racing the post-commit
  * auto-refresh hook (or another explicit refresh) exercises the
  * sidecar's generation-swap discipline under contention. The publish
  * path must never produce a corrupt generation (nonce-suffixed
  * directory names keep concurrent writers collision-free), a lost
  * pointer race must degrade quietly (the winner's generation is
  * complete and advisory-fresh), and the GC must never delete a
  * directory a racer is about to point at (orphans collect one swap
  * later). Convergence is the contract: after the dust settles, one
  * quiescent refresh yields zero stale files, zero invalid files,
  * indexed dedup ≡ the direct operator, and bounded generations. */
class IndexConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  private def dtext(i: Long): String =
    s"doc $i " + (0 until 12).map(j => s"tok${i}_$j").mkString(" ")

  test("racing append+refresh threads converge: no stale/invalid files, dedup ≡ direct, generations bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_race_")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, dir)
    TransactionWriter.overwrite(log,
      (0L until 20L).map(i => (i, dtext(i))).toDF("id", "text")
        .repartition(2, col("id")))
    LshIndex.build(log, "id", "text")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val threads = 4
    val rounds = 3
    Await.result(
      Future.sequence((0 until threads).map { t =>
        Future {
          (0 until rounds).foreach { r =>
            val lo = 1000L * (t * rounds + r + 1)
            TransactionWriter.appendWithRetry(log,
              (lo until lo + 5L).map(i => (i, dtext(i)))
                .toDF("id", "text"))
            // each thread refreshes through its own log handle, like
            // independent sessions would
            LshIndex.refresh(DeltaLog.forPath(spark, dir), "id", "text")
          }
        }
      // 20 minutes, not 5: one round-13 full-suite run hit the old
      // 300 s bound during a heavily host-contended window (passes
      // running ~2× slow) — the bound only guards against a genuine
      // hang, so it should sit far above any contended-but-progressing
      // run. Assertion surface unchanged.
      }), 1200.seconds)

    // quiescent convergence refresh, then the invariants
    val fresh = DeltaLog.forPath(spark, dir)
    LshIndex.refresh(fresh, "id", "text")
    val rows = Indexes.describe(DeltaLog.forPath(spark, dir))
      .collect { case ("lsh", _, covered, coverable, stale, invalid) =>
        (covered, coverable, stale, invalid) }
    assert(rows.nonEmpty, "index must survive the race")
    val (covered, coverable, stale, invalid) = rows.head
    assert(stale == 0L && invalid == 0L && covered == coverable,
      s"converged index must fully cover: covered=$covered/" +
        s"$coverable stale=$stale invalid=$invalid")

    // indexed dedup ≡ direct through the post-race index
    val batch = Seq((90001L, dtext(5)), (90002L, dtext(1003L)),
      (90003L, dtext(777777L))).toDF("id", "text")
    val cur = DeltaLog.forPath(spark, dir)
    val viaIdx = LshIndex.dedupBatch(cur, batch, "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val direct = graft.operators.MinHashLsh.dedupAgainstCorpus(
      batch, cur.snapshot.read(), "id", "text", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaIdx == direct && viaIdx == Seq(90003L),
      s"idx=$viaIdx direct=$direct")

    // race orphans are collected within two more swaps: generations on
    // disk settle back to current + superseded
    (0 until 2).foreach { r =>
      TransactionWriter.append(log,
        Seq((95000L + r, dtext(95000L + r))).toDF("id", "text"))
      LshIndex.refresh(DeltaLog.forPath(spark, dir), "id", "text")
    }
    val idxBase = new org.apache.hadoop.fs.Path(
      LshIndex.indexDir(log, "id", "text"))
    val hfs = idxBase.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = hfs.listStatus(idxBase).map(_.getPath.getName)
      .filter(_.startsWith("gen_")).toSeq
    assert(gens.size <= 2,
      s"generations must settle to current + superseded, got $gens")
  }
}
