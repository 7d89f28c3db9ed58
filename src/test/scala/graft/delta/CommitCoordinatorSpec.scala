package graft.delta

import java.nio.file.Files
import graft.SparkTestBase

/** A test coordinator proving the FQCN plug point: counts publications,
  * then delegates to the rename coordinator. */
class CountingCoordinator extends CommitCoordinator {
  override def publish(log: DeltaLog, version: Long,
      tmp: org.apache.hadoop.fs.Path, target: org.apache.hadoop.fs.Path): Unit = {
    CountingCoordinator.published.incrementAndGet()
    RenameCommitCoordinator.publish(log, version, tmp, target)
  }
}
object CountingCoordinator {
  val published = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Commit publication is pluggable per session; every coordinator must
  * let exactly one of two racing same-version commits win. */
class CommitCoordinatorSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-coord").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  private def withCoordinator[A](name: String)(f: => A): A = {
    spark.conf.set("spark.graft.commitCoordinator", name)
    try f finally spark.conf.unset("spark.graft.commitCoordinator")
  }

  test("locking coordinator: sequential commits work, replay intact") {
    withCoordinator("locking") {
      val log = freshLog()
      TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "s"))
      TransactionWriter.append(log, Seq((2L, "b")).toDF("k", "s"))
      assert(log.snapshot.version == 1L)
      assert(log.snapshot.read().count() == 2L)
    }
  }

  test("locking coordinator: exactly one racing same-version commit wins") {
    withCoordinator("locking") {
      val log = freshLog()
      TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "s"))
      val actions = Seq(
        CommitInfoAction(CommitInfo(System.currentTimeMillis(), "TEST", Map.empty)))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 8).map { _ =>
          Future {
            try { log.commit(1L, actions); "won" }
            catch { case _: java.util.ConcurrentModificationException => "lost" }
          }
        }), 60.seconds).toList
      assert(results.count(_ == "won") == 1, results.toString)
      assert(results.count(_ == "lost") == 7)
      // no stray tmp files survive the losers
      val strays = log.fs.listStatus(
        new org.apache.hadoop.fs.Path(log.tablePath, "_delta_log"))
        .map(_.getPath.getName).filter(_.endsWith(".tmp"))
      assert(strays.isEmpty, strays.mkString(","))
    }
  }

  test("rename coordinator rejects the second same-version commit") {
    withCoordinator("rename") {
      val log = freshLog()
      TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "s"))
      val actions = Seq(
        CommitInfoAction(CommitInfo(System.currentTimeMillis(), "TEST", Map.empty)))
      log.commit(1L, actions)
      intercept[java.util.ConcurrentModificationException] {
        log.commit(1L, actions)
      }
    }
  }

  test("file: tables default to the locking coordinator") {
    val log = freshLog()
    assert(CommitCoordinator.forLog(log) eq LockingCommitCoordinator)
    withCoordinator("rename") {
      assert(CommitCoordinator.forLog(log) eq RenameCommitCoordinator)
    }
  }

  test("custom coordinator loads by class name and is actually used") {
    withCoordinator(classOf[CountingCoordinator].getName) {
      val before = CountingCoordinator.published.get()
      val log = freshLog()
      TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "s"))
      TransactionWriter.append(log, Seq((2L, "b")).toDF("k", "s"))
      assert(CountingCoordinator.published.get() >= before + 2)
      assert(log.snapshot.read().count() == 2L)
    }
  }
}
