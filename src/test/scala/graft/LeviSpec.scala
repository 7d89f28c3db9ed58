package graft

import graft.delta.{DeltaLog, Skipping}

/** Golden tests ported from the reference's
  * tests/test_public_interface.py — log-plane analytics + pure parsers,
  * asserted against the reference's own hand-computed values over the
  * committed `basic_append` / `multi_partitioned` fixtures. */
class LeviSpec extends SparkTestBase {
  def basicAppend =
    DeltaLog.forPath(spark, "/root/reference/tests/reader_tests/generated/basic_append/delta").snapshot

  test("skipped_stats: equality (reference :11-16)") {
    assert(Levi.skippedStats(basicAppend, Seq(("a_float", "=", 4.5))) ==
      Map("num_files" -> 3L, "num_files_skipped" -> 2L, "num_bytes_skipped" -> 3887L))
  }

  test("skipped_stats: between (reference :19-24)") {
    assert(Levi.skippedStats(basicAppend, Seq(("a_float", ">", 1), ("a_float", "<", 3))) ==
      Map("num_files" -> 3L, "num_files_skipped" -> 1L, "num_bytes_skipped" -> 984L))
  }

  test("skipped_stats: less than (reference :27-32)") {
    assert(Levi.skippedStats(basicAppend, Seq(("a_float", "<", 4.5))) ==
      Map("num_files" -> 3L, "num_files_skipped" -> 0L, "num_bytes_skipped" -> 0L))
  }

  test("skipped_stats: less than or equal (reference :35-40)") {
    assert(Levi.skippedStats(basicAppend, Seq(("a_float", "<=", 2.3))) ==
      Map("num_files" -> 3L, "num_files_skipped" -> 1L, "num_bytes_skipped" -> 984L))
  }

  test("skipped_stats: greater than (reference :43-48)") {
    assert(Levi.skippedStats(basicAppend, Seq(("a_float", ">", 4.5))) ==
      Map("num_files" -> 3L, "num_files_skipped" -> 2L, "num_bytes_skipped" -> 3887L))
  }

  test("filter_to_sql (reference :63-66)") {
    assert(Skipping.filterToSql("a_float", "=", 4.5) ==
      "(`min.a_float` <= 4.5 and `max.a_float` >= 4.5)")
    assert(Skipping.filterToSql("a_float", ">", 3) == "(`max.a_float` > 3)")
    intercept[IllegalArgumentException](Skipping.filterToSql("x", "!=", 1))
  }

  test("delta_file_sizes (reference :68-72)") {
    assert(Levi.deltaFileSizes(basicAppend, Seq("<300b", "300b-1kb", "1kb-100kb", ">100kb")) ==
      Map("num_files_<300b" -> 0L, "num_files_300b-1kb" -> 2L,
        "num_files_1kb-100kb" -> 1L, "num_files_>100kb" -> 0L))
  }

  test("latest_version (reference :75-79)") {
    val log = DeltaLog.forPath(spark,
      "/root/reference/tests/reader_tests/generated/multi_partitioned/delta")
    assert(Levi.latestVersion(log) == 2L)
  }

  test("str_to_bytes (reference :82-85)") {
    assert(Levi.strToBytes("100b") == 100L)
    assert(Levi.strToBytes("1kb") == 1000L)
    assert(Levi.strToBytes("4gb") == 4000000000L)
    intercept[IllegalArgumentException](Levi.strToBytes("4parsecs"))
  }

  test("boundary_parser (reference :88-94)") {
    val tenTb = 10000000000000L
    assert(Levi.boundaryParser("<=1kb") == ((0L, 1000L)))
    assert(Levi.boundaryParser("<1kb") == ((0L, 999L)))
    assert(Levi.boundaryParser(">=1kb") == ((1000L, tenTb)))
    assert(Levi.boundaryParser(">1kb") == ((1001L, tenTb)))
    assert(Levi.boundaryParser("10kb-4gb") == ((10000L, 4000000000L)))
  }

  test("rowCountFromLog: exact from stats, DV-aware, None without stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft-rowcount")
      .resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    graft.delta.TransactionWriter.overwrite(log,
      (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "s"))
    assert(Levi.rowCountFromLog(log.snapshot).contains(1000L))
    // DV delete subtracts cardinality without touching data files
    graft.delta.Mutations.deleteWithDv(log, col("k") % 10 === 0)
    assert(Levi.rowCountFromLog(log.snapshot).contains(900L))
    assert(log.snapshot.read().count() == 900L)
    // a stats-less add poisons exactness -> None
    val f = log.snapshot.activeFiles.head
    log.commit(log.snapshot.version + 1, Seq(
      graft.delta.CommitInfoAction(graft.delta.CommitInfo(
        System.currentTimeMillis(), "TEST", Map.empty)),
      graft.delta.AddAction(f.copy(path = f.path + ".nostats.parquet",
        stats = None))))
    assert(Levi.rowCountFromLog(log.snapshot).isEmpty)
  }
}
