package graft

import graft.delta.{DeltaLog, Skipping}

/** Golden tests ported from the reference's
  * tests/test_public_interface.py — log-plane analytics + pure parsers,
  * asserted against the reference's own hand-computed values over the
  * committed `basic_append` / `multi_partitioned` fixtures.
  *
  * ERROR-PATH PARITY AUDIT — every pytest.raises branch in the
  * reference mapped to its graft assertion (this file + MutationsSpec):
  *
  * | reference line(s)        | raises     | branch                            | graft test (intercept)                                                        |
  * |--------------------------|------------|-----------------------------------|-------------------------------------------------------------------------------|
  * | :389 (:348-398)          | TypeError  | scd2 BASE missing required column | MutationsSpec "type_2_scd_upsert schema validation (reference :348-398, :401-451)" |
  * | :442 (:401-451)          | TypeError  | scd2 UPDATES missing pkey         | MutationsSpec, same test (updatesNoPkey branch)                               |
  * | :710 (:684-715)          | TypeError  | drop_duplicates: no table         | unrepresentable (non-nullable DeltaLog parameter)                             |
  * | :711-712                 | TypeError  | drop_duplicates: empty/None cols  | MutationsSpec "drop_duplicates error paths (reference :684-715)"              |
  * | :713                     | TypeError  | drop_duplicates: missing column   | MutationsSpec, same test                                                      |
  * | :714                     | TypeError  | drop_duplicates: cols not a list  | unrepresentable (Seq[String] parameter type)                                  |
  * | :875, :905 (:849-908)    | ValueError | pkey not unique table-wide        | MutationsSpec "drop_duplicates_pkey validations (reference :849-943)"         |
  * | :935 (:909-943) branch 1 | TypeError  | pkey: no table                    | unrepresentable (non-nullable DeltaLog parameter)                             |
  * | :935 branch 2            | TypeError  | pkey: no primary key              | MutationsSpec pkey validations (empty-pkey branch)                            |
  * | :935 branches 3-4        | TypeError  | pkey: empty/None dup cols         | MutationsSpec pkey validations (Nil branch)                                   |
  * | :935 branch 5            | TypeError  | pkey ∈ duplication_columns        | MutationsSpec pkey validations                                                |
  * | :935 branch 6            | TypeError  | pkey: missing column              | MutationsSpec pkey validations (col9 branch)                                  |
  * | :935 branches 7-8        | TypeError  | pkey: wrong argument types        | unrepresentable (typed parameters)                                            |
  * | levi str_to_bytes bad unit | ValueError | unparseable size string         | this file, "str_to_bytes (reference :82-85)"                                  |
  * | levi filter op validation  | —          | unsupported operator            | this file, "filter_to_sql (reference :63-66)"                                 |
  */
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
