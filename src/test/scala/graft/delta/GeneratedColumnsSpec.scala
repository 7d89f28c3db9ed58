package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType, StructField, StructType, TimestampType}
import graft.SparkTestBase

/** Generated columns: omitted → computed in the write job; provided →
  * null-safe-equality validated; protocol recorded at writer 4. */
class GeneratedColumnsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-gen").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("create with a generated partition column; omitted writes fill it") {
    val log = freshLog()
    val declared = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      GeneratedColumns.field("day", DateType, "CAST(ts AS DATE)")))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-02 23:59:59")))
      .toDF("id", "ts")
    // the classic delta shape: partition by the GENERATED day column,
    // which the frame omits entirely
    val log2 = log
    TransactionWriter.overwriteWithSchema(log2, df, declared,
      partitionBy = Some(Seq("day")))
    val snap = log2.snapshot
    assert(snap.protocol.minWriterVersion >= 4)
    assert(GeneratedColumns.of(snap.schema) == Map("day" -> "CAST(ts AS DATE)"))
    assert(snap.metadata.partitionColumns == Seq("day"))
    val got = snap.read().select("id", "day").as[(Long, java.sql.Date)]
      .collect().sortBy(_._1)
    assert(got.map(_._2.toString).toSeq == Seq("2026-01-01", "2026-01-02"))

    // an append omitting `day` fills it; partition pruning then works
    TransactionWriter.append(log2,
      Seq((3L, java.sql.Timestamp.valueOf("2026-01-01 05:00:00"))).toDF("id", "ts"))
    assert(log2.snapshot.read().where(col("day") === lit("2026-01-01")).count() == 2)
    val pruned = Skipping.prunedFiles(log2.snapshot,
      Seq(("day", "=", java.sql.Date.valueOf("2026-01-01"))))
    assert(pruned.size < log2.snapshot.activeFiles.size)

    // explicit CONSISTENT value passes; inconsistent aborts
    TransactionWriter.append(log2, Seq(
      (4L, java.sql.Timestamp.valueOf("2026-01-03 00:00:01"),
        java.sql.Date.valueOf("2026-01-03"))).toDF("id", "ts", "day"))
    assert(log2.snapshot.read().count() == 4)
    val before = log2.snapshot.version
    intercept[Exception] {
      TransactionWriter.append(log2, Seq(
        (5L, java.sql.Timestamp.valueOf("2026-01-04 00:00:01"),
          java.sql.Date.valueOf("1999-01-01"))).toDF("id", "ts", "day"))
    }
    assert(log2.latestVersion() == before)
  }

  test("generated column interacts with constraints and mutations") {
    val log = freshLog()
    val declared = StructType(Seq(
      StructField("s", StringType),
      GeneratedColumns.field("s_len", LongType, "length(s)")))
    val base = Seq("abc", "de").toDF("s")
    TransactionWriter.overwriteWithSchema(log, base, declared)
    assertSameRows(log.snapshot.read(),
      Seq(("abc", 3L), ("de", 2L)).toDF("s", "s_len"))
    // a targeted UPDATE that changes s must supply a consistent s_len
    // (the rewrite recomputes nothing by itself — the probe catches it)
    Mutations.update(log, col("s") === "de",
      Map("s" -> lit("xyzw"), "s_len" -> lit(4L)))
    assertSameRows(log.snapshot.read(),
      Seq(("abc", 3L), ("xyzw", 4L)).toDF("s", "s_len"))
    val before = log.snapshot.version
    intercept[Exception] {
      Mutations.update(log, col("s") === "abc", Map("s" -> lit("changed")))
    }
    assert(log.latestVersion() == before,
      "update breaking the generation invariant must not commit")
  }

  test("MERGE insert computes omitted generated columns from the row") {
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq((1L, "aa")).toDF("id", "s"),
      StructType(Seq(
        StructField("id", LongType),
        StructField("s", StringType),
        GeneratedColumns.field("slen", LongType, "length(s)"))))
    Merge.into(log, Seq((2L, "merged")).toDF("sid", "sv"),
        col("t.id") === col("s.sid"))
      .whenNotMatchedInsert(Map("id" -> col("s.sid"), "s" -> col("s.sv")))
      .execute()
    val got = log.snapshot.read().orderBy("id")
      .select("id", "s", "slen").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "aa", 2L), (2L, "merged", 6L)), got.toString)
    // inconsistent explicit value still aborts through the probe
    intercept[Exception] {
      Merge.into(log, Seq((3L, "x")).toDF("sid", "sv"),
          col("t.id") === col("s.sid"))
        .whenNotMatchedInsert(Map("id" -> col("s.sid"), "s" -> col("s.sv"),
          "slen" -> lit(999L)))
        .execute()
    }
  }

  test("predicates on the base column prune generated partition columns") {
    import org.apache.spark.sql.functions._
    val log = freshLog()
    val declared = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      GeneratedColumns.field("day", DateType, "CAST(ts AS DATE)")))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-02 08:00:00")),
      (3L, java.sql.Timestamp.valueOf("2026-01-03 23:59:59")))
      .toDF("id", "ts")
    TransactionWriter.overwriteWithSchema(log, df, declared,
      partitionBy = Some(Seq("day")))
    val snap = log.snapshot
    assert(snap.numFiles == 3, "one file per day partition expected")

    // equality on ts maps through ANY generated expr: only day=01-02
    val eq = snap.planFilesForPredicate(
      col("ts") === java.sql.Timestamp.valueOf("2026-01-02 08:00:00"))
    assert(eq.size == 1, s"eq pruned to ${eq.size} files")
    assert(eq.head.partitionValues("day") == "2026-01-02")

    // range on ts maps through the monotonic CAST-to-date: days 02..03
    val range = snap.planFilesForPredicate(
      col("ts") >= java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
    assert(range.size == 2, s"range pruned to ${range.size} files")
    assert(!range.exists(_.partitionValues("day") == "2026-01-01"))

    // correctness: the pruned scan still returns exactly the rows
    val rows = snap.read()
      .where(col("ts") >= java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(2L, 3L))
  }

  test("STRING-base generated column: range predicates must NOT prune (round-6 advice)") {
    import org.apache.spark.sql.functions._
    val log = freshLog()
    // day = to_date over a STRING in 'MM/dd/yyyy' order: the string
    // order of s disagrees with the parsed date order ('06/01/2024' <
    // '12/01/2023' as strings), so range mapping through the generated
    // expr would prune files that contain matching rows.
    val declared = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      GeneratedColumns.field("day", DateType, "to_date(s, 'MM/dd/yyyy')")))
    val df = Seq(
      (1L, "12/01/2023"),
      (2L, "06/01/2024"),
      (3L, "11/15/2024"))
      .toDF("id", "s")
    TransactionWriter.overwriteWithSchema(log, df, declared,
      partitionBy = Some(Seq("day")))
    val snap = log.snapshot
    assert(snap.numFiles == 3, "one file per day partition expected")

    // equality still maps (evaluate the expr at the literal): one file
    val eq = snap.planFilesForPredicate(col("s") === "06/01/2024")
    assert(eq.size == 1, s"eq pruned to ${eq.size} files")
    assert(eq.head.partitionValues("day") == "2024-06-01")

    // RANGE on the string base must keep every file: '12/01/2023' rows
    // satisfy s >= '06/01/2024' in string order but live in the
    // 2023-12-01 partition, which monotonic mapping would drop
    val range = snap.planFilesForPredicate(col("s") >= "06/01/2024")
    assert(range.size == 3,
      s"string-base range must not prune, kept ${range.size} files")
    val rows = snap.read().where(col("s") >= "06/01/2024")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L))
  }
}
