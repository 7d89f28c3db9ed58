package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.delta.{AddFile, DeltaLog, Mutations, TransactionWriter}

/** Mutation golden tests ported from the reference's
  * tests/test_public_interface.py, run against tables created by our own
  * TransactionWriter (the reference builds its fixtures with
  * write_deltalake the same way) — so this doubles as a writer/reader
  * roundtrip suite. */
class MutationsSpec extends SparkTestBase {
  import spark.implicits._

  def tmpTable(): String =
    Files.createTempDirectory("graft-delta-test").resolve("tbl").toString

  def writeTable(df: DataFrame, partitionBy: Seq[String] = Nil): DeltaLog = {
    val path = tmpTable()
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log, df,
      partitionBy = if (partitionBy.isEmpty) None else Some(partitionBy))
    log
  }

  test("kill_duplicates (reference :159-198)") {
    val log = writeTable(Seq(
      (1L, "A", "A"), (2L, "A", "B"), (3L, "A", "A"), (4L, "A", "A"),
      (5L, "B", "B"), (6L, "D", "D"), (9L, "B", "B"))
      .toDF("col1", "col2", "col3"))
    Levi.killDuplicates(log, Seq("col3", "col2"))
    assertSameRows(log.snapshot.read(),
      Seq((2L, "A", "B"), (6L, "D", "D")).toDF("col1", "col2", "col3"))
  }

  test("kill_duplicates error paths (same column contract as reference :684-715)") {
    // the reference has no kill_duplicates raises branch of its own —
    // its duplication_columns contract is shared with drop_duplicates
    val log = writeTable(Seq((1L, "A")).toDF("col1", "col2"))
    intercept[IllegalArgumentException](Levi.killDuplicates(log, Nil))
    intercept[IllegalArgumentException](Levi.killDuplicates(log, Seq("nope")))
  }

  test("drop_duplicates error paths (reference :684-715)") {
    val log = writeTable(Seq(
      (1L, "A", "A", "C"), (1L, "A", "A", "C"))
      .toDF("col1", "col2", "col3", "col4"))
    // empty duplication_columns (reference :712)
    intercept[IllegalArgumentException](
      Levi.dropDuplicates(log, Nil, orderBy = Seq("col1")))
    // non-existing column (reference :713, col5)
    intercept[IllegalArgumentException](
      Levi.dropDuplicates(log, Seq("col1", "col5"), orderBy = Seq("col1")))
    // the reference's None-table / wrong-argument-type branches
    // (:710-711, :714) are unrepresentable in this typed API
  }

  test("drop_duplicates one column (reference :597-638)") {
    val log = writeTable(Seq(
      (1L, "A", "A", "C"), (1L, "A", "A", "C"), (1L, "A", "A", "C"), (1L, "A", "A", "C"))
      .toDF("col1", "col2", "col3", "col4"))
    Levi.dropDuplicates(log, Seq("col1"), orderBy = Seq("col1"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "A", "A", "C")).toDF("col1", "col2", "col3", "col4"))
  }

  test("drop_duplicates two columns (reference :641-681)") {
    val log = writeTable(Seq(
      (1L, "A", "A", "C"), (1L, "A", "A", "C"), (1L, "B", "A", "C"), (1L, "B", "A", "C"))
      .toDF("col1", "col2", "col3", "col4"))
    Levi.dropDuplicates(log, Seq("col1", "col2"), orderBy = Seq("col1", "col2"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "A", "A", "C"), (1L, "B", "A", "C")).toDF("col1", "col2", "col3", "col4"))
  }

  test("drop_duplicates_pkey keeps smallest pkey per group (reference :720-817)") {
    val log = writeTable(Seq(
      (1L, "A", "A", "C"), (2L, "A", "A", "C"), (3L, "B", "A", "C"), (4L, "B", "A", "C"),
      (5L, "C", "X", "C"))
      .toDF("col1", "col2", "col3", "col4"))
    Levi.dropDuplicatesPkey(log, "col1", Seq("col2", "col3"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "A", "A", "C"), (3L, "B", "A", "C"), (5L, "C", "X", "C"))
        .toDF("col1", "col2", "col3", "col4"))
  }

  test("drop_duplicates_pkey validations (reference :849-943)") {
    val log = writeTable(Seq((1L, "A"), (1L, "B")).toDF("col1", "col2"))
    // non-unique pkey
    intercept[IllegalArgumentException](Levi.dropDuplicatesPkey(log, "col1", Seq("col2")))
    val log2 = writeTable(Seq((1L, "A"), (2L, "B")).toDF("col1", "col2"))
    // pkey inside duplication columns
    intercept[IllegalArgumentException](Levi.dropDuplicatesPkey(log2, "col1", Seq("col1", "col2")))
    // missing column
    intercept[IllegalArgumentException](Levi.dropDuplicatesPkey(log2, "col1", Seq("col9")))
    // empty duplication columns
    intercept[IllegalArgumentException](Levi.dropDuplicatesPkey(log2, "col1", Nil))
    // empty primary key (reference :935 "no pkey provided")
    intercept[IllegalArgumentException](Levi.dropDuplicatesPkey(log2, "", Seq("col2")))
  }

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("type_2_scd_upsert single attribute (reference :201-269)") {
    val log = writeTable(Seq(
      (1L, "A", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (2L, "B", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (4L, "D", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]))
      .toDF("pkey", "attr", "is_current", "effective_time", "end_time"))
    val updates = Seq(
      (2L, "Z", ts("2025-01-01 00:00:00")),
      (3L, "C", ts("2025-09-15 00:00:00")))
      .toDF("pkey", "attr", "effective_time")
    Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr"))
    assertSameRows(log.snapshot.read(), Seq(
      (2L, "B", false, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00")),
      (3L, "C", true, ts("2025-09-15 00:00:00"), null.asInstanceOf[Timestamp]),
      (2L, "Z", true, ts("2025-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (4L, "D", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (1L, "A", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]))
      .toDF("pkey", "attr", "is_current", "effective_time", "end_time"))
  }

  test("type_2_scd_upsert multiple attributes (reference :272-345)") {
    val log = writeTable(Seq(
      (1L, "A", "foo", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (2L, "B", "bar", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (4L, "D", "baz", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]))
      .toDF("pkey", "attr1", "attr2", "is_current", "effective_time", "end_time"))
    val updates = Seq(
      (2L, "Z", "qux", ts("2025-01-01 00:00:00")),
      (3L, "C", "quux", ts("2025-09-15 00:00:00")))
      .toDF("pkey", "attr1", "attr2", "effective_time")
    Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr1", "attr2"))
    assert(log.snapshot.read().count() == 5)
    assert(log.snapshot.read()
      .where($"pkey" === 2L && !$"is_current").count() == 1)
  }

  test("type_2_scd_upsert does not insert duplicates (reference :454-523)") {
    val log = writeTable(Seq(
      (1L, "A", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (2L, "B", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (4L, "D", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]))
      .toDF("pkey", "attr", "is_current", "effective_time", "end_time"))
    val updates = Seq((1L, "A", ts("2024-01-01 00:00:00"))).toDF("pkey", "attr", "effective_time")
    Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr"))
    assertSameRows(log.snapshot.read(), Seq(
      (1L, "A", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (2L, "B", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      (4L, "D", true, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp]))
      .toDF("pkey", "attr", "is_current", "effective_time", "end_time"))
  }

  test("type_2_scd_upsert with integer version column (reference :526-594)") {
    val log = writeTable(Seq(
      (1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]),
      (2L, "B", true, 1L, null.asInstanceOf[java.lang.Long]),
      (4L, "D", true, 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver"))
    val updates = Seq((2L, "Z", 2L), (3L, "C", 3L)).toDF("pkey", "attr", "effective_ver")
    Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr"),
      effectiveTimeColName = "effective_ver", endTimeColName = "end_ver")
    assertSameRows(log.snapshot.read(), Seq(
      (2L, "B", false, 1L, java.lang.Long.valueOf(2L)),
      (3L, "C", true, 3L, null.asInstanceOf[java.lang.Long]),
      (2L, "Z", true, 2L, null.asInstanceOf[java.lang.Long]),
      (4L, "D", true, 1L, null.asInstanceOf[java.lang.Long]),
      (1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver"))
  }

  test("type_2_scd_upsert schema validation (reference :348-398, :401-451)") {
    val log = writeTable(Seq(
      (1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver"))
    val updates = Seq((2L, "Z", 2L)).toDF("pkey", "attr", "effective_ver")
    // wrong attr list → base schema contract violated
    intercept[IllegalArgumentException](
      Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr", "bogus"),
        effectiveTimeColName = "effective_ver", endTimeColName = "end_ver"))
    // base missing a required column (reference :348-398 drops pkey
    // from the BASE): a base table without is_current/pkey must refuse
    val logNoCurrent = writeTable(Seq(
      (1L, "A", 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "effective_ver", "end_ver"))
    intercept[IllegalArgumentException](
      Levi.type2ScdUpsert(logNoCurrent, updates, "pkey", Seq("attr"),
        effectiveTimeColName = "effective_ver", endTimeColName = "end_ver"))
    // updates missing a required column (reference :401-451 drops pkey
    // from the UPDATES)
    val updatesNoPkey = Seq(("Z", 2L)).toDF("attr", "effective_ver")
    intercept[IllegalArgumentException](
      Levi.type2ScdUpsert(log, updatesNoPkey, "pkey", Seq("attr"),
        effectiveTimeColName = "effective_ver", endTimeColName = "end_ver"))
  }

  test("type_2_scd_upsert rejects multiple update rows per key") {
    val log = writeTable(Seq(
      (1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver"))
    val updates = Seq((1L, "X", 2L), (1L, "Y", 2L)).toDF("pkey", "attr", "effective_ver")
    val e = intercept[IllegalArgumentException](
      Levi.type2ScdUpsert(log, updates, "pkey", Seq("attr"),
        effectiveTimeColName = "effective_ver", endTimeColName = "end_ver"))
    assert(e.getMessage.contains("distinct 'pkey'"))
  }

  test("updated_partitions compares at microsecond precision") {
    import graft.delta._
    val path = tmpTable()
    val log = DeltaLog.forPath(spark, path)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    log.commit(0, Seq(
      ProtocolAction(Protocol()),
      MetadataAction(Metadata(java.util.UUID.randomUUID.toString, schema.json,
        Seq("p"), Map.empty, Some(0L))),
      AddAction(AddFile("p=x/f1.parquet", Map("p" -> "x"), 10L,
        modificationTime = 1000L)), // = 1_000_000 µs exactly
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    val snap = log.snapshot
    // boundary ON the file's millisecond: included (>=)
    assert(Levi.updatedPartitions(snap,
      startTime = Some(java.time.Instant.ofEpochMilli(1000L))).nonEmpty)
    // boundary 500µs PAST it: excluded — a millis-floor compare would
    // wrongly include it (reference filters at µs, levi/__init__.py:112-114)
    assert(Levi.updatedPartitions(snap,
      startTime = Some(java.time.Instant.ofEpochSecond(1L, 500000L))).isEmpty)
    // half-open end: end exactly at the file µs excludes it...
    assert(Levi.updatedPartitions(snap,
      endTime = Some(java.time.Instant.ofEpochMilli(1000L))).isEmpty)
    // ...but 1µs past includes it
    assert(Levi.updatedPartitions(snap,
      endTime = Some(java.time.Instant.ofEpochSecond(1L, 1000L))).nonEmpty)
  }

  test("updated_partitions with and without time filter (reference :97-156)") {
    val path = tmpTable()
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, 1L, "a"), (2L, 2L, "b")).toDF("data", "partition_1", "partition_2"),
      partitionBy = Some(Seq("partition_1", "partition_2")))
    val afterFirst = java.time.Instant.now().plusMillis(5)
    Thread.sleep(20)
    // append-style second write: overwrite with union to keep it simple
    TransactionWriter.overwrite(log,
      Seq((1L, 1L, "a"), (2L, 2L, "b"), (3L, 3L, "c")).toDF("data", "partition_1", "partition_2"),
      partitionBy = Some(Seq("partition_1", "partition_2")))
    val all = Levi.updatedPartitions(log.snapshot)
    assert(all.toSet == Set(
      Map("partition_1" -> "1", "partition_2" -> "a"),
      Map("partition_1" -> "2", "partition_2" -> "b"),
      Map("partition_1" -> "3", "partition_2" -> "c")))
    // all active files were rewritten by the overwrite, so the window
    // starting after the first write still sees all three partitions
    val windowed = Levi.updatedPartitions(log.snapshot, startTime = Some(afterFirst))
    assert(windowed.toSet == all.toSet)
    // a window ending before the first write sees nothing
    val none = Levi.updatedPartitions(log.snapshot,
      endTime = Some(java.time.Instant.ofEpochMilli(1000L)))
    assert(none.isEmpty)
  }

  test("writer roundtrip: partitioned table with null partition values") {
    val log = writeTable(
      Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
        .toDF("n", "p"),
      partitionBy = Seq("p"))
    val snap = log.snapshot
    assert(snap.metadata.partitionColumns == Seq("p"))
    assertSameRows(snap.read(),
      Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b")).toDF("n", "p"))
    // stats survive the roundtrip
    val flat = snap.addsFlat.select("num_records").collect().map(_.getLong(0)).sum
    assert(flat == 3L)
  }

  test("writer roundtrip: overwrite bumps version and removes old files") {
    val log = writeTable(Seq((1L, "a")).toDF("n", "s"))
    assert(log.snapshot.version == 0L)
    TransactionWriter.overwrite(log, Seq((2L, "b"), (3L, "c")).toDF("n", "s"))
    val snap = log.snapshot
    assert(snap.version == 1L)
    assertSameRows(snap.read(), Seq((2L, "b"), (3L, "c")).toDF("n", "s"))
    // time travel back to v0
    assertSameRows(log.snapshotAt(0).read(), Seq((1L, "a")).toDF("n", "s"))
  }

  test("normalize fast path equals the URI->Path route on every family") {
    def slow(s: String): String =
      try new org.apache.hadoop.fs.Path(new java.net.URI(s)).toString
      catch { case _: Exception => s }
    val cases = Seq(
      // fast-path family: no/empty authority, plain unreserved path
      "file:/tmp/t/part-00001.parquet",
      "file:///tmp/t/part-00001.parquet",
      "s3a:/b/key/date=2024-01-01/part+x.parquet",
      "file:/a/b.c/d_e-f",
      // general-route family: the fast path must decline these
      "hdfs://nn:8020/a/b",                 // real authority
      "s3a://bucket/key/part=1/x.parquet",  // real authority
      "file:/tmp/t/a%20b.parquet",          // percent-escape (decodes)
      "file:/tmp/t/\u00fcn\u00efcode.parquet", // non-ASCII
      "file:/tmp/t/",                       // trailing slash
      "file:/tmp//t/x",                     // empty segment
      "file:/tmp/t/./x",                    // dot segment
      "file:/tmp/t/../x",                   // dotdot segment
      "file:////tmp/x",                     // 4 slashes
      "relative/path.parquet",              // no scheme
      "not a uri at all",                   // URI parse failure
      "",                                   // empty
      "9bad:/scheme/x")                     // scheme can't start digit
    cases.foreach { s =>
      assert(Mutations.normalize(s) == slow(s),
        s"normalize('$s') diverged from the URI->Path route")
    }
  }

  test("pathCandidates fast path equals the qualified-Path route") {
    val log = writeTable(Seq((1L, "a")).toDF("n", "s"))
    val snap = log.snapshot
    def slowCands(rel: String): Seq[String] = {
      val q = log.fs.makeQualified(new org.apache.hadoop.fs.Path(
        log.rootPath, DeltaLog.decodePath(rel)))
      val forms = Seq(q.toString, q.toUri.toString)
      (forms ++ forms.map(_.replaceFirst(
        "^([a-zA-Z][a-zA-Z0-9+.-]*):/(?!/)", "$1:///"))).distinct
    }
    val rels = Seq(
      "part-00001-abc.snappy.parquet",            // plain (fast path)
      "p=1/part-00001.parquet",                   // partition dir (fast)
      "date=2024-01-01/part+x.parquet",           // '=' and '+' (fast)
      "p=a%20b/part-1.parquet",                   // url-escaped (slow)
      "p=__HIVE_DEFAULT_PARTITION__/x.parquet",   // underscores (fast)
      "p=%C3%BC/part-1.parquet")                  // unicode escape (slow)
    rels.foreach { rel =>
      val f = AddFile(rel, Map.empty, 1L, 0L)
      assert(snap.pathCandidates(f) == slowCands(rel),
        s"pathCandidates('$rel') diverged from the general route")
    }
  }
}
