package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** General MERGE INTO semantics + targeted-rewrite file behavior. */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  def freshLog(rows: Seq[(Long, String, Long)]): DeltaLog = {
    val path = Files.createTempDirectory("graft-merge").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log, rows.toDF("id", "attr", "v"))
    log
  }

  test("upsert: matched update + not-matched insert") {
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val source = Seq((2L, "B2"), (9L, "NEW")).toDF("id", "attr")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.attr"), "v" -> (col("t.v") + 1)))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "attr" -> col("s.attr"),
        "v" -> lit(0L)))
      .execute()
    assertSameRows(log.snapshot.read(),
      Seq((1L, "a", 10L), (2L, "B2", 21L), (3L, "c", 30L), (9L, "NEW", 0L))
        .toDF("id", "attr", "v"))
  }

  test("matched delete with condition; delete wins over update") {
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val source = Seq((1L), (2L)).toDF("id")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedDelete(condition = Some(col("t.v") < 15L))
      .whenMatchedUpdate(Map("attr" -> lit("touched")))
      .execute()
    // id=1 (v=10) deleted; id=2 (v=20) fails delete cond → updated
    assertSameRows(log.snapshot.read(),
      Seq((2L, "touched", 20L), (3L, "c", 30L)).toDF("id", "attr", "v"))
  }

  test("insert-only merge appends without touching existing files") {
    val log = freshLog(Seq((1L, "a", 10L)))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    val source = Seq((5L, "e", 50L), (1L, "dup", 99L)).toDF("id", "attr", "v")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "attr" -> col("s.attr"),
        "v" -> col("s.v")))
      .execute()
    val snap = log.snapshot
    assert(before.subsetOf(snap.activeFiles.map(_.path).toSet),
      "insert-only merge must keep existing add paths")
    assertSameRows(snap.read(),
      Seq((1L, "a", 10L), (5L, "e", 50L)).toDF("id", "attr", "v"))
  }

  test("untouched files keep their add paths across a targeted merge") {
    val path = Files.createTempDirectory("graft-merge").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // 4 files; the merge touches ids only in one of them
    TransactionWriter.overwrite(log,
      (1L to 40L).map(i => (i, s"a$i", i)).toDF("id", "attr", "v")
        .repartition(4, col("id")))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    assert(before.size == 4)
    val source = Seq((7L, "X")).toDF("id", "nattr")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.nattr")))
      .execute()
    val after = log.snapshot.activeFiles.map(_.path).toSet
    assert((before intersect after).size == 3,
      s"expected 3 untouched files preserved, before=$before after=$after")
    assert(log.snapshot.read().where(col("id") === 7L)
      .select("attr").collect()(0).getString(0) == "X")
  }

  test("merge applies matched clauses on a table carrying deletion vectors") {
    // the DV anti-join in the scan breaks input_file_name() attribution;
    // the __file lineage column must keep touched-file detection working
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Mutations.deleteWithDv(log, col("id") === 3L)
    assert(log.snapshot.activeFiles.exists(_.deletionVector.exists(_.cardinality > 0)))
    val source = Seq((1L, "upd"), (2L, "gone")).toDF("sid", "sattr")
    Merge.into(log, source, col("t.id") === col("s.sid"))
      .whenMatchedDelete(condition = Some(col("s.sattr") === "gone"))
      .whenMatchedUpdate(Map("attr" -> col("s.sattr")))
      .execute()
    assertSameRows(log.snapshot.read(),
      Seq((1L, "upd", 10L)).toDF("id", "attr", "v"))
  }

  test("DV-backed merge: matched clauses mark bitmaps, no data-file rewrite") {
    val path = Files.createTempDirectory("graft-merge").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      (0L until 1000L).map(i => (i, s"a$i", i)).toDF("id", "attr", "v").coalesce(1),
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    // 3-row matched delete on the single large file: DV path must mark
    // the rows in a bitmap without rewriting the data file
    Merge.into(log, Seq(3L, 500L, 999L).toDF("sid"),
        col("t.id") === col("s.sid"))
      .whenMatchedDelete()
      .execute()
    val snap = log.snapshot
    assert(snap.activeFiles.map(_.path).toSet == before,
      "matched delete must not rewrite or add data files")
    assert(snap.activeFiles.exists(_.deletionVector.exists(_.cardinality == 3L)))
    assert(snap.read().count() == 997L)

    // matched update: affected row DV-marked, updated version in a NEW
    // file; the original file's path survives
    Merge.into(log, Seq((10L, "upd")).toDF("sid", "sattr"),
        col("t.id") === col("s.sid"))
      .whenMatchedUpdate(Map("attr" -> col("s.sattr")))
      .execute()
    val snap2 = log.snapshot
    assert(before.subsetOf(snap2.activeFiles.map(_.path).toSet),
      "matched update must keep the original file; only new files may be added")
    assert(snap2.read().where(col("id") === 10L)
      .select("attr").as[String].head() == "upd")
    assert(snap2.read().count() == 997L)

    // a broad matched delete exceeds the fraction cap and falls back to
    // the rewrite path — correct result, no driver bitmap
    Merge.into(log, (0L until 1000L).map(Seq(_)).map(_.head).toDF("sid"),
        col("t.id") === col("s.sid"))
      .whenMatchedDelete(condition = Some(col("t.id") >= 100L))
      .execute()
    assert(log.snapshot.read().select("id").as[Long].collect().sorted.toSeq ==
      (0L until 100L).filterNot(_ == 3L))
  }

  test("NULL clause conditions behave as false, never as delete/update") {
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L)))
    // source row for id=1 carries a NULL flag → delete condition is NULL
    val source = Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, java.lang.Long.valueOf(1L))).toDF("id", "flag")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedDelete(condition = Some(col("s.flag") > 0L))
      .execute()
    // id=2 (flag=1) deleted; id=1 (flag=NULL) must SURVIVE
    assertSameRows(log.snapshot.read(),
      Seq((1L, "a", 10L)).toDF("id", "attr", "v"))
  }

  test("multiple source rows matching one target row is an error") {
    val log = freshLog(Seq((1L, "a", 10L)))
    val source = Seq((1L, "x"), (1L, "y")).toDF("id", "attr")
    val e = intercept[IllegalArgumentException] {
      Merge.into(log, source, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("attr" -> col("s.attr")))
        .execute()
    }
    assert(e.getMessage.contains("multiple source rows"))
  }

  test("not-matched-by-source clauses sync the target to the source") {
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val source = Seq((1L, "A")).toDF("id", "nattr")
    // full sync: matched rows update, unmatched-by-source rows with
    // v < 25 are deleted, the rest are flagged stale
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.nattr")))
      .whenNotMatchedBySourceDelete(condition = Some(col("t.v") < 25L))
      .whenNotMatchedBySourceUpdate(Map("attr" -> lit("stale")))
      .execute()
    assertSameRows(log.snapshot.read(),
      Seq((1L, "A", 10L), (3L, "stale", 30L)).toDF("id", "attr", "v"))
  }

  test("no-op merge commits nothing") {
    val log = freshLog(Seq((1L, "a", 10L)))
    val v0 = log.latestVersion()
    val source = Seq((99L, "zz")).toDF("id", "attr")
    val v = Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.attr")))
      .execute()
    assert(v == v0)
    assert(log.latestVersion() == v0)
  }

  test("withSchemaEvolution adds source-only columns; old rows read NULL") {
    val log = freshLog(Seq((1L, "a", 10L), (2L, "b", 20L)))
    val source = Seq((2L, "B2", "extra2"), (9L, "NEW", "extra9"))
      .toDF("id", "attr", "note")
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.attr"), "note" -> col("s.note")))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "attr" -> col("s.attr"),
        "v" -> lit(0L), "note" -> col("s.note")))
      .withSchemaEvolution()
      .execute()
    val snap = log.snapshot
    assert(snap.schema.fieldNames.contains("note"))
    assert(snap.schema("note").nullable)
    val out = snap.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)))).toSeq
    // untouched row 1: note NULL (its file was not rewritten for note)
    assert(out == Seq(
      (1L, "a", 10L, None),
      (2L, "B2", 20L, Some("extra2")),
      (9L, "NEW", 0L, Some("extra9"))), out.toString)
  }

  test("withSchemaEvolution batches ALL new columns into one metadata commit") {
    val log = freshLog(Seq((1L, "a", 10L)))
    val v0 = log.latestVersion()
    val source = Seq((1L, "A", "x", 5L), (2L, "B", "y", 6L))
      .toDF("id", "attr", "note", "score")
    // two new columns (note, score) -> exactly ONE schema commit plus
    // the merge commit (round-6 advice: was one commit per column)
    Merge.into(log, source, col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("attr" -> col("s.attr"),
        "note" -> col("s.note"), "score" -> col("s.score")))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "attr" -> col("s.attr"),
        "v" -> lit(0L), "note" -> col("s.note"), "score" -> col("s.score")))
      .withSchemaEvolution()
      .execute()
    assert(log.latestVersion() == v0 + 2,
      s"expected one ADD COLUMNS + one MERGE commit after v$v0, " +
        s"got latest ${log.latestVersion()}")
    val snap = log.snapshot
    assert(snap.schema.fieldNames.toSeq.takeRight(2) == Seq("note", "score"))
    val out = snap.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)),
        Option(r.get(4)))).toSeq
    assert(out == Seq(
      (1L, "A", Some("x"), Some(5L)),
      (2L, "B", Some("y"), Some(6L))), out.toString)
  }

  test("without schema evolution unknown columns still error") {
    val log = freshLog(Seq((1L, "a", 10L)))
    val source = Seq((1L, "x")).toDF("id", "note")
    intercept[IllegalArgumentException] {
      Merge.into(log, source, col("t.id") === col("s.id"))
        .whenMatchedUpdate(Map("note" -> col("s.note")))
        .execute()
    }
  }
}
