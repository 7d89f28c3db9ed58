package graft.delta

import java.nio.file.Files
import graft.SparkTestBase

/** The targeted-rewrite property: a mutation only rewrites files that
  * contain affected rows — clean files keep their exact add paths
  * across the commit. */
class MutationsTargetedSpec extends SparkTestBase {
  import spark.implicits._

  test("kill_duplicates leaves clean files untouched") {
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // file A: clean rows; file B: contains the dup group
    TransactionWriter.overwrite(log,
      Seq((1L, "x"), (2L, "y")).toDF("k", "v").coalesce(1))
    Maintenance.append(log,
      Seq((10L, "dup"), (11L, "dup"), (12L, "z")).toDF("k", "v").coalesce(1))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    assert(before.size == 2)

    val v = Mutations.killDuplicates(log, Seq("v"))
    val snap = log.snapshotAt(v)
    val after = snap.activeFiles.map(_.path).toSet
    // the clean v0 file must still be in the active set, path-identical
    val kept = before.intersect(after)
    assert(kept.size == 1, s"expected exactly one untouched file, before=$before after=$after")
    assertSameRows(snap.read(),
      Seq((1L, "x"), (2L, "y"), (12L, "z")).toDF("k", "v"))
  }

  test("no-op mutation commits nothing") {
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log, Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    val v0 = log.latestVersion()
    val v = Mutations.killDuplicates(log, Seq("v"))
    assert(v == v0)
    assert(log.latestVersion() == v0)
  }

  test("drop_duplicates_pkey targeted matches full-table semantics") {
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "A", "A"), (2L, "A", "A"), (5L, "C", "X")).toDF("col1", "col2", "col3").coalesce(1))
    Maintenance.append(log,
      Seq((3L, "B", "A"), (4L, "B", "A")).toDF("col1", "col2", "col3").coalesce(1))
    Mutations.dropDuplicatesPkey(log, "col1", Seq("col2", "col3"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "A", "A"), (3L, "B", "A"), (5L, "C", "X")).toDF("col1", "col2", "col3"))
  }

  test("scd2 targeted leaves unchanged-key files untouched") {
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]))
        .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver").coalesce(1))
    Maintenance.append(log,
      Seq((2L, "B", true, 1L, null.asInstanceOf[java.lang.Long]))
        .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver").coalesce(1))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    val updates = Seq((2L, "Z", 2L)).toDF("pkey", "attr", "effective_ver")
    Mutations.type2ScdUpsert(log, updates, "pkey", Seq("attr"),
      effectiveTimeColName = "effective_ver", endTimeColName = "end_ver")
    val after = log.snapshot.activeFiles.map(_.path).toSet
    // pkey=1's file untouched; pkey=2's file rewritten (closed) + insert
    assert(before.intersect(after).size == 1)
    assertSameRows(log.snapshot.read(), Seq(
      (1L, "A", true, 1L, null.asInstanceOf[java.lang.Long]),
      (2L, "B", false, 1L, java.lang.Long.valueOf(2L)),
      (2L, "Z", true, 2L, null.asInstanceOf[java.lang.Long]))
      .toDF("pkey", "attr", "is_current", "effective_ver", "end_ver"))
  }
}
