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

  test("delete rewrites only matching files; NULL-predicate rows survive") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    // file A: ids 1-2 (untouched); file B: ids 10-12 incl. a NULL v
    TransactionWriter.overwrite(log,
      Seq((1L, "x"), (2L, "y")).toDF("k", "v").coalesce(1))
    Maintenance.append(log,
      Seq((10L, "kill"), (11L, null), (12L, "keep")).toDF("k", "v").coalesce(1))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    val v = Mutations.delete(log, col("v") === "kill")
    val snap = log.snapshotAt(v)
    // untouched file path-identical; NULL row kept (SQL DELETE semantics)
    assert(before.intersect(snap.activeFiles.map(_.path).toSet).size == 1)
    assertSameRows(snap.read(),
      Seq((1L, "x"), (2L, "y"), (11L, null), (12L, "keep")).toDF("k", "v"))
    // no-match delete commits nothing
    assert(Mutations.delete(log, col("v") === "absent") == v)
  }

  test("update sets columns on matching rows only, targeted") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-targeted").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "amt").coalesce(1))
    Maintenance.append(log,
      Seq((3L, "c", 30L), (4L, "b", 40L)).toDF("k", "v", "amt").coalesce(1))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    val v = Mutations.update(log, col("v") === "b",
      Map("amt" -> (col("amt") * 10), "v" -> lit("B")))
    val snap = log.snapshotAt(v)
    assertSameRows(snap.read(),
      Seq((1L, "a", 10L), (2L, "B", 200L), (3L, "c", 30L), (4L, "B", 400L))
        .toDF("k", "v", "amt"))
    // both files contained a 'b' row here — but a SET on an unknown
    // column refuses before any scan
    val e = intercept[IllegalArgumentException](
      Mutations.update(log, col("v") === "B", Map("nope" -> lit(1))))
    assert(e.getMessage.contains("not in table schema"))
    // targeted: an update matching only file B leaves file A alone
    val v2 = Mutations.update(log, col("k") === 4L, Map("amt" -> lit(0L)))
    val after2 = log.snapshotAt(v2).activeFiles.map(_.path).toSet
    assert(log.snapshotAt(v2).read().where(col("k") === 4L)
      .select("amt").as[Long].head() == 0L)
    assert(after2.intersect(log.snapshotAt(v).activeFiles.map(_.path).toSet).nonEmpty)
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

  test("replaceWhere: one-commit scoped swap; straddling remainder survives") {
    val path = Files.createTempDirectory("graft-rw").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    import org.apache.spark.sql.functions._
    // one file straddles the scope (g='a' and g='b'), one is clean
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "g").coalesce(1))
    Maintenance.append(log, Seq((4L, "c"), (5L, "c")).toDF("k", "g").coalesce(1))
    val before = log.snapshot.activeFiles.map(_.path).toSet
    val v0 = log.latestVersion()
    val v = Mutations.replaceWhere(log,
      Seq((10L, "a")).toDF("k", "g"), col("g") === "a")
    assert(v == v0 + 1, "replaceWhere must be ONE commit")
    val snap = log.snapshotAt(v)
    // clean file untouched; straddling file's 'b' remainder survives
    assert(before.intersect(snap.activeFiles.map(_.path).toSet).size == 1)
    assertSameRows(snap.read(),
      Seq((3L, "b"), (4L, "c"), (5L, "c"), (10L, "a")).toDF("k", "g"))
  }

  test("replaceWhere refuses incoming rows outside the predicate scope") {
    val path = Files.createTempDirectory("graft-rw2").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    import org.apache.spark.sql.functions._
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "g"))
    val err = intercept[IllegalArgumentException] {
      Mutations.replaceWhere(log,
        Seq((2L, "b")).toDF("k", "g"), col("g") === "a")
    }
    assert(err.getMessage.contains("satisfy the predicate"))
  }

  test("replaceWhere emits delete + insert CDF changes in the same commit") {
    val path = Files.createTempDirectory("graft-rw3").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    import org.apache.spark.sql.functions._
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b")).toDF("k", "g"),
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val v = Mutations.replaceWhere(log,
      Seq((10L, "a")).toDF("k", "g"), col("g") === "a")
    val changes = ChangeDataFeed.tableChanges(log, v, Some(v))
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((1L, "delete"), (10L, "insert")),
      s"got $changes")
  }

  test("replaceWhere via the writer option on the graftdelta source") {
    val path = Files.createTempDirectory("graft-rw4").resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "g")
      .write.format("graftdelta").mode("overwrite").save(path)
    Seq((10L, "a")).toDF("k", "g")
      .write.format("graftdelta").mode("overwrite")
      .option("replaceWhere", "g = 'a'").save(path)
    assertSameRows(
      spark.read.format("graftdelta").load(path),
      Seq((2L, "b"), (10L, "a")).toDF("k", "g"))
  }

  test("dynamic partition overwrite replaces only incoming partitions") {
    val path = Files.createTempDirectory("graft-dyn").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    import org.apache.spark.sql.functions._
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "g"),
      partitionBy = Some(Seq("g")))
    val before = log.snapshot.planFiles()
      .filter(_.partitionValues.get("g").exists(v => v == "b" || v == "c"))
      .map(_.path).toSet
    val v = Mutations.overwriteDynamic(log,
      Seq((10L, "a"), (11L, "d")).toDF("k", "g"))
    val snap = log.snapshotAt(v)
    // untouched partitions keep their exact files
    assert(before.subsetOf(snap.activeFiles.map(_.path).toSet))
    assertSameRows(snap.read(),
      Seq((2L, "b"), (3L, "c"), (10L, "a"), (11L, "d")).toDF("k", "g"))
  }

  test("dynamic overwrite matches NULL partitions null-safely") {
    val path = Files.createTempDirectory("graft-dyn2").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("k", "g"),
      partitionBy = Some(Seq("g")))
    Mutations.overwriteDynamic(log,
      Seq((20L, null.asInstanceOf[String])).toDF("k", "g"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, "a"), (20L, null.asInstanceOf[String])).toDF("k", "g"))
  }

  test("dynamic overwrite refuses unpartitioned tables; option drives it") {
    val path = Files.createTempDirectory("graft-dyn3").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log, Seq((1L, "a")).toDF("k", "g"))
    val err = intercept[IllegalArgumentException] {
      Mutations.overwriteDynamic(log, Seq((2L, "b")).toDF("k", "g"))
    }
    assert(err.getMessage.contains("partitioned"))
    // writer-option path on a partitioned table
    val p2 = Files.createTempDirectory("graft-dyn4").resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "g")
      .write.format("graftdelta").partitionBy("g").mode("overwrite").save(p2)
    Seq((10L, "a")).toDF("k", "g")
      .write.format("graftdelta").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(p2)
    assertSameRows(
      spark.read.format("graftdelta").load(p2),
      Seq((2L, "b"), (10L, "a")).toDF("k", "g"))
  }

  test("dynamic overwrite works on a COLUMN-MAPPED partitioned table") {
    val path = Files.createTempDirectory("graft-dyn-cm").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    import org.apache.spark.sql.functions._
    TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b")).toDF("k", "g"),
      partitionBy = Some(Seq("g")),
      configuration = Map("delta.columnMapping.mode" -> "name"))
    val fresh = DeltaLog.forPath(spark, path)
    val bFile = fresh.snapshot.planFiles()
      .filter(_.partitionValues.exists(_._2 == "b")).map(_.path)
    Mutations.overwriteDynamic(fresh, Seq((10L, "a")).toDF("k", "g"))
    val after = DeltaLog.forPath(spark, path).snapshot
    // partition a swapped, b untouched — under PHYSICAL partition names
    assert(bFile.toSet.subsetOf(after.activeFiles.map(_.path).toSet),
      "untouched mapped partition must keep its file")
    assertSameRows(after.read(),
      Seq((2L, "b"), (10L, "a")).toDF("k", "g"))
  }

  test("session conf partitionOverwriteMode=dynamic drives the writer") {
    val path = Files.createTempDirectory("graft-dyn-conf").resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "g")
      .write.format("graftdelta").partitionBy("g").mode("overwrite").save(path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((10L, "a")).toDF("k", "g")
        .write.format("graftdelta").mode("overwrite").save(path)
      assertSameRows(
        spark.read.format("graftdelta").load(path),
        Seq((2L, "b"), (10L, "a")).toDF("k", "g"))
      // unpartitioned table under the same conf: plain overwrite
      val p2 = Files.createTempDirectory("graft-dyn-conf2").resolve("t").toString
      Seq((1L, "a")).toDF("k", "g")
        .write.format("graftdelta").mode("overwrite").save(p2)
      Seq((9L, "z")).toDF("k", "g")
        .write.format("graftdelta").mode("overwrite").save(p2)
      assertSameRows(spark.read.format("graftdelta").load(p2),
        Seq((9L, "z")).toDF("k", "g"))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }
}
