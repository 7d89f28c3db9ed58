package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** End-to-end smoke of the user-facing handle: one table driven through
  * write → analytics → merge → maintenance → history. */
class GraftTableSpec extends SparkTestBase {
  import spark.implicits._

  test("full lifecycle through the facade") {
    val t = GraftTable(spark,
      Files.createTempDirectory("graft-table").resolve("t").toString)
    t.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)).toDF("id", "k", "v"))
    assert(t.version == 0L)
    assert(t.read().count() == 3L)

    // analytics
    assert(t.skippedStats(Seq(("v", ">=", 25)))("num_files") >= 1L)
    assert(t.fileSizes()("num_files_<1mb") >= 1L)

    // merge
    t.merge(Seq((2L, 99L)).toDF("id", "nv"), col("t.id") === col("s.id"))
      .whenMatchedUpdate(Map("v" -> col("s.nv")))
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "k" -> lit("x"), "v" -> col("s.nv")))
      .execute()
    assert(t.read().where(col("id") === 2L).select("v").collect()(0).getLong(0) == 99L)

    // dedup on k keeping smallest id
    t.dropDuplicatesPkey("id", Seq("k"))
    assert(t.read().count() == 2L)

    // time travel + restore
    assertSameRows(t.readAt(0),
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "b", 30L)).toDF("id", "k", "v"))
    t.restore(1L)
    assert(t.read().count() == 3L)

    // maintenance + history
    t.compact()
    t.checkpoint()
    val h = t.history().collect()
    assert(h.length == t.version + 1)
    assert(h.head.getLong(0) == t.version) // newest first
    val ops = h.map(_.getString(2)).toSet
    assert(ops.contains("RESTORE") && ops.contains("OPTIMIZE"))
    val vacuumed = t.vacuum(retentionMs = 0L, allowZeroRetention = true)
    assert(vacuumed.nonEmpty)
    assert(t.read().count() == 3L)
  }
}
