package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Identity columns: generation on the start+k·step lattice beyond the
  * high-water mark, same-commit hwm advance, explicit-insert gating,
  * negative steps, rewrite passthrough, and protocol versioning. */
class IdentityColumnsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-idc").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("create with identity: generation, lattice, hwm advance, uniqueness") {
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq("a", "b", "c").toDF("s").repartition(2),
      StructType(Seq(
        IdentityColumns.field("id", start = 100L, step = 10L),
        StructField("s", StringType))))
    assert(log.snapshot.protocol.minWriterVersion == 6)
    val ids0 = log.snapshot.read().select("id").as[Long].collect().toSeq
    assert(ids0.size == 3 && ids0.distinct.size == 3)
    // lattice: every value is start + k*step, beyond (or at) start
    assert(ids0.forall(v => v >= 100L && (v - 100L) % 10L == 0L), ids0.toString)
    val hwm0 = IdentityColumns.of(log.snapshot.metadata.schema)
      .head.highWaterMark.get
    assert(hwm0 == ids0.max, "hwm must advance to the max written value")

    // second append allocates strictly beyond the recorded hwm
    TransactionWriter.append(log, Seq("d", "e").toDF("s").coalesce(1))
    val ids1 = log.snapshot.read().select("id").as[Long].collect().toSeq
    assert(ids1.size == 5 && ids1.distinct.size == 5)
    assert(ids1.filterNot(ids0.contains).forall(_ > hwm0))
    assert(ids1.forall(v => (v - 100L) % 10L == 0L))
  }

  test("explicit insert refused unless allowed; allowed values move hwm") {
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq("a").toDF("s"),
      StructType(Seq(
        IdentityColumns.field("id", allowExplicitInsert = true),
        StructField("s", StringType))))
    // allowed: explicit values pass through and the hwm tracks them
    TransactionWriter.append(log,
      Seq((500L, "explicit")).toDF("id", "s").coalesce(1))
    assert(log.snapshot.read().where(col("s") === "explicit")
      .select("id").as[Long].head() == 500L)
    assert(IdentityColumns.of(log.snapshot.metadata.schema)
      .head.highWaterMark.contains(500L))
    // generation continues beyond the explicit value
    TransactionWriter.append(log, Seq("after").toDF("s").coalesce(1))
    assert(log.snapshot.read().where(col("s") === "after")
      .select("id").as[Long].head() > 500L)

    val strict = freshLog()
    TransactionWriter.overwriteWithSchema(strict,
      Seq("a").toDF("s"),
      StructType(Seq(
        IdentityColumns.field("id"),
        StructField("s", StringType))))
    val e = intercept[IllegalArgumentException](
      TransactionWriter.append(strict, Seq((9L, "x")).toDF("id", "s")))
    assert(e.getMessage.contains("identity column id"))
  }

  test("plain overwrite keeps the identity declaration and allocates on") {
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq("a", "b").toDF("s").coalesce(1),
      StructType(Seq(
        IdentityColumns.field("id"),
        StructField("s", StringType))))
    // overwrite WITHOUT a declared schema: the runtime frame carries no
    // identity metadata, but the stored schema must keep the contract
    TransactionWriter.overwrite(log, Seq("x", "y", "z").toDF("s").coalesce(1))
    val spec = IdentityColumns.of(log.snapshot.metadata.schema)
    assert(spec.nonEmpty, "overwrite must not drop the identity declaration")
    val ids = log.snapshot.read().select("id").as[Long].collect().toSeq
    assert(ids.size == 3 && ids.distinct.size == 3)
    assert(ids.forall(_ > 2L), s"post-overwrite ids allocate beyond the hwm: $ids")
    // and the contract still enforces on the next append
    intercept[IllegalArgumentException](
      TransactionWriter.append(log, Seq((1L, "w")).toDF("id", "s")))
  }

  test("OPTIMIZE, declare-on-existing protocol upgrade, MERGE insert, partition guard") {
    // layout maintenance must work on identity tables (re-emitting
    // existing rows is not an explicit insert)
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq("a", "b", "c", "d").toDF("s").repartition(2),
      StructType(Seq(
        IdentityColumns.field("id"),
        StructField("s", StringType))))
    val before = log.snapshot.read()
      .select("id", "s").as[(Long, String)].collect().toSet
    Maintenance.compact(log)
    assert(log.snapshot.read().select("id", "s")
      .as[(Long, String)].collect().toSet == before)
    Maintenance.zorder(log, Seq("id"))
    assert(log.snapshot.read().select("id", "s")
      .as[(Long, String)].collect().toSet == before)

    // MERGE insert generates omitted identity values beyond the hwm
    val hwm0 = IdentityColumns.of(log.snapshot.metadata.schema)
      .head.highWaterMark.get
    Merge.into(log, Seq("merged").toDF("sv"), col("t.s") === col("s.sv"))
      .whenNotMatchedInsert(Map("s" -> col("s.sv")))
      .execute()
    val mergedId = log.snapshot.read().where(col("s") === "merged")
      .select("id").as[Long].head()
    assert(mergedId > hwm0, s"merge-inserted id beyond hwm: $mergedId")
    // explicit identity value in a merge insert refuses
    val e = intercept[IllegalArgumentException] {
      Merge.into(log, Seq((99L, "x")).toDF("sid", "sv"),
          col("t.s") === col("s.sv"))
        .whenNotMatchedInsert(Map("id" -> col("s.sid"), "s" -> col("s.sv")))
        .execute()
    }
    assert(e.getMessage.contains("identity column id"))

    // declaring identity on an EXISTING plain table upgrades the protocol
    val log2 = freshLog()
    TransactionWriter.overwrite(log2, Seq("x").toDF("s"))
    assert(log2.snapshot.protocol.minWriterVersion == 2)
    TransactionWriter.overwriteWithSchema(log2, Seq("y").toDF("s"),
      StructType(Seq(
        IdentityColumns.field("id"),
        StructField("s", StringType))))
    assert(log2.snapshot.protocol.minWriterVersion == 6,
      s"identity declaration must upgrade the writer: ${log2.snapshot.protocol}")

    // identity partition column refuses (hwm could never advance)
    val log3 = freshLog()
    val e3 = intercept[IllegalArgumentException] {
      TransactionWriter.overwriteWithSchema(log3, Seq("z").toDF("s"),
        StructType(Seq(
          IdentityColumns.field("id"),
          StructField("s", StringType))),
        partitionBy = Some(Seq("id")))
    }
    assert(e3.getMessage.contains("partition column"))
  }

  test("negative step descends; targeted rewrite keeps existing ids") {
    val log = freshLog()
    TransactionWriter.overwriteWithSchema(log,
      Seq("a", "b").toDF("s").coalesce(1),
      StructType(Seq(
        IdentityColumns.field("id", start = 0L, step = -5L),
        StructField("s", StringType))))
    val ids0 = log.snapshot.read().select("id").as[Long].collect().toSeq
    assert(ids0.toSet == Set(0L, -5L), ids0.toString)
    assert(IdentityColumns.of(log.snapshot.metadata.schema)
      .head.highWaterMark.contains(-5L))
    TransactionWriter.append(log, Seq("c").toDF("s").coalesce(1))
    assert(log.snapshot.read().select("id").as[Long].collect().min == -10L)

    // a DELETE (targeted rewrite) re-emits surviving rows unchanged
    Mutations.delete(log, col("s") === "a")
    val after = log.snapshot.read()
      .select("id", "s").as[(Long, String)].collect().toSet
    assert(after == Set((-5L, "b"), (-10L, "c")), after.toString)
  }
}
