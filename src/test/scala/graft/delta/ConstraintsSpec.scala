package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** CHECK constraints and NOT NULL invariants: enforcement must ride the
  * write job (no silently-committed violating rows), ALTER ADD must
  * validate existing data, and the protocol must record the feature. */
class ConstraintsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshLog(): DeltaLog = {
    val path = Files.createTempDirectory("graft-constraints").resolve("t").toString
    DeltaLog.forPath(spark, path)
  }

  test("add constraint, enforce on append, drop restores writability") {
    val log = freshLog()
    // Option[Long] declares amt NULLABLE — the NULL-satisfies-CHECK
    // case below must not trip the NOT NULL invariant instead
    TransactionWriter.overwrite(log,
      Seq((1L, Option(10L)), (2L, Option(20L))).toDF("k", "amt"))
    val v = Constraints.addCheckConstraint(log, "amt_pos", "amt > 0")
    assert(log.snapshot.metadata.configuration
      .get("delta.constraints.amt_pos").contains("amt > 0"))
    assert(log.snapshot.protocol.minWriterVersion >= 3)
    assert(v == log.snapshot.version)

    // clean append passes
    TransactionWriter.append(log, Seq((3L, 30L)).toDF("k", "amt"))
    assertSameRows(log.snapshot.read(),
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "amt"))

    // violating append aborts BEFORE commit; table state unchanged
    val before = log.snapshot.version
    val e = intercept[Exception] {
      TransactionWriter.append(log, Seq((4L, -5L)).toDF("k", "amt"))
    }
    assert(e.getMessage != null)
    assert(log.latestVersion() == before, "violating append must not commit")
    assertSameRows(log.snapshot.read(),
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "amt"))

    // NULL satisfies a CHECK (SQL semantics)
    TransactionWriter.append(log,
      Seq((5L, Option.empty[Long])).toDF("k", "amt"))
    assert(log.snapshot.read().count() == 4)

    Constraints.dropCheckConstraint(log, "amt_pos")
    TransactionWriter.append(log, Seq((6L, -1L)).toDF("k", "amt"))
    assert(log.snapshot.read().where(col("amt") === -1L).count() == 1)
  }

  test("add constraint refuses when existing rows violate it") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, -10L)).toDF("k", "amt"))
    val e = intercept[IllegalArgumentException] {
      Constraints.addCheckConstraint(log, "amt_pos", "amt > 0")
    }
    assert(e.getMessage.contains("existing rows violate"))
    // nothing committed
    assert(log.snapshot.metadata.configuration
      .keys.forall(!_.startsWith("delta.constraints.")))
  }

  test("constraint enforcement applies to rewrites and overwrites") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, 10L), (2L, 20L)).toDF("k", "amt"))
    Constraints.addCheckConstraint(log, "amt_max", "amt < 100")
    // UPDATE that would break the constraint aborts
    val before = log.snapshot.version
    intercept[Exception] {
      Mutations.update(log, col("k") === 1L, Map("amt" -> lit(500L)))
    }
    assert(log.latestVersion() == before)
    // UPDATE within bounds passes
    Mutations.update(log, col("k") === 1L, Map("amt" -> lit(50L)))
    assertSameRows(log.snapshot.read(), Seq((1L, 50L), (2L, 20L)).toDF("k", "amt"))
    // overwrite that keeps the config is checked too
    intercept[Exception] {
      TransactionWriter.overwrite(log, Seq((9L, 900L)).toDF("k", "amt"))
    }
    assert(log.latestVersion() == log.snapshot.version)
  }

  test("duplicate name and bad name are refused eagerly") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, 1L)).toDF("k", "amt"))
    Constraints.addCheckConstraint(log, "c1", "amt > 0")
    intercept[IllegalArgumentException] {
      Constraints.addCheckConstraint(log, "c1", "amt > 1")
    }
    intercept[IllegalArgumentException] {
      Constraints.addCheckConstraint(log, "bad name!", "amt > 0")
    }
    // drop of a missing constraint is a no-op returning current version
    val v = log.snapshot.version
    assert(Constraints.dropCheckConstraint(log, "absent") == v)
  }

  test("v7 tables record the checkConstraints writer feature") {
    val log = freshLog()
    TransactionWriter.overwrite(log, Seq((1L, 1L)).toDF("k", "amt"))
    Maintenance.enableInCommitTimestamps(log) // upgrades to writer v7
    Constraints.addCheckConstraint(log, "amt_pos", "amt > 0")
    val p = log.snapshot.protocol
    assert(p.minWriterVersion == 7)
    assert(p.writerFeatures.contains("checkConstraints"))
    // still enforced through the v7 gate
    intercept[Exception] {
      TransactionWriter.append(log, Seq((2L, -1L)).toDF("k", "amt"))
    }
    TransactionWriter.append(log, Seq((2L, 2L)).toDF("k", "amt"))
    assert(log.snapshot.read().count() == 2)
  }

  test("NOT NULL declared schema is enforced on append") {
    val log = freshLog()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val strict = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(1L, "a")), schema)
    TransactionWriter.overwrite(log, strict)
    // the committed schema keeps nullable=false on k
    assert(!log.snapshot.metadata.schema("k").nullable)
    val withNull = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(null, "b")),
      org.apache.spark.sql.types.StructType(schema.map(_.copy(nullable = true))))
    val before = log.snapshot.version
    intercept[Exception] {
      TransactionWriter.append(log, withNull)
    }
    assert(log.latestVersion() == before)
  }
}
