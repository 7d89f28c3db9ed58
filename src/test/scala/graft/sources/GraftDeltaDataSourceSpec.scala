package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.delta.DeltaLog

/** The spark.read/write.format("graftdelta") surface: short-name
  * registration, write modes, time travel, filter/column pushdown
  * through the skipping scan, and partitioned writes. */
class GraftDeltaDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graftdelta_dsv1_").toString

  test("write/read round-trip via short name, append and overwrite modes") {
    val path = tmpTable()
    val df1 = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    df1.write.format("graftdelta").mode("overwrite").save(path)
    val df2 = (11 to 15).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    df2.write.format("graftdelta").mode("append").save(path)

    val back = spark.read.format("graftdelta").load(path)
    assert(back.count() == 15)
    assert(back.agg(sum("id")).collect()(0).getLong(0) == (1 to 15).map(_.toLong).sum)
    // ErrorIfExists refuses on an existing table
    intercept[IllegalStateException] {
      df1.write.format("graftdelta").mode("error").save(path)
    }
    // Ignore is a no-op on an existing table
    df1.write.format("graftdelta").mode("ignore").save(path)
    assert(spark.read.format("graftdelta").load(path).count() == 15)
  }

  test("versionAsOf / timestampAsOf time travel through the reader options") {
    val path = tmpTable()
    Seq((1L, "a")).toDF("id", "s").write.format("graftdelta").mode("overwrite").save(path)
    Seq((2L, "b")).toDF("id", "s").write.format("graftdelta").mode("append").save(path)
    assert(spark.read.format("graftdelta").option("versionAsOf", "0").load(path).count() == 1)
    assert(spark.read.format("graftdelta").option("versionAsOf", "1").load(path).count() == 2)
    val ts = java.time.Instant.now().plusSeconds(60).toString
    assert(spark.read.format("graftdelta").option("timestampAsOf", ts).load(path).count() == 2)
    intercept[IllegalArgumentException] {
      spark.read.format("graftdelta")
        .option("versionAsOf", "0").option("timestampAsOf", ts).load(path).count()
    }
  }

  test("pushed filters drive stats-based file skipping in buildScan") {
    val path = tmpTable()
    // two appends -> two files with disjoint id ranges in their stats
    Seq.tabulate(50)(i => (i.toLong, "lo")).toDF("id", "tag")
      .coalesce(1).write.format("graftdelta").mode("overwrite").save(path)
    Seq.tabulate(50)(i => (100L + i, "hi")).toDF("id", "tag")
      .coalesce(1).write.format("graftdelta").mode("append").save(path)

    val log = DeltaLog.forPath(spark, path)
    assert(log.snapshot.activeFiles.size == 2)
    val rel = GraftDeltaRelation(spark.sqlContext, log.snapshot)
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val scanned = rel.buildScan(Array("id"), Array(GreaterThanOrEqual("id", 100L)))
    // only the hi file survives skipping: 50 rows reach the scan RDD
    assert(scanned.count() == 50)
    // and through the public API the filtered read agrees
    val out = spark.read.format("graftdelta").load(path).where($"id" >= 100L)
    assert(out.count() == 50 && out.agg(min("id")).collect()(0).getLong(0) == 100L)
  }

  test("column pruning reaches the scan") {
    val path = tmpTable()
    Seq((1L, "a", 3.5), (2L, "b", 4.5)).toDF("id", "s", "x")
      .write.format("graftdelta").mode("overwrite").save(path)
    val df = spark.read.format("graftdelta").load(path).select("s")
    assert(df.columns.toSeq == Seq("s"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("readChangesFrom option returns only the appended commit range") {
    val path = tmpTable()
    Seq((1L, "a")).toDF("id", "s").write.format("graftdelta").mode("overwrite").save(path)
    Seq((2L, "b"), (3L, "c")).toDF("id", "s").write.format("graftdelta").mode("append").save(path)
    Seq((4L, "d")).toDF("id", "s").write.format("graftdelta").mode("append").save(path)
    val changes = spark.read.format("graftdelta")
      .option("readChangesFrom", "0").load(path)
    assert(changes.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L))
    val bounded = spark.read.format("graftdelta")
      .option("readChangesFrom", "0").option("readChangesTo", "1").load(path)
    assert(bounded.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("SQL DDL surface: CREATE TABLE ... USING graftdelta") {
    val path = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.format("graftdelta").mode("overwrite").save(path)
    val tbl = "graftdelta_sql_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING graftdelta OPTIONS (path '$path')")
    try {
      assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) == 2)
      assert(spark.sql(s"SELECT s FROM $tbl WHERE id = 2").collect()(0).getString(0) == "b")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("partitioned write via partitionBy lands in the delta log") {
    val path = tmpTable()
    Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")).toDF("id", "s", "part")
      .write.format("graftdelta").partitionBy("part").mode("overwrite").save(path)
    val snap = DeltaLog.forPath(spark, path).snapshot
    assert(snap.metadata.partitionColumns == Seq("part"))
    assert(snap.activeFiles.forall(_.partitionValues.contains("part")))
    val back = spark.read.format("graftdelta").load(path)
    assert(back.where($"part" === "p1").count() == 2)
  }
}
