package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: injected SQL functions + the VectorKernelRule
  * HOF→native rewrite, on a dedicated session built the way a user
  * would (`withExtensions`). */
class ExtensionsSpec extends AnyFunSuite {

  // `getOrCreate` returns any pre-existing default session and silently
  // ignores `withExtensions`, so when the full suite runs we must step
  // around the shared SparkTestBase session (the SparkContext itself is
  // reused) and then restore the previous default for later suites.
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  private def plan(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  test("injected vec_dot / vec_l2norm work in plain SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_l2norm(array(3.0d, 4.0d)) AS n").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  // Non-foldable inputs (VALUES literals would be constant-folded away
  // before the plan string could show the kernel).
  private def mkView(): Unit = {
    spark.range(0, 4)
      .selectExpr(
        "id",
        "array(cast(id as double), cast(id + 1 as double)) AS a",
        "CASE WHEN id = 1 THEN array(cast(id as double)) " + // unequal length
          "WHEN id = 2 THEN array(cast(id as double), cast(null as double)) " +
          "WHEN id = 3 THEN cast(null as array<double>) " +
          "ELSE array(cast(id as double), cast(id + 2 as double)) END AS b")
      .createOrReplaceTempView("ext_vec")
  }

  test("VectorKernelRule rewrites the dot-product HOF to vec_dot") {
    mkView()
    val sql =
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  cast(0 as double), (acc, v) -> acc + v) AS d
        |FROM ext_vec WHERE id = 0""".stripMargin
    assert(plan(sql).contains("vec_dot"))
    assert(spark.sql(sql).collect()(0).getDouble(0) == 2.0) // 0*0 + 1*2
  }

  test("VectorKernelRule rewrites the l2-norm HOF to vec_l2norm") {
    mkView()
    val sql =
      """SELECT sqrt(aggregate(a, cast(0 as double), (acc, x) -> acc + x * x)) AS n
        |FROM ext_vec WHERE id = 3""".stripMargin
    assert(plan(sql).contains("vec_l2norm"))
    assert(spark.sql(sql).collect()(0).getDouble(0) == 5.0) // sqrt(9 + 16)
  }

  test("rewrite preserves HOF null semantics exactly") {
    mkView()
    // id=1 unequal lengths (zip_with pads with null), id=2 null element,
    // id=3 null array — all three must stay null after the rewrite
    val sql =
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  cast(0 as double), (acc, v) -> acc + v) AS d
        |FROM ext_vec WHERE id >= 1""".stripMargin
    assert(plan(sql).contains("vec_dot"))
    val rows = spark.sql(sql).collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(0)))
  }

  test("non-matching folds are left alone") {
    mkView()
    val sql =
      """SELECT aggregate(zip_with(a, b, (x, y) -> x + y),
        |  cast(0 as double), (acc, v) -> acc + v) AS d
        |FROM ext_vec WHERE id = 0""".stripMargin
    assert(!plan(sql).contains("vec_dot"))
    assert(spark.sql(sql).collect()(0).getDouble(0) == 3.0) // (0+0) + (1+2)
  }

  test("GRAFT SQL maintenance commands via the injected parser") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sqlcmd_")
      .resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("n", "s")
      .write.format("graftdelta").mode("overwrite").save(path)
    Seq((3L, "c")).toDF("n", "s")
      .write.format("graftdelta").mode("append").save(path)

    val hist = spark.sql(s"GRAFT HISTORY '$path'").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 0L))
    assert(hist.forall(_.getString(1) == "WRITE"))

    assert(spark.sql(s"GRAFT CHECKPOINT '$path'").collect()(0).getLong(0) == 1L)
    assert(spark.sql(s"GRAFT OPTIMIZE '$path' ZORDER BY (n)").collect()(0).getLong(0) == 2L)
    // non-numeric zorder columns are rejected with a clear error
    val ze = intercept[Exception](spark.sql(s"GRAFT OPTIMIZE '$path' ZORDER BY (s)").collect())
    assert(ze.getMessage.contains("numeric-like"))
    // v3 is the clustering-state domain commit the full zorder pass
    // persists (bounds + watermark for OPTIMIZE ... INCREMENTAL), so
    // the restore lands at v4
    val restored = spark.sql(s"GRAFT RESTORE '$path' TO VERSION 1").collect()(0).getLong(0)
    assert(restored == 4L)
    assert(spark.read.format("graftdelta").load(path).count() == 3)
    // vacuum with explicit retention parses and runs (nothing young deleted)
    assert(spark.sql(s"GRAFT VACUUM '$path' RETAIN 168 HOURS").collect()(0).getLong(0) == 0L)
    // an EXPLICIT `RETAIN 0 HOURS` is the zero-retention confirmation
    // (the programmatic API still requires allowZeroRetention = true):
    // the OPTIMIZE above superseded files that are now reclaimable
    assert(spark.sql(s"GRAFT VACUUM '$path' RETAIN 0 HOURS").collect()(0).getLong(0) > 0L)
    assert(spark.read.format("graftdelta").load(path).count() == 3)
    // inventory-sourced vacuum: candidates come from a parquet relation
    val invPath = java.nio.file.Files.createTempDirectory("graft-inv")
      .resolve("inv.parquet").toString
    Seq(("stray.parquet", System.currentTimeMillis() - 200L * 3600 * 1000, false))
      .toDF("path", "modificationTime", "isDir").write.parquet(invPath)
    val strayP = new org.apache.hadoop.fs.Path(path, "stray.parquet")
    val strayFs = strayP.getFileSystem(spark.sessionState.newHadoopConf())
    strayFs.create(strayP, false).close()
    assert(spark.sql(
      s"GRAFT VACUUM '$path' RETAIN 168 HOURS USING INVENTORY '$invPath'")
      .collect()(0).getLong(0) == 1L)
    assert(!strayFs.exists(strayP))
    // mutation statements: UPDATE (multi-assignment with a function
    // call containing commas), targeted DELETE, DV DELETE
    spark.sql(s"GRAFT UPDATE '$path' SET s = concat(s, '!'), n = n + 10 WHERE n = 1")
    val upd = spark.read.format("graftdelta").load(path)
      .where("n = 11").select("s").collect()
    assert(upd.map(_.getString(0)).toSeq == Seq("a!"))
    spark.sql(s"GRAFT DELETE FROM '$path' WHERE n = 2")
    assert(spark.read.format("graftdelta").load(path).count() == 2)
    spark.sql(s"GRAFT DELETE FROM '$path' USING DV WHERE n = 3")
    assert(spark.read.format("graftdelta").load(path).count() == 1)

    // constraints: add enforces, drop restores
    spark.sql(s"GRAFT ALTER '$path' ADD CONSTRAINT n_small CHECK (n < 100)")
    intercept[Exception] {
      Seq((200L, "z")).toDF("n", "s")
        .write.format("graftdelta").mode("append").save(path)
    }
    spark.sql(s"GRAFT ALTER '$path' DROP CONSTRAINT n_small")
    Seq((200L, "z")).toDF("n", "s")
      .write.format("graftdelta").mode("append").save(path)
    assert(spark.read.format("graftdelta").load(path).count() == 2)

    // shallow clone via SQL
    val clonePath = java.nio.file.Files.createTempDirectory("graft_sqlcmd_")
      .resolve("c").toString
    assert(spark.sql(s"GRAFT CLONE '$path' TO '$clonePath'").collect()(0).getLong(0) == 0L)
    assert(spark.read.format("graftdelta").load(clonePath).count() == 2)

    // ALTER ENABLE statements flip the features on
    spark.sql(s"GRAFT ALTER '$path' ENABLE CHANGE DATA FEED")
    spark.sql(s"GRAFT ALTER '$path' ENABLE ROW TRACKING")
    val snap = graft.delta.DeltaLog.forPath(spark, path).snapshot
    assert(graft.delta.ChangeDataFeed.enabled(snap))
    assert(graft.delta.RowTracking.supported(snap.protocol))
    assert(snap.activeFiles.forall(_.baseRowId.nonEmpty))

    // ALTER COLUMN TYPE widens through the parser (int table -> long)
    val widenPath = java.nio.file.Files.createTempDirectory("graft_sqlcmd_")
      .resolve("w").toString
    Seq((1, 7)).toDF("k", "v")
      .write.format("graftdelta").save(widenPath)
    spark.sql(s"GRAFT ALTER '$widenPath' ALTER COLUMN v TYPE bigint")
    assert(graft.delta.DeltaLog.forPath(spark, widenPath).snapshot
      .metadata.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)

    // DESCRIBE DETAIL summarizes the table from the log plane
    val detail = spark.sql(s"GRAFT DESCRIBE DETAIL '$path'").head()
    assert(detail.getAs[String]("format") == "delta")
    assert(detail.getAs[Long]("numFiles") >= 1L)
    assert(detail.getAs[Long]("sizeInBytes") > 0L)
    assert(detail.getAs[Long]("minWriterVersion") >= 1L)

    // SHOW PARTITIONS on a partitioned scratch table
    val spPath = java.nio.file.Files.createTempDirectory("graft_sqlcmd_")
      .resolve("sp").toString
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("n", "p")
      .write.format("graftdelta").partitionBy("p").save(spPath)
    val parts = spark.sql(s"GRAFT SHOW PARTITIONS '$spPath'")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(parts == Map("p=a" -> 2L, "p=b" -> 1L), parts.toString)

    // ordinary SQL still parses through the delegate
    assert(spark.sql("SELECT 1 + 1").collect()(0).getInt(0) == 2)
    // ...including parameterized statements (parsePlanWithParameters path)
    assert(spark.sql("SELECT ? + 1", Array(41)).collect()(0).getInt(0) == 42)
    // and a non-command statement mentioning GRAFT errors like normal SQL
    intercept[Exception](spark.sql("GRAFT FROBNICATE 'x'"))
  }

  test("GRAFT OPTIMIZE ZORDER BY + WHERE scopes the pass (round-6 advice: WHERE was dropped)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_zorderw_")
      .resolve("t").toString
    (1L to 40L).map(i => (i, i % 5, if (i % 2 == 0) "a" else "b"))
      .toDF("n", "m", "p")
      .write.format("graftdelta").partitionBy("p").mode("overwrite").save(path)
    val log = graft.delta.DeltaLog.forPath(spark, path)
    val before = log.snapshot.activeFiles
      .groupBy(_.partitionValues("p")).view.mapValues(_.map(_.path).toSet).toMap

    spark.sql(s"GRAFT OPTIMIZE '$path' ZORDER BY (n, m) WHERE p = 'a'").collect()
    val after = graft.delta.DeltaLog.forPath(spark, path).snapshot.activeFiles
      .groupBy(_.partitionValues("p")).view.mapValues(_.map(_.path).toSet).toMap
    assert(after("a").intersect(before("a")).isEmpty, "partition a rewritten")
    assert(after("b") == before("b"), "partition b untouched")
    assert(spark.read.format("graftdelta").load(path).count() == 40L)

    // a non-partition WHERE must fail loudly, not silently full-scan
    val e = intercept[Exception] {
      spark.sql(s"GRAFT OPTIMIZE '$path' ZORDER BY (n) WHERE n > 3").collect()
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
  }

  test("name-addressed tables: CREATE TABLE USING graftdelta, plain SELECT + INSERT") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_named_")
      .resolve("t").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("n", "s")
      .write.format("graftdelta").mode("overwrite").save(path)
    spark.sql(s"CREATE TABLE t_named USING graftdelta LOCATION '$path'")
    try {
      // temp-view-free reads through the session catalog
      assert(spark.sql("SELECT count(*) FROM t_named").collect()(0).getLong(0) == 3L)
      assert(spark.sql("SELECT s FROM t_named WHERE n = 2")
        .collect()(0).getString(0) == "b")
      // INSERT INTO the name lands as a transactional graft commit
      spark.sql("INSERT INTO t_named VALUES (4, 'd')")
      assert(spark.sql("SELECT count(*) FROM t_named").collect()(0).getLong(0) == 4L)
      assert(graft.delta.DeltaLog.forPath(spark, path).snapshot.version == 1L)
      // out-of-band mutation on the path + REFRESH TABLE (standard V1
      // external-table contract) is visible through the name
      spark.sql(s"GRAFT DELETE FROM '$path' WHERE n = 1")
      spark.sql("REFRESH TABLE t_named")
      assert(spark.sql("SELECT count(*) FROM t_named").collect()(0).getLong(0) == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS t_named")
  }

  test("persistent catalog: REGISTER TABLE survives catalog loss, RESTORE TABLES recovers") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cat_")
    val path = base.resolve("t").toString
    spark.conf.set("spark.graft.catalog.path",
      base.resolve("_graft_catalog.json").toString)
    try {
      Seq((1L, "a"), (2L, "b")).toDF("n", "s")
        .write.format("graftdelta").mode("overwrite").save(path)
      spark.sql(s"GRAFT REGISTER TABLE t_persisted LOCATION '$path'")
      assert(spark.sql("SELECT count(*) FROM t_persisted").collect()(0).getLong(0) == 2L)
      assert(graft.delta.GraftCatalog.entries(spark) == Map("t_persisted" -> path))
      // simulate a fresh session: the catalog registration is gone but
      // the persisted registry re-creates it
      spark.sql("DROP TABLE t_persisted")
      assert(!spark.catalog.tableExists("t_persisted"))
      assert(spark.sql("GRAFT RESTORE TABLES").collect()(0).getLong(0) == 1L)
      assert(spark.sql("SELECT count(*) FROM t_persisted").collect()(0).getLong(0) == 2L)
      // restore is idempotent; unregister drops both registry and name
      assert(spark.sql("GRAFT RESTORE TABLES").collect()(0).getLong(0) == 0L)
      // a stale entry (table files wiped out-of-band) is skipped, not
      // fatal, and doesn't block restoring the rest of the registry
      val stalePath = base.resolve("stale_t").toString
      Seq((1L, "x")).toDF("n", "s")
        .write.format("graftdelta").mode("overwrite").save(stalePath)
      graft.delta.GraftCatalog.register(spark, "t_stale", stalePath)
      spark.sql("DROP TABLE t_stale")
      val sp = new org.apache.hadoop.fs.Path(stalePath)
      sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
      assert(spark.sql("GRAFT RESTORE TABLES").collect()(0).getLong(0) == 0L)
      assert(!spark.catalog.tableExists("t_stale"))
      graft.delta.GraftCatalog.unregister(spark, "t_stale")
      spark.sql("GRAFT UNREGISTER TABLE t_persisted")
      assert(graft.delta.GraftCatalog.entries(spark).isEmpty)
      assert(!spark.catalog.tableExists("t_persisted"))
    } finally {
      spark.conf.unset("spark.graft.catalog.path")
      spark.sql("DROP TABLE IF EXISTS t_persisted")
    }
  }

  test("rewritten kernel matches the interpreted HOF on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
      .limit(50).cache()
    emb.createOrReplaceTempView("ext_emb")
    val hof = spark.sql(
      """SELECT vec_id, sqrt(aggregate(v, cast(0 as double), (acc, x) -> acc + x * x)) AS n
        |FROM ext_emb""".stripMargin).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = spark.sql("SELECT vec_id, vec_l2norm(v) AS n FROM ext_emb")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof == native) // bit-exact, not approximate
  }

  test("GRAFT RESTORE TO TIMESTAMP resolves through the time-travel clock") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft-rts")
      .resolve("t").toString
    val log = graft.delta.DeltaLog.forPath(spark, path)
    import spark.implicits._
    graft.delta.TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))                      // v0
    graft.delta.Mutations.delete(log, col("k") === 2L)               // v1
    assert(log.snapshot.read().count() == 1)
    // the v0 commit file's mtime IS the time-travel clock for v0
    val fs = log.fs
    val v0Ts = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      log.logPath, "00000000000000000000.json")).getModificationTime
    val iso = java.time.Instant.ofEpochMilli(v0Ts).toString
    spark.sql(s"GRAFT RESTORE '$path' TO TIMESTAMP '$iso'").collect()
    assert(graft.delta.DeltaLog.forPath(spark, path)
      .snapshot.read().count() == 2,
      "restore-to-timestamp must reinstate the v0 row set")
  }

  test("GRAFT RESTORE zone-less timestamp resolves in the SESSION timezone") {
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files.createTempDirectory("graft-rtz")
      .resolve("t").toString
    val log = graft.delta.DeltaLog.forPath(spark, path)
    import spark.implicits._
    graft.delta.TransactionWriter.overwrite(log,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))                      // v0
    graft.delta.Mutations.delete(log, col("k") === 2L)               // v1
    val fs = log.fs
    val v0Ts = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      log.logPath, "00000000000000000000.json")).getModificationTime
    // express v0's instant as a ZONE-LESS local datetime in a non-UTC
    // session zone; delta-spark resolves such literals in the session
    // zone, so the restore must land on v0 (a hardwired-UTC reading
    // would interpret this literal 7h later and still see v1)
    val zone = "Asia/Bangkok" // UTC+7, no DST
    val local = java.time.Instant.ofEpochMilli(v0Ts)
      .atZone(java.time.ZoneId.of(zone)).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", zone)
      spark.sql(s"GRAFT RESTORE '$path' TO TIMESTAMP '$local'").collect()
    } finally spark.conf.set("spark.sql.session.timeZone", prevZone)
    assert(graft.delta.DeltaLog.forPath(spark, path)
      .snapshot.read().count() == 2,
      "zone-less restore timestamp must resolve through the session zone")
  }
}
