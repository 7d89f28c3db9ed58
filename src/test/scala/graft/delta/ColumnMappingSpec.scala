package graft.delta

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Column mapping (name mode, minReaderVersion 2): data files and log
  * entries use physical names (`delta.columnMapping.physicalName`); the
  * reader surfaces logical names everywhere. Fixtures are hand-authored
  * (the reference corpus has no column-mapped case; delta-rs reads such
  * tables, so parity requires it). */
class ColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private def phys(name: String, id: Long): Metadata =
    new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", name)
      .putLong("delta.columnMapping.id", id)
      .build()

  // logical: n long, s string, st struct<x:int>, p string (partition)
  private val logicalSchema = StructType(Seq(
    StructField("n", LongType, nullable = true, phys("col-aaa", 1)),
    StructField("s", StringType, nullable = true, phys("col-bbb", 2)),
    StructField("st", StructType(Seq(
      StructField("x", IntegerType, nullable = true, phys("col-xxx", 4)))),
      nullable = true, phys("col-sss", 3)),
    StructField("p", StringType, nullable = true, phys("col-ppp", 5))))

  /** Write one physical-named parquet data file, return (rel, size, mtime). */
  private def writeDataFile(
      root: Path, rel: String, rows: Seq[(Long, String, Int)]): (String, Long, Long) = {
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(root, s".cm-staging-${java.util.UUID.randomUUID}")
    rows.toDF("col-aaa", "col-bbb", "x")
      .withColumn("col-sss", struct(col("x").as("col-xxx"))).drop("x")
      .coalesce(1).write.parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dest = new Path(root, rel)
    fs.mkdirs(dest.getParent)
    fs.rename(part, dest)
    fs.delete(staging, true)
    val st = fs.getFileStatus(dest)
    (rel, st.getLen, st.getModificationTime)
  }

  private def buildTable(mode: String = "name"): DeltaLog = {
    val path = Files.createTempDirectory("graft-cm").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val (r1, sz1, mt1) = writeDataFile(log.rootPath, "f1.parquet",
      Seq((1L, "a", 10), (2L, "b", 20)))
    val (r2, sz2, mt2) = writeDataFile(log.rootPath, "f2.parquet",
      Seq((3L, "c", 30)))
    val meta = graft.delta.Metadata(
      id = java.util.UUID.randomUUID.toString,
      schemaString = logicalSchema.json,
      partitionColumns = Seq("p"),
      configuration = Map(
        "delta.columnMapping.mode" -> mode,
        "delta.columnMapping.maxColumnId" -> "5"),
      createdTime = Some(0L))
    log.commit(0, Seq(
      ProtocolAction(Protocol(minReaderVersion = 2, minWriterVersion = 5)),
      MetadataAction(meta),
      AddAction(AddFile(r1, Map("col-ppp" -> "x"), sz1, mt1, stats = Some(
        """{"numRecords":2,"minValues":{"col-aaa":1,"col-bbb":"a","col-sss":{"col-xxx":10}},"maxValues":{"col-aaa":2,"col-bbb":"b","col-sss":{"col-xxx":20}},"nullCount":{"col-aaa":0,"col-bbb":0,"col-sss":{"col-xxx":0}}}"""))),
      AddAction(AddFile(r2, Map("col-ppp" -> "y"), sz2, mt2, stats = Some(
        """{"numRecords":1,"minValues":{"col-aaa":3,"col-bbb":"c","col-sss":{"col-xxx":30}},"maxValues":{"col-aaa":3,"col-bbb":"c","col-sss":{"col-xxx":30}},"nullCount":{"col-aaa":0,"col-bbb":0,"col-sss":{"col-xxx":0}}}"""))),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    log
  }

  test("name-mode table reads with logical names (incl. nested + partition)") {
    val snap = buildTable().snapshot
    assert(snap.columnMappingMode == "name")
    val df = snap.read()
    assert(df.schema.fieldNames.toSeq == Seq("n", "s", "st", "p"))
    val rows = df.select(col("n"), col("s"), col("st.x"), col("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(rows == Set((1L, "a", 10, "x"), (2L, "b", 20, "x"), (3L, "c", 30, "y")))
  }

  test("stats flatten to logical min/max columns") {
    val snap = buildTable().snapshot
    val flat = snap.addsFlat.select("min.n", "max.n", "min.st.x", "null_count.s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(flat == Set((1L, 2L, 10, 0L), (3L, 3L, 30, 0L)))
    // skipping filter on a LOGICAL column prunes by physical stats
    val stats = graft.Levi.skippedStats(snap, Seq(("n", "=", 3)))
    assert(stats("num_files") == 2L && stats("num_files_skipped") == 1L)
  }

  test("updated_partitions surfaces logical partition keys") {
    val snap = buildTable().snapshot
    val parts = graft.Levi.updatedPartitions(snap)
    assert(parts.toSet == Set(Map("p" -> "x"), Map("p" -> "y")))
  }

  // ---- id mode: resolution by parquet field id, not by name ---------------

  /** Data file whose column NAMES deliberately differ from the log's
    * physicalName — only the parquet field ids line up, so a read that
    * succeeds proves id-based resolution. */
  private def writeIdDataFile(
      root: Path, rel: String, rows: Seq[(Long, String, Int)]): (String, Long, Long) = {
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(root, s".cm-staging-${java.util.UUID.randomUUID}")
    def fid(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    val fileSchema = StructType(Seq(
      StructField("whatever_1", LongType, nullable = true, fid(1)),
      StructField("whatever_2", StringType, nullable = true, fid(2)),
      StructField("whatever_3", StructType(Seq(
        StructField("inner", IntegerType, nullable = true, fid(4)))),
        nullable = true, fid(3))))
    val df = rows.toDF("a", "b", "x")
      .select(col("a"), col("b"), struct(col("x").as("inner")).as("st"))
    spark.createDataFrame(df.rdd, fileSchema)
      .coalesce(1).write.parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dest = new Path(root, rel)
    fs.mkdirs(dest.getParent)
    fs.rename(part, dest)
    fs.delete(staging, true)
    val st = fs.getFileStatus(dest)
    (rel, st.getLen, st.getModificationTime)
  }

  private def buildIdTable(): DeltaLog = {
    val path = Files.createTempDirectory("graft-cm-id").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val (r1, sz1, mt1) = writeIdDataFile(log.rootPath, "f1.parquet",
      Seq((1L, "a", 10), (2L, "b", 20)))
    val (r2, sz2, mt2) = writeIdDataFile(log.rootPath, "f2.parquet",
      Seq((3L, "c", 30)))
    val meta = graft.delta.Metadata(
      id = java.util.UUID.randomUUID.toString,
      schemaString = logicalSchema.json,
      partitionColumns = Seq("p"),
      configuration = Map(
        "delta.columnMapping.mode" -> "id",
        "delta.columnMapping.maxColumnId" -> "5"),
      createdTime = Some(0L))
    log.commit(0, Seq(
      ProtocolAction(Protocol(minReaderVersion = 2, minWriterVersion = 5)),
      MetadataAction(meta),
      AddAction(AddFile(r1, Map("col-ppp" -> "x"), sz1, mt1, stats = None)),
      AddAction(AddFile(r2, Map("col-ppp" -> "y"), sz2, mt2, stats = None)),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    log
  }

  test("id-mode table resolves columns by parquet field id") {
    val snap = buildIdTable().snapshot
    assert(snap.columnMappingMode == "id")
    // physical read schema carries parquet.field.id for every mapped field
    val ps = snap.physicalSchema
    assert(ps("col-aaa").metadata.getLong("parquet.field.id") == 1L)
    assert(ps("col-sss").dataType.asInstanceOf[StructType]("col-xxx")
      .metadata.getLong("parquet.field.id") == 4L)
    val df = snap.read()
    assert(df.schema.fieldNames.toSeq == Seq("n", "s", "st", "p"))
    val rows = df.select(col("n"), col("s"), col("st.x"), col("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(rows == Set((1L, "a", 10, "x"), (2L, "b", 20, "x"), (3L, "c", 30, "y")))
  }

  // ---- writer side: physical-name writes ----------------------------------

  test("append into a name-mapped table writes physical names end-to-end") {
    val log = buildTable()
    val incoming = Seq((100L, "zz", 99, "z")).toDF("n", "s", "x", "p")
      .select(col("n"), col("s"), struct(col("x")).as("st"), col("p"))
    TransactionWriter.append(log, incoming)
    val snap = DeltaLog.forPath(spark, log.tablePath).snapshot
    assert(snap.version == 1L)
    val rows = snap.read().select(col("n"), col("s"), col("st.x"), col("p"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(rows == Set((1L, "a", 10, "x"), (2L, "b", 20, "x"),
      (3L, "c", 30, "y"), (100L, "zz", 99, "z")))
    // the new add's partitionValues and stats are keyed PHYSICALLY
    val added = snap.activeFiles.find(_.partitionValues.values.toSeq.contains("z")).get
    assert(added.partitionValues.keySet == Set("col-ppp"))
    assert(added.stats.exists(_.contains("\"col-aaa\"")),
      s"stats must use physical names, got: ${added.stats}")
    assert(added.stats.forall(!_.contains("\"n\"")))
    // the data file itself carries physical column names
    val raw = spark.read.parquet(
      new Path(log.rootPath, DeltaLog.decodePath(added.path)).toString)
    assert(raw.schema.fieldNames.toSet == Set("col-aaa", "col-bbb", "col-sss"))
    // and logical-column skipping still prunes the new file
    val stats = graft.Levi.skippedStats(snap, Seq(("n", "=", 100)))
    assert(stats("num_files") == 3L && stats("num_files_skipped") == 2L)
  }

  test("targeted rewrite (killDuplicates) works on a mapped table") {
    val log = buildTable()
    val dup = log.snapshot.read().where(col("n") === 2L)
    TransactionWriter.append(log, dup)
    assert(log.snapshot.read().where(col("n") === 2L).count() == 2L)
    Mutations.killDuplicates(log, Seq("n"))
    val left = log.snapshot.read().select("n").as[Long].collect().sorted.toSeq
    assert(left == Seq(1L, 3L), s"both copies of n=2 must die, got $left")
  }

  test("overwrite with a mapping mode CREATES a mapped table") {
    val path = Files.createTempDirectory("graft-cm-new").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val df = Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("n", "s", "p")
    TransactionWriter.overwrite(log, df, partitionBy = Some(Seq("p")),
      configuration = Map("delta.columnMapping.mode" -> "name"))
    val snap = DeltaLog.forPath(spark, path).snapshot
    assert(snap.columnMappingMode == "name")
    assert(snap.protocol.minReaderVersion == 2 && snap.protocol.minWriterVersion == 5)
    assert(snap.metadata.configuration("delta.columnMapping.maxColumnId") == "3")
    // every field annotated with id + physical name
    snap.schema.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"), f.name)
    }
    // reads surface logical names; files + adds hold physical ones
    assert(snap.read().schema.fieldNames.toSeq == Seq("n", "s", "p"))
    assert(snap.read().select("n").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val f0 = snap.activeFiles.head
    assert(f0.partitionValues.keys.forall(_.startsWith("col-")))
    // append keeps working against the created mapping
    TransactionWriter.append(log, Seq((3L, "c", "p1")).toDF("n", "s", "p"))
    assert(DeltaLog.forPath(spark, path).snapshot.read().count() == 3L)
  }

  test("id-mode create stamps parquet field ids readers can resolve by") {
    val path = Files.createTempDirectory("graft-cm-newid").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    TransactionWriter.overwrite(log, Seq((7L, "x")).toDF("n", "s"),
      configuration = Map("delta.columnMapping.mode" -> "id"))
    val snap = DeltaLog.forPath(spark, path).snapshot
    assert(snap.columnMappingMode == "id")
    // read the data file with WRONG names but matching field ids: only
    // footer-stamped ids can make this resolve
    val f = snap.activeFiles.head
    def fid(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    val wrongNames = StructType(Seq(
      StructField("w1", LongType, nullable = true, fid(1)),
      StructField("w2", StringType, nullable = true, fid(2))))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val got = spark.read.schema(wrongNames).parquet(
      new Path(log.rootPath, DeltaLog.decodePath(f.path)).toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((7L, "x")), "field ids must be stamped in the footer")
    // and the normal logical read works
    assert(snap.read().select("n").as[Long].head() == 7L)
  }

  test("id-mode create stamps NESTED field ids too") {
    val path = Files.createTempDirectory("graft-cm-nested").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val df = Seq((7L, 42)).toDF("n", "x")
      .select(col("n"), struct(col("x")).as("st"))
    TransactionWriter.overwrite(log, df,
      configuration = Map("delta.columnMapping.mode" -> "id"))
    val snap = DeltaLog.forPath(spark, path).snapshot
    val f = snap.activeFiles.head
    def fid(id: Long): Metadata =
      new MetadataBuilder().putLong("parquet.field.id", id).build()
    // ids assigned depth-first: n=1, st=2, st.x=3
    val wrongNames = StructType(Seq(
      StructField("w1", LongType, nullable = true, fid(1)),
      StructField("w2", StructType(Seq(
        StructField("inner", IntegerType, nullable = true, fid(3)))),
        nullable = true, fid(2))))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val got = spark.read.schema(wrongNames).parquet(
      new Path(log.rootPath, DeltaLog.decodePath(f.path)).toString)
      .select(col("w1"), col("w2.inner"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((7L, 42)),
      "nested field ids must be stamped in the parquet footer")
    assert(snap.read().select("st.x").as[Int].head() == 42)
  }

  test("schema evolution on mapped tables is refused with guidance") {
    val log = buildTable()
    val e1 = intercept[IllegalArgumentException] {
      TransactionWriter.appendMergeSchema(log,
        Seq((1L, "a", 1, "x", "new")).toDF("n", "s", "x", "p", "extra")
          .select(col("n"), col("s"), struct(col("x")).as("st"), col("p"), col("extra")))
    }
    assert(e1.getMessage.contains("column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TransactionWriter.overwrite(log,
        Seq((1L, "x", "p1")).toDF("different", "schema", "p"))
    }
    assert(e2.getMessage.contains("column mapping"), e2.getMessage)
  }

  test("reader v3 with unsupported features stays rejected") {
    val path = Files.createTempDirectory("graft-cm-v3").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val meta = graft.delta.Metadata(
      id = java.util.UUID.randomUUID.toString,
      schemaString = StructType(Seq(StructField("n", LongType))).json,
      partitionColumns = Nil, configuration = Map.empty, createdTime = Some(0L))
    // a reader feature this engine genuinely does not implement
    // (variantType/typeWidening graduated to supported in round 6)
    log.commit(0, Seq(
      ProtocolAction(Protocol(minReaderVersion = 3, minWriterVersion = 7,
        readerFeatures = Set("futureCompression"),
        writerFeatures = Set("futureCompression"))),
      MetadataAction(meta),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    val e = intercept[IllegalArgumentException](log.snapshot)
    assert(e.getMessage.contains("minReaderVersion=3"))
    assert(e.getMessage.contains("futureCompression"))
  }
}
