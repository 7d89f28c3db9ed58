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

  test("reader v3 with unsupported features stays rejected") {
    val path = Files.createTempDirectory("graft-cm-v3").resolve("t").toString
    val log = DeltaLog.forPath(spark, path)
    val meta = graft.delta.Metadata(
      id = java.util.UUID.randomUUID.toString,
      schemaString = StructType(Seq(StructField("n", LongType))).json,
      partitionColumns = Nil, configuration = Map.empty, createdTime = Some(0L))
    log.commit(0, Seq(
      ProtocolAction(Protocol(minReaderVersion = 3, minWriterVersion = 7,
        readerFeatures = Set("variantType"), writerFeatures = Set("variantType"))),
      MetadataAction(meta),
      CommitInfoAction(CommitInfo(0L, "WRITE"))))
    val e = intercept[IllegalArgumentException](log.snapshot)
    assert(e.getMessage.contains("minReaderVersion=3"))
    assert(e.getMessage.contains("variantType"))
  }
}
