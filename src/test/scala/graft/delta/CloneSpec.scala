package graft.delta

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Shallow clone: zero-copy create, independent evolution, DV
  * preservation, and vacuum isolation. */
class CloneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-clone").resolve("t").toString

  test("shallow clone reads the source snapshot without copying data") {
    val src = DeltaLog.forPath(spark, tmp())
    TransactionWriter.overwrite(src,
      (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))
    TransactionWriter.append(src, Seq((20L, "v20")).toDF("id", "v"))

    val clonePath = tmp()
    val v = Clone.shallow(src, clonePath)
    assert(v == 0L)
    val dst = DeltaLog.forPath(spark, clonePath)
    assertSameRows(dst.snapshot.read(), src.snapshot.read())
    // zero data files under the clone root
    val dataFiles = dst.fs.listStatus(dst.rootPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(dataFiles.isEmpty, "shallow clone must not copy data")
    // stats survive: file pruning still works on the clone
    assert(dst.snapshot.activeFiles.forall(_.stats.nonEmpty))
    // add.path entries are FULLY QUALIFIED URIs (scheme kept), matching
    // the 'p' DV descriptor spelling — a clone on a different filesystem
    // must resolve them against the SOURCE's filesystem, and decodePath
    // must round-trip the scheme instead of re-rooting on the reader's
    assert(dst.snapshot.activeFiles.forall(_.path.startsWith("file:")),
      dst.snapshot.activeFiles.map(_.path).mkString(", "))
    dst.snapshot.activeFiles.foreach { f =>
      assert(dst.snapshot.absolutePath(f).startsWith("file:"))
    }
  }

  test("clone of an older version; clone evolves independently") {
    val src = DeltaLog.forPath(spark, tmp())
    TransactionWriter.overwrite(src, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TransactionWriter.append(src, Seq((3L, "c")).toDF("id", "v"))

    val dst = DeltaLog.forPath(spark, tmp())
    Clone.shallow(src, dst.tablePath, version = Some(0L))
    assert(dst.snapshot.read().count() == 2) // pre-append snapshot

    // clone-side mutations don't touch the source
    TransactionWriter.append(dst, Seq((9L, "z")).toDF("id", "v"))
    Mutations.delete(dst, col("id") === 1L)
    assertSameRows(dst.snapshot.read(), Seq((2L, "b"), (9L, "z")).toDF("id", "v"))
    assert(src.snapshot.read().count() == 3, "source must be untouched")

    // source-side append after the clone is invisible to the clone
    TransactionWriter.append(src, Seq((4L, "d")).toDF("id", "v"))
    assert(dst.snapshot.read().count() == 2)

    // cloning onto an existing table refuses
    intercept[IllegalArgumentException] {
      Clone.shallow(src, dst.tablePath)
    }
  }

  test("deletion vectors survive the clone; clone vacuum spares source files") {
    val src = DeltaLog.forPath(spark, tmp())
    TransactionWriter.overwrite(src,
      (0L until 30L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    Mutations.deleteWithDv(src, col("id") % 3 === 0)

    val dst = DeltaLog.forPath(spark, tmp())
    Clone.shallow(src, dst.tablePath)
    val got = dst.snapshot.read().select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 30L).filter(_ % 3 != 0))
    assert(dst.snapshot.activeFiles.exists(_.deletionVector.exists(_.storageType == "p")))

    // vacuum on the clone finds nothing of the source's to delete
    val deleted = Maintenance.vacuum(dst, retentionMs = 0L, allowZeroRetention = true)
    assert(deleted.isEmpty)
    assert(src.snapshot.read().count() == 20, "source still reads fine")

    // a clone-side targeted rewrite localizes the touched file
    Mutations.update(dst, col("id") === 1L, Map("v" -> lit("upd")))
    assert(dst.snapshot.read().where(col("v") === "upd").count() == 1)
    assert(src.snapshot.read().where(col("v") === "upd").count() == 0)
  }

  test("row tracking survives the clone: ids identical on both sides") {
    import spark.implicits._
    val srcPath = java.nio.file.Files.createTempDirectory("graft-clone-rt")
      .resolve("s").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))
    RowTracking.enable(src)
    val srcIds = RowTracking.readWithRowIds(src.snapshot)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap

    val dstPath = java.nio.file.Files.createTempDirectory("graft-clone-rt")
      .resolve("d").toString
    Clone.shallow(src, dstPath)
    val dst = DeltaLog.forPath(spark, dstPath)
    assert(dst.snapshot.activeFiles.forall(_.baseRowId.nonEmpty),
      "clone must carry baseRowId on every add")
    val dstIds = RowTracking.readWithRowIds(dst.snapshot)
      .select("id", "_row_id").as[(Long, Long)].collect().toMap
    assert(dstIds == srcIds, s"clone ids must match source: $dstIds vs $srcIds")
  }
}
