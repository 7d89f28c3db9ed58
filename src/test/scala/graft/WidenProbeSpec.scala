package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class WidenProbeSpec extends SparkTestBase {
  import spark.implicits._
  test("probe: parquet reader widens int->long and float->double") {
    val d = java.nio.file.Files.createTempDirectory("widen_").toString
    Seq((1, 1.5f), (2, 2.5f)).toDF("a", "b").write.parquet(d + "/p")
    val sch = StructType(Seq(StructField("a", LongType), StructField("b", DoubleType)))
    val out = spark.read.schema(sch).parquet(d + "/p").orderBy("a").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 1.5), (2L, 2.5)))
  }
  test("probe: parquet reader widens int->double and byte chain") {
    val d = java.nio.file.Files.createTempDirectory("widen_").toString
    Seq((1, 7), (2, 9)).toDF("a", "b").write.parquet(d + "/p")
    val sch = StructType(Seq(StructField("a", LongType), StructField("b", DoubleType)))
    val out = spark.read.schema(sch).parquet(d + "/p").orderBy("a").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 7.0), (2L, 9.0)))
  }
}
