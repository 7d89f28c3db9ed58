package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession + order-insensitive DataFrame comparison. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Canonical, order-stable string form of a row value (sorted map keys,
    * hex binary) so result sets compare as multisets. */
  def canon(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => canon(k) + "→" + canon(x) }.toSeq.sorted
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(canon).mkString("[", ",", "]")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: BigDecimal => d.underlying.stripTrailingZeros.toPlainString
    case f: Float => f.toString
    case d: Double => d.toString
    case t: java.sql.Timestamp => t.toInstant.toString
    case other => other.toString
  }

  def sortedRows(df: DataFrame): Seq[String] = {
    val names = df.schema.fieldNames.sorted.toSeq
    df.select(names.head, names.tail: _*).collect().toSeq
      .map(r => canon(r)).sorted
  }

  def assertSameRows(actual: DataFrame, expected: DataFrame, hint: String = ""): Unit = {
    val a = sortedRows(actual)
    val e = sortedRows(expected)
    assert(a == e, s"$hint\nactual  (${a.size}): ${a.take(10).mkString("\n ")}\n" +
      s"expected(${e.size}): ${e.take(10).mkString("\n ")}")
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      // compile-cache sized for a many-query catalog (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
