package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftTable
import graft.delta.TransactionWriter

/** End-to-end demo of the Change Data Feed surface:
  * `runMain graft.tools.CdfDemo [dir]` — creates a table, enables CDF,
  * runs a targeted UPDATE, a DV DELETE and a DV UPDATE, then prints the
  * full versioned change feed.
  */
object CdfDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("cdf-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]").appName("cdf-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val t = GraftTable(spark, s"$dir/cdf_table")
      TransactionWriter.overwrite(t.log,
        (0L until 6L).map(i => (i, s"name_$i", i * 10L)).toDF("id", "name", "score"))
      t.enableChangeDataFeed()
      println(s"== CDF enabled at v${t.log.latestVersion()} ==")

      TransactionWriter.append(t.log, Seq((6L, "name_6", 60L)).toDF("id", "name", "score"))
      t.update(col("id") === 2L, Map("score" -> lit(999L)))
      t.deleteWithDv(col("id") === 3L)
      t.updateWithDv(col("id") === 6L, Map("name" -> lit("renamed")))
      println(s"== after append/UPDATE/DV-DELETE/DV-UPDATE: v${t.log.latestVersion()} ==")
      t.read().orderBy("id").show()

      println("== change feed v1.. ==")
      val feed = t.changeFeed(1)
        .orderBy("_commit_version", "id", "_change_type")
      feed.show(50, truncate = false)
      val byType = feed.groupBy("_change_type").count()
        .as[(String, Long)].collect().toMap
      require(byType == Map("insert" -> 1L, "update_preimage" -> 2L,
        "update_postimage" -> 2L, "delete" -> 1L),
        s"unexpected change-type histogram: $byType")
      println(s"change-type histogram OK: $byType")
    } finally spark.stop()
  }
}
