package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

/** The q_bucketed_join claim is a PLAN shape, not just a result: with
  * both sides bucketed on the join key, the sort-merge join must plan
  * with no Exchange — the co-located join that makes fact-fact joins
  * affordable at 100 TB (bucket once at ingest, never shuffle again). */
class BucketedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed sort-merge join plans without any exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bktspec_").toString
    spark.sql("DROP TABLE IF EXISTS spec_b_a")
    spark.sql("DROP TABLE IF EXISTS spec_b_b")
    // one file per bucket (repartition on the key) — required for Spark
    // to trust the per-bucket sort order and elide the SMJ sorts
    (1L to 1000L).map(i => (i, i * 2)).toDF("k", "va")
      .repartition(4, col("k"))
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", tmp + "/a").saveAsTable("spec_b_a")
    (1L to 1000L).filter(_ % 3 == 0).map(i => (i, i * 5)).toDF("k", "vb")
      .repartition(4, col("k"))
      .write.format("parquet").bucketBy(4, "k").sortBy("k")
      .option("path", tmp + "/b").saveAsTable("spec_b_b")

    val joined = spark.table("spec_b_a").hint("merge")
      .join(spark.table("spec_b_b"), "k")
    val plan = joined.queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle, found: ${exchanges.map(_.nodeName)}")
    assert(plan.toString.contains("SortMergeJoin"),
      s"expected a sort-merge join in:\n$plan")
    // both scans must actually use the bucket metadata
    assert("Bucketed: true".r.findAllIn(plan.toString).size == 2,
      s"expected both scans bucketed in:\n$plan")
    // (the residual bucket-local Sorts are exchange-free; Spark only
    // elides them under the legacy bucketedTableScan.outputOrdering
    // conf, since multi-file buckets cannot guarantee scan order)
    assert(joined.count() == 333)

    spark.sql("DROP TABLE IF EXISTS spec_b_a")
    spark.sql("DROP TABLE IF EXISTS spec_b_b")
  }

  test("q_bucketed_join matches the plain-join aggregate") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.Queries.queries("q_bucketed_join")(spark, dir)
    val expected = spark.table("lineitem")
      .join(spark.table("orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
        count(lit(1)).as("n_lines"))
    assertSameRows(out, expected)
  }
}
