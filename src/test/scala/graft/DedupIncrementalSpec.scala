package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** dedupAgainstCorpus: two-sided-bloom incremental dedup must equal the
  * plain content anti-join exactly (blooms only pre-filter; the exact
  * join removes false positives and blooms have no false negatives). */
class DedupIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def batch = Seq(
    (1L, "fresh one"), (2L, "seen a"), (3L, "fresh two"),
    (4L, "seen b"), (5L, "fresh three"), (6L, "seen a"))
    .toDF("id", "text")

  private def prior = Seq("seen a", "seen b", "seen c").toDF("text")

  test("matches the exact anti-join semantics") {
    val got = Dedup.dedupAgainstCorpus(batch, prior, "text")
    val want = batch.join(prior.distinct(), Seq("text"), "left_anti")
    assertSameRows(got, want, "incremental dedup vs plain anti-join")
    // both copies of an intra-batch dup drop when the text is in prior
    assert(got.count() == 3)
  }

  test("empty prior keeps the whole batch") {
    val got = Dedup.dedupAgainstCorpus(batch, prior.limit(0), "text")
    assertSameRows(got, batch, "empty prior")
  }

  test("disjoint prior keeps the whole batch") {
    val got = Dedup.dedupAgainstCorpus(
      batch, Seq("other x", "other y").toDF("text"), "text")
    assertSameRows(got, batch, "no-overlap prior")
  }

  test("SQL surface: bloom_filter_agg + might_contain round-trip") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    prior.createOrReplaceTempView("bloom_prior_v")
    batch.createOrReplaceTempView("bloom_batch_v")
    val hits = spark.sql(
      """SELECT count(*) AS n FROM bloom_batch_v
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(text)) FROM bloom_prior_v),
        |  xxhash64(text))""".stripMargin).head().getLong(0)
    // no false negatives: all 3 true matches must probe positive
    assert(hits >= 3 && hits <= 6)
  }
}
