package graft

import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span, Millis}

/** Library cache hygiene: pipeline queries that persist shared stages
  * must not leave InMemoryRelations behind once their result is
  * consumed. */
class QueriesCacheSpec extends SparkTestBase {

  test("cached-stage pipeline unpersists after the consuming action") {
    // suites share one SparkSession — start from a clean cache so a
    // leak from an earlier suite can't fail THIS hygiene check
    spark.catalog.clearCache()
    val sf = "/root/testdata/sf0.001"
    val fn = graft.queries.Queries.queries("q_minhash_dedup")
    val result = fn(spark, sf)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "stages must be cached while the pipeline result is pending")
    assert(result.count() > 0)
    // the cleanup listener fires asynchronously on the listener bus
    // (generous timeout: the bus can lag far behind under host load)
    eventually(timeout(Span(60, Seconds)), interval(Span(100, Millis))) {
      assert(spark.sharedState.cacheManager.isEmpty,
        "no InMemoryRelation may remain after the consuming action")
    }
  }
}
