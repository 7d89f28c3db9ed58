package graft

import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span, Millis}

/** Library cache hygiene: pipeline queries that persist shared stages
  * must not leave THEIR InMemoryRelations behind once their result is
  * consumed. Assertions are scoped to the pipeline's own stage views —
  * the CacheManager is shared across every suite on this context, so a
  * global-emptiness check would flake on any foreign entry another
  * suite (or its async listener) parks there mid-run. */
class QueriesCacheSpec extends SparkTestBase {

  private val stageViews = Seq("g_hsh", "g_sig", "g_buckets")

  test("cached-stage pipeline unpersists after the consuming action") {
    val sf = "/root/testdata/sf0.001"
    val fn = graft.queries.Queries.queries("q_minhash_dedup")
    val result = fn(spark, sf)
    assert(stageViews.exists(v => spark.catalog.isCached(v)),
      "stage views must be cached while the pipeline result is pending")
    assert(result.count() > 0)
    // the cleanup listener fires asynchronously on the listener bus
    // (generous timeout: the bus can lag far behind under host load)
    eventually(timeout(Span(60, Seconds)), interval(Span(100, Millis))) {
      stageViews.foreach { v =>
        assert(!spark.catalog.isCached(v),
          s"stage view $v may not stay cached after the consuming action")
      }
    }
  }
}
