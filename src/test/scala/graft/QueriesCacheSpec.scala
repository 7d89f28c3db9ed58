package graft

/** Lifecycle contract of the checkpoint-staged pipelines (see
  * Queries.cachedStagesQuery — CacheManager substitution was measured
  * to MISS persisted stage subtrees, so stages localCheckpoint
  * instead): stage views are never CacheManager entries, and a result
  * returned by one pipeline invocation must stay READABLE after later
  * invocations run — a checkpointed RDD cannot recompute, so eager
  * cross-invocation unpersists would break held results (blocks are
  * instead reclaimed by the ContextCleaner once unreachable). */
class QueriesCacheSpec extends SparkTestBase {

  test("stage views are checkpoint-backed; prior results survive later runs") {
    val sf = "/root/testdata/sf0.001"
    val dedup = graft.queries.Queries.queries("q_minhash_dedup")
    val r1 = dedup(spark, sf)
    val n1 = r1.count()
    assert(n1 > 0)
    Seq("g_hsh", "g_sig", "g_buckets").foreach { v =>
      assert(!spark.catalog.isCached(v),
        s"stage view $v must be checkpoint-backed, not CacheManager-cached")
    }
    // later invocations (same pipeline and a sibling) must not
    // invalidate r1's checkpointed stages
    assert(dedup(spark, sf).count() == n1)
    assert(graft.queries.Queries.queries("q_minhash_cc")(spark, sf).count() > 0)
    assert(r1.count() == n1,
      "a held pipeline result must stay readable after later invocations")
  }
}
