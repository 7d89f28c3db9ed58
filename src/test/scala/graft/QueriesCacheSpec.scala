package graft

/** Library block hygiene for the checkpoint-staged pipelines: shared
  * stages materialize via localCheckpoint (see Queries.cachedStagesQuery
  * — CacheManager substitution was measured to MISS the stage subtrees,
  * so persist() paid without serving), and a new pipeline invocation
  * must free the previous invocation's checkpoint blocks. Assertions
  * are delta-based — the SparkContext is shared across every suite, so
  * absolute persistent-RDD counts would flake on foreign blocks. */
class QueriesCacheSpec extends SparkTestBase {

  test("stage checkpoints materialize per run and do not leak across runs") {
    val sf = "/root/testdata/sf0.001"
    val fn = graft.queries.Queries.queries("q_minhash_dedup")
    assert(fn(spark, sf).count() > 0)
    val after1 = spark.sparkContext.getPersistentRDDs.size
    // the stage views exist but are NOT CacheManager entries (no
    // plan-matching fragility, no suite-wide compare cost)
    Seq("g_hsh", "g_sig", "g_buckets").foreach { v =>
      assert(!spark.catalog.isCached(v),
        s"stage view $v must be checkpoint-backed, not CacheManager-cached")
    }
    // a second invocation unpersists the first's blocks before
    // checkpointing its own: net persistent-RDD count must not grow
    assert(fn(spark, sf).count() > 0)
    val after2 = spark.sparkContext.getPersistentRDDs.size
    assert(after2 <= after1,
      s"stage checkpoint blocks leaked across runs: $after1 -> $after2")
  }
}
