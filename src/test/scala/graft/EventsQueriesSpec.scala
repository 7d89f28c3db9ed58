package graft

/** Guards the schema-adaptive events.ts accessor against testdata
  * regeneration (the round-5 failure mode: the driver rewrote
  * events.parquet from TIMESTAMP(NANOS) to timestamp[us] and every
  * event-time query failed analysis, invisible to a suite that never
  * read the events table). Every event-time query family must analyze
  * and produce rows against the CURRENT events.parquet: batch queries
  * via limit(1), streaming queries via a full (tiny at sf0.001)
  * AvailableNow drain. */
class EventsQueriesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  for (q <- Seq("q_asof_join", "q_range_join", "q_sessionize",
      "q_updated_partitions", "q_json_extract", "q_funnel",
      "q_retention", "q_session_paths", "q_decay_engagement",
      "q_attribution"))
    test(s"$q analyzes and returns rows against the current events schema") {
      val df = graft.queries.Queries.queries(q)(spark, sf)
      assert(df.limit(1).collect().nonEmpty, s"$q returned no rows at sf0.001")
    }

  // one windowed-agg stream and the typed (Dataset-encoded) stream cover
  // both streaming accessor shapes (the others reuse the same exprs);
  // the stream-static join additionally reads customer columns
  for (q <- Seq("q_stream_counts", "q_stream_sessionize",
      "q_stream_static_join"))
    test(s"$q drains against the current events schema") {
      val df = graft.queries.Queries.queries(q)(spark, sf)
      assert(df.count() > 0, s"$q drained to an empty result at sf0.001")
    }
}
