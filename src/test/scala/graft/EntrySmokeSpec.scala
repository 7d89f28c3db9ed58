package graft

/** Mirrors the driver's smoke check: `SparkEntry.entry` must work on a
  * session that did NOT pre-configure our parquet-nanos setting (the
  * driver owns its own builder). */
class EntrySmokeSpec extends SparkTestBase {
  test("entry runs without pre-set nanos config and returns rows") {
    val vanilla = spark.newSession()
    vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val n = SparkEntry.entry(vanilla).count()
    assert(n > 0, "entry must return rows for the driver smoke check")
  }

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles missing a query: ${(o -- q).toSeq.sorted}")
  }
}
