package graft

import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric pair is a fixed point at score = scale") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)))
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph matches the hand-computed integer recurrence") {
    // center 1 <-> leaves 2, 3; three exact int64 iterations
    val r = ranks(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
    assert(r == Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L),
      s"got $r")
  }

  test("dangling-node mass vanishes (documented simplification)") {
    val r = ranks(Seq((1L, 2L))) // 2 has no out-edges
    assert(r == Map(1L -> 150000L, 2L -> 277500L), s"got $r")
  }

  test("result is independent of input partitioning") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
    val df1 = edges.toDF("src", "dst").repartition(7)
    val df2 = edges.toDF("src", "dst").coalesce(1)
    val r1 = PageRank.pageRank(df1, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = PageRank.pageRank(df2, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    // fully symmetric triangle: all nodes equal, at the fixed point
    assert(r1.values.toSet.size == 1)
  }

  test("zero iterations returns the uniform initial scores") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 0)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }
}
