package graft

import graft.operators.KCore

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Option[Int] = None): Set[Long] =
    KCore.core(edges.toDF("a", "b"), "a", "b", k, rounds)
      .collect().map(_.getLong(0)).toSet

  test("pendant chain peels away, the triangle survives at k=2") {
    // 1-2-3 triangle with a tail 3-4-5: deleting 5 (deg 1) drops 4 to
    // deg 1, then 4 drops — a 2-round cascade the peel must follow
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(edges, 2) == Set(1L, 2L, 3L))
    assert(core(edges, 3) == Set.empty[Long])
    assert(core(edges, 1) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("bounded rounds at or past the fixpoint equal the fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 8L))
    val fix = core(edges, 2)
    assert(core(edges, 2, rounds = Some(8)) == fix)
    assert(core(edges, 2, rounds = Some(12)) == fix)
    // one round only peels the FIRST wave (strictly more survivors
    // than the fixpoint when a cascade exists)
    assert(core(edges, 2, rounds = Some(1)).size > fix.size)
  }

  test("matches a brute-force peel on a hashed pseudo-random graph") {
    val edges = (0 until 300).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"e$i")
      ((h & 0x7fffffff) % 40L, ((h >> 8) & 0x7fffffff) % 40L)
    }.filter(e => e._1 != e._2).distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) += b; adj(b) += a }
    var alive = adj.keySet.toSet
    var changed = true
    while (changed) {
      val next = alive.filter(n => (adj(n) & alive).size >= 4)
      changed = next != alive
      alive = next
    }
    assert(core(edges, 4) == alive)
  }
}
