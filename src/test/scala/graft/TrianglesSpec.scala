package graft

import graft.operators.Triangles

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def perNode(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node participates in 3 of the 4 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(perNode(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a square has no triangles; adding one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(perNode(square) == Map.empty)
    // diagonal 1-3: triangles (1,2,3) and (1,3,4)
    assert(perNode(square :+ (1L, 3L)) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("orientation, duplicates and self-loops are canonicalized away") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L), (2L, 3L))
    // canonical edge set = {(1,2),(2,3),(1,3)} -> one triangle
    assert(perNode(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
