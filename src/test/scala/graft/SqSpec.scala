package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Sq}

class SqSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.0, 0.0, 10.0, 10.0)),
    (2L, Seq(0.1, 0.0, 10.0, 10.1)),
    (3L, Seq(5.0, 5.0, 0.0, 0.0)),
    (4L, Seq(5.1, 5.0, 0.1, 0.0))).toDF("vec_id", "embedding")

  test("trainBounds returns per-dimension corpus min/max") {
    val (mns, mxs) = Sq.trainBounds(vecs, "embedding")
    assert(mns.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    assert(mxs.toSeq == Seq(5.1, 5.0, 10.0, 10.1))
  }

  test("sqCodes clamps to [0, levels-1] and zeroes degenerate dims") {
    // third column is constant -> degenerate (mn = mx) -> code 0
    val df = Seq(
      (1L, Seq(0.0, 10.0, 7.0)),
      (2L, Seq(10.0, 0.0, 7.0)),
      (3L, Seq(5.0, 5.0, 7.0))).toDF("vec_id", "embedding")
    val (mns, mxs) = Sq.trainBounds(df, "embedding")
    val codes = df.select(col("vec_id"),
        Sq.sqCodes(col("embedding"), mns.toSeq, mxs.toSeq).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(1L) == Seq(0L, 255L, 0L))
    assert(codes(2L) == Seq(255L, 0L, 0L))
    assert(codes(3L) == Seq(127L, 127L, 0L))
    assert(codes.values.flatten.forall(c => c >= 0L && c <= 255L))
  }

  test("codeDist is the exact integer squared distance") {
    val df = Seq((Seq(0L, 3L, 255L), Seq(4L, 0L, 255L))).toDF("a", "b")
    val d = df.select(Sq.codeDist(col("a"), col("b"))).head().getLong(0)
    assert(d == 16L + 9L + 0L)
  }

  test("ivfSqTopK ranks the true near neighbor first (all cells probed)") {
    val coarse = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 1, k = 2,
      iterations = 2)
    val (mns, mxs) = Sq.trainBounds(vecs, "embedding")
    val out = Sq.ivfSqTopK(vecs, vecs.where(col("vec_id") === 1L),
        "vec_id", "embedding", coarse, mns, mxs,
        kNeighbors = 3, nprobe = 2)
      .orderBy("rnk").collect()
    assert(out.length == 3)
    assert(out.head.getLong(1) == 2L,
      s"expected neighbor 2 first, got ${out.head.getLong(1)}")
    // distances are exact integers and non-decreasing in rank
    val dists = out.map(_.getLong(2)).toSeq
    assert(dists == dists.sorted)
  }

  test("ivfSqTopK with nprobe=1 bounds candidates to the probed cell") {
    val coarse = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 1, k = 2,
      iterations = 2)
    val (mns, mxs) = Sq.trainBounds(vecs, "embedding")
    val out = Sq.ivfSqTopK(vecs, vecs.where(col("vec_id") === 1L),
        "vec_id", "embedding", coarse, mns, mxs,
        kNeighbors = 3, nprobe = 1).collect()
    // only vec 2 shares vec 1's cell in this two-cluster layout
    assert(out.map(_.getLong(1)).toSet == Set(2L))
  }
}
