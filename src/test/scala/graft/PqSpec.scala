package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

class PqSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated clusters per half of the vector
  private def vecs = Seq(
    (1L, Seq(0.0, 0.0, 10.0, 10.0)),
    (2L, Seq(0.1, 0.0, 10.0, 10.1)),
    (3L, Seq(5.0, 5.0, 0.0, 0.0)),
    (4L, Seq(5.1, 5.0, 0.1, 0.0))).toDF("vec_id", "embedding")

  test("trainCodebooks produces m*k deterministic entries") {
    val b1 = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    val b2 = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    assert(b1.size == 4)
    assert(b1.map(x => (x._1, x._2, x._3.toSeq)) ==
      b2.map(x => (x._1, x._2, x._3.toSeq)))
    assert(b1.forall(_._3.length == 2))
  }

  test("encode groups near-identical vectors to the same codes") {
    val books = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1L) == codes(2L), s"${codes(1L)} vs ${codes(2L)}")
    assert(codes(3L) == codes(4L))
    assert(codes(1L) != codes(3L))
  }

  test("adcTopK ranks the true near neighbor first") {
    val books = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", books)
    val out = Pq.adcTopK(codes, vecs.where(col("vec_id") === 1L),
      "vec_id", "embedding", books, kNeighbors = 2).collect()
    assert(out.length == 2)
    val first = out.find(_.getInt(3) == 1).get
    assert(first.getLong(1) == 2L,
      s"expected neighbor 2 first, got ${first.getLong(1)}")
  }

  test("ivfPqTopK agrees with brute-force ADC when probing all cells") {
    val books = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    val coarse = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 1, k = 2,
      iterations = 2)
    val codes = Pq.encode(vecs, "vec_id", "embedding", books)
    val queries = vecs.where(col("vec_id") === 1L)
    val full = Pq.adcTopK(codes, queries, "vec_id", "embedding", books,
      kNeighbors = 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    // nprobe = k_coarse: every cell probed -> candidate set is the
    // whole corpus, so results must equal the brute-force ADC ranking
    val ivf = Pq.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      coarse, books, kNeighbors = 3, nprobe = 2).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(ivf == full, s"ivf=$ivf full=$full")
  }

  test("ivfPqTopK with nprobe=1 bounds candidates to the query cell") {
    val coarse = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 1, k = 2,
      iterations = 2)
    val books = Pq.trainCodebooks(vecs, "vec_id", "embedding", m = 2, k = 2,
      iterations = 2)
    val out = Pq.ivfPqTopK(vecs, vecs.where(col("vec_id") === 1L),
      "vec_id", "embedding", coarse, books, kNeighbors = 3, nprobe = 1)
      .collect().map(_.getLong(1)).toSet
    // vectors 1,2 cluster together; 3,4 in the other cell -> only 2
    assert(out == Set(2L), out.toString)
  }

  test("trainCodebooksMulti equals per-spec trainCodebooks bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val specs = Seq((1, 8), (4, 16))
    val multi = Pq.trainCodebooksMulti(emb, "vec_id", "embedding", specs,
      iterations = 2)
    specs.zipWithIndex.foreach { case ((m, k), si) =>
      val single = Pq.trainCodebooks(emb, "vec_id", "embedding", m, k,
        iterations = 2)
      assert(multi(si).map { case (j, c, v) => (j, c, v.toSeq) } ==
        single.map { case (j, c, v) => (j, c, v.toSeq) },
        s"spec (m=$m, k=$k) diverged")
    }
  }
}
