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

  test("trainPermutation is a variance-balanced permutation") {
    // variance lives in dims 0 and 1; m=2 must split them apart
    val rnd = new scala.util.Random(7)
    val df = (0 until 60).map { i =>
      (i.toLong, Seq(rnd.nextGaussian() * 10, rnd.nextGaussian() * 10,
        rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1))
    }.toDF("vec_id", "embedding")
    val perm = Pq.trainPermutation(df, "embedding", m = 2)
    assert(perm.sorted == (0 until 4), s"not a permutation: $perm")
    val sub0 = perm.slice(0, 2).toSet
    assert(sub0.count(Set(0, 1)) == 1,
      s"high-variance dims 0,1 must split across subspaces: $perm")
    // determinism across retrains
    assert(Pq.trainPermutation(df, "embedding", m = 2) == perm)
  }

  test("permute reorders columns and preserves L2 distances") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    val out = df.select(Pq.permute(col("embedding"), Seq(2, 0, 3, 1)))
      .head().getSeq[Double](0)
    assert(out == Seq(3.0, 1.0, 4.0, 2.0))
  }

  test("OPQ permutation improves PQ recall on a variance-skewed corpus") {
    // the q_embedding_opq_knn premise at spec scale: concentrate the
    // corpus variance in one contiguous slice (exact binary scalings),
    // then plain PQ wastes 3 of 4 subspace budgets while the balanced
    // permutation spreads the energy — recall@3 vs exact must improve
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val skew = emb.select(col("vec_id"),
      expr("transform(embedding, (x, i) -> x * " +
        "(CASE WHEN i < 16 THEN 4.0D ELSE 0.25D END))").as("embedding"))
      .localCheckpoint()
    val queries = skew.where(col("vec_id") % 5 === 0)

    def top3(books: Seq[(Int, Long, Array[Double])],
        corpus: org.apache.spark.sql.DataFrame,
        qs: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val codes = Pq.encode(corpus, "vec_id", "embedding", books)
      Pq.adcTopK(codes, qs, "vec_id", "embedding", books, kNeighbors = 3)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    }
    // exact squared-L2 ground truth (ADC's metric; permutation-
    // invariant, so computed once unrotated)
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val c = skew.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("d", round(Pq.l2sq(col("qv"), col("cv")), 4))
        .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("d"), col("neighbor_id"))))
        .where(col("rnk") <= 3)
        .select("query_id", "neighbor_id")
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rs) => qid -> rs.map(_.getLong(1)).toSet }
    }
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / t.size
      }.sum / exact.size

    val plainBooks = Pq.trainCodebooks(
      skew, "vec_id", "embedding", m = 4, k = 16, iterations = 2)
    val rPlain = recall(top3(plainBooks, skew, queries))

    val perm = Pq.trainPermutation(skew, "embedding", m = 4)
    assert(perm.sorted == (0 until 64), "must be a 64-dim permutation")
    val permuted = skew.select(col("vec_id"),
      Pq.permute(col("embedding"), perm).as("embedding")).localCheckpoint()
    val opqBooks = Pq.trainCodebooks(
      permuted, "vec_id", "embedding", m = 4, k = 16, iterations = 2)
    val rOpq = recall(top3(opqBooks, permuted,
      permuted.where(col("vec_id") % 5 === 0)))

    assert(rOpq > rPlain,
      f"OPQ recall $rOpq%.3f must beat plain PQ $rPlain%.3f at equal (m,k)")
  }
}
