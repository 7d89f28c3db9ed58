package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{MinHashLsh, Multimodal, Similarity}

/** Specs for the training-pipeline operator APIs (the SQL-query
  * counterparts are gated by the DuckDB oracle; these cover the
  * library-level Column/DataFrame API semantics). */
class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("wordNgrams produces n-2 trigrams and empty below n") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.wordNgrams(col("text"), 3).as("ng"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("hash28 is stable and within 28 bits") {
    val v = Seq("abc").toDF("s").select(TextFunctions.hash28(col("s"))).collect()(0).getLong(0)
    // md5("abc") = 900150983cd24fb0... -> 0x9001509 = 150999305
    assert(v == java.lang.Long.parseLong("9001509", 16))
    assert(v >= 0 && v < (1L << 28))
  }

  test("tokenCount handles blanks") {
    val r = Seq("a b c", "", "  ").toDF("text")
      .select(TextFunctions.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(3, 0, 0))
  }

  test("fingerprint is order-insensitive on token bags") {
    val r = Seq("b a c", "c b a", "a x").toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(r(0) == r(1) && r(0) != r(2))
  }

  test("minhash LSH finds the planted near-duplicates") {
    val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // sf0.001 corpus plants near-dup pairs with jaccard ≈ 0.97+ — LSH at
    // 16 hashes / 4 bands catches them with overwhelming probability
    assert(pairs.nonEmpty, "expected at least one planted near-dup pair")
    // survivors of dedup = docs minus one side of each dup component
    val kept = MinHashLsh.dedup(docs, "doc_id", "text").count()
    assert(kept < docs.count())
    assert(kept >= docs.count() - 2L * pairs.length)
  }

  test("cosine is 1 for identical vectors and symmetric") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(-1.0f, -2.0f, -3.0f)))
      .toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val a = df.where($"id" === 1).select($"v".as("a"))
    val b = df.where($"id" === 2).select($"v".as("b"))
    val r = a.crossJoin(b).select(
      Similarity.cosine(col("a"), col("a")).as("self"),
      Similarity.cosine(col("a"), col("b")).as("anti")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val queries = emb.where($"vec_id" % 100 === 0)
    val res = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
    val counts = res.groupBy("query_id").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) == 3L))
    // rank 1 has the max sim within each query group
    val bad = res.as("r").groupBy("query_id")
      .agg(max(when($"rnk" === 1, $"sim")).as("top"), max($"sim").as("mx"))
      .where($"top" =!= $"mx").count()
    assert(bad == 0)
  }

  test("hash28Array matches the per-element HOF form incl. null elements") {
    import graft.functions.VectorExpressions
    val df = Seq(
      (1L, Seq("abc", "def", null, "xyz q")),
      (2L, Seq.empty[String])).toDF("id", "arr")
    val both = df.select($"id",
      VectorExpressions.hash28Array($"arr").as("fused"),
      expr("transform(arr, s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT))").as("hof"))
      .collect()
    both.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"row ${r.getLong(0)}"))
    // null array -> null
    val nr = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("arr")
      .select(VectorExpressions.hash28Array($"arr")).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("minhashSignatures matches the 16 array_min(transform) walks") {
    import graft.functions.VectorExpressions
    import graft.queries.Queries.{MinhashA, MinhashB, MinhashP}
    val hs = MinHashLsh.hashedShingles(docs, "doc_id", "text")
    val fused = hs.select($"doc_id",
      VectorExpressions.minhashSignatures($"hs", MinhashA, MinhashB, MinhashP).as("sig"))
    val checks = (0 until 16).map(j =>
      s"element_at(sig, ${j + 1}) = array_min(transform(hs, h -> (${MinhashA(j)} * h + ${MinhashB(j)}) % $MinhashP))")
    val bad = fused.join(hs, "doc_id")
      .where(not(checks.map(expr).reduce(_ && _))).count()
    assert(bad == 0)
  }

  /** Sign-LSH theory: a pair at cosine sim s agrees on one hyperplane
    * with prob r = 1 - acos(s)/π, survives a band of P planes with r^P,
    * and is recalled by B bands with 1-(1-r^P)^B. */
  private def predictedRecall(sims: Seq[Double], planes: Int, bands: Int): Double =
    sims.map { s =>
      val r = 1.0 - math.acos(math.min(s, 1.0)) / math.Pi
      1.0 - math.pow(1.0 - math.pow(r, planes), bands)
    }.sum / math.max(sims.size, 1)

  test("banded LSH near-dup recall matches the (1-(1-r^P)^B) prediction") {
    // The synthetic corpus has NO true near-dups (max pairwise sim
    // ~0.5); at that sim level selective LSH params cannot recall
    // everything, so the meaningful check is precision (subset, exact
    // rerank) + recall agreeing with theory. On a real corpus with
    // sim>=0.9 dups these params predict recall 0.996.
    val exactPairs = {
      val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("sim", round(Similarity.cosine(col("a.v"), col("b.v")), 4))
        .where($"sim" >= 0.4)
        .select(col("a.vec_id"), col("b.vec_id"), col("sim"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    }
    val banded = Similarity.bandedNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(exactPairs.keySet)) // precision 1.0 by construction
    val measured = banded.size.toDouble / math.max(exactPairs.size, 1)
    val predicted = predictedRecall(exactPairs.values.toSeq, planes = 8, bands = 16)
    info(f"near-dup recall measured=$measured%.3f predicted=$predicted%.3f (n=${exactPairs.size})")
    assert(math.abs(measured - predicted) <= 0.15,
      s"measured recall $measured deviates from theory $predicted")
    // sanity: the theory DOES promise near-total recall for real dups
    assert(predictedRecall(Seq(0.9), 8, 16) > 0.99)
  }

  test("banded LSH top-k candidate recall matches theory") {
    val queries = emb.where($"vec_id" % 25 === 0)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val banded = Similarity.bandedTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = bf.count(p => banded.contains(p._1)).toDouble / bf.length
    val predicted = predictedRecall(bf.map(_._2).toSeq, planes = 8, bands = 16)
    info(f"top-k overlap measured=$overlap%.3f predicted=$predicted%.3f (n=${bf.length})")
    // overlap can only fall below candidate recall (rank displacement),
    // and not by much since the rerank is exact
    assert(overlap <= predicted + 0.1 && overlap >= predicted - 0.25,
      s"overlap $overlap inconsistent with candidate-recall theory $predicted")
  }

  test("ivfTopK operator matches the oracle-verified SQL query") {
    val queries = emb.where($"vec_id" % 25 === 0)
    val cent = emb.where($"vec_id" % 25 === 13)
    val api = Similarity.ivfTopK(emb, queries, cent, "vec_id", "embedding", k = 3)
    val sql = graft.SparkEntry.queries("q_embedding_ivf_knn")(
      spark, "/root/testdata/sf0.001")
    assertSameRows(api, sql)
  }

  test("semDedup drops only in-cluster near-dups, keeps lowest id") {
    // two orthogonal clusters; ids 1/2/3 are near-identical in cluster A
    // (1 survives as lowest), 10 is alone near centroid B, 11 is in A's
    // cell but dissimilar to everything -> survives
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.01, 0.0)),
      (3L, Seq(0.998, 0.02, 0.0)),
      (10L, Seq(0.0, 1.0, 0.0)),
      (11L, Seq(0.6, 0.0, 0.8))).toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, cents, "vec_id", "embedding", 0.95)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 0L), (10L, 1L), (11L, 0L)), s"got $out")
  }

  test("lshNearDupPairs is a subset of brute-force pairs at the same threshold") {
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force within the same frame
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val bf = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(Similarity.cosine(col("a.v"), col("b.v")), 4))
      .where($"sim" >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(bf), s"LSH produced non-near-dup pairs: ${lsh.diff(bf)}")
  }

  test("multimodal metadata/features/frames plumbing") {
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", Array.fill(256)(7.toByte)),
      Multimodal.MediaAsset(2L, "video", Array.fill(4096)(9.toByte)),
      Multimodal.MediaAsset(3L, "audio", Array.fill(512)(3.toByte))).toDS()
    val meta = Multimodal.extractMeta(assets).collect().sortBy(_.asset_id)
    assert(meta.length == 3)
    assert(meta(0).media_type == "image" && meta(0).duration_ms == 0L)
    assert(meta(1).byte_size == 4096L && meta(1).duration_ms > 0L)
    // determinism: same bytes → same metadata
    val meta2 = Multimodal.extractMeta(assets).collect().sortBy(_.asset_id)
    assert(meta.toSeq == meta2.toSeq)
    val feats = Multimodal.extractFeatures(assets, dim = 8).collect()
    assert(feats.forall(_.feature.length == 8))
    val frames = Multimodal.sampleFrames(assets)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_idx", "frame_bytes"))
    assert(frames.where($"asset_id" === 2L).count() > 0)
  }

  test("trainKMeans is deterministic and assignment-consistent with ivfTopK") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 300L).map { i =>
      // three planted clusters around orthogonal-ish directions
      val base = (i % 3).toInt
      val v = Array.tabulate(8)(d =>
        (if (d % 3 == base) 1.0 else 0.05) + rnd.nextDouble() * 0.1)
      (i, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val a = Similarity.trainKMeans(df, "vec_id", "embedding", k = 3, iterations = 3)
    val b = Similarity.trainKMeans(df.repartition(2), "vec_id", "embedding", k = 3, iterations = 3)
    assert(a.size == 3 && a.forall(_._2.length == 8))
    assert(a.map(_._1) == Seq(0L, 1L, 2L))
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq),
      "training must be reproducible across input layouts")
    // trained quantizer plugs into ivfTopK and returns valid top-k rows
    val cents = a.map { case (cid, cv) => (cid, cv.toSeq) }.toDF("vec_id", "embedding")
    val knn = Similarity.ivfTopK(df, df.where($"vec_id" < 10), cents,
      "vec_id", "embedding", k = 2, nprobe = 2)
    val rows = knn.collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length <= 2))
  }

  test("repartitionBySize bounds partition bytes under 1000:1 asset skew") {
    // 4 giant assets (256 KB) among 400 tiny ones (256 B): round-robin
    // by count could stack giants in one task; prefix-sum binning must
    // keep every partition near the byte target.
    val giants = (1L to 4L).map(i =>
      Multimodal.MediaAsset(i, "video", Array.fill(256 * 1024)((i % 100).toByte)))
    val tinies = (100L to 499L).map(i =>
      Multimodal.MediaAsset(i, "image", Array.fill(256)((i % 100).toByte)))
    val df = (giants ++ tinies).toDS().toDF().repartition(3)
    val target = 300L * 1024
    val out = Multimodal.repartitionBySize(df, target)
    val perPartition = out
      .select(length($"content").cast("long").as("b"))
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid").agg(org.apache.spark.sql.functions.sum("b").as("bytes"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("rows"))
      .collect()
    val totalBytes = 4L * 256 * 1024 + 400L * 256
    assert(perPartition.map(_.getAs[Long]("bytes")).sum == totalBytes)
    assert(perPartition.map(_.getAs[Long]("rows")).sum == 404L)
    // every partition stays within target + one max asset (a row can't split)
    val maxAsset = 256L * 1024
    perPartition.foreach { r =>
      assert(r.getAs[Long]("bytes") <= target + maxAsset,
        s"partition ${r.getAs[Int]("pid")} holds ${r.getAs[Long]("bytes")} bytes " +
          s"(> target $target + maxAsset $maxAsset)")
    }
    // and the work actually spread: more than one partition carries bytes
    assert(perPartition.count(_.getAs[Long]("bytes") > 0) >= 3)
  }

  test("minhash bucket-size cap drops only degenerate-bucket pairs") {
    import graft.operators.MinHashLsh
    // 6 identical boilerplate docs (one degenerate bucket per band) +
    // one true near-dup pair with distinct-but-similar text
    val boiler = (1L to 6L).map(i => (i, "aa bb cc dd ee ff gg hh"))
    val pairDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog today"),
      (102L, "the quick brown fox jumps over the lazy dog tonight"))
    val df = (boiler ++ pairDocs).toDF("doc_id", "text")
    val uncapped = MinHashLsh.nearDupPairs(df, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((101L, 102L)))
    assert(uncapped.count { case (a, b) => a <= 6 && b <= 6 } == 15) // 6 choose 2
    val capped = MinHashLsh.nearDupPairs(df, "doc_id", "text", 0.3, maxBucketSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((101L, 102L)), "selective-bucket pairs must survive the cap")
    assert(!capped.exists { case (a, b) => a <= 6 && b <= 6 },
      "degenerate-bucket pairs should be dropped by the cap")
  }

  test("native vec_dot / vec_l2norm match the HOF fold bit-for-bit") {
    import graft.functions.VectorExpressions
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0)),
      (2L, Seq(0.1, 0.2, 0.3), Seq(0.9, 0.8, 0.7))).toDF("id", "a", "b")
    val r = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("nd"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, y) => acc + y).as("hd"),
      VectorExpressions.l2Norm(col("a")).as("nn"),
      sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x)).as("hn"))
      .collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1), "dot mismatch")
      assert(row.getDouble(2) == row.getDouble(3), "norm mismatch")
    }
    // null array → null
    val n = Seq((1L, null.asInstanceOf[Seq[Double]], Seq(1.0)))
      .toDF("id", "a", "b")
      .select(VectorExpressions.dot(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("salted dedup matches unsalted on a planted hot key") {
    import graft.operators.Dedup
    // 20k rows on ONE hot key + 1k scattered — the shape that OOMs a
    // single-reducer window at scale
    val hot = (1L to 20000L).map(i => ("hot", i))
    val rest = (1L to 1000L).map(i => (s"k${i % 97}", 100000L + i))
    val df = (hot ++ rest).toDF("k", "id").repartition(8)
    val expected = Dedup.dropDuplicatesOrdered(df, Seq("k"), Seq(col("id").asc))
    val salted = Dedup.dropDuplicatesOrderedSalted(df, Seq("k"), Seq(col("id").asc), salts = 8)
    assertSameRows(salted, expected)
    // survivor of the hot group is the global minimum id
    assert(salted.where(col("k") === "hot").select("id").collect()(0).getLong(0) == 1L)
  }

  test("simhash16 stays within 16 bits and is stable") {
    val r = docs.limit(50)
      .select(TextFunctions.simhash16(
        transform(array_distinct(TextFunctions.tokens(col("text"))),
          t => TextFunctions.hash28(t))).as("sh"))
      .collect().map(_.getLong(0))
    assert(r.forall(v => v >= 0 && v < 65536))
    assert(r.distinct.length > 1)
  }

  test("asOf attaches the latest right row at or before each left time") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 4L, "early"), (2L, 50L, "other"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100L), (1L, 15L, 200L), (1L, 20L, 300L), (3L, 1L, 999L))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"),
        r.getAs[Long]("asof_rt"), r.getAs[Long]("asof_rv"))).toSet
    assert(out == Set(
      (1L, 10L, 5L, 100L),   // latest <= 10 is rt=5
      (1L, 20L, 20L, 300L))) // tie: right row AT t is visible (<= semantics)
    // left rows with no prior right row (k=1 t=4; k=2) are dropped (inner);
    // unmatched right keys (k=3) never appear
  }

  test("asOf right-side ties broken by rightOrder, last wins") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 1L, 111L), (1L, 10L, 2L, 222L)).toDF("k", "rt", "seq", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"), rightOrder = Seq("seq"))
      .collect()(0)
    assert(out.getAs[Long]("asof_rv") == 222L)
  }

  test("asOf carries the latest right ROW atomically when a value is NULL") {
    import graft.operators.AsOfJoin
    // the latest right row has rv=NULL; a per-column carry would stitch
    // the older row's rv=100 onto the newer row's time (a row that
    // never existed) — the DuckDB ASOF JOIN contract returns (15, NULL)
    val left = Seq((1L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some(100L)), (1L, 15L, None)).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv")).collect()(0)
    assert(out.getAs[Long]("asof_rt") == 15L)
    assert(out.isNullAt(out.fieldIndex("asof_rv")), "NULL value must come through, not an older row's value")
  }

  test("asOf forward direction attaches the earliest right row at or after") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L), (1L, 21L), (1L, 99L)).toDF("k", "t")
    val right = Seq((1L, 5L, 100L), (1L, 15L, 200L), (1L, 21L, 300L))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"),
      direction = "forward")
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Long]("asof_rt"),
        r.getAs[Long]("asof_rv"))).toSet
    assert(out == Set(
      (10L, 15L, 200L),  // earliest >= 10 is rt=15
      (21L, 21L, 300L))) // equal time visible in forward too
    // t=99 has no later right row -> dropped (inner semantics)
  }

  test("asOf tolerance drops matches beyond the window") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L), (1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 8L, 100L), (1L, 50L, 200L)).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"),
      tolerance = Some(lit(5L)))
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Long]("asof_rt"))).toSet
    // t=10 matches rt=8 (distance 2 <= 5); t=100's latest is rt=50
    // (distance 50 > 5) -> dropped
    assert(out == Set((10L, 8L)))
  }

  test("pointInInterval matches the naive inequality join exactly") {
    import graft.operators.RangeJoin
    // random-ish deterministic intervals/points incl. bin-boundary cases
    val intervals = (1L to 40L).map { i =>
      val s0 = (i * 37) % 200
      (i % 3, i, s0, s0 + (i * 13) % 60)
    }.toDF("k", "iid", "s", "e")
    val points = (1L to 120L).map { p => (p % 3, p, (p * 29) % 260) }
      .toDF("k", "pid", "t")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e", binWidth = 50)
      .select("k", "iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = points.join(intervals, Seq("k"))
      .where(col("t") >= col("s") && col("t") <= col("e"))
      .select("k", "iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty)
    // exactly-once: no duplicate (interval, point) pairs from multi-bin intervals
    val n = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e", 50).count()
    assert(n == got.size)
    // negative coordinates: floor-division binning must stay monotonic
    // (Spark floor(-1/50.0) = -1, not 0 — truncation would mis-bin)
    val negI = Seq((1L, 1L, -120L, -30L), (1L, 2L, -10L, 40L)).toDF("k", "iid", "s", "e")
    val negP = Seq((1L, 1L, -100L), (1L, 2L, -40L), (1L, 3L, 0L), (1L, 4L, -121L))
      .toDF("k", "pid", "t")
    val negGot = RangeJoin.pointInInterval(negP, negI, Seq("k"), "t", "s", "e", 50)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negGot == Set((1L, 1L), (1L, 2L), (2L, 3L)))
    // coordinates beyond 2^53 (raw epoch-nanos territory): double
    // division rounds adjacent longs to the same quotient, so integer
    // DIV binning is required for point and interval bins to agree
    val base = (1L << 60) + 12345L // not representable exactly as double
    val bigI = Seq((1L, 1L, base, base + 10L), (1L, 2L, base + 100L, base + 120L))
      .toDF("k", "iid", "s", "e")
    val bigP = Seq((1L, 1L, base + 5L), (1L, 2L, base + 110L), (1L, 3L, base + 50L))
      .toDF("k", "pid", "t")
    val bigGot = RangeJoin.pointInInterval(bigP, bigI, Seq("k"), "t", "s", "e", 7L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigGot == Set((1L, 1L), (2L, 2L)))
  }

  test("asOf rejects inputs colliding with its reserved/output names") {
    import graft.operators.AsOfJoin
    val right = Seq((1L, 10L, "a")).toDF("k", "rt", "rv")
    val badLeft = Seq((1L, 11L, "x")).toDF("k", "t", "asof_rt")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right, Seq("k"), "t", "rt", Seq("rv"))
    }
    assert(e1.getMessage.contains("asof_rt"))
    val badLeft2 = Seq((1L, 11L, "x")).toDF("k", "t", "__tag")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft2, right, Seq("k"), "t", "rt", Seq("rv"))
    }
    val left = Seq((1L, 11L)).toDF("k", "t")
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv", "rt"))
    }
    assert(e3.getMessage.contains("rightTime"))
  }

  test("packSequences assigns bins by exclusive prefix sum within groups") {
    import graft.operators.Packing
    val df = Seq(
      ("en", 1L, 600L), ("en", 2L, 600L), ("en", 3L, 600L), ("en", 4L, 600L),
      ("en", 5L, 3000L), // oversized doc: starts mid-bin, straddles
      ("de", 1L, 100L))
      .toDF("lang", "id", "n")
    val out = Packing.packSequences(df, "id", "n", budget = 1000L, groupCols = Seq("lang"))
      .collect().map(r => ((r.getAs[String]("lang"), r.getAs[Long]("id")),
        (r.getAs[Long]("bin_id"), r.getAs[Long]("bin_offset")))).toMap
    assert(out(("en", 1L)) == (0L, 0L))    // before=0
    assert(out(("en", 2L)) == (0L, 600L))  // before=600
    assert(out(("en", 3L)) == (1L, 200L))  // before=1200
    assert(out(("en", 4L)) == (1L, 800L))  // before=1800
    assert(out(("en", 5L)) == (2L, 400L))  // before=2400
    assert(out(("de", 1L)) == (0L, 0L))    // groups pack independently
    // bins are contiguous in id order: ids sorted per group must have
    // non-decreasing bin_id with no gaps
    val byGroup = Packing.packSequences(df, "id", "n", 1000L, Seq("lang"))
      .collect().groupBy(_.getAs[String]("lang"))
    byGroup.values.foreach { rows =>
      val bins = rows.sortBy(_.getAs[Long]("id")).map(_.getAs[Long]("bin_id")).toSeq
      assert(bins == bins.sorted, s"bin ids must be non-decreasing in id order: $bins")
      assert(bins.distinct == (bins.min to bins.max).toSeq, s"bin ids must be gap-free: $bins")
    }
  }

  test("connected components: chains, cycles, stars, and determinism") {
    import graft.operators.ConnectedComponents
    import spark.implicits._
    // long chain (worst case for plain label propagation), a cycle,
    // a star, an isolated pair — mixed ids, duplicate + reversed edges
    val chain = (0L until 20L).map(i => (100L + i, 101L + i))   // 100..120
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val star = Seq((50L, 60L), (50L, 61L), (50L, 62L))
    val pair = Seq((900L, 800L))                                // reversed order
    val edges = (chain ++ cycle ++ star ++ pair ++ chain.map(_.swap))
      .toDF("a", "b")
    // threshold default -> driver union-find; 0 -> distributed
    // large-star/small-star; identical contract required of both
    for (threshold <- Seq(500000L, 0L)) {
      val comp = ConnectedComponents.components(edges, "a", "b",
        smallGraphThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert((100L to 120L).forall(comp(_) == 100L), s"chain($threshold): $comp")
      assert(Seq(1L, 2L, 3L).forall(comp(_) == 1L))
      assert(Seq(50L, 60L, 61L, 62L).forall(comp(_) == 50L))
      assert(comp(800L) == 800L && comp(900L) == 800L)
      assert(comp.size == 21 + 3 + 4 + 2, "every node exactly once")
    }
    // empty edge list → empty assignment
    assert(ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0L)
  }

  test("dedupConnected keeps one doc per transitive near-dup chain") {
    import graft.operators.MinHashLsh
    import spark.implicits._
    // A≈B, B≈C by construction (shared shingles), A and C farther apart;
    // unique docs survive untouched.
    val base = (0 until 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extraB"),
      (3L, base + " extraB extraC"),
      (10L, (100 until 140).map(i => s"zz$i").mkString(" ")),
      (11L, (200 until 240).map(i => s"qq$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = MinHashLsh.dedupConnected(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(10L) && kept.contains(11L))
    assert(kept.intersect(Set(1L, 2L, 3L)) == Set(1L),
      s"one survivor for the 1-2-3 chain, the min id: $kept")
    // components view maps every doc, chain collapsed to min id
    val comps = MinHashLsh.nearDupComponents(docs, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 11L)
  }
}
