package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Embedding similarity search over an `Array[Float]`/`Array[Double]`
  * column: brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketing as the scale path (candidates shrink
  * from O(n·q) to bucket-local).
  */
object Similarity {

  /** Index-ordered cosine similarity (deterministic accumulation order —
    * reproducible across engines). Backed by the native codegen'd
    * [[graft.functions.VectorExpressions]] (same left-fold arithmetic as
    * the HOF form it replaced). NULL on ragged input: unequal-length or
    * null-element vectors yield null (the `aggregate(zip_with(...))`
    * contract), so such pairs drop out of every thresholded result —
    * validate embedding dims upstream if raggedness is possible. */
  def cosine(a: Column, b: Column): Column =
    VectorExpressions.dot(a, b) / (norm(a) * norm(b))

  def norm(v: Column): Column = VectorExpressions.l2Norm(v)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force top-k neighbors for each query row. `queries` and
    * `corpus` both carry (idCol, vecCol); self-pairs excluded. The
    * query side is broadcast — at scale the corpus stays partitioned
    * and never shuffles. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val sims = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Deterministic pseudo-random hyperplane for LSH: component i of
    * plane p = (hash-derived value in [-1, 1]). Seeded by (p, i), no
    * RNG state. */
  private def planeComponent(p: Int, i: Column): Column =
    (conv(substring(md5(concat_ws("_", lit(p), i)), 1, 7), 16, 10).cast("long")
      .cast("double") / lit(134217728.0)) - 1.0 // 2^27

  /** Sign-bucket key from `numPlanes` hyperplanes: bit p = sign of the
    * projection onto plane p. Vectors in the same bucket are likely
    * cosine-close; near-dup search then only joins within buckets. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column = {
    val dims = size(vec)
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(1), dims), (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Candidate near-dup pairs within LSH buckets, verified with exact
    * cosine ≥ threshold. */
  def lshNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 8): DataFrame = {
    val withBucket = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), numPlanes))
    val a = withBucket.select(col(idCol).as("id_a"), col("v").as("va"), col("bucket"))
    val b = withBucket.select(col(idCol).as("id_b"), col("v").as("vb"), col("bucket"))
    a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  // ---- banded (multi-table) LSH — the 100TB-shaped ANN path ----------------
  //
  // One sign-bucket table has recall (1-θ/π)^planes per pair; B bands of P
  // planes each recover recall 1-(1-r^P)^B while keeping candidate counts
  // bucket-local (same banding idea as MinHash-LSH). At larger corpus
  // sizes, raise planesPerBand (buckets per band = 2^P) so per-bucket
  // membership stays bounded: P ≈ log2(n / targetBucketSize).

  /** Deterministic hyperplane matrix: component i (1-based) of global
    * plane q is `md5("q_i")`'s leading-7-hex-digits value, scaled to
    * [-1, 1). Pure md5 arithmetic — bit-identical to the SQL formula
    * `conv(substring(md5(concat(q, '_', i)), 1, 7), 16, 10) / 2^27 - 1`
    * used by the DuckDB oracle, but materialized ONCE driver-side and
    * shipped as plan constants instead of re-hashed per row·dim. */
  def planeMatrix(numPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dims) { (q, i0) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${q}_${i0 + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      java.lang.Long.parseLong(hex, 16) / 134217728.0 - 1.0
    }

  /** (id, band, k) bucket rows: one row per input row per band. The
    * projection is rounded to 6 decimals before the sign test so both
    * engines agree near zero. One [[VectorExpressions.lshBandKeys]]
    * evaluation per row (single codegen'd loop over the constant plane
    * matrix) + posexplode — replaces the earlier B×P-separate-dot
    * projection that dominated these queries' janino and execution
    * cost. */
  private def bandedBuckets(
      n: DataFrame, idCol: String, bands: Int, planesPerBand: Int,
      dims: Int): DataFrame = {
    val planes = planeMatrix(bands * planesPerBand, dims)
    n.select(col(idCol),
      posexplode(VectorExpressions.lshBandKeys(col("v"),
        planes.map(_.toSeq).toSeq, bands, planesPerBand)))
      .toDF(idCol, "band", "k")
  }

  /** Near-dup pairs via banded LSH candidates + exact cosine rerank.
    * Plan shape: bucket-key equi-join (shuffle on (band, k)) → distinct
    * pairs → two id-equi-joins for the exact verify. No all-pairs join,
    * no label blocking — candidate volume tracks true-dup volume. */
  def bandedNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bands: Int = 16, planesPerBand: Int = 8, dims: Int = 64): DataFrame = {
    val n = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val buckets = bandedBuckets(n, "id", bands, planesPerBand, dims)
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.k") === col("y.k") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("sim", round(
        VectorExpressions.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** IVF-Flat approximate top-k (the second scale path besides banded
    * LSH): assign every corpus vector to its nearest centroid via a
    * broadcast join + `max_by` (the n×C expansion collapses map-side —
    * partial aggregation — before any exchange), probe each query's
    * `nprobe` nearest cells, and rerank exactly within them. Candidates
    * shuffle only on the cell id. `centroids` is caller-provided
    * (trained k-means, or any deterministic coarse quantizer); at scale
    * grow it ~√n so cells stay bounded. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val n = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cent = centroids.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cnrm", norm(col("cv")))
    val sims = n.crossJoin(broadcast(cent))
      .withColumn("csim", round(
        VectorExpressions.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4))
      .select("id", "cid", "csim")
    val assign = sims.groupBy("id")
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"))
    val qids = queries.select(col(idCol).as("id")).distinct()
    val qw = Window.partitionBy("id").orderBy(col("csim").desc, col("cid"))
    val probe = sims.join(broadcast(qids), "id")
      .withColumn("cr", row_number().over(qw)).where(col("cr") <= nprobe)
      .select(col("id").as("query_id"), col("cid"))
    val cand = probe.join(assign, "cid")
      .where(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .distinct()
    val qs = n.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cs = n.select(col("id").as("neighbor_id"), col("v").as("cv2"), col("nrm").as("cn"))
    val rer = cand.join(qs, "query_id").join(cs, "neighbor_id")
      .withColumn("sim", round(
        VectorExpressions.dot(col("qv"), col("cv2")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    rer.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** SemDeDup-style cluster-bucketed embedding near-dedup (the k-means
    * bucketing shape of Abbas et al., "SemDeDup", arXiv:2303.09540):
    * assign every vector to its max-cosine centroid, compute pairwise
    * cosine ONLY within a cluster, and drop every row whose similarity
    * to a LOWER-id row of the same cluster reaches `threshold` — the
    * deterministic keep-lowest-id variant of the paper's
    * keep-one-per-duplicate-group. Returns surviving (id, cid).
    *
    * Scale shape: candidates are cluster-bucketed — Σ cluster² work,
    * tunable via k — the semantic-bucket analogue of the banded-LSH
    * path (which buckets by random hyperplane signs instead).
    * Assignment is one broadcast pass; the in-cluster self-join
    * shuffles on cid only. The largest cluster bounds the worst task:
    * raise k (or pre-split hot cells) to cap it. Assignment ties break
    * to the lower centroid id, matching [[ivfTopK]]. */
  def semDedup(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val n = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cent = centroids.select(col(idCol).as("cid"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cnrm", norm(col("cv")))
    val assign = n.crossJoin(broadcast(cent))
      .withColumn("csim", round(
        VectorExpressions.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")), 4))
      .groupBy("id")
      .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    val a = assign.select(col("cid"), col("id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assign.select(col("cid"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(
        VectorExpressions.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .where(col("sim") >= threshold)
      .select(col("id_b").as("id")).distinct()
    assign.join(dropped, Seq("id"), "left_anti").select(col("id"), col("cid"))
  }

  /** Deterministic k-means training for the IVF coarse quantizer.
    *
    * - Seeding is data-derived and fixed: the k rows whose ids hash
    *   lowest under md5 (no RNG state, same seed set every run).
    * - Assignment matches [[ivfTopK]]'s rule exactly (max cosine,
    *   ties to the lower centroid id), so a corpus vector trains
    *   toward the same cell it will later be probed in.
    * - Each iteration is one broadcast-join assignment pass plus one
    *   (cid, dim) average — both map-side partial-aggregable; the
    *   driver only ever holds k×dims doubles.
    * - Centroid components are rounded to `roundDp` decimals per
    *   iteration, absorbing float reduce-order noise so the trained
    *   quantizer is reproducible run to run.
    *
    * Returns (cid 0..k-1, centroid) pairs; empty cells keep their
    * previous centroid. */
  def trainKMeans(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int = 3, roundDp: Int = 6): Seq[(Long, Array[Double])] = {
    require(k > 0 && iterations >= 0, s"need k > 0, iterations >= 0 (got $k, $iterations)")
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    var centroids: Seq[(Long, Array[Double])] = n
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => i.toLong -> r.getSeq[Double](1).toArray }
      .toSeq
    val dims = centroids.headOption.map(_._2.length).getOrElse(0)
    (1 to iterations).foreach { _ =>
      val centDf = centroids.map { case (cid, cv) => (cid, cv.toSeq) }
        .toDF("cid", "cv")
        .withColumn("cnrm", norm(col("cv")))
      val assign = n.crossJoin(broadcast(centDf))
        .withColumn("csim", round(
          VectorExpressions.dot(col("v"), col("cv")) / (norm(col("v")) * col("cnrm")), 4))
        .groupBy("id")
        .agg(max_by(col("cid"), struct(col("csim"), -col("cid"))).as("cid"),
          first(col("v")).as("v"))
      val means = assign
        .select(col("cid"), posexplode(col("v")))
        .groupBy("cid", "pos")
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val arr = new Array[Double](dims)
          rows.foreach { r =>
            arr(r.getInt(1)) =
              BigDecimal(r.getDouble(2)).setScale(roundDp, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
          }
          cid -> arr
        }
      centroids = centroids.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
    }
    centroids
  }

  /** Approximate top-k: banded-LSH candidates (queries join the corpus
    * only within shared buckets) + exact cosine rerank + per-query
    * window. The corpus is never broadcast-nested-looped; both sides
    * shuffle on (band, k), candidates per query ≈ corpus × 2^-P × B. */
  def bandedTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bands: Int = 16, planesPerBand: Int = 8, dims: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = queries.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cb = bandedBuckets(c, "id", bands, planesPerBand, dims)
    val qb = bandedBuckets(q, "id", bands, planesPerBand, dims)
    val cand = qb.as("q")
      .join(cb.as("c"),
        col("q.band") === col("c.band") && col("q.k") === col("c.k") &&
          col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"))
      .distinct()
    val qs = q.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cs = c.select(col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val sims = cand.join(qs, "query_id").join(cs, "neighbor_id")
      .withColumn("sim", round(
        VectorExpressions.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
