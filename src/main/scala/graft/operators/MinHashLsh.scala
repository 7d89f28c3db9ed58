package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.queries.Queries.{MinhashA, MinhashB, MinhashP}

/** MinHash + banded LSH near-duplicate detection, DataFrame-native.
  *
  * Scale shape (the whole point of LSH): signatures are one narrow
  * map-side pass; the only shuffle keys are (band, bucket) — candidate
  * pair count tracks the true near-dup count, never O(n²). Exact
  * Jaccard verification runs on candidates only.
  */
object MinHashLsh {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands

  /** doc frame → (id, hs) where hs = 28-bit hashes of the distinct word
    * 3-gram shingles (fused [[graft.functions.VectorExpressions.hash28Array]]
    * — one codegen'd md5 loop instead of an interpreted transform). */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol),
      graft.functions.VectorExpressions.hash28Array(
        array_distinct(TextFunctions.wordNgrams(col(textCol), n))).as("hs"))

  /** Append mh0..mh15 signature columns (all 16 mins from ONE fused
    * pass over the shingle array — [[graft.functions.VectorExpressions
    * .minhashSignatures]] — instead of 16 interpreted array_min walks). */
  def withSignature(hashed: DataFrame): DataFrame = {
    val sig = graft.functions.VectorExpressions.minhashSignatures(
      col("hs"), MinhashA, MinhashB, MinhashP)
    hashed.withColumn("_sig", sig)
      .select(hashed.columns.map(col) ++
        (0 until NumHashes).map(j => element_at(col("_sig"), j + 1).as(s"mh$j")): _*)
  }

  /** (id, band, bucketKey) — one row per band per doc. */
  def bandBuckets(sig: DataFrame, idCol: String): DataFrame = {
    val bandKeys: Column = array((0 until Bands).map { b =>
      concat_ws(",", (0 until RowsPerBand).map(r =>
        col(s"mh${b * RowsPerBand + r}").cast("string")): _*)
    }: _*)
    sig.select(col(idCol), posexplode(bandKeys).as(Seq("band", "k")))
  }

  /** Candidate pairs: docs sharing any band bucket (deduplicated).
    *
    * `maxBucketSize` is the skew guard: a degenerate bucket (e.g. every
    * empty/boilerplate doc hashing identically) of size m contributes
    * m²/2 pairs and concentrates them in ONE join task. Buckets above
    * the cap are dropped from CANDIDATE GENERATION (their members still
    * pair through their other, selective bands) — the standard
    * LSH-at-scale mitigation. 0 disables the cap. */
  def candidatePairs(
      buckets: DataFrame, idCol: String, maxBucketSize: Int = 0): DataFrame = {
    val capped =
      if (maxBucketSize <= 0) buckets
      else {
        val sizes = buckets.groupBy("band", "k")
          .agg(count(lit(1)).as("__bsz"))
          .where(col("__bsz") <= maxBucketSize)
          .select("band", "k")
        buckets.join(sizes, Seq("band", "k"))
      }
    val a = capped.as("x")
    val b = capped.as("y")
    a.join(b,
        col("x.band") === col("y.band") && col("x.k") === col("y.k") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
  }

  /** Near-dup pairs with exact Jaccard ≥ threshold, verified on the
    * hashed shingle sets of candidates only. */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxBucketSize: Int = 0): DataFrame = {
    val hashed = hashedShingles(df, idCol, textCol).cache()
    val cand = candidatePairs(
      bandBuckets(withSignature(hashed), idCol), idCol, maxBucketSize)
    val ha = hashed.select(col(idCol).as("id_a"), col("hs").as("hs_a"))
    val hb = hashed.select(col(idCol).as("id_b"), col("hs").as("hs_b"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Cluster assignment over the TRANSITIVE CLOSURE of the verified
    * near-dup graph: every doc mapped to the minimum doc id reachable
    * through Jaccard-≥-threshold chains (A≈B≈C lands A and C in one
    * cluster even when they share no band). Connected components run
    * with alternating large-star/small-star ([[ConnectedComponents]],
    * O(log n) rounds); docs with no near-dup map to themselves.
    * Output: (idCol, component). */
  def nearDupComponents(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxBucketSize: Int = 0): DataFrame = {
    val pairs = nearDupPairs(df, idCol, textCol, threshold, maxBucketSize)
    val comp = ConnectedComponents.components(pairs, "id_a", "id_b")
      .withColumnRenamed("id", idCol)
    df.select(col(idCol)).join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
  }

  /** Component-wise dedup: keep exactly ONE doc (the component-minimum
    * id) per transitive near-dup cluster. Stricter than [[dedup]]'s
    * bucket-local rule on chained duplicates; costs the CC iterations
    * on top of the pair join. */
  def dedupConnected(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxBucketSize: Int = 0): DataFrame = {
    val comp = ConnectedComponents.components(
      nearDupPairs(df, idCol, textCol, threshold, maxBucketSize), "id_a", "id_b")
    val drop = comp.where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** LSH dedup: a doc survives iff it is the minimum id in every bucket
    * it lands in (single-pass, transitive-closure-free — deterministic
    * and shuffle-bounded; matches q_minhash_dedup). */
  def dedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val buckets = bandBuckets(
      withSignature(hashedShingles(df, idCol, textCol)), idCol)
    val mins = buckets.groupBy("band", "k").agg(min(col(idCol)).as("m"))
    val keepIds = buckets.join(mins, Seq("band", "k"))
      .groupBy(col(idCol)).agg(min("m").as("mm"))
      .where(col(idCol) === col("mm"))
      .select(idCol)
    df.join(keepIds, idCol)
  }
}
