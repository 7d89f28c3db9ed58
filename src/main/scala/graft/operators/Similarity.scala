package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `Array[Float]`/`Array[Double]`
  * column: brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketing as the scale path (candidates shrink
  * from O(n·q) to bucket-local).
  */
object Similarity {

  /** Index-ordered cosine similarity (deterministic accumulation order —
    * reproducible across engines). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    dot / (norm(a) * norm(b))
  }

  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

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
}
