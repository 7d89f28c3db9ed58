package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the other
  * classic ANN compression besides PQ: each dimension is affinely
  * mapped onto `levels` integer steps between its corpus-wide min and
  * max, so a 64-dim float32 vector becomes 64 one-byte codes (4×
  * smaller at rest) and distances become PURE INTEGER arithmetic
  * (Σ (qcodeᵢ − ccodeᵢ)², SIMD-friendly, no float rounding to
  * reconcile between engines). Unlike PQ there is no trained codebook
  * to ship — the whole "model" is 2 doubles per dimension, and it is
  * derived by one order-free MIN/MAX aggregation pass, which means a
  * verification oracle can recompute it from the data instead of
  * reading an export.
  *
  * Serving shape mirrors [[Pq.ivfPqTopK]]: an IVF coarse quantizer
  * bounds each query's candidates to `nprobe` cells (expansion ≈
  * corpus·nprobe/k_coarse, similarity-driven, not corpus-driven) and
  * candidates rank by the integer code distance. One corpus pass
  * computes BOTH the cell and the codes. At 100 TB the corpus at rest
  * is (cell, 64 bytes of codes) per vector; raw floats are touched
  * only by the bounds/coarse training passes.
  *
  * Reference scope note: the reference engine has no ANN surface at
  * all (it is a Delta-maintenance library); this extends the
  * training-data-pipeline family (SemDeDup/IVF/PQ siblings) with the
  * quantization variant most vector stores ship first.
  */
object Sq {

  /** Per-dimension corpus bounds: one posexplode + (dim → MIN/MAX)
    * aggregation — order-free comparisons only, so any engine
    * recomputes bit-identical values. Returns dims-sized arrays
    * (driver-bounded like a codebook). */
  def trainBounds(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = df
      .select(posexplode(Pq.asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .collect()
    val dims = rows.length
    val mns = new Array[Double](dims)
    val mxs = new Array[Double](dims)
    rows.foreach { r =>
      mns(r.getInt(0)) = r.getDouble(1); mxs(r.getInt(0)) = r.getDouble(2)
    }
    (mns, mxs)
  }

  /** Map-only SQ encoding expression: codeᵢ =
    * clamp(⌊(xᵢ − mnᵢ)·(levels−1)/(mxᵢ − mnᵢ)⌋, 0, levels−1), with
    * degenerate dimensions (mn = mx) encoding 0. The bounds ride
    * along as literals; operation order `((x − mn) · s) / w` matches
    * the oracle's left-associative SQL so IEEE doubles agree
    * bit-for-bit before the floor. */
  def sqCodes(vec: Column, mns: Seq[Double], mxs: Seq[Double],
      levels: Int = 256): Column = {
    require(levels > 1, s"levels must be > 1, got $levels")
    graft.functions.VectorExpressions.sqEncode(vec, mns, mxs, levels)
  }

  /** The pre-round-14 `zip_with(vec, bounds, ...)` HOF spelling of
    * [[sqCodes]] — kept ONLY as the SqKernelSpec cross-check (as a
    * CodegenFallback it forced the one-pass cell+codes corpus
    * projection interpreted). */
  private[graft] def sqCodesComposed(vec: Column, mns: Seq[Double],
      mxs: Seq[Double], levels: Int = 256): Column = {
    require(levels > 1, s"levels must be > 1, got $levels")
    val bounds = zip_with(typedLit(mns), typedLit(mxs),
      (a, b) => struct(a.as("mn"), b.as("mx")))
    zip_with(Pq.asDouble(vec), bounds, (x, b) => {
      val mn = b.getField("mn")
      val mx = b.getField("mx")
      when(mx === mn, lit(0L)).otherwise(
        greatest(lit(0L), least(lit((levels - 1).toLong),
          floor((x - mn) * lit((levels - 1).toDouble) / (mx - mn)))))
    })
  }

  /** Exact integer squared distance between two code arrays —
    * Σ (aᵢ − bᵢ)² as BIGINT (≤ dims·(levels−1)², far inside int64);
    * no rounding step because there is nothing inexact to round.
    * Codegen'd kernel; [[codeDistComposed]] is the SqKernelSpec
    * cross-check. */
  def codeDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.codeDist(a, b)

  /** The pre-round-14 `aggregate(zip_with(...))` HOF spelling of
    * [[codeDist]] — kept ONLY as the SqKernelSpec cross-check. */
  private[graft] def codeDistComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc: Column, x: Column) => acc + x)

  /** IVF-SQ top-k: coarse cells bound the candidates, SQ codes rank
    * them in the integer domain. ONE corpus pass computes the coarse
    * cell and the codes (no second scan); queries encode map-only and
    * broadcast with their probed cells. Returns
    * (query_id, neighbor_id, idist, rnk ≤ kNeighbors) with the
    * lowest-id tie-break shared by every ANN sibling. */
  def ivfSqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[(Int, Long, Array[Double])],
      mns: Array[Double], mxs: Array[Double],
      kNeighbors: Int, nprobe: Int, levels: Int = 256): DataFrame = {
    require(kNeighbors > 0, s"kNeighbors must be > 0, got $kNeighbors")
    require(coarse.nonEmpty, "coarse codebook must not be empty")
    require(coarse.forall(_._1 == 0), "coarse codebook must be m=1")
    import org.apache.spark.sql.expressions.Window
    val coarseDists = Pq.bookDists(col(vecCol), coarse, 0)
    // widen before the per-pair integer distance loop (see
    // Pq.ivfPqTopK's note: parallelism + a small JIT-able pair stage)
    val coded = Adaptive.widen(
      corpus.select(col(idCol).as("neighbor_id"),
        array_position(coarseDists, array_min(coarseDists)).cast("int")
          .as("cell"),
        sqCodes(col(vecCol), mns.toSeq, mxs.toSeq, levels).as("__cc")))
    val q = queries
      .select(col(idCol).as("query_id"),
        sqCodes(col(vecCol), mns.toSeq, mxs.toSeq, levels).as("__qc"))
      .join(Pq.probeCells(queries, idCol, vecCol, coarse, nprobe),
        Seq("query_id"))
      .withColumnRenamed("cell", "qcell")
    coded.join(broadcast(q),
        col("cell") === col("qcell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        codeDist(col("__qc"), col("__cc")).as("idist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("idist"), col("neighbor_id"))))
      .where(col("rnk") <= kNeighbors)
  }
}
