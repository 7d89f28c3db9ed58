package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the ANN shape
  * that actually fits 100 TB: raw float vectors (256 B at dim 64, KBs
  * at dim 1k+) compress to `m` one-byte codes, so the scan side of a
  * similarity query reads codes + a tiny codebook instead of the
  * vectors themselves (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * Pipeline: [[trainCodebooks]] (k-means per subspace over the
  * corpus — the only pass that touches raw vectors), [[encode]]
  * (map-only nearest-centroid assignment per subspace, codebooks as
  * literals — NO join, NO shuffle), [[adcTopK]] (asymmetric distance:
  * query stays raw, corpus stays codes; distance is the sum of
  * subspace distances to the coded centroids).
  *
  * Everything is deterministic (md5-seeded centroid init, round-4
  * distance compare, lowest-id tie-breaks) so the DuckDB oracle can
  * replay encode + ADC bit-for-bit from the exported codebooks. All
  * pure Column algebra — no UDFs.
  */
object Pq {

  /** Whole-array cast to `array<double>` — a plain Cast (codegen'd,
    * element-wise, exact float→double widening), replacing the
    * `transform(c, _.cast("double"))` HOF spelling that dropped every
    * containing projection out of whole-stage codegen. */
  private[graft] def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential-order squared L2 distance between two double arrays
    * (matches DuckDB's `list_sum(list_transform(...))` evaluation
    * order; compare only after ROUND(.,4)). Codegen'd kernel since the
    * round-14 optimization round; [[l2sqComposed]] is the PqKernelSpec
    * cross-check. */
  private[graft] def l2sq(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.l2Sq(a, b)

  /** The pre-round-14 `aggregate(zip_with(...))` HOF spelling of
    * [[l2sq]] — kept ONLY as the PqKernelSpec cross-check. */
  private[graft] def l2sqComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  /** Round-4 distances from the `j`-th subvector (dsub elements at
    * offset j·dsub) to every centroid of book `j`, codegen'd — the
    * encode/probe primitive, value-identical to
    * `transform(bookLit(books, j), c => round(l2sqComposed(
    * asDouble(slice(vec, j·dsub+1, dsub)), c), 4))` (PqKernelSpec). */
  private[graft] def bookDists(
      vec: Column, books: Seq[(Int, Long, Array[Double])], j: Int): Column = {
    val cents = books.filter(_._1 == j).sortBy(_._2).map(_._3.toSeq)
    val dsub = cents.head.length
    graft.functions.VectorExpressions.centroidDists(vec, cents, j * dsub)
  }

  /** Train per-subspace codebooks: for each of `m` equal slices of the
    * vector, k-means with squared-L2 assignment. Returns
    * (subspace, cid, centroid) rows — `m·k` entries, a driver-sized
    * value like any broadcast-join build side. Centroid init is the
    * md5-ordered first k subvectors (layout-independent); means round
    * to `roundDp` so retraining anywhere reproduces the same books. */
  def trainCodebooks(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iterations: Int = 3,
      roundDp: Int = 6): Seq[(Int, Long, Array[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    require(k > 0 && iterations >= 0, s"need k > 0, iterations >= 0")
    val dsub = dims / m
    // all subspaces train in the SAME jobs: explode (id, j, subvector)
    // once, then every iteration is one assignment+means pass over the
    // whole relation instead of m separate job chains
    val sub = df.select(col(idCol).as("id"),
      explode(expr(
        s"transform(sequence(0, ${m - 1}), " +
          s"j -> struct(j AS j, slice($vecCol, j * $dsub + 1, $dsub) AS sv))"))
        .as("e"))
      .select(col("id"), col("e.j").cast("int").as("j"),
        asDouble(col("e.sv")).as("v"))
      .localCheckpoint()
    // init: the md5-ordered first k subvectors PER SUBSPACE (identical
    // selection to ordering each subspace independently)
    var centroids: Map[(Int, Long), Array[Double]] = sub
      .withColumn("rn", row_number().over(Window.partitionBy("j")
        .orderBy(md5(col("id").cast("string")), col("id"))))
      .where(col("rn") <= k)
      .collect()
      .map(r => (r.getInt(1), r.getInt(3).toLong - 1L) ->
        r.getSeq[Double](2).toArray)
      .toMap
    (1 to iterations).foreach { _ =>
      val centDf = centroids.toSeq
        .map { case ((j, cid), cv) => (j, cid, cv.toSeq) }
        .toDF("j", "cid", "cv")
      val assign = sub.join(broadcast(centDf), Seq("j"))
        .withColumn("d", round(l2sq(col("v"), col("cv")), 4))
        .groupBy("id", "j")
        .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cid"),
          first(col("v")).as("v"))
      val means = assign
        .select(col("j"), col("cid"), posexplode(col("v")))
        .groupBy("j", "cid", "pos")
        .agg(avg(col("col")).as("mu"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case (key, rows) =>
          val arr = new Array[Double](dsub)
          rows.foreach { r =>
            arr(r.getInt(2)) = BigDecimal(r.getDouble(3))
              .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          key -> arr
        }
      centroids = centroids.map { case (key, old) =>
        key -> means.getOrElse(key, old)
      }
    }
    sub.unpersist()
    centroids.toSeq
      .map { case ((j, cid), cv) => (j, cid, cv) }
      .sortBy(x => (x._1, x._2))
  }

  /** Train SEVERAL codebook shapes over the same corpus in ONE shared
    * job chain — an IVF-PQ setup needs both the coarse (m=1) and the
    * product (m>1) quantizers, and training them separately doubles
    * every Spark job on what is per-job-overhead-bound work (the k-
    * means math is trivial; the cost is job count). Results are
    * IDENTICAL to calling [[trainCodebooks]] once per spec: the init
    * window ranks the same rows in the same md5 order within each
    * (spec, subspace), and every mean averages the same group —
    * PqSpec pins the equivalence. Returns one book per spec, in
    * order. */
  def trainCodebooksMulti(
      df: DataFrame, idCol: String, vecCol: String,
      specs: Seq[(Int, Int)], iterations: Int = 3,
      roundDp: Int = 6): Seq[Seq[(Int, Long, Array[Double])]] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    require(specs.nonEmpty && iterations >= 0, "need specs, iterations >= 0")
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    specs.foreach { case (m, k) =>
      require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
      require(k > 0, s"need k > 0") }
    // every spec's subvectors ride ONE exploded relation, tagged si
    val pieces = specs.zipWithIndex.map { case ((m, _), si) =>
      val dsub = dims / m
      s"transform(sequence(0, ${m - 1}), j -> struct($si AS si, " +
        s"j AS j, slice($vecCol, j * $dsub + 1, $dsub) AS sv))"
    }
    val sub = df.select(col(idCol).as("id"),
        explode(expr(pieces.mkString("concat(", ", ", ")"))).as("e"))
      .select(col("id"), col("e.si").as("si"),
        col("e.j").cast("int").as("j"), asDouble(col("e.sv")).as("v"))
      .localCheckpoint()
    val maxK = specs.map(_._2).max
    var centroids: Map[(Int, Int, Long), Array[Double]] = sub
      .withColumn("rn", row_number().over(Window.partitionBy("si", "j")
        .orderBy(md5(col("id").cast("string")), col("id"))))
      .where(col("rn") <= maxK)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(4).toLong - 1L) ->
        r.getSeq[Double](3).toArray)
      .filter { case ((si, _, cid), _) => cid < specs(si)._2 }
      .toMap
    (1 to iterations).foreach { _ =>
      val centDf = centroids.toSeq
        .map { case ((si, j, cid), cv) => (si, j, cid, cv.toSeq) }
        .toDF("si", "j", "cid", "cv")
      val assign = sub.join(broadcast(centDf), Seq("si", "j"))
        .withColumn("d", round(l2sq(col("v"), col("cv")), 4))
        .groupBy("id", "si", "j")
        .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cid"),
          first(col("v")).as("v"))
      val means = assign
        .select(col("si"), col("j"), col("cid"), posexplode(col("v")))
        .groupBy("si", "j", "cid", "pos")
        .agg(avg(col("col")).as("mu"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .map { case (key @ (si, _, _), rows) =>
          val arr = new Array[Double](dims / specs(si)._1)
          rows.foreach { r =>
            arr(r.getInt(3)) = BigDecimal(r.getDouble(4))
              .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          key -> arr
        }
      centroids = centroids.map { case (key, old) =>
        key -> means.getOrElse(key, old)
      }
    }
    sub.unpersist()
    specs.indices.map { si =>
      centroids.collect { case ((`si`, j, cid), cv) => (j, cid, cv) }
        .toSeq.sortBy(x => (x._1, x._2))
    }
  }

  /** Variance-balancing coordinate permutation — a deterministic OPQ
    * surrogate. PQ's loss is the sum of per-subspace quantization
    * errors, and a fixed per-subspace centroid budget is wasted when
    * variance concentrates in one contiguous slice (Ge et al.,
    * "Optimized Product Quantization", CVPR 2013 — their parametric
    * solution balances subspace energy; the full learned rotation
    * needs dense eigen/Procrustes iterations, but the PERMUTATION
    * family already captures the dominant win for axis-aligned skew,
    * and a permutation is exactly reproducible by the SQL oracle and
    * storable as one small index row).
    *
    * One aggregation pass computes per-dimension population variance
    * (rounded to `roundDp` for layout-independence, house k-means
    * convention); dims then deal greedily — highest variance first,
    * each to the open subspace with the least accumulated variance
    * (ties: lowest dim, lowest subspace). Returns `perm` where
    * `perm(newPos) = oldDim`, grouped so new positions
    * `[j·dsub, (j+1)·dsub)` form subspace j. L2 is permutation-
    * invariant, so ADC distances over permuted vectors ARE distances
    * in the original space — only the subspace partition changes. */
  def trainPermutation(
      df: DataFrame, vecCol: String, m: Int,
      roundDp: Int = 6): Seq[Int] = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    require(m > 0 && dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    // a dimension that is NULL in every row has NULL var_pop — treat
    // it as zero variance (it lands last in the deal) rather than NPE
    val varByDim = df
      .select(posexplode(asDouble(col(vecCol))))
      .groupBy("pos").agg(round(var_pop(col("col")), roundDp).as("v"))
      .collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
    val order = (0 until dims)
      .sortBy(d => (-varByDim.getOrElse(d, 0.0), d))
    val load = Array.fill(m)(0.0)
    val slots = Array.fill(m)(Vector.empty[Int])
    order.foreach { d =>
      val open = (0 until m).filter(slots(_).size < dsub)
      val j = open.minBy(j => (load(j), j))
      load(j) += varByDim.getOrElse(d, 0.0)
      slots(j) :+= d
    }
    slots.toSeq.flatten
  }

  /** Reorder a vector column by a [[trainPermutation]] result:
    * `out[p] = vec[perm(p)]`. Pure Column algebra (dims fixed
    * `element_at`s — stays in codegen). */
  def permute(vec: Column, perm: Seq[Int]): Column =
    array(perm.map(d => element_at(vec, d + 1)): _*)

  /** The codebook for one subspace as a literal
    * `array<array<double>>`, index = cid + 1 (1-based). */
  private[graft] def bookLit(
      books: Seq[(Int, Long, Array[Double])], j: Int): Column =
    typedLit(books.filter(_._1 == j).sortBy(_._2).map(_._3.toSeq))

  /** Map-only PQ encoding: per subspace, the (1-based) index of the
    * nearest codebook centroid by round-4 squared L2; ties take the
    * first (= lowest cid). Output: `idCol | codes array<int>` with
    * `codes[j] = cid_j + 1`. Zero shuffle, zero join — the codebooks
    * ride along as literals (the executor-side footprint is m·k·dsub
    * doubles, same as a broadcast, without the join machinery). */
  def encode(
      df: DataFrame, idCol: String, vecCol: String,
      books: Seq[(Int, Long, Array[Double])]): DataFrame = {
    val m = books.map(_._1).max + 1
    val codeCols = (0 until m).map { j =>
      val dists = bookDists(col(vecCol), books, j)
      array_position(dists, array_min(dists)).cast("int")
    }
    df.select(col(idCol), array(codeCols: _*).as("codes"))
  }

  /** Per-query nearest `nprobe` coarse cells by round-4 squared L2
    * (ties: lowest cell id) — the IVF probe step. `coarse` is a
    * full-vector codebook ([[trainCodebooks]] with m = 1); output
    * cells are 1-based to match [[encode]]'s code values. */
  def probeCells(
      queries: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[(Int, Long, Array[Double])], nprobe: Int): DataFrame = {
    require(nprobe > 0, s"nprobe must be > 0, got $nprobe")
    require(coarse.nonEmpty, "coarse codebook must not be empty")
    require(coarse.forall(_._1 == 0), "coarse codebook must be m=1")
    import org.apache.spark.sql.expressions.Window
    queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .select(col("query_id"),
        posexplode(bookDists(col("__qv"), coarse, 0)))
      .select(col("query_id"), (col("pos") + 1).as("cell"),
        col("col").as("__d"))
      .withColumn("__r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__d"), col("cell"))))
      .where(col("__r") <= nprobe)
      .select("query_id", "cell")
  }

  /** IVF-PQ: the production ANN shape — a coarse quantizer bounds each
    * query's candidates to `nprobe` cells, and candidates rank by
    * asymmetric distance over their PQ codes. The corpus at rest is
    * (cell, codes): m+1 small ints per vector. The expansion is
    * per-cell, ≈ corpus·nprobe/k_coarse pairs instead of the full
    * corpus — with codes, not vectors, flowing through it.
    * Both quantizers come from [[trainCodebooks]] (coarse: m = 1). */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[(Int, Long, Array[Double])],
      books: Seq[(Int, Long, Array[Double])],
      kNeighbors: Int, nprobe: Int): DataFrame = {
    require(kNeighbors > 0, s"kNeighbors must be > 0, got $kNeighbors")
    val m = books.map(_._1).max + 1
    import graft.functions.VectorExpressions
    import org.apache.spark.sql.expressions.Window
    // ONE corpus pass computes the coarse cell AND the PQ decode —
    // no second scan, no cells join
    val coarseDists = bookDists(col(vecCol), coarse, 0)
    val recon = (0 until m).map { j =>
      val dists = bookDists(col(vecCol), books, j)
      element_at(bookLit(books, j),
        array_position(dists, array_min(dists)).cast("int"))
    }.reduce(concat(_, _))
    // widen the corpus side BEFORE the per-pair distance loop: a
    // bench-scale single-split scan otherwise runs the whole
    // candidates×queries expansion (plus its sort) in ONE task, and
    // the exchange also ends the codegen region, so the hot pair loop
    // compiles as its own small JIT-able method instead of riding one
    // giant fused stage (at scale the scan's own splits make this a
    // no-op — Adaptive.widen saturates to full width)
    val decoded = Adaptive.widen(
        corpus.select(col(idCol).as("neighbor_id"),
          array_position(coarseDists, array_min(coarseDists)).cast("int")
            .as("cell"),
          recon.as("__rv")))
      .withColumn("__rn2", VectorExpressions.dot(col("__rv"), col("__rv")))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn2", VectorExpressions.dot(col("__qv"), col("__qv")))
      .join(probeCells(queries, idCol, vecCol, coarse, nprobe), Seq("query_id"))
      .withColumnRenamed("cell", "qcell")
    decoded.join(broadcast(q),
        col("cell") === col("qcell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("__qn2") -
          lit(2.0) * VectorExpressions.dot(col("__qv"), col("__rv")) +
          col("__rn2"), 4).as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adist"), col("neighbor_id"))))
      .where(col("rnk") <= kNeighbors)
  }

  /** Asymmetric-distance top-k: queries keep raw vectors, the corpus
    * is only its codes. Approximate distance = ||q − recon||² where
    * `recon` is the code's centroid reconstruction (identical to
    * Σ_j ||q_j − c_{j,code_j}||² since subspaces concatenate) —
    * evaluated as `|q|² − 2·q·recon + |recon|²` so the million-pair
    * hot loop runs through the codegen'd `vec_dot` kernel instead of
    * an interpreted HOF fold. Each neighbor decodes ONCE (map-only,
    * corpus-sized); the corpus scan itself stays m bytes/row at rest.
    * Returns (query_id, neighbor_id, adist, rnk ≤ kNeighbors). */
  def adcTopK(
      codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      books: Seq[(Int, Long, Array[Double])], kNeighbors: Int): DataFrame = {
    require(kNeighbors > 0, s"kNeighbors must be > 0, got $kNeighbors")
    val m = books.map(_._1).max + 1
    import graft.functions.VectorExpressions
    val recon = (0 until m).map { j =>
      element_at(bookLit(books, j), element_at(col("codes"), j + 1))
    }.reduce(concat(_, _))
    // widen before the queries×corpus pair loop (see ivfPqTopK: one
    // bench-scale input split would otherwise run the whole expansion
    // and its sort in one task inside one giant codegen method)
    val decoded = Adaptive.widen(
      codes.select(col(idCol).as("neighbor_id"), recon.as("__rv")))
      .withColumn("__rn2", VectorExpressions.dot(col("__rv"), col("__rv")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn2", VectorExpressions.dot(col("__qv"), col("__qv")))
    import org.apache.spark.sql.expressions.Window
    decoded.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("__qn2") -
          lit(2.0) * VectorExpressions.dot(col("__qv"), col("__rv")) +
          col("__rn2"), 4).as("adist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adist"), col("neighbor_id"))))
      .where(col("rnk") <= kNeighbors)
  }
}
