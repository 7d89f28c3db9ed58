package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Sketch-based corpus profiling — the sublinear-state statistics a
  * 100 TB pipeline runs where an exact `GROUP BY` would shuffle the
  * whole corpus: Count-Min frequency estimation, HyperLogLog distinct
  * counting, and sample-derived range-partition boundaries.
  *
  * All three are DETERMINISTIC (md5-derived hashing, integer or
  * exact-selection arithmetic throughout), so unlike Spark's built-in
  * `approx_count_distinct`/`count_min_sketch` the results are
  * reproducible bit-for-bit by any engine — which is what lets the
  * DuckDB oracle verify them, and what makes reruns/stage-retries at
  * scale produce identical statistics.
  *
  * Scale shapes:
  *  - CMS: one map-only pass over the corpus; the only shuffle carries
  *    at most `depth × width` partially-aggregated cells per map task
  *    (the sketch relation itself is depth×width rows — broadcastable).
  *  - HLL: one map-only pass; the shuffle carries at most `m` register
  *    cells per map task (map-side MAX partial aggregation), final
  *    state is `m` rows regardless of corpus size.
  *  - Range bounds: the corpus is touched map-only twice (hash-sample,
  *    then bucket assignment against broadcast-sized boundaries); the
  *    only sort is over the bounded sample. This is the
  *    RangePartitioner recipe: sample → boundaries → broadcast.
  */
object Sketches {

  // ---- Count-Min Sketch ----------------------------------------------------

  /** The (row, bucket) cell coordinates from one md5 hex digest: row
    * `r` reads hex chars `[1+7r, 7+7r]` — four disjoint 28-bit slices
    * of the same digest (depth ≤ 4 with md5's 32 hex chars), the
    * standard one-hash-many-slices construction. ONE md5 per key
    * occurrence instead of `depth` (measured 3-4× cheaper at the
    * corpus pass, where the sketch build spends its time). */
  private def cmsCellsFromDigest(digest: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
    require(width > 0 && width <= (1 << 28), s"width must be in (0, 2^28], got $width")
    array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        (conv(substring(digest, 1 + 7 * r, 7), 16, 10).cast("long") % width)
          .as("bucket"))
    }: _*)
  }

  private def cmsDigest(key: Column): Column = md5(concat(lit("cms|"), key))

  /** Build a depth×width Count-Min sketch over `key` occurrences
    * (each input row counts once). Returns the sketch as a relation
    * `(row INT, bucket INT, cnt BIGINT)` of at most depth×width rows
    * — small enough to broadcast, checkpoint, or merge across shards
    * (CMS cells are sums, so sketches of corpus shards add). */
  def cmsSketch(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(cmsDigest(key).as("__h"))
      .select(explode(cmsCellsFromDigest(col("__h"), depth, width)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the frequency of each distinct key in `keys`
    * (a one-column DataFrame) from a sketch built with the same
    * depth/width: the classic min over the key's `depth` cells.
    * The sketch side is broadcast — estimation never shuffles the
    * key relation. */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val k = keys.columns.head
    keys.select(col(k).as("key"))
      .distinct()
      .select(col("key"), cmsDigest(col("key")).as("__h"))
      .select(col("key"),
        explode(cmsCellsFromDigest(col("__h"), depth, width)).as("cell"))
      // LEFT join: the sketch stores only occupied cells, and an absent
      // cell is evidence of count 0 — an inner join would drop it from
      // the min and inflate the estimate (or lose never-seen keys
      // entirely), breaking the CMS point-estimate contract.
      .join(broadcast(sketch),
        col("cell.row") === col("row") && col("cell.bucket") === col("bucket"),
        "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- HyperLogLog ---------------------------------------------------------

  /** Deterministic HyperLogLog distinct-count summary over `key`, with
    * `m = 2^b` registers (b in [4, 12] — the exact-integer harmonic
    * sum bounds b; see hllRegisters).
    *
    * Hash layout: 60 md5-derived bits (TextFunctions.hash60) split into
    * a bucket index (`h mod m`) and a (60−b)-bit pattern word whose
    * leading-zero rank feeds the register. Register update is MAX, so
    * duplicate keys are absorbed map-side and the shuffle carries at
    * most m cells per map task. The raw estimate α·m²/Σ2^−M is computed
    * over an EXACT integer harmonic sum (terms scaled by 2^(50) as
    * dyadic integers; a register above 50 — pattern word of 50+ leading
    * zeros, probability ≈ 2^−50 per bucket — contributes 0 in both
    * engines identically), and the only floating-point step is one
    * constant-by-integer division, reproducible bit-for-bit on any
    * IEEE-754 engine.
    *
    * Returns one row: `(m, zero_buckets, harmonic_s, est_distinct)`.
    * Small-range linear counting (`m·ln(m/V)` when the raw estimate is
    * under 2.5m and V buckets are empty) is left to the caller: `ln` is
    * libm-dependent and would break cross-engine determinism, and at
    * the corpus sizes this engine targets the branch never triggers. */
  def hllSummary(df: DataFrame, key: Column, b: Int = 10): DataFrame =
    hllSummarize(hllRegisters(df, key, b), b)

  /** The HLL register relation `(bucket, reg)` for `key` — at most
    * `m = 2^b` rows, built by a MAX aggregate over per-occurrence rank
    * rows. MAX is monotonic and duplicate-insensitive, which is what
    * makes the registers maintainable by a Structured Streaming
    * aggregate with bounded (m-row) state and mergeable across corpus
    * shards (`unionByName` + re-max) — feed either form to
    * [[hllSummarize]]. */
  def hllRegisters(df: DataFrame, key: Column, b: Int = 10): DataFrame = {
    val (bucket, rho) = hllBucketRho(key, b)
    df.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("reg"))
  }

  /** The (bucket, rho) pair for one key occurrence — shared by the
    * global and per-group register builders. */
  private def hllBucketRho(key: Column, b: Int): (Column, Column) = {
    // Upper bound 12, not 16: the harmonic sum's worst case is m·2^50
    // (every register 0), which for m = 2^13 reaches 2^63 and wraps
    // Long. b=12 keeps the worst case at 2^62 with the exactness intact.
    require(b >= 4 && b <= 12, s"b must be in [4,12], got $b")
    val m = 1 << b
    val patBits = 60 - b
    val h = TextFunctions.hash60(concat(lit("hll|"), key))
    // pattern word: the remaining 60-b bits, extracted with an integer
    // shift (a double division would corrupt bits past 2^53); rho =
    // leading zeros + 1 = (patBits + 1) - msb position (length of
    // bin(w), identical in DuckDB).
    val w = shiftright(h, b)
    val rho = when(w === 0, lit(patBits + 1))
      .otherwise(lit(patBits + 1) - length(bin(w)))
    (h % m, rho.cast("int"))
  }

  /** Per-group HLL registers `(grp, bucket, reg)` — the GROUP BY
    * sibling of [[hllRegisters]]: state is `groups · m` rows (still
    * sublinear — the corpus shuffles at most that many partially
    * MAX-combined cells per map task, never its raw keys). Feed to
    * [[hllSummarizeBy]]. */
  def hllRegistersBy(df: DataFrame, group: Column, key: Column,
      b: Int = 10): DataFrame = {
    val (bucket, rho) = hllBucketRho(key, b)
    df.select(group.as("grp"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("grp", "bucket").agg(max("rho").as("reg"))
  }

  /** Per-group collapse of a [[hllRegistersBy]] relation: one summary
    * row per group with the same exact dyadic-integer harmonic sum as
    * [[hllSummarize]]. Groups with zero occurrences are absent (they
    * have no registers to summarize). */
  def hllSummarizeBy(registers: DataFrame, b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 12, s"b must be in [4,12], got $b")
    val m = 1 << b
    // Cache the merged registers ONCE (groups·m rows — sketch-sized):
    // both the group list and the lattice join read it below, and
    // without this the register build (one full corpus pass)
    // re-executes for each — measured 2 corpus scans instead of 1.
    // Self-unpersisting so the blocks are released after the caller's
    // consuming action instead of leaking until GC.
    val merged = CacheHygiene.selfUnpersisting(
      registers.groupBy("grp", "bucket").agg(max("reg").as("reg")))
    val groups = merged.select("grp").distinct()
    // dense lattice per group: groups × m rows, both sides bounded
    val lattice = groups
      .crossJoin(merged.sparkSession.range(0, m).select(col("id").as("bucket")))
      .join(merged, Seq("grp", "bucket"), "left")
      .select(col("grp"), coalesce(col("reg"), lit(0)).as("reg"))
    lattice.groupBy("grp").agg(
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zero_buckets"),
        sum(hllTerm).as("harmonic_s"))
      .select(col("grp"), lit(m.toLong).as("m"), col("zero_buckets"),
        col("harmonic_s"))
      .withColumn("est_distinct", hllEstCol(b))
  }

  /** Collapse a register relation from [[hllRegisters]] (possibly
    * re-maxed from several shards/micro-batches) into the one-row
    * summary described at [[hllSummary]]. */
  def hllSummarize(registers: DataFrame, b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 12, s"b must be in [4,12], got $b")
    val m = 1 << b
    // Re-max first: a shard union may carry several rows per bucket,
    // and a plain lattice join would duplicate those buckets' terms.
    val merged = registers.groupBy("bucket").agg(max("reg").as("reg"))
    // Dense register lattice: empty buckets carry register 0 (term 2^50).
    val lattice = merged.sparkSession
      .range(0, m).select(col("id").as("bucket"))
      .join(merged, Seq("bucket"), "left")
      .select(coalesce(col("reg"), lit(0)).as("reg"))
    lattice.agg(
        sum(when(col("reg") === 0, 1L).otherwise(0L)).as("zero_buckets"),
        sum(hllTerm).as("harmonic_s"))
      .select(lit(m.toLong).as("m"), col("zero_buckets"), col("harmonic_s"))
      .withColumn("est_distinct", hllEstCol(b))
  }

  /** The dyadic-integer harmonic term for one register row — ONE
    * definition shared by the global and per-group collapses (a future
    * change to the b ≤ 12 overflow reasoning must apply to both). */
  private def hllTerm: Column = expr(
    "CASE WHEN reg <= 50 THEN shiftleft(CAST(1 AS BIGINT), 50 - reg) " +
      "ELSE CAST(0 AS BIGINT) END")

  /** floor(α·m²·2^50 / harmonic_s): α·m²·2^50 is precomputed to one
    * double constant (the oracle embeds the same shortest-repr
    * literal), so this division is the whole cross-engine
    * floating-point surface — shared by both collapses. */
  private def hllEstCol(b: Int): Column =
    floor(lit(hllAlphaNum(b)) / col("harmonic_s").cast("double")).cast("long")

  /** The α·m²·2^50 numerator for `hllSummary(b)`, exposed so oracles
    * can embed the identical double constant. */
  def hllAlphaNum(b: Int): Double = {
    val m = 1 << b
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble * 1125899906842624.0
  }

  // ---- Range-partition boundaries ------------------------------------------

  /** Sample-derived range-partition boundaries plus the full-table
    * bucket census — the planning step of a 100 TB global sort /
    * sorted export (Spark's own RangePartitioner shape, made
    * deterministic and engine-replayable).
    *
    * 1. Hash-sample `rate` of the table on md5(idCol) — map-only,
    *    reproducible across retries, no sampling RNG.
    * 2. NTILE(buckets) over the SAMPLE (the only sort in the job, and
    *    it sorts `rate · |table|` rows — bounded by construction; at
    *    1000 executors you pick `rate` so the sample is a few 100k
    *    rows) → per-bucket upper bound `hi` = max sampled value.
    * 3. The first `buckets−1` bounds — partitioner metadata, not data
    *    — are collected and inlined as an array literal; assignment is
    *    a map-only `size(filter(bounds, b -> b < x))` per row, the
    *    broadcast-binary-search every range shuffle does.
    *
    * Returns `(bucket, hi, n_sample, n_table)` — skew in `n_table`
    * across buckets is exactly the partition skew the sampled sort
    * would have. Values tie to bounds go to the LOWER bucket
    * (assignment is `hi < x`, strict). */
  def rangeBounds(df: DataFrame, idCol: String, valueCol: String,
      buckets: Int, rate: Double): DataFrame = {
    val bounds = sampleBounds(df, idCol, valueCol, buckets, rate)
    val census = df.select(
        bucketAssign(bounds, buckets, col(valueCol)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_table"))
    bounds.join(census, Seq("bucket"), "left")
      .select(col("bucket").cast("int").as("bucket"), col("hi"),
        col("n_sample"), coalesce(col("n_table"), lit(0L)).as("n_table"))
  }

  /** NTILE boundaries over the deterministic hash-sample: `(bucket,
    * hi, n_sample)`, one row per sampled bucket. */
  private def sampleBounds(df: DataFrame, idCol: String, valueCol: String,
      buckets: Int, rate: Double): DataFrame = {
    val sample = df.where(
      TextFunctions.hash28(concat(lit("rb|"), col(idCol).cast("string")))
        .cast("double") / 268435456.0 < rate)
    val w = Window.orderBy(col(valueCol), col(idCol))
    sample
      .select(col(idCol), col(valueCol), ntile(buckets).over(w).as("bucket"))
      .groupBy("bucket")
      .agg(max(col(valueCol)).as("hi"), count(lit(1)).as("n_sample"))
  }

  /** Map-only bucket assignment against the collected boundary values.
    * The collect is partitioner metadata — bounded at `buckets` values,
    * like broadcast codebooks/centroids elsewhere in the engine; values
    * are collected untyped so any orderable valueCol (long, double,
    * decimal, string) works. Ties to a boundary go to the LOWER bucket
    * (strict `hi < x`), so equal values always share a bucket. */
  private def bucketAssign(bounds: DataFrame, buckets: Int,
      value: Column): Column = {
    val cuts = bounds.where(col("bucket") < buckets)
      .orderBy("bucket").select("hi").collect().map(_.get(0))
    // Degenerate sample (0–1 rows) yields no interior cuts; array() of
    // zero columns is NullType-typed and would poison the comparison,
    // so assign everything to bucket 1 directly.
    if (cuts.isEmpty) lit(1)
    else size(filter(array(cuts.map(lit(_)).toSeq: _*), b => b < value)) + 1
  }

  /** Global sort positions computed WITHOUT a global sort — the export
    * layout step of a 100 TB sorted write. Every row gets its 0-based
    * rank under `(valueCol, idCol)` built from three parallel pieces:
    *
    * 1. bucket assignment against the sampled boundaries (map-only);
    * 2. a per-BUCKET window for local positions — `buckets` independent
    *    sorts of ~1/buckets of the data each, not one global one;
    * 3. a `buckets`-row census prefix sum, broadcast back, turning
    *    local positions into global ranks.
    *
    * Equal to `ROW_NUMBER() OVER (ORDER BY valueCol, idCol) - 1` (the
    * oracle computes exactly that): bucket k's values never exceed
    * bucket k+1's (strict-cut assignment keeps ties co-located), so
    * concatenating buckets in order IS the total order. */
  def sortedExport(df: DataFrame, idCol: String, valueCol: String,
      buckets: Int, rate: Double): DataFrame = {
    val bounds = sampleBounds(df, idCol, valueCol, buckets, rate)
    // `assigned` (scan + per-row cut filter) feeds BOTH the local ranks
    // and the bucket census: persist the narrow relation so the table
    // is scanned once, self-freeing after the caller's action.
    val assigned = CacheHygiene.selfUnpersisting(
      df.select(col(idCol), col(valueCol),
        bucketAssign(bounds, buckets, col(valueCol)).cast("int").as("bucket")))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col(valueCol), col(idCol))
    // long-typed running count as the rank (ROWS frame over the total
    // (value, id) order) — row_number() is 32-bit and would wrap on a
    // bucket past 2^31 rows before any cast could save it.
    val local = assigned.withColumn("__local",
      count(lit(1)).over(
        localW.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
    // prefix sum over the ≤buckets-row census — planner-sized window
    val offW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = assigned.groupBy("bucket")
      .agg(count(lit(1)).as("__n"))
      .select(col("bucket"),
        coalesce(sum(col("__n")).over(offW), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "bucket")
      .select(col(idCol), col("bucket"),
        (col("__local") + col("__off")).as("pos"))
  }

  // ---- bottom-k quantile sketch --------------------------------------------
  //
  // The distribution member of the sketch family (CMS = counts, HLL =
  // distinct, this = quantiles): per group, keep the k rows whose
  // md5-derived 28-bit hash of the ID is smallest — a deterministic
  // uniform sample of FIXED size (bottom-k sketches, Cohen & Kaplan,
  // PODC 2007), so per-group state is k rows no matter how large the
  // group grows, and the sample's empirical quantiles estimate the
  // group's with the usual O(1/√k) error. Bottom-k under a fixed total
  // order is associative: the union of two groups' sketches re-sketched
  // IS the sketch of the union ([[mergeQuantileSketches]] — the algebra
  // that lets per-shard sketches roll up without touching row data).
  // Everything is md5-anchored, so the DuckDB oracle replays selection
  // and quantile ranks bit-for-bit.

  private def qskHash(idCol: String): Column =
    TextFunctions.hash28(concat(lit("qs|"), col(idCol).cast("string")))

  /** Build the per-group sketch: `(groupCols..., idCol, valueCol)`,
    * ≤ k rows per group (all rows when the group is smaller).
    *
    * 100 TB shape: a broadcast of the per-group counts (group
    * cardinality is sketch metadata, same order as the output) turns
    * the scan into a map-only hash-threshold filter keeping
    * ~`oversample·k` rows per group — the exact bottom-k window then
    * sorts only survivors, never the table (the [[rangeBounds]]
    * sample-only-sort discipline). The threshold arithmetic is pure
    * integer, so both engines compute the identical survivor set.
    *
    * The pre-filter is PROBABILISTIC cover: a group could in principle
    * keep fewer than `min(k, n)` survivors (Binomial tail —
    * vanishingly rare at `oversample = 8`, and deterministic per
    * dataset). Rather than silently returning a short sample, a
    * shortfall REFUSES with the failing groups and the fix (raise
    * `oversample`) — the guard is one count over the already-tiny
    * survivor relation. Groups whose key is NULL are matched
    * null-safely (they sketch like any other group, as in the
    * aggregate form). */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, k: Int, oversample: Int = 8): DataFrame = {
    require(k > 0 && oversample > 0, s"need k > 0, oversample > 0")
    val gcols = groupCols.map(col)
    val counts = df.groupBy(gcols: _*).agg(count(lit(1)).as("__n"))
    // integer ceil(oversample·k·2^28 / n), capped at the full range —
    // DIV, not `/` (double division), so both engines compute the
    // identical per-group threshold
    val threshold = least(lit(268435456L),
      expr(s"(CAST(${oversample.toLong * k} AS BIGINT) * 268435456 " +
        "+ __n - 1) DIV __n"))
    // null-safe group match (a plain USING join would drop null keys)
    val cdf = counts.select(
      (groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__n")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val survivors = df.join(broadcast(cdf), cond)
      .where(qskHash(idCol) < threshold)
      .drop(groupCols.map(c => s"__g_$c"): _*)
    // v is the FINAL tie-break: under duplicate ids with differing
    // values the rank-k boundary stays a pure function of the input
    // set (and stays aligned with the aggregate form's heap order)
    val w = Window.partitionBy(gcols: _*)
      .orderBy(qskHash(idCol), col(idCol), col(valueCol))
    val sketch = survivors
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .select((gcols :+ col(idCol) :+ col(valueCol)): _*)
      .localCheckpoint()
    // shortfall guard: every group must have kept min(k, n) rows
    val short = sketch.groupBy(gcols: _*).agg(count(lit(1)).as("__kept"))
      .join(broadcast(cdf),
        groupCols.map(c => col(c) <=> col(s"__g_$c"))
          .reduceOption(_ && _).getOrElse(lit(true)))
      .where(col("__kept") < least(lit(k.toLong), col("__n")))
      .select(gcols: _*).limit(5).collect()
    require(short.isEmpty,
      s"quantileSketch: the oversample=$oversample pre-filter kept fewer " +
        s"than min(k=$k, n) rows for group(s) ${short.mkString(", ")} — " +
        "raise oversample (the exact-bottom-k guarantee is guarded, " +
        "never silently weakened)")
    sketch
  }

  /** The sketch as a BOUNDED-STATE AGGREGATE — identical sample to
    * [[quantileSketch]] (bottom-k under the same `(hash, id)` order; a
    * spec pins the equivalence), but expressed as one
    * `TypedImperativeAggregate` whose per-group state is a k-capped
    * heap. That form is what Structured Streaming can maintain in
    * complete mode across micro-batches (the CMS/HLL streaming
    * discipline) — a window bottom-k cannot run in a streaming
    * aggregation, and the batch path's count-then-threshold pre-filter
    * needs the corpus twice. Use this for streams and single-pass
    * contexts; the threshold+window form for batch scans where the
    * map-only pre-filter keeps the sort survivor-sized. */
  def quantileSketchAgg(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    // the aggregate buffer is long-typed: refuse non-integral id/value
    // columns up front (a silent cast would null them out and shrink
    // the sample) — the window form handles any orderable type
    Seq(idCol, valueCol).foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq("byte", "short", "integer", "long")
        .contains(dt.typeName),
        s"quantileSketchAgg needs integral $c, got ${dt.typeName} " +
          "(use quantileSketch for other types)")
    }
    val gcols = groupCols.map(col)
    df.groupBy(gcols: _*)
      .agg(org.apache.spark.sql.graftshims.SqlShims.bottomKSketchAgg(
        qskHash(idCol), col(idCol).cast("long"),
        col(valueCol).cast("long"), k).as("__sample"))
  }

  /** Explode an aggregate-form sketch back to [[quantileSketch]]'s
    * relational shape `(groupCols..., idCol, valueCol)`. */
  def sketchRows(agged: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    agged.select((gcols :+ explode(col("__sample")).as("__e")): _*)
      .select((gcols :+ col("__e.id").as(idCol) :+
        col("__e.v").as(valueCol)): _*)
  }

  /** Re-sketch the union of sketches: bottom-k per group of the
    * combined rows (hashes recomputed from the IDs — the sketch stays
    * a plain relation, no opaque state). Associativity makes this the
    * sketch of the combined input whenever each argument covered its
    * own input's bottom-k. */
  def mergeQuantileSketches(sketches: Seq[DataFrame],
      groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    val gcols = groupCols.map(col)
    // the sketch relation is (groupCols..., idCol, valueCol); recover
    // the value column so the merge applies the same (h, id, v) total
    // order as the build forms (deterministic under duplicate ids)
    val valueCols = sketches.head.columns
      .filterNot(c => groupCols.contains(c) || c == idCol).map(col).toSeq
    val w = Window.partitionBy(gcols: _*)
      .orderBy((qskHash(idCol) +: col(idCol) +: valueCols): _*)
    sketches.reduce(_ unionByName _)
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= k)
      .drop("__r")
  }

  /** Empirical quantiles from a sketch: for each probability `p` (in
    * integer percent), the value at 1-based rank `ceil(p·m/100)` of
    * the sample ordered by `(value, id)` — integer rank arithmetic,
    * deterministic ties, so the oracle reproduces every picked value.
    * Output: `(groupCols..., p_e2, value, n_sample)`. Sketches are
    * k-bounded, so the per-group sort is a k-row array sort. */
  def quantileFromSketch(sketch: DataFrame, groupCols: Seq[String],
      idCol: String, valueCol: String, probsE2: Seq[Int]): DataFrame = {
    require(probsE2.nonEmpty && probsE2.forall(p => p > 0 && p <= 100),
      s"probabilities must be integer percents in (0, 100]: $probsE2")
    val gcols = groupCols.map(col)
    val sorted = sketch.groupBy(gcols: _*)
      .agg(sort_array(collect_list(struct(col(valueCol).as("v"),
        col(idCol).as("i")))).as("__s"))
    sorted.select((gcols :+
        explode(typedLit(probsE2.sorted)).as("p_e2") :+
        col("__s")): _*)
      // integer ceil(p·m/100) — DIV, not `/` (double division)
      .withColumn("__rk", expr("CAST((p_e2 * size(__s) + 99) DIV 100 AS INT)"))
      .select((gcols :+ col("p_e2") :+
        element_at(col("__s"), col("__rk")).getField("v").as("value") :+
        size(col("__s")).cast("long").as("n_sample")): _*)
  }
}
