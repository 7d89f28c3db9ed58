package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: benchmark decontamination,
  * Gopher/C4-style repetition and quality filters, exact-quota
  * stratified sampling, and PII redaction. All pure `Column` algebra
  * (no UDFs) — pushdown, pruning, and whole-stage codegen survive, and
  * every derived value is md5-anchored so the DuckDB oracle reproduces
  * it bit-for-bit.
  */
object Curation {

  /** Distinct 28-bit hashes of the word `n`-grams of `text` — one
    * truncated gram when the document is shorter than `n` tokens
    * (mirrors `GREATEST(len-n+1, 1)` on the oracle side). Codegen'd
    * kernel since round 14; [[gramHashesComposed]] is the
    * Round14KernelSpec cross-check. */
  def gramHashes(text: Column, n: Int): Column =
    array_distinct(graft.functions.VectorExpressions.ngramHashes(
      text, n, hexDigits = 7, minOne = true))

  /** The pre-round-14 `transform(sequence(...))` HOF spelling of
    * [[gramHashes]] — kept ONLY as the Round14KernelSpec cross-check. */
  private[graft] def gramHashesComposed(text: Column, n: Int): Column = {
    val t = TextFunctions.tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => TextFunctions.hash28(array_join(slice(t, i, lit(n)), " "))))
  }

  /** Benchmark decontamination: flag every training document sharing at
    * least one word `gramSize`-gram with the benchmark set.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus
    * (eval suites are thousands of documents), so its distinct-gram set
    * is broadcast and the corpus side stays map-local — one partial
    * aggregate per doc, no corpus shuffle beyond the per-doc count.
    * Contamination counts track shared grams, never corpus size.
    */
  def decontaminate(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      gramSize: Int = 8): DataFrame = {
    val dg = train.select(col(idCol),
      explode(gramHashes(col(textCol), gramSize)).as("gr"))
    val bg = bench.select(explode(gramHashes(col(textCol), gramSize)).as("gr"))
      .distinct()
    val hits = dg.join(broadcast(bg), Seq("gr"))
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("hits"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  /** C4/Dolma-style PARAGRAPH-level exact dedup: chunk each document
    * into fixed `chunkWords`-word windows (the paragraph unit for
    * corpora whose text carries no newline structure), drop every
    * chunk whose content already occurred earlier in the corpus —
    * first occurrence by (`idCol`, chunk position) survives, including
    * intra-document repeats — and reassemble the survivors in order.
    * Documents whose every chunk was seen elsewhere disappear.
    *
    * Scale shape: two shuffles, both irreducible for exact corpus-wide
    * dedup — one hash-partitioned window over md5(chunk) (survivor
    * election; map-side nothing to combine, but the exchange carries
    * (id, pos, hash, chunk), bounded by corpus size not n²), one
    * groupBy(id) for reassembly. Chunk election uses a window rather
    * than min-join so each chunk row is read once. The probabilistic
    * alternative at extreme scale is a bloom-filter pass (Dolma); this
    * is the exact Spark-native shape.
    */
  def dedupParagraphs(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 15): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be > 0, got $chunkWords")
    val w = split(col(textCol), " ")
    val chunks = docs
      .select(col(idCol), w.as("__w"))
      .select(col(idCol),
        explode(expr(s"sequence(0, (size(__w) - 1) DIV $chunkWords)")).as("__ck"),
        col("__w"))
      .select(col(idCol), col("__ck"),
        array_join(slice(col("__w"), col("__ck") * chunkWords + 1,
          lit(chunkWords)), " ").as("__para"))
    val win = Window.partitionBy(md5(col("__para")))
      .orderBy(col(idCol), col("__ck"))
    chunks
      .withColumn("__rn", row_number().over(win))
      .where(col("__rn") === 1)
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__ck"), col("__para")))),
          x => x.getField("__para"))).as(textCol))
  }

  /** SPAN-level decontamination: instead of dropping whole documents
    * that touch the benchmark ([[decontaminate]]), cut out only the
    * contaminated fixed-word chunks — a chunk is contaminated when any
    * of its word `gramSize`-grams appears in the benchmark set — and
    * reassemble the rest. Keeps the uncontaminated 95% of a long doc
    * that merely quotes one benchmark passage. Documents whose every
    * chunk is contaminated disappear.
    *
    * Scale shape: benchmark gram set broadcast (eval suites are tiny
    * vs the corpus); chunk gram explosion is map-only and the
    * contaminated-(id, chunk) relation is hit-sized; one reassembly
    * groupBy — the same shuffle bound as [[dedupParagraphs]]. */
  def scrubContamination(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 15, gramSize: Int = 8): DataFrame = {
    require(chunkWords > 0 && gramSize > 0,
      s"chunkWords/gramSize must be > 0, got $chunkWords/$gramSize")
    val w = split(col(textCol), " ")
    val chunks = train
      .select(col(idCol), w.as("__w"))
      .select(col(idCol),
        explode(expr(s"sequence(0, (size(__w) - 1) DIV $chunkWords)")).as("__ck"),
        col("__w"))
      .select(col(idCol), col("__ck"),
        array_join(slice(col("__w"), col("__ck") * chunkWords + 1,
          lit(chunkWords)), " ").as("__para"))
    val benchGrams = bench
      .select(explode(gramHashes(col(textCol), gramSize)).as("gr"))
      .distinct()
    val contaminated = chunks
      .select(col(idCol), col("__ck"),
        explode(gramHashes(col("__para"), gramSize)).as("gr"))
      .join(broadcast(benchGrams), Seq("gr"))
      .select(col(idCol), col("__ck"))
      .distinct()
    chunks
      .join(contaminated, Seq(idCol, "__ck"), "left_anti")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__ck"), col("__para")))),
          x => x.getField("__para"))).as(textCol))
  }

  /** RefinedWeb/C4-style BOILERPLATE removal: delete every fixed
    * `chunkWords`-word chunk whose content occurs in at least `minDocs`
    * DISTINCT documents (navigation bars, cookie banners, license
    * footers — text repeated across pages rather than merely repeated
    * within one), then reassemble each document from its surviving
    * chunks in order. Unlike [[dedupParagraphs]] no survivor is
    * elected: a frequent chunk is removed from EVERY document,
    * including its first occurrence. Documents left with no chunks
    * disappear.
    *
    * Scale shape: the frequent-chunk relation is the corpus-wide
    * distinct-doc count per chunk hash — one hash-partitioned
    * aggregate whose input the map side pre-shrinks via per-partition
    * (hash, id) dedup, and whose OUTPUT after the `>= minDocs` filter
    * is tiny (boilerplate is by definition a small set of distinct
    * strings), so the removal join broadcasts it; no second data-sized
    * shuffle until the groupBy(id) reassembly. At 100 TB the same plan
    * holds: frequent-set size scales with distinct boilerplate, not
    * corpus size.
    */
  def removeBoilerplate(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 15, minDocs: Int = 2): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be > 0, got $chunkWords")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val w = split(col(textCol), " ")
    val chunks = docs
      .select(col(idCol), w.as("__w"))
      .select(col(idCol),
        explode(expr(s"sequence(0, (size(__w) - 1) DIV $chunkWords)")).as("__ck"),
        col("__w"))
      .select(col(idCol), col("__ck"),
        array_join(slice(col("__w"), col("__ck") * chunkWords + 1,
          lit(chunkWords)), " ").as("__para"),
        md5(array_join(slice(col("__w"), col("__ck") * chunkWords + 1,
          lit(chunkWords)), " ")).as("__h"))
    val frequent = chunks
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__h").as("__fh"))
    chunks
      .join(broadcast(frequent), col("__h") === col("__fh"), "left_anti")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("kept_chunks"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__ck"), col("__para")))),
          x => x.getField("__para"))).as(textCol))
  }

  /** Cross-document repeated-span detection — the ExactSubstr shape of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (2021): hash every SLIDING `k`-token window (stride 1,
    * unlike [[removeBoilerplate]]'s disjoint chunks) and mark a window
    * duplicated when the same hash occurs in ≥ 2 DISTINCT documents.
    * Returns per-document `(idCol, n_windows, n_dup_windows)` — the
    * statistic a pipeline thresholds to drop or mask span-duplicated
    * documents. Documents shorter than `k` tokens have no windows and
    * no output row.
    *
    * Scale shape: the span relation is one generator expression per
    * row — O(total tokens) rows of (id, 60-bit hash), no text on the
    * wire. Cross-doc detection is `min(id) != max(id)` per hash (NOT
    * `countDistinct`): min/max combine map-side, so the exchange
    * carries one row per distinct window per map partition even for a
    * boilerplate window hit by millions of documents. The dup relation
    * is duplicated-content-sized — data-dependent, so it joins back on
    * the window hash (a shuffle join; its build side arrives already
    * partitioned by the groupBy) rather than a broadcast. */
  def repeatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k > 0, s"window size must be > 0, got $k")
    // codegen'd sliding-window hashes straight off the text (round 14:
    // the transform/hash60 walk was CodegenFallback; a shorter-than-k
    // doc yields an empty array, exactly the rows the old size filter
    // dropped before its descending-sequence edge could fire)
    val spans = docs
      .select(col(idCol), explode(
        graft.functions.VectorExpressions.ngramHashes(
          col(textCol), k, hexDigits = 15, minOne = false)).as("__wh"))
    val dup = spans
      .groupBy(col("__wh"))
      .agg((min(col(idCol)) =!= max(col(idCol))).as("__crossdup"))
    spans.join(dup, "__wh")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("__crossdup"), lit(1L)).otherwise(lit(0L)))
          .as("n_dup_windows"))
  }

  /** Split each document into fixed-token-window chunks with overlap —
    * the RAG-indexing / context-packing shape. Chunk i covers tokens
    * `[i·stride, i·stride + chunkTokens)` where
    * `stride = chunkTokens - overlapTokens`; every document yields at
    * least one chunk; the final chunk is the (possibly short) tail.
    *
    * Scale shape: map-only — one narrow projection and a generator
    * expression per row, no shuffle, no UDF; at 100 TB chunking rides
    * the scan. Integer arithmetic end-to-end (cross-engine ceil-div via
    * `(n - overlap + stride - 1) DIV stride`).
    * Output: (idCol, chunk_id, chunk_text, n_tokens). */
  def chunkDocuments(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be > 0, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__tk"), size(toks).as("__n"))
      .select(col(idCol), col("__tk"), col("__n"),
        posexplode(expr(
          s"transform(sequence(0, greatest(1, (__n - $overlapTokens + $stride - 1) DIV $stride) - 1)," +
            s" i -> array_join(slice(__tk, i * $stride + 1, $chunkTokens), ' '))"))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("chunk_id") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Gopher-style repetition/quality metrics per document, as scaled
    * integers (floor ×1e6 — engines with different round-half rules
    * agree): mean word length, most-frequent-token ratio, duplicate
    * word-3-gram fraction.
    *
    * Scale shape: the token histogram is explode → two-level aggregate —
    * partial (map-side) combine collapses the explosion before the
    * exchange, so the shuffle carries one row per (doc, distinct token),
    * bounded by vocabulary, not document length.
    */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = df.select(col(idCol), col(textCol),
      TextFunctions.tokens(col(textCol)).as("tk"))
    val topc = t.select(col(idCol), explode(col("tk")).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(idCol).agg(max("c").as("topc"))
    // codegen'd truncated 3-grams (round 14; the transform walk was
    // CodegenFallback — composed form pinned by Round14KernelSpec)
    val g3 = graft.functions.VectorExpressions.wordNgramsMinOne(
      col(textCol), 3)
    // Σ token length ≡ length(text) − (n_tokens − 1): the single-space
    // split partitions the text exactly (every separator is one char),
    // so the interpreted aggregate-over-lengths fold is pure arithmetic
    val m = t.select(col(idCol),
      size(col("tk")).cast("double").as("nt"),
      (length(col(textCol)) - (size(col("tk")) - 1)).cast("double")
        .as("sumlen"),
      g3.as("g3"))
    m.join(topc, Seq(idCol))
      .select(col(idCol),
        floor(col("sumlen") / col("nt") * 1000000.0).cast("long").as("mean_word_len_e6"),
        floor(col("topc").cast("double") / col("nt") * 1000000.0).cast("long").as("top_tok_e6"),
        floor((lit(1.0) - size(array_distinct(col("g3"))).cast("double")
          / size(col("g3")).cast("double")) * 1000000.0).cast("long").as("dup_3gram_e6"))
  }

  /** Exact-quota stratified sample: the first `perStratum` rows of each
    * stratum in deterministic md5 order (stable under reshuffles and
    * engine changes — the standard reproducible-sampling move).
    *
    * Scale shape: one shuffle on the strata columns + a rank that
    * `WindowGroupLimit` evaluates partially on the map side (only
    * `perStratum` rows per stratum survive each partial), so a huge
    * stratum never materializes its full sorted run. For strata too
    * large even for that, pre-filter with `hash28(id) % k < p` first —
    * approximate quota, no window at all. */
  def stratifiedSample(
      df: DataFrame, strataCols: Seq[String], idCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select((idCol +: strataCols).map(col): _*)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
  }

  /** Training-mixture assembly: take a deterministic, md5-ranked
    * fraction of each source so the output hits the requested mixture
    * WEIGHTS (relative sampling rates per source, each in [0,1] — the
    * "sample 100% of wiki, 30% of crawl" knob of a pretraining data
    * recipe). Per-source quota = ceil(weight × n_source), so a weight
    * of 1.0 keeps a source whole and tiny sources never round to
    * zero. Selection order is a pure function of the data (md5 of the
    * id), making the mixture reproducible across runs and layouts.
    *
    * Scale shape: one count aggregate (map-side combined, |sources|
    * rows) broadcast back, then ONE hash-shuffle window per source
    * partition — rank-k selection, no global sort. Sources absent from
    * `weights` are dropped (explicit recipe, no silent passthrough). */
  def mixSources(
      df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    weights.foreach { case (s, w) =>
      require(w >= 0.0 && w <= 1.0, s"weight for $s must be in [0,1], got $w")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF(sourceCol, "__w"))
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
    val quotas = broadcast(counts.join(wdf, sourceCol)
      .select(col(sourceCol), ceil(col("__w") * col("__n")).as("__quota")))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(quotas, sourceCol)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Temperature-based mixture sampling (the mT5/XLM-R multilingual
    * rebalancing rule): group g is kept at rate
    * `min(1, target · n_g^α / Σ n^α / n_g)` — α < 1 flattens the
    * distribution toward low-resource groups, α = 1 is proportional.
    * Row selection is a deterministic md5-fraction threshold on the id,
    * so the sample is a pure function of the data (reproducible across
    * runs/layouts) and EXPECTED group sizes hit the temperature
    * weights (threshold sampling, not exact-k — chain
    * [[stratifiedSample]]/[[mixSources]] for exact quotas).
    *
    * Scale shape: one map-side-combined count aggregate (|groups|
    * rows), rates broadcast back, then a MAP-ONLY hash-threshold
    * filter — no window, no per-group shuffle. Rates round to 1e-6 so
    * cross-engine pow/sum ulp noise cannot flip a row. */
  def temperatureSample(
      df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetRows: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetRows > 0, s"targetRows must be > 0, got $targetRows")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), lit(alpha)))
      .cache()
    // grand total is a SCALAR aggregate over the |groups|-sized count
    // relation — a planner-sized driver value, like a join threshold
    val bigW = counts.agg(sum(col("__w"))).head().getDouble(0)
    val rates = counts
      .select(col(groupCol),
        round(least(lit(1.0),
          lit(targetRows.toDouble) * col("__w") / lit(bigW) / col("__n").cast("double")),
          6).as("__rate"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(TextFunctions.hash28(col(idCol).cast("string")).cast("double") /
        lit(268435456.0) < col("__rate")) // 2^28
      .drop("__rate")
  }

  /** DSIR-style deterministic importance sampling: keep each row with
    * probability `min(1, targetFraction · w / mean(w))` — rows whose
    * `weight` (a quality or domain-relevance score) exceeds the corpus
    * mean are over-sampled, low-weight rows under-sampled, and the
    * EXPECTED kept fraction is ~`targetFraction`. Selection is the same
    * md5-threshold rule as [[temperatureSample]]: a pure function of
    * the row id, reproducible across runs, layouts, and cluster sizes.
    *
    * Scale shape: one map-side-combined scalar aggregate (the mean —
    * a planner-sized driver value like a broadcast-join threshold),
    * then a MAP-ONLY filter; no shuffle of the data itself. Rates
    * round to 1e-6 so cross-engine ulp noise cannot flip a row. */
  def importanceSample(
      df: DataFrame, idCol: String, weight: Column,
      targetFraction: Double): DataFrame = {
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0,1], got $targetFraction")
    val meanW = df.agg(avg(weight.cast("double"))).head().getDouble(0)
    require(meanW > 0.0, s"mean weight must be > 0, got $meanW")
    df.where(
      TextFunctions.hash28(col(idCol).cast("string")).cast("double") /
        lit(268435456.0) < // 2^28
      round(least(lit(1.0),
        lit(targetFraction) * weight.cast("double") / lit(meanW)), 6))
  }

  /** Fractional-epoch UP-sampling (the other half of mixture building
    * from [[temperatureSample]]'s down-sampling): each row is emitted
    * `floor(f)` times plus one more with probability `frac(f)`, where
    * `f` is its group's epoch factor — so a source marked 2.3 epochs
    * contributes each row 2 times and a deterministic 30% of rows a
    * 3rd time, and EXPECTED volume is exactly `f·n`. The fractional
    * choice is the md5-threshold rule (pure function of the id —
    * reproducible across runs and layouts); `copy` (1-based) lets
    * downstream shuffles/packing treat repeats as distinct rows.
    *
    * Scale shape: broadcast the |groups|-row factor relation, then a
    * MAP-ONLY `explode(sequence(...))` — no shuffle, output size is
    * the only cost (as it must be: the repeats are the product). */
  def upsampleEpochs(
      df: DataFrame, groupCol: String, idCol: String,
      factors: Map[String, Double]): DataFrame = {
    require(factors.nonEmpty && factors.values.forall(f => f > 0 && f <= 100),
      s"epoch factors must be in (0, 100], got $factors")
    val spark = df.sparkSession
    import spark.implicits._
    val fdf = factors.toSeq.toDF(groupCol, "__f")
    df.join(broadcast(fdf), Seq(groupCol))
      .withColumn("__base", floor(col("__f")).cast("int"))
      .withColumn("__extra",
        when(TextFunctions.hash28(col(idCol).cast("string")).cast("double") /
          lit(268435456.0) < // 2^28
          round(col("__f") - floor(col("__f")), 6), 1).otherwise(0))
      .withColumn("copy", explode(
        // sequence(1, 0) would count DOWN in Spark — empty array out
        when(col("__base") + col("__extra") >= 1,
          expr("sequence(1, __base + __extra)"))
          .otherwise(array().cast("array<int>"))))
      .drop("__f", "__base", "__extra")
  }

  /** CCNet-style language-model quality scoring: a bigram LM with
    * add-one smoothing is "trained" on the corpus itself (two
    * aggregates: unigram and bigram counts), then every document is
    * scored by its average negative log-likelihood — high-NLL docs are
    * the gibberish/boilerplate candidates a perplexity filter drops.
    *
    * Cross-engine exactness: each bigram's NLL is floor-scaled to an
    * integer (`floor(-1e6·ln p)`) BEFORE the per-document sum, so the
    * aggregation is integer arithmetic — order-free, no float-sum
    * divergence between engines (the same trick as TF-IDF's score_e6).
    *
    * Scale shape: the LM relations are vocabulary- and bigram-bounded
    * (map-side combined); scoring joins the exploded corpus back on
    * the bigram key — one hash join whose build side is the LM, one
    * groupBy(doc). No UDFs, no iteration. */
  /** (w1, w2) bigram rows from a space-tokenized text column, carrying
    * `keep` columns through — direct struct pairs, no string
    * re-joining/re-splitting round trip. */
  /** Adjacent token pairs via the codegen'd [[graft.functions
    * .VectorExpressions.wordNgrams]] kernel (round-14: the
    * `transform(sequence(...), i -> struct(element_at...))` HOF walk
    * forced every bigram feed's projection interpreted). Tokens carry
    * no spaces by construction (they come from a single-space split),
    * so the 2-gram's one space splits it back losslessly —
    * BigramPairsSpec pins pair-identity against the old spelling,
    * empty/trailing tokens included. Rows with < 2 tokens vanish
    * through the empty-array explode, exactly like the old size
    * filter. */
  private def bigramPairs(
      df: DataFrame, textCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+
        explode(TextFunctions.wordNgrams(col(textCol), 2)).as("__g"): _*)
      .select(keep.map(col) :+
        element_at(split(col("__g"), " ", 2), 1).as("w1") :+
        element_at(split(col("__g"), " ", 2), 2).as("w2"): _*)

  def perplexityScore(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = bigramPairs(df, textCol, keep = Seq(idCol))
    val uni = bigrams.groupBy("w1").agg(count(lit(1)).as("u_n"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("b_n"))
    val vocabSize = bigrams.select(col("w1")).union(
      bigrams.select(col("w2"))).distinct().count()
    bigrams
      .join(bi, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .select(col(idCol),
        floor(lit(-1e6) *
          log((col("b_n") + 1).cast("double") /
            (col("u_n") + lit(vocabSize)).cast("double")))
          .cast("long").as("nll_e6"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        // integer DIV keeps the average exact and order-free too
        expr("CAST(sum(nll_e6) DIV count(1) AS BIGINT)").as("avg_nll_e6"))
  }

  /** Interpolated Kneser–Ney bigram probabilities in FIXED POINT
    * (Kneser & Ney 1995; the standard D = 0.75 absolute discount).
    * Every term is integer arithmetic over count relations, so the
    * smoothed LM is bit-reproducible on any engine:
    *
    *   p(w2|w1) ≈ (10⁶·(4·c12 − 3)) DIV (4·c1)              (discounted ML)
    *            + (λ_q6 · pc_q6) DIV 10⁶                     (interpolation)
    *   λ_q6  = (750000·N1+(w1·)) DIV c1                      (backoff mass)
    *   pc_q6 = (10⁶·N1+(·w2)) DIV N1+(··)                    (continuation)
    *
    * (4·c12 − 3 encodes c12 − 3/4 exactly; each DIV floors — the
    * deterministic quantization is the point, the ≤3 µunit flooring
    * error is noise relative to the 0.75-discount approximation
    * itself.)
    *
    * Scale shape: ONE corpus pass builds the bigram count relation;
    * everything after is vocabulary²-bounded aggregation and joins on
    * w1/w2 keys (map-side combined); the single scalar N1+(··) rides
    * along as a broadcast. */
  def knBigram(df: DataFrame, textCol: String): DataFrame = {
    val grams = bigramPairs(df, textCol, keep = Seq.empty)
    val c12 = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(
      sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val n1b = c12.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val n1tot = c12.agg(count(lit(1)).as("n1tot"))
    c12.join(c1, "w1").join(n1b, "w2").crossJoin(broadcast(n1tot))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        (expr("(1000000L * (4L * c12 - 3L)) DIV (4L * c1)") +
          expr("((750000L * n1f) DIV c1) * ((1000000L * n1b) DIV n1tot) DIV 1000000L"))
          .as("p_kn_q6"))
  }

  /** Cross-document novelty scoring: for each document, how many of
    * its distinct word n-grams appear in NO lower-id document — the
    * curation signal that separates original content from recombined /
    * templated text (a doc of entirely previously-seen n-grams is a
    * remix). First occurrence = min(doc id) over the corpus, so the
    * score is order-free and engine-exact.
    *
    * Scale shape: grams hash to 60-bit ints BEFORE the shuffle (the
    * n-word strings never leave the map side — the same trick as
    * repeatedSpans); per-doc totals and per-gram first-occurrence are
    * two aggregations over the hashed relation, and novelty-per-doc is
    * one more count over the gram-sized first relation — NO join back
    * to the corpus, the final join is docs-sized × docs-sized.
    * Returns (idCol, n_grams, n_novel). */
  def noveltyScore(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // hash straight off the text (repeatedSpans' shape, codegen'd
    // since round 14): the explode emits int64s — gram strings are
    // never materialized as rows; shorter-than-n docs yield the empty
    // array the old size filter used to drop
    val grams = df
      .select(col(idCol), explode(
        graft.functions.VectorExpressions.ngramHashes(
          col(textCol), n, hexDigits = 15, minOne = false)).as("__g"))
      .distinct()
    val perDoc = grams.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val novel = grams.groupBy("__g").agg(min(col(idCol)).as("__first"))
      .groupBy(col("__first").as(idCol))
      .agg(count(lit(1)).as("__nn"))
    perDoc.join(novel, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("__nn"), lit(0L)).as("n_novel"))
  }

  /** Token-distribution entropy per document in FIXED POINT — the
    * classic gibberish/boilerplate signal (near-zero entropy = one
    * token repeated; high entropy = diverse vocabulary). Each distinct
    * token's term is c·floor(10⁶·(−ln(c/n))) — the floor happens
    * BEFORE the per-doc sum, so the aggregation is pure int64 and the
    * score is bit-identical on any engine and at any parallelism
    * (H ≈ entropy_e6 / 10⁶ nats). One explode + two doc-keyed
    * aggregations that share the doc partitioning.
    * Returns (idCol, n_tokens, entropy_e6). */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      .select(col(idCol), col("__n"),
        (col("__c") * floor(lit(-1e6) *
          log(col("__c").cast("double") / col("__n").cast("double")))
          .cast("long")).as("__term"))
      .groupBy(idCol)
      .agg(max(col("__n")).as("n_tokens"),
        expr("CAST(sum(__term) DIV max(__n) AS BIGINT)").as("entropy_e6"))

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * exponential-race form): item i gets key −ln(uᵢ)/wᵢ with uᵢ a
    * deterministic md5-derived uniform; the k SMALLEST keys are a true
    * weight-proportional sample. The key quantizes to an integer via
    * one floor of an identical IEEE expression, so the selection
    * replays exactly on any engine; re-running yields the same sample
    * (resumable exports). Map-only scoring + a top-k (TakeOrdered, no
    * global sort). Returns (idCol, weightCol, key_e12) — the k winners. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // u = (h+1)/2^60 ∈ (0, 1]; key = floor((−ln u)·10¹² / w) — parens
    // fixed so both engines evaluate the same IEEE op sequence
    val h = TextFunctions.hash60(
      concat(lit("ws|"), col(idCol).cast("string")))
    df.where(col(weightCol) > 0)
      .withColumn("key_e12",
        floor((-log((h + 1).cast("double") / lit(1152921504606846976.0))) *
          lit(1e12) / col(weightCol).cast("double")).cast("long"))
      .select(col(idCol), col(weightCol), col("key_e12"))
      .orderBy(col("key_e12"), col(idCol))
      .limit(k)
  }

  /** Training-export shuffle: assign every document a deterministic
    * pseudo-random shard and a dense position within it — the
    * corpus-wide "random" permutation a training run reads, WITHOUT a
    * global sort: the permutation key is a hash, sharding is a hash
    * bucket, and ordering is shard-LOCAL (each shard's window sorts
    * 1/shards of the corpus in parallel). Deterministic: re-running
    * the export yields the identical order, so a resumed training job
    * sees the same data sequence. */
  def shuffleExport(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val pk = TextFunctions.hash28(
      concat(lit("perm|"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // long-typed running count as the rank (total (__k, id) order):
    // row_number() is 32-bit and wraps past 2^31 rows per shard.
    df.select(col(idCol), (pk % shards).cast("int").as("shard"), pk.as("__k"))
      .withColumn("pos", count(lit(1)).over(w) - 1L)
      .drop("__k")
  }

  /** Token-budget data selection: keep the highest-quality documents
    * whose running token total stays within `fraction` of the corpus'
    * tokens — the "best N tokens" selection step of quality-first
    * training recipes.
    *
    * The running total over the (quality DESC, id) order is computed
    * as a DISTRIBUTED prefix sum: range-partition by the sort key,
    * window WITHIN each partition, then one tiny per-partition-totals
    * relation (numPartitions rows) turns local sums into global ones.
    * No single-reducer global window — the per-doc relation at 100 TB
    * is billions of rows, and the classic two-phase prefix sum keeps
    * every stage parallel. */
  def tokenBudgetSelect(
      df: DataFrame, idCol: String, textCol: String,
      fraction: Double, prefixParts: Int = 32): DataFrame = {
    val r = df.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextFunctions.qualityScoreE6(col(textCol)).as("quality_e6"))
    val budget = r.agg(floor(sum(col("n_tokens")) * fraction)
      .cast("long").as("__budget"))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"))
      .orderBy(col("quality_e6").desc, col(idCol))
    // `part` carries the tokenize + quality + range-exchange work and
    // is consumed TWICE (offsets aggregate + final join): persist the
    // narrow (id, counts, pid) relation so the corpus pipeline runs
    // once — the self-unpersisting cache frees it after the caller's
    // action completes.
    val part = CacheHygiene.selfUnpersisting(r
      .repartitionByRange(prefixParts, col("quality_e6").desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local", sum(col("n_tokens")).over(localW)))
    val offW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = part.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptot"))
      .select(col("__pid"),
        coalesce(sum(col("__ptot")).over(offW), lit(0L)).as("__off"))
    part.join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(budget))
      .where(col("__local") + col("__off") <= col("__budget"))
      .select(col(idCol), col("quality_e6"), col("n_tokens"))
  }

  /** BM25 (Okapi) top-k retrieval for a constant query — the lexical
    * half of a hybrid (BM25 + vector) search stack. One corpus pass
    * builds per-(doc, term) frequencies for the query terms only
    * (map-side filter on the broadcast term set), document-frequency
    * and average-length statistics are term-/scalar-sized, and each
    * per-term contribution is integer-quantized (`floor(1e6·idf·tfnorm)`)
    * so the per-doc sum is order-free and engine-exact. Robertson idf
    * (`ln((N-df+0.5)/(df+0.5) + 1)`) keeps scores positive. */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__w"))
    val stats = toks.agg(
      count(lit(1)).as("__n"),
      sum(size(col("__w"))).as("__toktot"))
    val terms = {
      import df.sparkSession.implicits._
      queryTerms.distinct.toDF("__term")
    }
    // per-(doc, term) tf + doc length; corpus side map-only before the
    // (doc,term) aggregate — the broadcast term set prunes everything else
    val tf = toks
      .select(col(idCol), size(col("__w")).cast("long").as("__dl"),
        explode(col("__w")).as("__t"))
      .join(broadcast(terms), col("__t") === col("__term"))
      .groupBy(col(idCol), col("__term"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))
    val contrib = tf
      .join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        floor(lit(1e6) *
          log((col("__n").cast("double") - col("__df").cast("double") + 0.5) /
            (col("__df").cast("double") + 0.5) + 1.0) *
          (col("__tf").cast("double") * lit(k1 + 1.0) /
            (col("__tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * (col("__dl").cast("double") /
                (col("__toktot").cast("double") / col("__n").cast("double")))))))
          .cast("long").as("__s_e6"))
    contrib.groupBy(col(idCol))
      .agg(sum(col("__s_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol))
      .limit(topK)
  }

  /** Canonical text normalization for dedup/tokenizer front-ends:
    * lower-case, strip characters outside printable ASCII, collapse
    * whitespace runs, trim. Map-only codegen'd string ops; character
    * classes only, so Java regex and RE2 agree byte-for-byte. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^ -~]", " "), // non-printable-ASCII -> space
      "[ ]+", " "))

  /** Regex PII scrub (email-shaped, then runs of digits), returning the
    * redacted text plus per-pattern match counts. Patterns use only
    * character classes — Java regex and RE2 agree byte-for-byte.
    * Map-only: codegen'd `RegExpReplace`/`RegExpExtractAll`, no shuffle. */
  val EmailPattern = "[a-z0-9]+@[a-z]+[.][a-z]+"
  val DigitRunPattern = "[0-9][0-9]+"

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(DigitRunPattern), lit(0)))
        .cast("long").as("n_ids"),
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        DigitRunPattern, "<ID>").as("redacted"))

  /** Top `k` tokens per group by count (vocabulary building / corpus
    * inspection), deterministic via (count desc, token asc) ordering.
    *
    * Scale shape: explode → two-level aggregate — map-side partial
    * combine collapses the token explosion before the exchange, so the
    * shuffle carries one row per (group, distinct token); the final
    * rank's `WindowGroupLimit` keeps only k rows per group per partial.
    * Result: token counts shuffle bounded by vocabulary × groups, never
    * by corpus token volume. */
  def topTerms(
      df: DataFrame, groupCols: Seq[String], textCol: String,
      k: Int): DataFrame = {
    val counts = df
      .select(groupCols.map(col) :+
        explode(TextFunctions.tokens(col(textCol))).as("tok"): _*)
      .where(col("tok") =!= "")
      .groupBy(groupCols.map(col) :+ col("tok"): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col("tok").asc)
    counts.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Inverted-index export: one row per term with its document
    * frequency and the posting list DELTA-GAP encoded (first doc id,
    * then successive differences) — the at-rest layout lexical search
    * indexes ship, because gaps of a sorted id list compress far
    * better than absolute ids. One term-keyed shuffle over the
    * DISTINCT (term, doc) relation; `minDf`/`maxDf` bound the output
    * to the useful vocabulary band (rare terms are noise, ubiquitous
    * terms are stopwords — and they also bound the largest collected
    * posting list). Sorting happens inside each term's bounded list
    * (`array_sort`), never across the relation. */
  def invertedIndex(
      df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = df.select(
        explode(TextFunctions.tokens(col(textCol))).as("term"),
        col(idCol).cast("long").as("doc"))
      .where(col("term") =!= "").distinct()
    // The df band is enforced BEFORE collect_list: a stopword term in
    // 10^8 documents must never materialize a 10^8-element list in one
    // aggregation buffer just to be dropped afterwards. The count pass
    // is map-side combined and its output is vocabulary-sized; the
    // band join is a semi-join against that bounded relation.
    val band = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    val lists = pairs.join(band, "term")
      .groupBy("term")
      .agg(first(col("df")).as("df"),
        array_sort(collect_list("doc")).as("__ids"))
    val shifted = concat(array(lit(0L)),
      slice(col("__ids"), lit(1), size(col("__ids")) - 1))
    lists.select(col("term"), col("df"),
      concat_ws(",",
        zip_with(col("__ids"), shifted, (a, b) => (a - b).cast("string")))
        .as("postings"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram feature distribution
    * is, and keep the top scorers. The importance weight
    * log p_target(x) − log p_raw(x) under bucketed bigram unigram
    * models reduces to Σ_b n_b · c_b, where `c_b` is a PER-BUCKET
    * integer constant `floor(1e6 · ln(p_t[b]/p_r[b]))` (Laplace
    * smoothing on both sides) — so the per-doc sum is pure integer
    * arithmetic, order-free and engine-exact; only the B-bounded bucket
    * relation ever touches `ln`.
    *
    * Scale shape: pass 1 builds the raw+target bucket counts in ONE
    * corpus aggregate (conditional sums over the same grams, B rows
    * out); pass 2 re-scores every doc against the broadcast score
    * relation. No per-doc state, no model larger than B rows. */
  def dsirSelect(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 4096, topK: Int = 100): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = df.select(col(idCol), isTarget.as("__t"),
        explode(TextFunctions.wordNgrams(col(textCol), 2)).as("g"))
      .withColumn("b",
        TextFunctions.hash28(concat(lit("dsir|"), col("g"))) % buckets)
    // ONE pass for both distributions: raw = every doc, target = the
    // isTarget subset, as conditional aggregates over the same rows.
    val counts = grams.groupBy("b").agg(
      count(lit(1)).as("n_r"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"))
    val totals = counts.agg(
      sum(col("n_r")).as("tot_r"), sum(col("n_t")).as("tot_t"))
    // c_b = floor(1e6·ln(((n_t+1)·(tot_r+B)) / ((n_r+1)·(tot_t+B)))):
    // one ln over exact integer inputs per bucket (Laplace-smoothed
    // ratio), following the BM25/NB integer-quantization precedent.
    // factors cast to DOUBLE before multiplying: count×total products
    // overflow int64 at corpus scale (1e13 grams × 1e13 grams); the
    // double rounding is identical IEEE arithmetic in both engines.
    val scores = counts.crossJoin(broadcast(totals)).select(col("b"),
      floor(lit(1e6) * log(
        ((col("n_t") + 1).cast("double") * (col("tot_r") + buckets).cast("double")) /
          ((col("n_r") + 1).cast("double") * (col("tot_t") + buckets).cast("double"))))
        .cast("long").as("c"))
    grams.join(broadcast(scores), "b")
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("score_e6"))
      .orderBy(col("score_e6").desc, col(idCol)).limit(topK)
  }
}
