package graft

/** Guards the documents/embeddings query families against testdata
  * regeneration, the same failure mode EventsQueriesSpec guards for
  * events.parquet (round-5: a driver-side type change broke 8 queries
  * invisibly, because `sbt test` never read the regenerated file).
  * One representative query per family/accessor shape, limit(1) at
  * sf0.001 — together they touch every documents column (doc_id,
  * text, lang, source, n_chars) and every embeddings column (vec_id,
  * embedding, label), so any driver regeneration that changes a type
  * or drops a column fails here first, not at the correctness gate. */
class DocsEmbeddingsQueriesSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private val documentFamilies = Seq(
    "q_token_count",        // tokenization over text
    "q_quality_gopher",     // quality stats over text + n_chars
    "q_lang_id",            // n-gram language heuristic over text, lang
    "q_dedup_exact",        // hash-groupBy over text, doc_id
    "q_minhash_dedup",      // shingle -> minhash -> LSH bands
    "q_simhash_neardup",    // 64-bit simhash banding
    "q_ngram_jaccard",      // LSH candidates + exact jaccard verify
    "q_paragraph_dedup",    // chunk-hash family
    "q_substring_dedup",    // sliding-window repeated spans
    "q_token_bpe",          // BPE apply over text
    "q_tfidf",              // tf-idf over doc_id, text
    "q_postings",           // inverted-index gap-encoded posting lists
    "q_corpus_profile",     // GROUPING SETS over lang, source, n_chars
    "q_pack_sequences",     // packing lattice over doc_id, lang
    "q_split_assign",       // hash-threshold sampling over doc_id
    "q_nb_classifier",      // NB model over source, doc_id, text
    "q_hashed_features",    // hashing-trick featurization over text
    "q_pmi_cooccur",        // skip-gram PMI statistics over text
    "q_vocab_encode",       // dense vocab ids + ordered re-encoding
    "q_incr_agg",           // CDF-maintained rollup over source, n_chars
    "q_stream_incr_agg",    // streaming CDF rollup over source, n_chars
    "q_shuffle_export",     // hash-shard training permutation over doc_id
    "q_token_budget",       // distributed prefix-sum selection over text
    "q_canonical_docs",     // CC + quality canonical election
    "q_bm25_topk",          // Okapi BM25 lexical retrieval over text
    "q_hybrid_rrf",         // BM25 + cosine reciprocal-rank fusion
    "q_temperature_sample", // per-lang rates
    "q_mix_sources",        // per-source rates
    "q_cms_heavy_hitters",  // Count-Min sketch over text 3-grams
    "q_hll_distinct",       // HyperLogLog registers over text 3-grams
    "q_hll_by_source",      // per-group HLL registers over source, text
    "q_hll_overlap",        // mergeable-register set algebra over lang, text
    "q_stream_hll",         // streaming-maintained HLL registers
    "q_stream_cms",         // streaming-maintained CMS cells
    "q_group_quantiles",    // per-source rank-selected quantiles
    "q_dsir_select",        // hashed-bigram importance selection
    "q_kn_bigram",          // fixed-point Kneser-Ney bigram LM
    "q_novelty",            // cross-doc 8-gram novelty over doc_id, text
    "q_entropy",            // fixed-point token entropy over text
    "q_weighted_sample",    // ES weighted sample over doc_id, n_chars
    "q_bloom_read",         // per-file bloom index probe over text md5
    "q_mad_outliers",       // median/MAD robust outliers over lang, n_chars
    "q_hilbert_read",       // hilbert re-cluster over doc_id, n_chars
    "q_quality_percentile", // per-lang integer percentile of quality_e6
    "q_analyze_read",       // stats backfill + pruned scan over n_chars
    "q_zorder_read",        // zorder re-cluster over doc_id, n_chars
    "q_bloom_join",         // index-powered join: dim keys prune fact files
    "q_fingerprint")        // bag fingerprint over text

  private val embeddingFamilies = Seq(
    "q_embedding_knn_lsh",    // banded LSH top-k over embedding
    "q_embedding_semdedup",   // cluster-then-dedup over embedding
    "q_embedding_ivf_knn",    // IVF cells over embedding, vec_id
    "q_ann_recall",           // IVF-vs-brute recall evaluation
    "q_embedding_ivfpq_knn",  // PQ codebooks + IVF fused pass
    "q_embedding_sq_knn",     // scalar-quantized int codes + IVF cells
    "q_embedding_stats",      // fixed-point per-dimension moments
    "q_embedding_neardup")    // label-blocked pairs over label

  for (q <- documentFamilies)
    test(s"$q analyzes and returns rows against the current documents schema") {
      val df = graft.queries.Queries.queries(q)(spark, sf)
      assert(df.limit(1).collect().nonEmpty, s"$q returned no rows at sf0.001")
    }

  for (q <- embeddingFamilies)
    test(s"$q analyzes and returns rows against the current embeddings schema") {
      val df = graft.queries.Queries.queries(q)(spark, sf)
      assert(df.limit(1).collect().nonEmpty, s"$q returned no rows at sf0.001")
    }
}
