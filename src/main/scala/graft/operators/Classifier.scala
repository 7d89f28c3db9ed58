package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Model-based corpus filtering: the CCNet/DCLM-style step where a
  * cheap supervised classifier (fastText-shaped in the papers; a
  * multinomial Naive Bayes here, which the same token-count relations
  * express exactly) is trained on labeled text and then scores the
  * whole corpus, and the hashing-trick featurizer that feeds any
  * linear model at scale.
  *
  * Everything is `Column` algebra over integer count relations. Log
  * probabilities are quantized to integers (`floor(-1e6·ln(p))`, the
  * same device as `Curation.perplexityScore`) so per-document score
  * sums and arg-min decisions are order-free and engine-exact — the
  * DuckDB oracle reproduces the confusion matrix bit-for-bit.
  *
  * Scale shape: the model is a (token, class) relation — vocabulary ×
  * classes bounded, never corpus bounded, and never collected to the
  * driver. Scoring expands each corpus token by the class count K
  * (small: quality tiers / source buckets / languages) and joins the
  * model on the token key — one hash-partitioned join whose build side
  * is the model relation, then one (doc, class) aggregate and one
  * per-doc arg-min. No UDFs, no iteration: training is two
  * aggregations over the corpus, which is why this family (not
  * gradient descent) is the first-pass filter at 100 TB.
  */
object Classifier {

  /** Integer-quantized negative log of a positive rational `num/den`:
    * `floor(-1e6 · ln(num/den))` as BIGINT. Both engines evaluate the
    * same double division then the same libm `ln` — the quantization
    * absorbs last-ulp differences everywhere except exact integer
    * boundaries of 1e6·ln, which counts-derived rationals do not hit. */
  private def nllE6(num: Column, den: Column): Column =
    floor(lit(-1e6) * log(num.cast("double") / den.cast("double")))
      .cast("long")

  /** Multinomial Naive Bayes with add-one smoothing, trained on
    * `train`'s `(labelCol, textCol)` and evaluated on `test`: returns
    * the confusion matrix `(label, predicted, n_docs)` over `test`.
    *
    * Per-class token scores are `floor(-1e6·ln((cnt+1)/(tot_c+V)))`;
    * unseen tokens take the class default `floor(-1e6·ln(1/(tot_c+V)))`;
    * the class prior `floor(-1e6·ln(docs_c/docs))` joins in once per
    * (doc, class). Prediction is the minimum total NLL, ties broken by
    * class name — an integer-domain arg-min, deterministic on any
    * engine and any partitioning. */
  def naiveBayesConfusion(
      train: DataFrame, test: DataFrame,
      labelCol: String, idCol: String, textCol: String): DataFrame = {
    val tok = (df: DataFrame, extra: Seq[String]) => df.select(
      (col(labelCol) +: extra.map(col)) :+
        explode(TextFunctions.tokens(col(textCol))).as("__t"): _*)

    val trainTok = tok(train, Nil)
    // (token, class) count relation + per-class totals + vocab size.
    // tot and vocab both derive from cnt — vocabulary×classes sized —
    // so the corpus is tokenized ONCE for the whole model (the
    // remaining corpus passes are the priors scan, which prunes to the
    // label column alone, and the test side).
    val cnt = trainTok.groupBy(col(labelCol), col("__t"))
      .agg(count(lit(1)).as("__n"))
    val tot = cnt.groupBy(col(labelCol))
      .agg(sum(col("__n")).as("__tot"))
    val vocab = cnt.select(countDistinct(col("__t")).as("__v"))
    val priors = train.groupBy(col(labelCol))
      .agg(count(lit(1)).as("__docs"))
      .crossJoin(train.select(count(lit(1)).as("__alldocs")))

    // Per-class smoothing denominator and defaults; K rows.
    val classes = tot.crossJoin(vocab)
      .join(priors, labelCol)
      .select(col(labelCol).as("__cls"),
        col("__tot"), col("__v"),
        nllE6(lit(1), col("__tot") + col("__v")).as("__default_e6"),
        nllE6(col("__docs"), col("__alldocs")).as("__prior_e6"))
    val model = cnt
      .join(classes, col(labelCol) === col("__cls"))
      .select(col("__cls"), col("__t"),
        nllE6(col("__n") + 1, col("__tot") + col("__v")).as("__score_e6"))

    // Score: expand each test token by the K classes, join the model
    // on (token, class), fall back to the class default, sum per
    // (doc, class), add the prior, arg-min by (total, class name).
    val testTok = tok(test, Seq(idCol))
      .crossJoin(broadcast(
        classes.select(col("__cls"), col("__default_e6"), col("__prior_e6"))))
      .join(model, Seq("__cls", "__t"), "left")
      .groupBy(col(idCol), col(labelCol), col("__cls"), col("__prior_e6"))
      .agg(sum(coalesce(col("__score_e6"), col("__default_e6"))).as("__sum"))
      .select(col(idCol), col(labelCol),
        struct((col("__sum") + col("__prior_e6")).as("__nll"),
          col("__cls").as("cls")).as("__scored"))
    testTok
      .groupBy(col(idCol), col(labelCol))
      .agg(min(col("__scored")).as("__best"))
      .groupBy(col(labelCol).as("label"),
        col("__best.cls").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Hashing-trick featurization (Weinberger et al.): each token maps
    * to `hash28(token) mod numBuckets` with a sign from an independent
    * hash bit, and a document's feature value is the signed count —
    * the collision-unbiased sparse vector every linear/fastText-style
    * model consumes at scale. Map-only expansion plus one (doc,
    * bucket) aggregate; output rows are bounded by
    * `min(tokens, numBuckets)` per document, never vocabulary size. */
  def hashedFeatures(
      df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int): DataFrame = {
    val t = explode(TextFunctions.tokens(col(textCol))).as("__t")
    df.select(col(idCol), t)
      .select(col(idCol),
        (TextFunctions.hash28(col("__t")) % numBuckets).as("bucket"),
        (when(TextFunctions.hash28(concat(lit("s|"), col("__t"))) % 2 === 0,
          lit(1L)).otherwise(lit(-1L))).as("__sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).as("val"))
      .where(col("val") =!= 0)
  }

  /** Frequency-ranked dense vocabulary: `(token, id)` with ids 0..V-1
    * assigned by (count DESC, token ASC) — the id assignment every
    * tokenizer export needs before a corpus ships as integer arrays.
    *
    * The ranking window is intentionally global (single partition):
    * the input is the VOCABULARY relation, which is bounded by distinct
    * token count (~10⁶ for word-level, ~10⁵ for BPE vocabularies), not
    * the corpus — at 100 TB the corpus-sized work is the one count
    * aggregate that precedes it, which shuffles on the token key. */
  def vocabIndex(df: DataFrame, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .select(col("token"), col("n"),
        (row_number().over(w) - 1).cast("long").as("id"))
  }

  /** Encode each document's text as the integer-id sequence under
    * `vocab` (the output of [[vocabIndex]]): posexplode keeps token
    * positions through the vocabulary join, and the id array is
    * reassembled in position order. One corpus-side shuffle on the
    * token key (or a broadcast when the vocabulary fits), one (doc)
    * re-aggregation — the export step that turns curated text into
    * training-ready token ids. */
  def encodeTokens(
      df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame =
    df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "token")))
      .join(vocab.select(col("token"), col("id")), Seq("token"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("id")))),
        s => s.getField("id")).as("token_ids"))

  /** Skip-gram co-occurrence PMI over a `window`-token context (the
    * word2vec/GloVe preprocessing statistic): pairs are unordered
    * (lexicographically normalized), counted at distances 1..window,
    * and scored `floor(1e6·ln(cp·N² / (Np·c1·c2)))` — integer-exact
    * via the same quantization as the NB scores. Only pairs with
    * `cp >= minCount` survive, which bounds the pair relation by
    * observed-cooccurrence cardinality (not vocab²) before the two
    * unigram joins; the unigram relation is vocabulary-sized. */
  def pmiCooccurrence(
      df: DataFrame, textCol: String,
      window: Int = 2, minCount: Long = 5L): DataFrame = {
    // (w1, w2) at distances 1..window, normalized so w1 <= w2. A pair
    // at distance d is the (first, last) token of a (d+1)-gram, and
    // tokens carry no spaces, so substring_index on the codegen'd
    // [[graft.functions.VectorExpressions.wordNgrams]] kernel's grams
    // recovers them losslessly (round 14 — the indexed-lambda
    // transform walk this replaces was CodegenFallback; short docs
    // contribute nothing through the empty-array explode exactly as
    // the old 0-length slice did). Pair multiset pinned by
    // Round14KernelSpec against the composed spelling.
    val pairs = (1 to window).map { d =>
      df.select(explode(graft.functions.VectorExpressions.wordNgrams(
          col(textCol), d + 1)).as("__g"))
        .select(substring_index(col("__g"), " ", 1).as("__wa"),
          substring_index(col("__g"), " ", -1).as("__wb"))
    }.reduce(_ union _)
      .select(least(col("__wa"), col("__wb")).as("w1"),
        greatest(col("__wa"), col("__wb")).as("w2"))
    val uni = df.select(explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val nTok = uni.agg(sum(col("__c")).as("__ntok"))
    val nPair = pairs.agg(count(lit(1)).as("__npair"))
    pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)
      .join(uni.select(col("__t").as("w1"), col("__c").as("__c1")), "w1")
      .join(uni.select(col("__t").as("w2"), col("__c").as("__c2")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nPair))
      .select(col("w1"), col("w2"), col("n_pair"),
        floor(lit(1e6) * log(
          col("n_pair").cast("double") * col("__ntok").cast("double") *
            col("__ntok").cast("double") /
            (col("__npair").cast("double") * col("__c1").cast("double") *
              col("__c2").cast("double"))))
          .cast("long").as("pmi_e6"))
  }
}
