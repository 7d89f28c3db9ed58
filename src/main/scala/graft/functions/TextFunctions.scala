package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus pipelines, as
  * composable codegen-friendly `Column` expressions (no UDFs — every
  * function lowers to built-in Catalyst expressions, so pushdown,
  * pruning and whole-stage codegen keep working around them).
  *
  * Hashing anchor: the leading hex chars of md5, giving deterministic
  * values that any engine (including the DuckDB oracle) reproduces
  * bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens (single-space tokenizer — the corpus contract). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-grams joined with single spaces; empty array when there are
    * fewer than `n` tokens. Codegen'd kernel since the round-14
    * optimization round — the HOF spelling ([[wordNgramsComposed]],
    * kept as the WordNgramsSpec cross-check) is CodegenFallback and
    * forced every gram feed's projection interpreted. */
  def wordNgrams(text: Column, n: Int): Column =
    VectorExpressions.wordNgrams(text, n)

  /** The pre-round-14 `transform(sequence(...))` HOF spelling of
    * [[wordNgrams]] — kept ONLY as the WordNgramsSpec cross-check (the
    * codegen'd kernel must stay value-identical to it). */
  private[graft] def wordNgramsComposed(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
  }

  /** 28-bit integer hash from the md5 hex prefix (products with 28-bit
    * multipliers stay inside int64). */
  def hash28(e: Column): Column =
    conv(substring(md5(e), 1, 7), 16, 10).cast("long")

  /** 60-bit variant for low-collision fingerprints. */
  def hash60(e: Column): Column =
    conv(substring(md5(e), 1, 15), 16, 10).cast("long")

  /** Token count; 0 for blank text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Order-insensitive bag-of-words document fingerprint. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Heuristic quality score in [0, 1e6] (scaled long): rewards length
    * (up to 100 tokens), vocabulary diversity, and word length (up to 8
    * chars). Scaled-integer output so engines with different
    * round-half rules agree. */
  def qualityScoreE6(text: Column): Column = {
    val nt = size(tokens(text)).cast("double")
    val nd = size(array_distinct(tokens(text))).cast("double")
    val nc = length(text).cast("double")
    val score = lit(0.4) * least(nt / 100.0, lit(1.0)) +
      lit(0.3) * (nd / nt) +
      lit(0.3) * least(((nc - nt + 1.0) / nt) / 8.0, lit(1.0))
    floor(score * 1000000.0).cast("long")
  }

  /** Stopword-ratio language guess (the corpus carries an English-ish
    * shared vocabulary; the value is the deterministic feature, the
    * label is a thresholded convenience). */
  def langIdHeuristic(text: Column, stopwords: Seq[String] = Seq("the", "a", "of", "and")): Column = {
    val t = tokens(text)
    val ratio = size(filter(t, x => x.isin(stopwords.map(lit): _*)))
      .cast("double") / size(t).cast("double")
    when(ratio >= 0.08, "en").when(ratio >= 0.03, "en_like").otherwise("unknown")
  }

  /** MinHash signature entry j over a column of hashed shingles. */
  def minhash(hashedShingles: Column, a: Long, b: Long, p: Long): Column =
    array_min(transform(hashedShingles, h => (h * a + b) % p))

  /** 16-bit SimHash over a column of hashed tokens: bit j is set iff
    * more than half the hashes have bit j set. */
  def simhash16(hashedTokens: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(15)), j =>
        when(
          lit(2) * size(filter(hashedTokens, h =>
            floor(h / pow(lit(2.0), j.cast("double"))).cast("long") % 2 === 1)) > size(hashedTokens),
          pow(lit(2.0), j.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc + x)
}
