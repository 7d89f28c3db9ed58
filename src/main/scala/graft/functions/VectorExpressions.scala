package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshims.{DotProduct, L2Norm, SqlShims}
import org.apache.spark.sql.graftshims.SqlShims.{column, expression}

/** Public facade over the native Catalyst vector expressions
  * ([[org.apache.spark.sql.graftshims.DotProduct]] /
  * [[org.apache.spark.sql.graftshims.L2Norm]]) — codegen'd primitive
  * loops replacing the CodegenFallback `aggregate(zip_with(...))` HOF
  * form on the embedding hot path, with identical index-ordered double
  * arithmetic (so DuckDB-oracle parity is preserved). */
object VectorExpressions {

  /** `Σ a[i]*b[i]` over `array<double>` columns (length = min of the
    * two; null array → null). */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** L2 norm — `sqrt(Σ v[i]²)` fused in one pass. */
  def l2Norm(v: Column): Column = column(L2Norm(expression(v)))

  /** 28-bit md5-prefix hash of every string element in one codegen'd
    * pass (replaces the interpreted `transform(arr, s -> hash28(s))`). */
  def hash28Array(arr: Column): Column =
    column(org.apache.spark.sql.graftshims.Hash28Array(expression(arr)))

  /** All k MinHash signature entries in one pass over the hashed
    * shingles: entry j = `min_h ((a(j)*h + b(j)) % p)`. */
  def minhashSignatures(
      hashedShingles: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    column(org.apache.spark.sql.graftshims.MinHashSignatures(
      expression(hashedShingles), a, b, p))

  /** All banded sign-LSH keys in one pass: element b =
    * `Σ_p (round(v·plane[b·P+p], 6) >= 0 ? 1<<p : 0)`. The plane matrix
    * ships once as a codegen reference object instead of B×P literal
    * arrays. */
  def lshBandKeys(
      v: Column, planes: Seq[Seq[Double]],
      bands: Int, planesPerBand: Int): Column =
    column(org.apache.spark.sql.graftshims.BandedLshKeys(
      expression(v), planes, bands, planesPerBand))

  /** Hilbert curve index of 2-6 scaled long coordinates — one compiled
    * kernel call per row, replacing the interpreted aggregate-HOF walk
    * of [[Hilbert.index2]]/[[Hilbert.indexD]] (kept as the spec
    * cross-checks) on the clustering hot path. */
  def hilbertIndex(coords: Seq[Column], bits: Int): Column =
    column(org.apache.spark.sql.graftshims.HilbertIndexExpr(
      coords.map(expression), bits))

  /** The whole MinHash shingle front-end (tokenize → word n-grams →
    * distinct → 28-bit md5-prefix hash) fused into one codegen'd
    * kernel — bit-identical to
    * `hash28Array(array_distinct(TextFunctions.wordNgrams(text, n)))`,
    * which is kept as the spec cross-check (its HOF ngram walk forces
    * the whole projection interpreted). */
  def hashedShingles(text: Column, n: Int): Column =
    column(org.apache.spark.sql.graftshims.HashedShingles(expression(text), n))

  /** The k smallest long-array elements, ascending — codegen'd
    * equivalent of `slice(array_sort(hs), 1, k)` (kept as the
    * BottomKExprSpec cross-check; its `array_sort` HOF forces the
    * whole projection interpreted). */
  def bottomK(arr: Column, k: Int): Column =
    column(org.apache.spark.sql.graftshims.BottomK(expression(arr), k))

  /** All MinHash band-bucket keys ("," joins, nulls skipped) in one
    * codegen'd pass over the signature array — equivalent of the
    * `aggregate(sequence(...))` concat_ws fold (kept as the
    * BandKeysExprSpec cross-check). */
  def minhashBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    column(org.apache.spark.sql.graftshims.MinHashBandKeys(
      expression(sig), bands, rowsPerBand))
}
