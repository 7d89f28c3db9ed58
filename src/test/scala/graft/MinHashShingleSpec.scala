package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorExpressions}

/** The fused HashedShingles kernel must be bit-identical to the
  * composed HOF form `hash28Array(array_distinct(wordNgrams(text, n)))`
  * it replaced on the MinHash hot path — including the tokenizer's
  * trailing-empty behavior, the fewer-than-n-tokens empty array, the
  * first-occurrence-order distinct, and hashing AFTER dedup. */
class MinHashShingleSpec extends SparkTestBase {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column, n: Int) =
    VectorExpressions.hash28Array(
      array_distinct(TextFunctions.wordNgramsComposed(c, n)))

  private def assertEquiv(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val rows = df.select(col("text"),
        VectorExpressions.hashedShingles(col("text"), n).as("fused"),
        composed(col("text"), n).as("hof")).collect()
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2),
          s"null disagreement on '${r.get(0)}'")
      else
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"mismatch on '${r.get(0)}': fused=${r.getSeq[Long](1)} " +
            s"hof=${r.getSeq[Long](2)}")
    }
  }

  test("fused ≡ composed on the documents corpus (n = 3)") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    assertEquiv(spark.table("documents").select("text"), 3)
  }

  test("fused ≡ composed on edge cases, n = 1/2/3") {
    val edge = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d",
      "a  b  c",            // double spaces → empty tokens kept
      "x y z ",             // trailing space → trailing empty token
      " leading space",
      "a b c a b c a b c",  // repeated n-grams → distinct collapses
      "ünïcödé tökens ärë hàshed by utf-8 bytes",
      "one two three four five six seven eight nine ten")
      .toDF("text")
      .unionByName(Seq.empty[String].toDF("text"))
      .unionByName(spark.sql("SELECT CAST(NULL AS STRING) AS text"))
    for (n <- Seq(1, 2, 3)) assertEquiv(edge, n)
  }

  test("operator hashedShingles output is unchanged by the kernel swap") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents").select(col("doc_id"), col("text"))
    val got = graft.operators.MinHashLsh.hashedShingles(docs, "doc_id", "text")
    val want = docs.select(col("doc_id"), composed(col("text"), 3).as("hs"))
    assertSameRows(got, want, "operator vs composed shingles")
  }

  test("containmentPairs finds prefix inclusions and respects the threshold") {
    import spark.implicits._
    // doc 1 = 40 unique tokens; doc 2 = its first 36 tokens (90%
    // prefix: containment 1, Jaccard 34/38 ≈ 0.89); docs 3/4 unrelated
    val a = (0 until 40).map(j => s"w${j}_alpha").mkString(" ")
    val b = (0 until 36).map(j => s"w${j}_alpha").mkString(" ")
    val c = (0 until 40).map(j => s"x${j}_beta").mkString(" ")
    val d = (0 until 40).map(j => s"y${j}_gamma").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("id", "text")
    val pairs = graft.operators.MinHashLsh
      .containmentPairs(docs, "id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)),
      s"exactly the prefix inclusion, at containment 1.0: ${pairs.toSeq}")
    // the symmetric verify misses it at the same threshold: Jaccard of
    // the pair is ~0.89 < 0.9 — the case this operator exists for
    val jac = graft.operators.MinHashLsh
      .nearDupPairs(docs, "id", "text", threshold = 0.9).count()
    assert(jac == 0L, "Jaccard at 0.9 must miss the inclusion pair")
  }

  test("containmentPairs finds EXTREME-skew inclusions the Jaccard bands cannot") {
    import spark.implicits._
    // doc 1 = 600 unique tokens; doc 2 = its first 8 tokens (6 shingles,
    // containment 1, Jaccard 6/598 ≈ 0.01 — a band fires with
    // probability j⁴ ≈ 10⁻⁸, so banded candidates alone would miss it;
    // the bottom-k anchor scheme pairs TRUE subsets deterministically)
    val big = (0 until 600).map(j => s"w${j}_alpha").mkString(" ")
    val tiny = (0 until 8).map(j => s"w${j}_alpha").mkString(" ")
    val noise = (0 until 600).map(j => s"z${j}_beta").mkString(" ")
    val docs = Seq((1L, big), (2L, tiny), (3L, noise)).toDF("id", "text")
    val pairs = graft.operators.MinHashLsh
      .containmentPairs(docs, "id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)),
      s"the extreme-skew inclusion, deterministically: ${pairs.toSeq}")
  }

  test("containmentAgainstCorpus screens a batch against a prior corpus, both directions") {
    import spark.implicits._
    val big = (0 until 400).map(j => s"w${j}_alpha").mkString(" ")
    val other = (0 until 400).map(j => s"v${j}_delta").mkString(" ")
    val prior = Seq((1L, big), (2L, other)).toDF("id", "text")
    // batch 10: tiny prefix of prior 1 (batch-contained-in-prior);
    // batch 11: prior doc 2's text wrapped in 400 new tokens
    // (prior-contained-in-batch — the reverse direction);
    // batch 12: unrelated
    val wrap = (0 until 400).map(j => s"q${j}_eps").mkString(" ")
    val batch = Seq(
      (10L, (0 until 9).map(j => s"w${j}_alpha").mkString(" ")),
      (11L, s"$wrap $other"),
      (12L, (0 until 50).map(j => s"r${j}_zeta").mkString(" ")))
      .toDF("id", "text")
    val got = graft.operators.MinHashLsh
      .containmentAgainstCorpus(batch, prior, "id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((10L, 1L), (11L, 2L)),
      s"exactly the two cross inclusions: ${got.toSeq}")
    assert(got.forall(_._3 >= 0.9))
  }
}
