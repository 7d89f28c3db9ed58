package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorExpressions}
import graft.operators.{Pq, Sq}

/** Round-14 optimization-round kernels: every codegen'd expression
  * that replaced a CodegenFallback HOF on the ANN / gram-feed hot
  * paths must be value-identical to the composed spelling it
  * replaced — null arrays, null elements, length mismatches, empty
  * strings, NaN bounds and real-corpus data included. A divergence
  * here would silently move PQ code assignments, SQ codes, ADC
  * distances, or gram feeds — and with them the ANN/sketch gates'
  * oracle hashes. */
class Round14KernelSpec extends SparkTestBase {
  import spark.implicits._

  private def assertColsEqual(df: DataFrame, label: String): Unit =
    df.collect().foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1))
        assert(r.isNullAt(0) && r.isNullAt(1),
          s"$label null disagreement: fused=${r.get(0)} hof=${r.get(1)}")
      else assert(r.get(0) == r.get(1),
        s"$label mismatch: fused=${r.get(0)} hof=${r.get(1)}")
    }

  private val doubleArrays: Seq[Seq[java.lang.Double]] = Seq(
    Seq.empty,
    Seq(1.5: java.lang.Double),
    Seq(1.0, -2.25, 3.5, 0.0).map(Double.box),
    Seq(0.1, 0.2, 0.3).map(Double.box),                  // inexact decimals
    Seq[java.lang.Double](1.0, null, 3.0),               // null element
    (1 to 8).map(i => Double.box(i * 0.125)))

  private def pairDf: DataFrame = {
    val all = doubleArrays :+ null
    val rows = for (a <- all; b <- all) yield (a, b)
    rows.toDF("a", "b")
  }

  test("L2SqDist ≡ aggregate(zip_with) fold on adversarial array pairs") {
    assertColsEqual(pairDf.select(
      Pq.l2sq(col("a"), col("b")),
      Pq.l2sqComposed(col("a"), col("b"))), "l2sq")
  }

  test("CodeDistLong ≡ integer fold on adversarial code pairs") {
    val codes: Seq[Seq[java.lang.Long]] = Seq(
      Seq.empty, Seq(255L: java.lang.Long),
      Seq(0L, 255L, 17L).map(Long.box),
      Seq[java.lang.Long](1L, null, 3L),
      (0L to 63L).map(Long.box))
    val all = codes :+ null
    val rows = (for (a <- all; b <- all) yield (a, b)).toDF("a", "b")
    assertColsEqual(rows.select(
      Sq.codeDist(col("a"), col("b")),
      Sq.codeDistComposed(col("a"), col("b"))), "codeDist")
  }

  // a small adversarial codebook: 3 centroids of dim 4
  private val cents: Seq[Seq[Double]] = Seq(
    Seq(0.0, 0.0, 0.0, 0.0),
    Seq(1.0, -1.0, 0.5, 2.0),
    Seq(0.1, 0.2, 0.3, 0.4))

  private def centsComposed(vec: Column, offset: Int): Column =
    transform(typedLit(cents.map(_.toSeq)),
      c => round(Pq.l2sqComposed(
        Pq.asDouble(slice(vec, lit(offset + 1), lit(4))), c), 4))

  test("CentroidDists ≡ transform(round(l2sq(slice))) on adversarial vectors, offsets 0/4") {
    // vectors shorter than offset+dsub, exact-length, longer, null
    // elements, null vector — the slice/zip_with padding semantics
    val vecs: Seq[Seq[java.lang.Double]] = Seq(
      Seq.empty,
      Seq(1.0, 2.0).map(Double.box),                       // shorter than dsub
      Seq(1.0, 2.0, 3.0, 4.0).map(Double.box),             // exact at offset 0
      Seq[java.lang.Double](1.0, null, 3.0, 4.0),          // null inside slice
      (1 to 8).map(i => Double.box(i * 0.25)),             // covers offset 4
      (1 to 10).map(i => Double.box(-i * 1.5)))            // longer than needed
    val df = (vecs.map(Tuple1(_)) :+
      Tuple1(null.asInstanceOf[Seq[java.lang.Double]])).toDF("v")
    for (off <- Seq(0, 4)) {
      val rows = df.select(
        VectorExpressions.centroidDists(col("v"), cents, off).as("fused"),
        centsComposed(col("v"), off).as("hof")).collect()
      rows.foreach { r =>
        assert(!r.isNullAt(0), "fused CentroidDists is never a null array")
        assert(!r.isNullAt(1), "composed transform over a literal book is never null")
        assert(r.getSeq[Any](0) == r.getSeq[Any](1),
          s"off=$off mismatch: fused=${r.getSeq[Any](0)} hof=${r.getSeq[Any](1)}")
      }
    }
  }

  test("CentroidDists ≡ composed through the real embeddings corpus (PQ encode shape)") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings")
    val books = Pq.trainCodebooks(emb, "vec_id", "embedding",
      m = 4, k = 16, iterations = 1)
    (0 until 4).foreach { j =>
      val bc = books.filter(_._1 == j).sortBy(_._2).map(_._3.toSeq)
      val composed = transform(typedLit(bc),
        c => round(Pq.l2sqComposed(
          Pq.asDouble(slice(col("embedding"), lit(j * 16 + 1), lit(16))), c), 4))
      val rows = emb.select(
        Pq.bookDists(col("embedding"), books, j).as("fused"),
        composed.as("hof")).collect()
      rows.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"subspace $j: fused=${r.getSeq[Any](0)} hof=${r.getSeq[Any](1)}"))
    }
  }

  test("SqEncode ≡ zip_with/when/least/greatest stack, degenerate and NaN bounds included") {
    val mns = Seq(0.0, -1.0, 5.0, Double.NaN, 2.0)
    val mxs = Seq(1.0, 1.0, 5.0, Double.NaN, 2.5) // dim 2 degenerate, dim 3 NaN-degenerate
    val vecs: Seq[Seq[java.lang.Double]] = Seq(
      Seq(0.5, 0.0, 7.0, 1.0, 2.2).map(Double.box),
      Seq(-3.0, 99.0, 5.0, 0.0, 2.5).map(Double.box),     // clamps both ways
      Seq[java.lang.Double](0.5, null, 5.0, 1.0, 2.0),    // null element
      Seq(0.5, 0.0).map(Double.box),                      // shorter than bounds
      (1 to 8).map(i => Double.box(i * 0.5)))             // longer than bounds
    val df = (vecs.map(Tuple1(_)) :+
      Tuple1(null.asInstanceOf[Seq[java.lang.Double]])).toDF("v")
    assertColsEqual(df.select(
      Sq.sqCodes(col("v"), mns, mxs, 256),
      Sq.sqCodesComposed(col("v"), mns, mxs, 256)), "sqCodes")
  }

  test("SqEncode ≡ composed through the real embeddings corpus") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val emb = spark.table("embeddings")
    val (mns, mxs) = Sq.trainBounds(emb, "embedding")
    assertColsEqual(emb.select(
      Sq.sqCodes(col("embedding"), mns.toSeq, mxs.toSeq, 256),
      Sq.sqCodesComposed(col("embedding"), mns.toSeq, mxs.toSeq, 256)),
      "sqCodes corpus")
  }

  test("VecScale ≡ indexed-lambda transform (the OPQ skew profile)") {
    val composed = (v: Column) => expr(
      "transform(__v, (x, i) -> x * " +
        "(CASE WHEN i < 16 THEN 4.0D ELSE 0.25D END))")
    val vecs: Seq[Seq[java.lang.Double]] = Seq(
      Seq.empty,
      Seq(1.5, -2.0).map(Double.box),
      Seq[java.lang.Double](1.0, null, 3.0),
      (1 to 20).map(i => Double.box(i * 0.1)),             // spans the 16 boundary
      (1 to 64).map(i => Double.box(i * -0.375)))
    val df = (vecs.map(Tuple1(_)) :+
      Tuple1(null.asInstanceOf[Seq[java.lang.Double]])).toDF("__v")
    assertColsEqual(df.select(
      VectorExpressions.vecScale(col("__v"), Seq.fill(16)(4.0), 0.25),
      composed(col("__v"))), "vecScale")
  }

  test("VecScale ≡ indexed-lambda transform on the real float embeddings") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    assertColsEqual(spark.table("embeddings").select(
      VectorExpressions.vecScale(col("embedding"), Seq.fill(16)(4.0), 0.25),
      expr("transform(embedding, (x, i) -> x * " +
        "(CASE WHEN i < 16 THEN 4.0D ELSE 0.25D END))")), "vecScale corpus")
  }

  test("WordNgrams ≡ transform(sequence) HOF on edge texts, n = 1/2/3") {
    val edge = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d",
      "a  b  c", "x y z ", " leading space",
      "a b c a b c a b c",
      "ünïcödé tökens ärë hàshed by utf-8 bytes",
      "one two three four five six seven eight nine ten")
      .toDF("text")
      .unionByName(spark.sql("SELECT CAST(NULL AS STRING) AS text"))
    for (n <- Seq(1, 2, 3))
      assertColsEqual(edge.select(
        TextFunctions.wordNgrams(col("text"), n),
        TextFunctions.wordNgramsComposed(col("text"), n)), s"wordNgrams n=$n")
  }

  test("WordNgrams ≡ composed on the documents corpus (n = 3)") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    assertColsEqual(spark.table("documents").select(
      TextFunctions.wordNgrams(col("text"), 3),
      TextFunctions.wordNgramsComposed(col("text"), 3)), "wordNgrams corpus")
  }

  test("Simhash16 ≡ aggregate/filter majority on adversarial hash arrays") {
    val composed = expr(
      "aggregate(transform(sequence(0, 15), j -> " +
        "CASE WHEN 2 * size(filter(hs, v -> CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2 = 1)) > size(hs) " +
        "THEN CAST(POW(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    val arrays: Seq[Seq[java.lang.Long]] = Seq(
      Seq.empty,
      Seq(0L: java.lang.Long),
      Seq(65535L, 65535L, 0L).map(Long.box),
      Seq(1L, 3L, 5L, 268435455L).map(Long.box),
      Seq[java.lang.Long](null, 7L, null, 65535L),          // null elements
      (1L to 40L).map(i => Long.box(i * 12345L)))
    val df = (arrays.map(Tuple1(_)) :+
      Tuple1(null.asInstanceOf[Seq[java.lang.Long]])).toDF("hs")
    df.select(VectorExpressions.simhash16(col("hs")), composed).collect()
      .foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(0) == r.getLong(1),
          s"simhash16 mismatch: fused=${r.get(0)} hof=${r.get(1)}")
      }
  }

  test("Simhash16 + vec_hash28 ≡ the composed SQL spelling on the corpus") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val rows = spark.sql(
      """WITH t AS (SELECT doc_id, array_distinct(split(text, ' ')) AS toks FROM documents),
        |h AS (SELECT doc_id, transform(toks, tk -> CAST(conv(substring(md5(tk), 1, 7), 16, 10) AS BIGINT)) AS hs,
        |  vec_hash28(toks) AS hs2 FROM t)
        |SELECT doc_id,
        |  aggregate(transform(sequence(0, 15), j ->
        |      CASE WHEN 2 * size(filter(hs, v -> CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2 = 1)) > size(hs)
        |           THEN CAST(POW(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
        |    CAST(0 AS BIGINT), (acc, x) -> acc + x) AS hof,
        |  vec_simhash16(hs2) AS fused
        |FROM h""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.get(0)}: hof=${r.get(1)} fused=${r.get(2)}"))
  }

  test("SimhashMd5Bands ≡ the four-band composed SQL spelling on the corpus") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val hbCols = (0 until 4).map { b =>
      s"transform(ms, m -> CAST(conv(substring(m, ${1 + 4 * b}, 4), 16, 10) AS BIGINT)) AS h$b"
    }.mkString(",\n")
    def bandVal(b: Int): String =
      s"""aggregate(transform(sequence(0, 15), j ->
         |      CASE WHEN 2 * size(filter(h$b, v -> CAST(FLOOR(v / POW(2, j)) AS BIGINT) % 2 = 1)) > size(h$b)
         |           THEN CAST(POW(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         |    CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin
    val bandCols = (0 until 4).map(b => s"${bandVal(b)} AS b$b").mkString(",\n")
    val rows = spark.sql(
      s"""WITH t AS (SELECT doc_id, array_distinct(split(text, ' ')) AS toks FROM documents),
         |h AS (SELECT doc_id, toks, transform(toks, tk -> md5(tk)) AS ms FROM t),
         |hb AS (SELECT doc_id, toks, $hbCols FROM h),
         |f AS (SELECT doc_id, toks, $bandCols FROM hb)
         |SELECT array(b0, b1, b2, b3) AS hof, vec_simhash_bands(toks) AS fused
         |FROM f""".stripMargin).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      s"bands mismatch: hof=${r.getSeq[Long](0)} fused=${r.getSeq[Long](1)}"))
  }

  test("NgramHashes ≡ the hash28/hash60 transform walks, truncation included") {
    import graft.operators.Curation
    val texts = Seq(
      "", " ", "a", "a b", "a b c d e f g h i j",
      "a  b  c", "x y z ", " lead tail ",
      "ünïcödé tökens ärë hàshed by utf-8 bytes here ok now")
      .toDF("text")
    // hash28 truncated (gramHashes' composed spelling). NULL text is
    // the ONE documented divergence: the composed form's greatest()
    // null-skip yields a single-NULL-element array there while the
    // kernel yields NULL — unreachable through every consumer (text
    // columns are non-null; a [NULL] gram exploded would join nothing
    // anyway), and the kernel's NULL is the saner contract.
    for (n <- Seq(2, 8))
      assertColsEqual(texts.select(
        graft.operators.Curation.gramHashes(col("text"), n),
        Curation.gramHashesComposed(col("text"), n)), s"gramHashes n=$n")
    val nullRow = spark.sql("SELECT CAST(NULL AS STRING) AS text").select(
      graft.operators.Curation.gramHashes(col("text"), 2),
      Curation.gramHashesComposed(col("text"), 2)).head()
    assert(nullRow.isNullAt(0) && nullRow.getSeq[Any](1) == Seq(null),
      s"documented null-text divergence moved: ${nullRow}")
    // hash60 sliding (repeatedSpans/novelty shape) on the >= n domain
    for (n <- Seq(2, 8)) {
      val t = TextFunctions.tokens(col("text"))
      val composed = transform(
        sequence(lit(1), size(t) - (n - 1)),
        i => TextFunctions.hash60(array_join(slice(t, i, lit(n)), " ")))
      assertColsEqual(texts
        .where(size(TextFunctions.tokens(col("text"))) >= n)
        .select(
          VectorExpressions.ngramHashes(col("text"), n, 15, minOne = false),
          composed), s"hash60 ngrams n=$n")
    }
  }

  test("wordNgramsMinOne ≡ the gopher truncated-3-gram walk; sumlen arithmetic") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents").select("text")
      .unionByName(Seq("", "a", "a  b ").toDF("text"))
    val t = TextFunctions.tokens(col("text"))
    val g3hof = transform(
      sequence(lit(1), greatest(size(t) - 2, lit(1))),
      i => array_join(slice(t, i, lit(3)), " "))
    assertColsEqual(docs.select(
      VectorExpressions.wordNgramsMinOne(col("text"), 3), g3hof), "g3")
    val sumHof = aggregate(transform(t, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    assertColsEqual(docs.select(
      (length(col("text")) - (size(t) - 1)).cast("long"), sumHof), "sumlen")
  }

  test("pmi skip-gram pairs via the kernel ≡ the indexed-lambda spelling") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val docs = spark.table("documents").select("text")
      .unionByName(Seq("", "one", "a  b c ", " x y").toDF("text"))
    for (d <- Seq(1, 2)) {
      val hof = docs.select(col("text").as("__w0"))
        .select(split(col("__w0"), " ").as("__w"))
        .select(explode(expr(
          s"""transform(slice(__w, 1, greatest(size(__w) - $d, 0)),
             |  (x, i) -> struct(
             |    least(x, element_at(__w, i + 1 + $d)) AS w1,
             |    greatest(x, element_at(__w, i + 1 + $d)) AS w2))""".stripMargin))
          .as("__p"))
        .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      val kernel = docs.select(explode(
          VectorExpressions.wordNgrams(col("text"), d + 1)).as("__g"))
        .select(substring_index(col("__g"), " ", 1).as("__wa"),
          substring_index(col("__g"), " ", -1).as("__wb"))
        .select(least(col("__wa"), col("__wb")).as("w1"),
          greatest(col("__wa"), col("__wb")).as("w2"))
      assertSameRows(kernel, hof, s"pmi pairs d=$d")
    }
  }

  test("bigramPairs via the kernel ≡ the struct-walk spelling, empty tokens included") {
    val docs = Seq(
      (1L, "a b c"), (2L, "single"), (3L, ""), (4L, "a  b"),
      (5L, "x y z "), (6L, " lead"), (7L, "p q p q p"))
      .toDF("doc_id", "text")
    val old = docs
      .select(col("doc_id"), split(col("text"), " ").as("__w"))
      .where(size(col("__w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(__w) - 1), " +
          "i -> struct(element_at(__w, i) AS w1, element_at(__w, i + 1) AS w2))"))
        .as("__b"))
      .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val now = graft.operators.Curation.perplexityScore(docs, "doc_id", "text")
    // pair-identity is pinned through knBigram's public gram feed: count
    // every (w1, w2) pair per doc through both spellings
    val newPairs = docs
      .select(col("doc_id"),
        explode(TextFunctions.wordNgrams(col("text"), 2)).as("__g"))
      .select(col("doc_id"),
        element_at(split(col("__g"), " ", 2), 1).as("w1"),
        element_at(split(col("__g"), " ", 2), 2).as("w2"))
    assertSameRows(newPairs, old, "bigram pairs")
    now.count() // the public consumer still evaluates
  }
}
