package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Library-level semantics of the corpus-curation operators (the
  * driver-facing query counterparts are gated by the DuckDB oracle). */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("temperatureSample: flattens toward low-resource groups, deterministic") {
    val rows = (1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 110).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "grp")
    val got = graft.operators.Curation
      .temperatureSample(df, "grp", "id", alpha = 0.5, targetRows = 50L)
    val byGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate_small = min(1, 50·√10/(√100+√10)/10) = 1.0 → fully kept
    assert(byGrp("small") == 10L, s"small group must be fully kept: $byGrp")
    // rate_big ≈ 0.38 — threshold sampling lands NEAR the expectation
    assert(byGrp("big") > 20L && byGrp("big") < 55L, s"big ≈ 38%: $byGrp")
    // pure function of the data: identical on a second run
    val again = graft.operators.Curation
      .temperatureSample(df, "grp", "id", alpha = 0.5, targetRows = 50L)
    assertSameRows(got, again, "temperature sample determinism")
  }

  test("chunkDocuments: overlapping windows cover every token exactly") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, text), (2L, "a b")).toDF("doc_id", "text")
    val chunks = graft.operators.Curation
      .chunkDocuments(docs, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // stride 3: [w1..w4], [w4..w7], [w7..w10]
    assert(d1.map(_._3).toSeq == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L))
    // short doc: one chunk, the whole text
    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, "a b", 2L)))
    // consecutive chunks overlap by exactly overlapTokens
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(" ").last == b._3.split(" ").head)
    }
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark") {
    val overlap = "one two three four five six seven eight"
    val train = Seq(
      (1L, s"prefix words $overlap suffix words here"),
      (2L, "totally different content with no shared gram at all xx"),
      (3L, s"another carrier of $overlap indeed")).toDF("doc_id", "text")
    val bench = Seq((100L, s"benchmark holds $overlap and more")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getBoolean(2)).toSeq == Seq(true, false, true))
    assert(out(0).getLong(1) >= 1 && out(1).getLong(1) == 0)
  }

  test("dedupParagraphs keeps first occurrence, drops repeats, reassembles in order") {
    // chunk size 2: doc 1 = [a b][c d], doc 2 = [c d][e f], doc 3 = [a b]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, "doc_id", "text", chunkWords = 2)
      .orderBy("doc_id").collect()
    // doc 3's only chunk duplicates doc 1's first -> doc 3 disappears
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(2) == "a b c d" && out(0).getLong(1) == 2L)
    assert(out(1).getString(2) == "e f" && out(1).getLong(1) == 1L)
  }

  test("dedupParagraphs removes intra-document repeats and ragged tails") {
    // doc 1 = [x y][x y][z] -> second [x y] is an intra-doc repeat;
    // trailing chunk shorter than chunkWords survives on its own
    val docs = Seq((1L, "x y x y z"), (2L, "z")).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(docs, "doc_id", "text", chunkWords = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getString(2) == "x y z" && out(0).getLong(1) == 2L)
  }

  test("scrubContamination cuts only the touching chunks") {
    // chunk 2 words, grams 2 words: doc 1 = [a b][c d][e f]; bench
    // contains "c d" -> only the middle chunk is cut
    val train = Seq((1L, "a b c d e f"), (2L, "c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "x c d y")).toDF("doc_id", "text")
    val out = Curation.scrubContamination(train, bench, "doc_id", "text",
      chunkWords = 2, gramSize = 2).orderBy("doc_id").collect()
    // doc 2 was entirely contaminated -> disappears
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getString(2) == "a b e f" && out(0).getLong(1) == 2L)
  }

  test("removeBoilerplate drops cross-doc frequent chunks from every doc") {
    // chunk size 2: [a b] appears in docs 1, 2, 3 -> boilerplate, removed
    // everywhere (no survivor); intra-doc repeat [c d][c d] in doc 1 is
    // ONE distinct doc -> kept, both copies.
    val docs = Seq(
      (1L, "a b c d c d"),
      (2L, "a b e f"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
      chunkWords = 2, minDocs = 2).orderBy("doc_id").collect()
    // doc 3 was pure boilerplate -> disappears
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(2) == "c d c d" && out(0).getLong(1) == 2L)
    assert(out(1).getString(2) == "e f" && out(1).getLong(1) == 1L)
  }

  test("repeatedSpans counts cross-doc sliding windows, ignores intra-doc repeats") {
    // k = 3: doc 1 and 2 share the span "a b c" (doc 2 shifted by one
    // token — sliding windows catch it, disjoint chunks would not);
    // doc 3's "x y z x y z" repeats only WITHIN itself -> not
    // duplicated; doc 4 is shorter than k -> no output row.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "q a b c"),
      (3L, "x y z x y z"),
      (4L, "t u")).toDF("doc_id", "text")
    val out = Curation.repeatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 2L, 1L), // windows: [a b c][b c d]; dup: [a b c]
      (2L, 2L, 1L), // windows: [q a b][a b c]; dup: [a b c]
      (3L, 4L, 0L)), out.toString) // 4 windows, all intra-doc only
  }

  test("removeBoilerplate honors the minDocs threshold") {
    val docs = Seq(
      (1L, "a b x y"),
      (2L, "a b"),
      (3L, "a b")).toDF("doc_id", "text")
    // minDocs = 4: nothing is frequent enough, all docs intact
    val out = Curation.removeBoilerplate(docs, "doc_id", "text",
      chunkWords = 2, minDocs = 4).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getString(2) == "a b x y")
  }

  test("importanceSample keeps high-weight rows preferentially and is deterministic") {
    val docs = (1L to 400L).map(i => (i, if (i % 4 == 0) 100.0 else 1.0))
      .toDF("doc_id", "w")
    val out = Curation.importanceSample(docs, "doc_id", col("w"), 0.25)
    val kept = out.collect().map(_.getLong(0)).toSet
    // weight 100 vs mean ~25.75 -> heavy rows rate ~0.97, light ~0.0097
    val heavy = kept.count(_ % 4 == 0)
    val light = kept.size - heavy
    assert(heavy > 80 && light < 10, s"heavy=$heavy light=$light")
    // pure function of the data: a second run selects the same rows
    assert(Curation.importanceSample(docs, "doc_id", col("w"), 0.25)
      .collect().map(_.getLong(0)).toSet == kept)
  }

  test("importanceSample caps the rate at 1 and validates inputs") {
    val docs = Seq((1L, 5.0), (2L, 5.0)).toDF("doc_id", "w")
    // uniform weights at fraction 1.0 -> rate 1 -> everything kept
    assert(Curation.importanceSample(docs, "doc_id", col("w"), 1.0).count() == 2)
    intercept[IllegalArgumentException] {
      Curation.importanceSample(docs, "doc_id", col("w"), 0.0)
    }
  }

  test("upsampleEpochs repeats whole epochs and samples the fraction") {
    val docs = (1L to 400L).map(i => (if (i <= 200) "a" else "b", i))
      .toDF("src", "doc_id")
    val out = Curation.upsampleEpochs(docs, "src", "doc_id",
      Map("a" -> 2.0, "b" -> 1.5)).cache()
    // integer factor: exactly 2 copies of every 'a' row, copies 1..2
    assert(out.where(col("src") === "a").count() == 400L)
    assert(out.where(col("src") === "a").groupBy("doc_id").count()
      .where(col("count") =!= 2).count() == 0)
    // fractional: between 1 and 2 copies, expected ~300 total
    val bCnt = out.where(col("src") === "b").count()
    assert(bCnt > 250 && bCnt < 350, s"b=$bCnt")
    // deterministic: same rows again
    val again = Curation.upsampleEpochs(docs, "src", "doc_id",
      Map("a" -> 2.0, "b" -> 1.5))
    assert(again.count() == out.count())
    out.unpersist()
    // factor < 1 down-samples without error
    val down = Curation.upsampleEpochs(docs, "src", "doc_id",
      Map("a" -> 0.5, "b" -> 0.5)).count()
    assert(down > 120 && down < 280, s"down=$down")
  }

  test("perplexityScore matches a hand-computed bigram LM") {
    // corpus bigrams: doc1 "a b a b": (a,b)x2 (b,a)x1; doc2 "a b": (a,b)
    // uni: a->3, b->1 (as bigram-left); V = distinct{a,b} = 2
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = Curation.perplexityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def nll(bn: Long, un: Long): Long =
      math.floor(-1e6 * math.log((bn + 1).toDouble / (un + 2).toDouble)).toLong
    val ab = nll(3, 3) // (a,b) count 3, u(a)=3
    val ba = nll(1, 1) // (b,a) count 1, u(b)=1
    assert(out(1L) == ((3L, (ab + ba + ab) / 3)), out(1L).toString)
    assert(out(2L) == ((1L, ab)))
    assert(!out.contains(3L), "single-token docs have no bigrams")
  }

  test("decontaminate handles docs shorter than the gram size") {
    val train = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text")
    // whole-doc truncated gram matches the identical benchmark doc
    assert(out.where(col("contaminated")).count() == 2)
  }

  test("gopherQuality computes exact metrics on a crafted doc") {
    // tokens: aa aa aa bb (nt=4, sumlen=8, top=3); 3-grams: "aa aa aa","aa aa bb" (2 distinct of 2)
    val df = Seq((7L, "aa aa aa bb")).toDF("doc_id", "text")
    val r = Curation.gopherQuality(df, "doc_id", "text").collect()(0)
    assert(r.getLong(1) == 2000000L) // mean word len 2.0
    assert(r.getLong(2) == 750000L)  // 3/4
    assert(r.getLong(3) == 0L)       // no duplicate 3-grams
    val rep = Seq((8L, "x x x x x x")).toDF("doc_id", "text")
    val r2 = Curation.gopherQuality(rep, "doc_id", "text").collect()(0)
    assert(r2.getLong(3) == 750000L) // 4 grams, 1 distinct -> 0.75
  }

  test("stratifiedSample takes an exact deterministic quota per stratum") {
    val df = (0 until 300).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "grp")
    val a = Curation.stratifiedSample(df, Seq("grp"), "id", 10)
    assert(a.count() == 30)
    assert(a.groupBy("grp").count().collect().forall(_.getLong(1) == 10))
    val b = Curation.stratifiedSample(df.repartition(7), Seq("grp"), "id", 10)
    assert(a.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("normalizeText lower-cases, strips non-printables, collapses spaces") {
    val df = Seq("  Hello\tWORLD  é  x  ").toDF("t")
      .select(Curation.normalizeText(col("t")).as("n"))
    assert(df.collect()(0).getString(0) == "hello world x")
  }

  test("mixSources hits per-source quotas deterministically") {
    import graft.operators.Curation
    val docs = ((0 until 100).map(i => (i.toLong, "keep")) ++
      (100 until 200).map(i => (i.toLong, "half")) ++
      (200 until 210).map(i => (i.toLong, "tiny")) ++
      (300 until 320).map(i => (i.toLong, "dropped")))
      .toDF("doc_id", "source")
    val weights = Map("keep" -> 1.0, "half" -> 0.5, "tiny" -> 0.01)
    val out = Curation.mixSources(docs, "source", "doc_id", weights)
    val bySource = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // ceil(1.0*100)=100, ceil(0.5*100)=50, ceil(0.01*10)=1, dropped absent
    assert(bySource == Map("keep" -> 100L, "half" -> 50L, "tiny" -> 1L),
      bySource.toString)
    // layout-independent: same selection after a repartition
    val out2 = Curation.mixSources(docs.repartition(7), "source", "doc_id", weights)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      out2.select("doc_id").as[Long].collect().sorted.toSeq)
    intercept[IllegalArgumentException] {
      Curation.mixSources(docs, "source", "doc_id", Map("keep" -> 1.5))
    }
  }

  test("shuffleExport: dense per-shard positions, deterministic, total") {
    val docs = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out = Curation.shuffleExport(docs, "doc_id", shards = 8).cache()
    assert(out.count() == 100)
    // positions are dense 0..n-1 within each shard
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    byShard.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1, r.toString)
    }
    // deterministic across runs and layouts
    val again = Curation.shuffleExport(docs.repartition(7), "doc_id", 8)
    assertSameRows(out, again, "shuffleExport determinism")
    out.unpersist()
  }

  test("tokenBudgetSelect matches a single-window greedy selection") {
    val docs = (0L until 60L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.tokenBudgetSelect(docs, "doc_id", "text", 0.4)
    // oracle: the same selection with a plain global window
    val t = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
      graft.functions.TextFunctions.qualityScoreE6(col("text")).as("quality_e6"))
    val budget = t.agg(floor(sum("n_tokens") * 0.4).cast("long")).first().getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_e6").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expect = t.withColumn("cum", sum("n_tokens").over(w))
      .where(col("cum") <= budget)
      .select("doc_id", "quality_e6", "n_tokens")
    assertSameRows(out, expect, "distributed vs single-window prefix sum")
    // the budget is actually binding: selected tokens <= budget < selected + 1 more
    val sel = out.agg(coalesce(sum("n_tokens"), lit(0L))).first().getLong(0)
    assert(sel <= budget)
  }

  test("bm25TopK matches a hand-evaluated Okapi formula") {
    // 3 docs, term "x": tf 2/1/0, dl 4/2/3 -> doc 1 then doc 2; doc 3 absent.
    val docs = Seq(
      (1L, "x x y z"), (2L, "x y"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = Curation.bm25TopK(docs, "doc_id", "text", Seq("x"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def s(tf: Double, dl: Double): Long = {
      val n = 3.0; val df0 = 2.0; val avg = 9.0 / 3.0
      val idf = math.log((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
      val tfn = tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avg)))
      math.floor(1e6 * idf * tfn).toLong
    }
    assert(got.toSeq == Seq((1L, s(2, 4)), (2L, s(1, 2))))
  }

  test("dsirSelect ranks target-like documents above off-distribution ones") {
    // Target seed (ids 0-9) writes about apples; raw bulk (ids 10-49)
    // about rocks; ids 50-54 are apple-like raw docs — DSIR must pull
    // exactly the apple-like raw docs into a top-5 over the raw pool.
    val docs = (
      (0L until 10L).map(i => (i, "sweet apple orchard ripe apple harvest")) ++
      (10L until 50L).map(i => (i, s"grey rock basalt granite stone slab r$i")) ++
      (50L until 55L).map(i => (i, "sweet apple orchard crisp apple cider"))
    ).toDF("doc_id", "text")
    val top = Curation.dsirSelect(docs.where(col("doc_id") >= 10),
      "doc_id", "text", isTarget = lit(false), buckets = 512, topK = 5)
    // score raw docs against a target distribution: build scores from
    // the FULL frame where target = ids < 10
    val sel = Curation.dsirSelect(docs, "doc_id", "text",
      isTarget = col("doc_id") < 10, buckets = 512, topK = 15)
      .collect().map(_.getLong(0)).toSet
    assert((50L until 55L).forall(sel.contains),
      s"apple-like raw docs missing from DSIR selection: $sel")
    assert(top.count() == 5) // smoke: the all-raw scoring path also runs
  }

  test("knBigram matches the hand-computed fixed-point KN recurrence") {
    // tokens [a,b,a,b,a,c]: c12 = {(a,b)->2, (a,c)->1, (b,a)->2};
    // c1 = {a: (3, 2 conts), b: (2, 1)}; N1+(.w) = 1 each; N1+(..) = 3
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = Curation.knBigram(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 583332L)),
      ("a", "c") -> ((1L, 3L, 249999L)),
      ("b", "a") -> ((2L, 2L, 749999L))), s"got $out")
    // interpolated KN: per-history mass over observed continuations
    // stays under 1 (the remainder backs off to unseen words)
    val perW1 = out.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2._3).sum).toMap
    assert(perW1.values.forall(m => m > 0L && m <= 1000000L), s"$perW1")
  }

  test("noveltyScore credits first occurrence to the lowest doc id") {
    // bigrams (n=2): doc 1 "a b c" -> {a b, b c}; doc 2 "b c d" ->
    // {b c, c d}: doc 1 originates both of its grams, doc 2 only "c d"
    val df = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val out = Curation.noveltyScore(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L))), s"got $out")
  }

  test("tokenEntropy: uniform max, single-token zero, exact fixed point") {
    val df = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Curation.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: one token, p=1, entropy 0; doc 2: uniform over 4 ->
    // ln(4) = 1.386294...; term per token = floor(1e6*ln 4) = 1386294
    assert(out == Map(1L -> ((4L, 0L)), 2L -> ((4L, 1386294L))), s"got $out")
  }

  test("weightedSample is deterministic and returns exactly k winners") {
    val df = (1L to 50L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
    val a = Curation.weightedSample(df, "doc_id", "n_chars", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val b = Curation.weightedSample(df, "doc_id", "n_chars", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "sample is not deterministic across runs")
    assert(a.length == 10 && a.map(_._1).distinct.length == 10)
    // keys are the ascending selection order
    assert(a.map(_._2).toSeq == a.map(_._2).sorted.toSeq)
    // zero/negative weights are excluded, never division-by-zero
    val z = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "n_chars")
    val zo = Curation.weightedSample(z, "doc_id", "n_chars", k = 5).collect()
    assert(zo.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("redactPii counts and replaces emails and digit runs") {
    val df = Seq((1L, "reach me at bob99@mail.com or 12345 ext 77"),
                 (2L, "nothing to hide")).toDF("doc_id", "text")
    val out = Curation.redactPii(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 3)
    assert(out(0).getString(3) == "reach me at <EMAIL> or <ID> ext <ID>")
    assert(out(1).getLong(1) == 0 && out(1).getLong(2) == 0)
    assert(out(1).getString(3) == "nothing to hide")
  }
}
