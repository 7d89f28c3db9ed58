package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.delta.{DeltaLog, Skipping, TransactionWriter}

/** Property-style randomized tests (seeded — deterministic across runs).
  * Spark jobs are expensive, so each property runs a small fixed number
  * of generated cases rather than scalacheck's default 100. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  test("str_to_bytes / boundary_parser round-trip on generated specs") {
    val unitGen = Gen.oneOf("b", "kb", "mb", "gb", "tb")
    val mult = Map("b" -> 1L, "kb" -> 1000L, "mb" -> 1000000L,
      "gb" -> 1000000000L, "tb" -> 1000000000000L)
    (1 to 100).foreach { i =>
      val n = sample(Gen.choose(0L, 9999L), i * 7L)
      val u = sample(unitGen, i * 13L)
      assert(Levi.strToBytes(s"$n$u") == n * mult(u))
      val (lo, hi) = Levi.boundaryParser(s"${n}$u-${n * 2}$u")
      assert(lo == n * mult(u) && hi == 2 * n * mult(u))
      assert(Levi.boundaryParser(s"<=$n$u") == ((0L, n * mult(u))))
      assert(Levi.boundaryParser(s">$n$u") == ((n * mult(u) + 1, Levi.MaxFileSize)))
    }
  }

  test("stats skipping is SOUND: pruned files never contain matches") {
    (1 to 6).foreach { caseId =>
      val path = Files.createTempDirectory("graft-prop").resolve("t").toString
      val log = DeltaLog.forPath(spark, path)
      val rows = (1 to 200).map { i =>
        val v = sample(Gen.choose(-1000L, 1000L), caseId * 1000L + i)
        (i.toLong, v)
      }
      TransactionWriter.overwrite(log, rows.toDF("id", "v").repartition(5))
      val snap = log.snapshot
      Seq("=", "<", "<=", ">", ">=").foreach { op =>
        val pivot = sample(Gen.choose(-1200L, 1200L), caseId * 31L + op.hashCode)
        val filters = Seq(("v", op, pivot))
        // rows from the FULL scan that satisfy the predicate...
        val expected = Skipping.readWhere(snap, Nil).where(op match {
          case "=" => col("v") === pivot
          case "<" => col("v") < pivot
          case "<=" => col("v") <= pivot
          case ">" => col("v") > pivot
          case ">=" => col("v") >= pivot
        }).collect().map(_.getLong(0)).toSet
        // ...must ALL survive the pruned scan (soundness; completeness
        // of pruning is best-effort, correctness is not)
        val got = Skipping.readWhere(snap, filters).collect().map(_.getLong(0)).toSet
        assert(got == expected,
          s"case $caseId op $op pivot $pivot: pruned scan lost/added rows " +
            s"(missing=${expected -- got}, extra=${got -- expected})")
      }
    }
  }

  test("writer round-trip preserves random data incl. nulls and partitions") {
    (1 to 5).foreach { caseId =>
      val path = Files.createTempDirectory("graft-prop").resolve("t").toString
      val log = DeltaLog.forPath(spark, path)
      val rows = (1 to 80).map { i =>
        val s = if (sample(Gen.choose(0, 5), caseId * 97L + i) == 0) null
          else sample(Gen.alphaNumStr.map(_.take(8)), caseId * 101L + i)
        val p = sample(Gen.oneOf("x", "y", null.asInstanceOf[String]), caseId * 103L + i)
        val d = sample(Gen.choose(-1e6, 1e6), caseId * 107L + i)
        (i.toLong, s, p, d)
      }
      val df = rows.toDF("id", "s", "p", "d")
      TransactionWriter.overwrite(log, df, partitionBy = Some(Seq("p")))
      // null partition values → __HIVE_DEFAULT_PARTITION__ round-trip
      assertSameRows(log.snapshot.read(), df, s"case $caseId")
    }
  }

  test("salted dedup equals unsalted for random data under a total order") {
    import graft.operators.Dedup
    (1 to 4).foreach { caseId =>
      val rows = (1 to 500).map { i =>
        val k = sample(Gen.choose(0, 20), caseId * 11L + i)
        (s"k$k", i.toLong)
      }
      val df = rows.toDF("k", "id").repartition(7)
      val plain = Dedup.dropDuplicatesOrdered(df, Seq("k"), Seq(col("id").asc))
      val salted = Dedup.dropDuplicatesOrderedSalted(df, Seq("k"), Seq(col("id").asc),
        salts = 2 + caseId)
      assertSameRows(salted, plain, s"case $caseId")
    }
  }

  test("salted dedup is stable across input repartitioning (content salt)") {
    import graft.operators.Dedup
    val rows = (1 to 400).map { i =>
      val k = sample(Gen.choose(0, 10), 31L + i)
      (s"k$k", i.toLong, sample(Gen.choose(0, 5), 77L + i))
    }
    val df = rows.toDF("k", "id", "v")
    // total order: identical survivors regardless of physical layout
    val a = Dedup.dropDuplicatesOrderedSalted(df.repartition(3), Seq("k"),
      Seq(col("id").asc), salts = 8)
    val b = Dedup.dropDuplicatesOrderedSalted(df.repartition(13), Seq("k"),
      Seq(col("id").asc), salts = 8)
    assertSameRows(a, b, "total order, different layouts")
    // non-total order (ties in v): the survivor must still be one row
    // per group holding the group-minimal order value
    val c = Dedup.dropDuplicatesOrderedSalted(df.repartition(5), Seq("k"),
      Seq(col("v").asc), salts = 8).collect()
    val minV = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).min }
    assert(c.length == minV.size)
    c.foreach(r => assert(r.getInt(2) == minV(r.getString(0)),
      s"survivor of ${r.getString(0)} does not carry the minimal order value"))
  }

  test("matview refresh equals a full recompute under random mutation sequences") {
    // the IVM soundness property, fuzzed: any interleaving of
    // append/delete/update batches, refreshed at random points, must
    // leave BOTH refresh strategies (signed fold for SUM, changed-key
    // rederive for SUM+MIN/MAX) equal to a from-scratch rollup
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val base = Files.createTempDirectory(s"graft-mvprop$trial-")
      val srcPath = base.resolve("src").toString
      val src = DeltaLog.forPath(spark, srcPath)
      var nextId = 1000L
      def batch(n: Int) = {
        val rows = (0 until n).map { _ =>
          nextId += 1; (nextId, s"g${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)
        }
        rows.toDF("id", "k", "v")
      }
      TransactionWriter.overwrite(src, batch(40))                  // v0
      graft.delta.ChangeDataFeed.enable(src)                       // v1
      val sumView = base.resolve("sum_view").toString
      val mmView = base.resolve("mm_view").toString
      graft.delta.MatView.create(spark, sumView, srcPath, Seq("k"), "v")
      graft.delta.MatView.create(spark, mmView, srcPath, Seq("k"),
        Seq("sum" -> "v", "min" -> "v", "max" -> "v"))
      for (_ <- 1 to 8) {
        rnd.nextInt(3) match {
          case 0 => TransactionWriter.append(src, batch(5 + rnd.nextInt(10)))
          case 1 => graft.delta.Mutations.delete(src,
            col("id") % (2 + rnd.nextInt(5)) === rnd.nextInt(2))
          case 2 => graft.delta.Mutations.update(src,
            col("v") % (2 + rnd.nextInt(4)) === 1,
            Map("v" -> lit(rnd.nextInt(2000).toLong)))
        }
        if (rnd.nextBoolean()) {
          graft.delta.MatView.refresh(spark, sumView)
          graft.delta.MatView.refresh(spark, mmView)
        }
      }
      graft.delta.MatView.refresh(spark, sumView)
      graft.delta.MatView.refresh(spark, mmView)
      // MatView.read is the view's read surface (raw snapshot reads
      // additionally expose the hidden IVM maintenance columns — the
      // SUM non-null counts, the AVG (sum, count) pairs)
      val truth = src.snapshot.read().groupBy("k")
      assertSameRows(graft.delta.MatView.read(spark, sumView),
        truth.agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v")),
        s"trial $trial signed-fold view diverged")
      assertSameRows(graft.delta.MatView.read(spark, mmView),
        truth.agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"),
          min("v").as("min_v"), max("v").as("max_v")),
        s"trial $trial rederive view diverged")
    }
  }

  test("decontaminate always flags a doc carrying a planted benchmark gram") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    (0 until 3).foreach { caseId =>
      def words(n: Int, seed: Long): String =
        (0 until n).map(i => vocab(sample(Gen.choose(0, vocab.size - 1), seed + i))).mkString(" ")
      val benchText = words(12, caseId * 1000L)
      val plant = benchText.split(" ").slice(2, 10).mkString(" ") // an 8-gram of the benchmark
      val carrier = words(5, caseId * 2000L) + " " + plant + " " + words(4, caseId * 3000L)
      val clean = "one two three four five six seven eight nine ten eleven twelve"
      val train = Seq((1L, carrier), (2L, clean)).toDF("doc_id", "text")
      val bench = Seq((9L, benchText)).toDF("doc_id", "text")
      val out = operators.Curation.decontaminate(train, bench, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(out(1L), s"case $caseId: planted gram not flagged")
      assert(!out(2L), s"case $caseId: clean doc falsely flagged")
    }
  }

  test("asOf equals the naive per-row latest-match on random data") {
    import graft.operators.AsOfJoin
    (1 to 4).foreach { caseId =>
      // random keys/times with deliberate collisions; ~1/6 right values NULL
      val left = (1 to 60).map { i =>
        (sample(Gen.choose(0, 5), caseId * 11L + i).toLong, // k
          sample(Gen.choose(0L, 40L), caseId * 13L + i),    // t
          i.toLong)                                          // lid
      }
      val right = (1 to 50).map { i =>
        val v = if (sample(Gen.choose(0, 5), caseId * 17L + i) == 0) None
          else Some(sample(Gen.choose(0L, 999L), caseId * 19L + i))
        (sample(Gen.choose(0, 5), caseId * 23L + i).toLong, // k
          sample(Gen.choose(0L, 40L), caseId * 29L + i),    // rt
          i.toLong,                                          // seq (tie-break)
          v)                                                 // rv (nullable)
      }
      val got = AsOfJoin.asOf(
        left.toDF("k", "t", "lid").repartition(5),
        right.toDF("k", "rt", "seq", "rv").repartition(3),
        Seq("k"), "t", "rt", Seq("seq", "rv"), rightOrder = Seq("seq"))
        .collect()
        .map(r => (r.getAs[Long]("lid"),
          (r.getAs[Long]("asof_rt"), r.getAs[Long]("asof_seq"),
            Option(r.getAs[Any]("asof_rv"))))).toMap
      // naive reference: per left row, the max-(rt, seq) right row with rt <= t
      val want = left.flatMap { case (k, t, lid) =>
        val matches = right.filter(r => r._1 == k && r._2 <= t)
        if (matches.isEmpty) None
        else {
          val m = matches.maxBy(r => (r._2, r._3))
          Some(lid -> ((m._2, m._3, m._4.map(_.asInstanceOf[Any]))))
        }
      }.toMap
      assert(got == want, s"case $caseId")
      assert(want.nonEmpty, s"case $caseId degenerate")
    }
  }

  test("redactPii leaves no pattern match behind (idempotent fixpoint)") {
    (0 until 3).foreach { caseId =>
      val docs = (0 until 20).map { i =>
        val base = sample(Gen.alphaLowerStr.map(_.take(12)), caseId * 500L + i)
        val s = (caseId + i) % 3 match {
          case 0 => s"$base user${i}@mail$i.com tail"
          case 1 => s"$base ${1000 + i * 37} and ${i}9 tail"
          case 2 => base
        }
        (i.toLong, s)
      }.toDF("doc_id", "text")
      val red = operators.Curation.redactPii(docs, "doc_id", "text")
      // re-running redaction on already-redacted text changes nothing
      val twice = operators.Curation.redactPii(
        red.select(col("doc_id"), col("redacted").as("text")), "doc_id", "text")
      assert(twice.where(col("n_emails") > 0 || col("n_ids") > 0).count() == 0,
        s"case $caseId: residual PII patterns after redaction")
    }
  }

  test("removeBoilerplate equals the naive frequent-chunk filter") {
    import graft.operators.Curation
    val words = Seq("a", "b", "c", "d", "e")
    (1 to 4).foreach { caseId =>
      val docs = (1L to 20L).map { i =>
        val n = sample(Gen.choose(1, 12), caseId * 100 + i)
        val txt = (1 to n).map(j =>
          words(sample(Gen.choose(0, words.size - 1), caseId * 1000 + i * 31 + j)))
          .mkString(" ")
        (i, txt)
      }
      val df = docs.toDF("doc_id", "text")
      val cw = 3
      val out = Curation.removeBoilerplate(df, "doc_id", "text",
        chunkWords = cw, minDocs = 2)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      // naive reference in plain Scala
      def chunksOf(t: String) = t.split(" ").grouped(cw).map(_.mkString(" ")).toSeq
      val freq = docs.flatMap { case (id, t) => chunksOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val expected = docs.map { case (id, t) =>
        id -> chunksOf(t).filterNot(freq).mkString(" ")
      }.filter(_._2.nonEmpty).toMap
      assert(out == expected, s"case $caseId")
    }
  }

  test("upsampleEpochs total copies equal the per-row closed form") {
    import graft.operators.Curation
    import graft.functions.TextFunctions
    (1 to 3).foreach { caseId =>
      val rows = (1L to 50L).map(i => (if (i % 2 == 0) "g1" else "g2", i))
      val df = rows.toDF("g", "id")
      val f = Map("g1" -> 1.7, "g2" -> 2.0)
      val out = Curation.upsampleEpochs(df, "g", "id", f)
      // closed form per row: floor(f) + [md5frac(id) < round(frac(f),6)]
      val fracs = df.select(col("id"),
        (TextFunctions.hash28(col("id").cast("string")).cast("double") /
          268435456.0).as("u")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = rows.map { case (g, id) =>
        val fv = f(g)
        math.floor(fv).toLong +
          (if (fracs(id) < BigDecimal(fv - math.floor(fv))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) 1L else 0L)
      }.sum
      assert(out.count() == expected, s"case $caseId")
    }
  }

  test("shuffleExport is a bijection for generated corpora") {
    (1 to 4).foreach { caseId =>
      val n = sample(Gen.choose(20, 120), caseId * 97L)
      val shards = sample(Gen.choose(1, 9), caseId * 101L)
      val docs = (0 until n).map(i => (i.toLong * 3 + caseId, s"d$i"))
        .toDF("doc_id", "text")
      val out = graft.operators.Curation.shuffleExport(docs, "doc_id", shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(out.length == n)
      assert(out.map(_._1).distinct.length == n, "every doc exactly once")
      // (shard, pos) is a key and positions are dense per shard
      val byShard = out.groupBy(_._2)
      byShard.foreach { case (sh, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
          s"case $caseId shard $sh positions not dense")
      }
    }
  }

  test("aggDelta of an insert-only feed equals the full aggregate") {
    (1 to 4).foreach { caseId =>
      val rows = (1 to 150).map { i =>
        val k = sample(Gen.oneOf("a", "b", "c", "d"), caseId * 503L + i)
        val v = sample(Gen.choose(-50L, 50L), caseId * 509L + i)
        (k, v, "insert")
      }
      val delta = graft.operators.IncrementalAgg.aggDelta(
        rows.toDF("k", "v", "_change_type"), Seq("k"), "v")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expected = rows.groupBy(_._1).map { case (k, rs) =>
        k -> ((rs.size.toLong, rs.map(_._2).sum))
      }
      assert(delta == expected, s"case $caseId")
    }
  }

  test("hashedFeatures: total signed mass is bounded by the token count") {
    (1 to 4).foreach { caseId =>
      val words = Seq("red", "blue", "green", "gold", "iron", "clay")
      val docs = (0 until 30).map { i =>
        val len = sample(Gen.choose(1, 20), caseId * 701L + i)
        val text = (0 until len)
          .map(j => sample(Gen.oneOf(words), caseId * 709L + i * 31L + j))
          .mkString(" ")
        (i.toLong, text)
      }.toDF("doc_id", "text")
      val feats = graft.operators.Classifier
        .hashedFeatures(docs, "doc_id", "text", 64)
        .groupBy("doc_id").agg(sum(abs(col("val"))).as("mass"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lens = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      feats.foreach { case (id, m) =>
        assert(m <= lens(id), s"case $caseId doc $id mass $m > ${lens(id)}")
      }
    }
  }

  test("SQ codes are within [0,255] and order-preserving per dimension") {
    (1 to 4).foreach { caseId =>
      val vecs = (1 to 40).map { i =>
        (i.toLong, (1 to 6).map(d =>
          sample(Gen.choose(-100.0, 100.0), caseId * 1000L + i * 17L + d)))
      }
      val df = vecs.toDF("vec_id", "embedding")
      val (mns, mxs) = operators.Sq.trainBounds(df, "embedding")
      val codes = df.select(col("vec_id"),
          operators.Sq.sqCodes(col("embedding"), mns.toSeq, mxs.toSeq).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(codes.values.flatten.forall(c => c >= 0L && c <= 255L))
      // order preservation: x_a <= x_b in a dimension => code_a <= code_b
      // (the affine map is monotone and both clamp the same way)
      val byId = vecs.toMap
      for (a <- codes.keys; bK <- codes.keys; d <- 0 until 6
           if byId(a)(d) <= byId(bK)(d))
        assert(codes(a)(d) <= codes(bK)(d),
          s"case $caseId dim $d: ${byId(a)(d)} -> ${codes(a)(d)} vs " +
            s"${byId(bK)(d)} -> ${codes(bK)(d)}")
    }
  }

  test("PageRank conserves mass on regular graphs (no flooring loss)") {
    // On a d-regular symmetric graph every score divides evenly at the
    // uniform fixed point, so total mass stays exactly n·scale.
    (1 to 3).foreach { caseId =>
      val n = 4 + caseId * 2
      // ring: i <-> i+1 (mod n) — 2-regular, symmetric
      val edges = (0 until n).flatMap { i =>
        Seq((i.toLong, ((i + 1) % n).toLong), (((i + 1) % n).toLong, i.toLong))
      }
      val out = operators.PageRank.pageRank(
          edges.toDF("src", "dst"), "src", "dst", iterations = 4)
        .collect().map(_.getLong(1))
      assert(out.length == n)
      assert(out.toSet == Set(1000000L),
        s"ring should sit at the uniform fixed point, got ${out.toSeq}")
    }
  }

  test("funnel counts are monotonically non-increasing across stages") {
    (1 to 3).foreach { caseId =>
      val types = Seq("a", "b", "c")
      val rows = (1 to 300).map { i =>
        (sample(Gen.choose(1L, 25L), caseId * 900L + i * 3L),
          sample(Gen.choose(0L, 1000L), caseId * 901L + i * 7L),
          types(sample(Gen.choose(0, 2), caseId * 902L + i * 11L)))
      }
      val out = operators.Funnel.funnelCounts(
          rows.toDF("user_id", "ets", "event_type"),
          "user_id", "ets", "event_type", types)
        .orderBy("stage").collect().map(_.getLong(2)).toSeq
      assert(out.size == 3)
      assert(out == out.sorted.reverse,
        s"case $caseId: stages must shrink, got $out")
    }
  }
}
