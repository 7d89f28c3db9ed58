package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.operators.MinHashLsh

/** Round-13 optimization-round kernels: the codegen'd BottomK and
  * MinHashBandKeys expressions must be value-identical to the composed
  * HOF spellings they replaced on the LSH hot paths
  * (`slice(array_sort(hs), 1, k)` and the `aggregate(sequence(...))`
  * concat_ws fold) — including null arrays, null elements, empty
  * arrays, shorter-than-k arrays, duplicate values and negative
  * values. A divergence here would silently change LSH candidate
  * generation (anchors / band buckets) and with it every dedup /
  * containment / index gate's oracle hash. */
class KernelExprSpec extends SparkTestBase {
  import spark.implicits._

  private val arrays: Seq[Seq[java.lang.Long]] = Seq(
    Seq.empty,
    Seq(5L: java.lang.Long),
    Seq(3L, 1L, 2L).map(Long.box),
    Seq(9L, 9L, 9L).map(Long.box),                      // duplicates
    Seq(-4L, 7L, -4L, 0L, Long.MaxValue).map(Long.box), // negatives, dup
    (1L to 20L).reverse.map(Long.box),                  // longer than k
    Seq[java.lang.Long](null, 3L, null, 1L),            // null elements
    Seq[java.lang.Long](null, null))

  private def arrayDf = {
    val rows = arrays.map(a => Tuple1(a)) :+ Tuple1(null.asInstanceOf[Seq[java.lang.Long]])
    rows.toDF("hs")
  }

  test("BottomK ≡ slice(array_sort) on adversarial arrays, k = 1/3/8") {
    for (k <- Seq(1, 3, 8)) {
      val rows = arrayDf.select(col("hs"),
        MinHashLsh.bottomK(col("hs"), k).as("fused"),
        MinHashLsh.bottomKComposed(col("hs"), k).as("hof")).collect()
      rows.foreach { r =>
        if (r.isNullAt(1) || r.isNullAt(2))
          assert(r.isNullAt(1) && r.isNullAt(2),
            s"null disagreement on ${r.get(0)} (k=$k)")
        else
          assert(r.getSeq[Any](1) == r.getSeq[Any](2),
            s"mismatch on ${r.get(0)} (k=$k): " +
              s"fused=${r.getSeq[Any](1)} hof=${r.getSeq[Any](2)}")
      }
    }
  }

  test("BottomK ≡ composed on real shingle arrays") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val hs = MinHashLsh.hashedShingles(
      spark.table("documents").select("doc_id", "text"), "doc_id", "text")
    val rows = hs.select(
      MinHashLsh.bottomK(col("hs"), MinHashLsh.AnchorK).as("fused"),
      MinHashLsh.bottomKComposed(col("hs"), MinHashLsh.AnchorK).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("MinHashBandKeys ≡ aggregate fold on adversarial signature arrays") {
    // Signature-shaped arrays: exactly NumHashes entries or the NULL
    // array — the full domain MinHashSignatures can produce (its
    // output is always length-16, or null for a null shingle array).
    // Shorter arrays are NOT in the domain: the composed fold's
    // element_at ERRORS on them under ANSI, while the fused kernel
    // treats missing entries as skipped — strictly more permissive,
    // never reachable through the pipeline.
    val sigs = Seq(
      (1L to 16L).map(Long.box),
      (1L to 16L).map(i => Long.box(i * -7L)),
      Seq[java.lang.Long](null, 2L, 3L, 4L, 5L, null, 7L, 8L,
        9L, 10L, 11L, 12L, null, null, null, null),
      Seq.fill(16)(null: java.lang.Long))
    val rows = (sigs.map(a => Tuple1(a)) :+
      Tuple1(null.asInstanceOf[Seq[java.lang.Long]])).toDF("sig")
      .select(col("sig"),
        MinHashLsh.bandKeysOf(col("sig")).as("fused"),
        MinHashLsh.bandKeysOfComposed(col("sig")).as("hof")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1), s"fused must never be null (sig=${r.get(0)})")
      if (r.isNullAt(2)) {
        // composed fold only nulls when aggregate() gets a NULL seq —
        // it never does (sequence(0,3) is literal); defensive guard
        assert(false, s"composed unexpectedly null on ${r.get(0)}")
      } else assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch on ${r.get(0)}: fused=${r.getSeq[String](1)} " +
          s"hof=${r.getSeq[String](2)}")
    }
  }

  test("MinHashBandKeys ≡ fold through the real signature kernel") {
    graft.queries.Queries.registerViews(spark, "/root/testdata/sf0.001")
    val hs = MinHashLsh.hashedShingles(
      spark.table("documents").select("doc_id", "text"), "doc_id", "text")
    val sig = VectorExpressions.minhashSignatures(col("hs"),
      graft.queries.Queries.MinhashA, graft.queries.Queries.MinhashB,
      graft.queries.Queries.MinhashP)
    val rows = hs.select(
      MinHashLsh.bandKeysOf(sig).as("fused"),
      MinHashLsh.bandKeysOfComposed(sig).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }
}
