package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  test("naiveBayesConfusion separates lexically distinct classes") {
    val train = Seq(
      ("A", 1L, "x x x y"), ("A", 2L, "x x y x"), ("A", 3L, "x y x x"),
      ("B", 4L, "z z z y"), ("B", 5L, "z z y z"), ("B", 6L, "z y z z"))
      .toDF("source", "doc_id", "text")
    val test0 = Seq(
      ("A", 10L, "x x"), ("A", 11L, "x y x"),
      ("B", 12L, "z z"), ("B", 13L, "y z z"))
      .toDF("source", "doc_id", "text")
    val cm = Classifier
      .naiveBayesConfusion(train, test0, "source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(cm == Set(("A", "A", 2L), ("B", "B", 2L)))
  }

  test("naiveBayesConfusion prior decides when tokens are uninformative") {
    // "w" is unseen in training; both classes fall back to default token
    // scores, and class A's larger prior (2 docs vs 1) plus identical
    // token totals must win.
    val train = Seq(
      ("A", 1L, "x"), ("A", 2L, "x"), ("B", 3L, "x x"))
      .toDF("source", "doc_id", "text")
    val test0 = Seq(("B", 10L, "w")).toDF("source", "doc_id", "text")
    val cm = Classifier
      .naiveBayesConfusion(train, test0, "source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.toSeq == Seq(("B", "A", 1L)))
  }

  test("hashedFeatures signed counts match an independent md5") {
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val got = Classifier.hashedFeatures(df, "doc_id", "text", 1024)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap

    def h28(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def sign(t: String): Long = if (h28("s|" + t) % 2 == 0) 1L else -1L
    val expected = Map(
      h28("a") % 1024 -> 2L * sign("a"),
      h28("b") % 1024 -> sign("b"))
    assert(got == expected)
  }

  test("pmiCooccurrence counts window-2 pairs and quantizes ln exactly") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val rows = Classifier.pmiCooccurrence(df, "text", window = 2, minCount = 1L)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // d=1 pairs: (a,b) x3; d=2 pairs: (a,a), (b,b). npair=5, ntok=4.
    def pmiE6(cp: Long, c1: Long, c2: Long): Long =
      math.floor(1e6 * math.log(cp.toDouble * 4 * 4 / (5.0 * c1 * c2))).toLong
    assert(rows == Map(
      ("a", "b") -> (3L, pmiE6(3, 2, 2)),
      ("a", "a") -> (1L, pmiE6(1, 2, 2)),
      ("b", "b") -> (1L, pmiE6(1, 2, 2))))
  }

  test("vocabIndex ranks by frequency then token, ids dense from 0") {
    val df = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val v = Classifier.vocabIndex(df, "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v == Set(("b", 3L, 0L), ("a", 2L, 1L), ("c", 1L, 2L)))
  }

  test("encodeTokens preserves token order through the vocabulary join") {
    val df = Seq((1L, "b b b a a c"), (2L, "c a b")).toDF("doc_id", "text")
    val vocab = Classifier.vocabIndex(df, "text")
    val enc = Classifier.encodeTokens(df, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // Corpus counts: b=4, a=3, c=2 -> ids b=0, a=1, c=2.
    assert(enc == Map(
      1L -> Seq(0L, 0L, 0L, 1L, 1L, 2L),
      2L -> Seq(2L, 1L, 0L)))
  }

  test("pmiCooccurrence respects minCount") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val rows = Classifier.pmiCooccurrence(df, "text", window = 2, minCount = 2L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(rows == Set(("a", "b")))
  }
}
