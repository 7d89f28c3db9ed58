package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("char split has no empty symbols") {
    val r = Seq("abc").toDF("w").select(expr("split(w, '')").as("s")).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"), r.getSeq[String](0).toString)
  }

  test("bpePairCounts weights pairs by word frequency") {
    // corpus: "ab ab cd" -> ab freq 2, cd freq 1
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val out = Bpe.bpePairCounts(docs, "text", topK = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out(("a", "b")) == 2L)
    assert(out(("c", "d")) == 1L)
  }

  test("trainBpe learns the classic merges and applyBpe segments with them") {
    // the textbook example: low lower lowest newest widest
    val docs = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest widest")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainBpe(docs, "text", numMerges = 4)
    // "es" (6) and "est" (6) dominate; "lo"/"low" follow with 7 each
    assert(merges.length == 4, merges.toString)
    assert(merges.contains(("e", "s")) || merges.contains(("s", "t")),
      merges.toString)
    val seg = vocab.where(col("word") === "newest").head().getSeq[String](2)
    assert(seg.length < 6, s"expected merged segmentation, got $seg")
    // apply reproduces the trained segmentation on matching text
    val applied = Bpe.applyBpe(Seq((9L, "newest")).toDF("id", "text"),
      "text", merges, "toks").head().getSeq[String](2)
    assert(applied == seg, s"apply=$applied train=$seg")
  }

  test("trainBpe merge fold is left-to-right non-overlapping") {
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.trainBpe(docs, "text", numMerges = 1)
    assert(merges == Seq(("a", "a")))
    assert(vocab.head().getSeq[String](2) == Seq("aa", "aa"))
  }
}
