package graft

import graft.operators.IncrementalJoin
import org.apache.spark.sql.functions._

class IncrementalJoinSpec extends SparkTestBase {
  import spark.implicits._

  // view = fact(id, fk, v) ⨝ dim(k, attr); CDF frames built by hand
  // (schema: table cols + _change_type + _commit_version)
  test("viewDelta covers the full fact/dim mutation matrix") {
    val factOld = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"),
      (4L, 30L, "d")).toDF("id", "fk", "v")
    val dimOld = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("k", "attr")
    val view0 = factOld.join(dimOld.withColumnRenamed("k", "fk"), Seq("fk"))
    // fact: insert 5, insert-then-delete 6, delete 2, update 3's fk
    // 20 -> 30 (re-derives under the new dim key)
    val factNew = Seq((1L, 10L, "a"), (3L, 30L, "c2"), (4L, 30L, "d"),
      (5L, 20L, "e")).toDF("id", "fk", "v")
    val factChanges = Seq(
      (5L, 20L, "e", "insert", 2L),
      (6L, 10L, "x", "insert", 2L),
      (6L, 10L, "x", "delete", 3L),
      (2L, 10L, "b", "delete", 3L),
      (3L, 20L, "c", "update_preimage", 4L),
      (3L, 30L, "c2", "update_postimage", 4L)
    ).toDF("id", "fk", "v", "_change_type", "_commit_version")
    // dim: update 30's attr, delete 10 (its facts leave the view)
    val dimNew = Seq((20L, "twenty"), (30L, "THIRTY")).toDF("k", "attr")
    val dimChanges = Seq(
      (30L, "thirty", "update_preimage", 2L),
      (30L, "THIRTY", "update_postimage", 2L),
      (10L, "ten", "delete", 3L)
    ).toDF("k", "attr", "_change_type", "_commit_version")

    val (touched, upserts) = IncrementalJoin.viewDelta(
      factChanges, dimChanges, factNew, dimNew,
      factPk = Seq("id"), fk = "fk", dimPk = "k", dimCols = Seq("attr"))
    val got = IncrementalJoin.applyDelta(view0, touched, upserts, Seq("id"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("fk"),
        r.getAs[String]("v"), r.getAs[String]("attr"))).toSet
    val want = factNew.join(dimNew.withColumnRenamed("k", "fk"), Seq("fk"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("fk"),
        r.getAs[String]("v"), r.getAs[String]("attr"))).toSet
    assert(got == want, s"incremental $got vs recompute $want")
    // the interesting cases landed: 1 left (dim 10 deleted), 6 never
    // appeared (insert then delete), 3 re-keyed to the updated dim row
    assert(!got.exists(_._1 == 1L) && !got.exists(_._1 == 6L))
    assert(got.contains((3L, 30L, "c2", "THIRTY")))
  }

  test("a fact UPDATE that changes the fact PK evicts the old key's row") {
    val factOld = Seq((1L, 10L, "a"), (2L, 10L, "b"), (7L, 20L, "g"))
      .toDF("id", "fk", "v")
    val dim = Seq((10L, "ten"), (20L, "twenty")).toDF("k", "attr")
    val view0 = factOld.join(dim.withColumnRenamed("k", "fk"), Seq("fk"))
    // window: insert id 8 at v2, then an UPDATE at v3 re-keys 8 -> 9
    // (old PK 8 exists only as an update_preimage — the round-7 bug
    // left both the stale pre-window row AND, worse, ranked the v2
    // insert as id 8's latest change); separately re-key 2 -> 3
    val factNew = Seq((1L, 10L, "a"), (3L, 10L, "b2"), (7L, 20L, "g"),
      (9L, 20L, "h2")).toDF("id", "fk", "v")
    val factChanges = Seq(
      (8L, 20L, "h", "insert", 2L),
      (8L, 20L, "h", "update_preimage", 3L),
      (9L, 20L, "h2", "update_postimage", 3L),
      (2L, 10L, "b", "update_preimage", 4L),
      (3L, 10L, "b2", "update_postimage", 4L)
    ).toDF("id", "fk", "v", "_change_type", "_commit_version")
    val emptyDim = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "attr", "_change_type", "_commit_version")
    val (touched, upserts) = IncrementalJoin.viewDelta(
      factChanges, emptyDim, factNew, dim,
      factPk = Seq("id"), fk = "fk", dimPk = "k", dimCols = Seq("attr"))
    val got = IncrementalJoin.applyDelta(view0, touched, upserts, Seq("id"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("fk"),
        r.getAs[String]("v"), r.getAs[String]("attr"))).toSet
    val want = factNew.join(dim.withColumnRenamed("k", "fk"), Seq("fk"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("fk"),
        r.getAs[String]("v"), r.getAs[String]("attr"))).toSet
    assert(got == want, s"incremental $got vs recompute $want")
    assert(!got.exists(_._1 == 2L) && !got.exists(_._1 == 8L),
      "old PKs of re-keying updates must leave the view")
  }

  test("no changes means no touched keys and no upserts") {
    val fact = Seq((1L, 10L, "a")).toDF("id", "fk", "v")
    val dim = Seq((10L, "ten")).toDF("k", "attr")
    val empty = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("id", "fk", "v", "_change_type", "_commit_version")
    val emptyDim = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "attr", "_change_type", "_commit_version")
    val (touched, upserts) = IncrementalJoin.viewDelta(
      empty, emptyDim, fact, dim, Seq("id"), "fk", "k", Seq("attr"))
    assert(touched.isEmpty && upserts.isEmpty)
  }
}
