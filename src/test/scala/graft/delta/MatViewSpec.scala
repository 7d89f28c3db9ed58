package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MatViewSpec extends SparkTestBase {
  import spark.implicits._

  private def rollup(path: String): Map[String, (Long, Long)] =
    DeltaLog.forPath(spark, path).snapshot.read()
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v")))).toMap

  test("create + refresh folds changes; a crashed refresh cannot double-count") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("view").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v"))     // v0
    ChangeDataFeed.enable(src)                                    // v1
    MatView.create(spark, viewPath, srcPath, Seq("k"), "v")
    assert(rollup(viewPath) == Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))

    TransactionWriter.append(src, Seq(("b", 7L)).toDF("k", "v")) // v2
    Mutations.delete(src, col("v") === 10L)                      // v3
    val wm = MatView.refresh(spark, viewPath)
    assert(wm == 3L)
    assert(rollup(viewPath) == Map("a" -> ((1L, 20L)), "b" -> ((2L, 12L))))

    // crash simulation: roll the watermark back as if the refresh
    // died between its merge and its domain commit — the re-run's
    // merge must be a txn-marker no-op, then repair the watermark
    Domains.set(DeltaLog.forPath(spark, viewPath), MatView.StateDomain,
      """{"sourceVersion":1}""")
    assert(MatView.refresh(spark, viewPath) == 3L)
    assert(rollup(viewPath) == Map("a" -> ((1L, 20L)), "b" -> ((2L, 12L))),
      "replayed refresh must not double-count")
    // nothing new: watermark unchanged, no merge
    val vBefore = DeltaLog.forPath(spark, viewPath).snapshot.version
    assert(MatView.refresh(spark, viewPath) == 3L)
    assert(DeltaLog.forPath(spark, viewPath).snapshot.version == vBefore)

    // the hard crash case: watermark rolled back AND the source moved
    // on — the fold must start at the MARKER (3), not the stale
    // watermark (1), or the v2/v3 window would double-count
    Domains.set(DeltaLog.forPath(spark, viewPath), MatView.StateDomain,
      """{"sourceVersion":1}""")
    TransactionWriter.append(src, Seq(("a", 100L)).toDF("k", "v")) // v4
    assert(MatView.refresh(spark, viewPath) == 4L)
    assert(rollup(viewPath) ==
      Map("a" -> ((2L, 120L)), "b" -> ((2L, 12L))),
      "post-crash refresh must fold only the unmerged window")
  }

  test("DESCRIBE MATVIEW reports definition and watermark") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-desc")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("view").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src, Seq(("a", 1L)).toDF("k", "v"))
    ChangeDataFeed.enable(src)
    MatView.create(spark, viewPath, srcPath, Seq("k"), "v")
    val r = graft.plans.GraftSqlParser.run(spark,
      s"GRAFT DESCRIBE MATVIEW '$viewPath'").collect()(0)
    assert(r.getString(0) == srcPath && r.getString(1) == "k" &&
      r.getString(2) == "sum(v)" && r.getLong(3) == 1L, s"got $r")
  }

  test("MIN/MAX matview refreshes via changed-key rederive") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-mm")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("view").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 9L), ("c", 1L))
        .toDF("k", "v"))                                          // v0
    ChangeDataFeed.enable(src)                                    // v1
    graft.plans.GraftSqlParser.run(spark,
      s"GRAFT CREATE MATVIEW '$viewPath' FROM '$srcPath' " +
        "KEYS (k) SUM (v) MIN (v) MAX (v)").collect()
    def view(): Map[String, (Long, Long, Long, Long)] =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"),
          r.getAs[Long]("sum_v"), r.getAs[Long]("min_v"),
          r.getAs[Long]("max_v")))).toMap
    assert(view() == Map("a" -> ((2L, 30L, 10L, 20L)),
      "b" -> ((2L, 14L, 5L, 9L)), "c" -> ((1L, 1L, 1L, 1L))))

    // delete a group MAXIMUM (non-invertible), delete a whole group,
    // append a new minimum — one refresh covers the window
    Mutations.delete(src, col("v") === 20L)                       // v2
    Mutations.delete(src, col("k") === "c")                       // v3
    TransactionWriter.append(src, Seq(("b", 2L)).toDF("k", "v"))  // v4
    assert(MatView.refresh(spark, viewPath) == 4L)
    assert(view() == Map("a" -> ((1L, 10L, 10L, 10L)),
      "b" -> ((3L, 16L, 2L, 9L))),
      "deleted maximum must re-derive; vanished group must drop")

    // idempotent replay: roll the watermark back — the txn marker
    // makes the re-run a no-op merge, then repairs the watermark
    Domains.set(DeltaLog.forPath(spark, viewPath), MatView.StateDomain,
      """{"sourceVersion":1}""")
    assert(MatView.refresh(spark, viewPath) == 4L)
    assert(view() == Map("a" -> ((1L, 10L, 10L, 10L)),
      "b" -> ((3L, 16L, 2L, 9L))))
  }

  test("refresh bootstraps from createVersion when the state domain is lost") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-boot")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("view").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src, Seq(("a", 1L)).toDF("k", "v")) // v0
    ChangeDataFeed.enable(src)                                      // v1
    MatView.create(spark, viewPath, srcPath, Seq("k"), "v")
    // crash simulation: the create's domain commit never landed
    Domains.remove(DeltaLog.forPath(spark, viewPath), MatView.StateDomain)
    TransactionWriter.append(src, Seq(("a", 4L)).toDF("k", "v"))    // v2
    assert(MatView.refresh(spark, viewPath) == 2L,
      "refresh must bootstrap the watermark from createVersion")
    assert(rollup(viewPath) == Map("a" -> ((2L, 5L))))
  }

  test("re-created view bootstraps past the previous incarnation's stale domain") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-reinc")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("view").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src, Seq(("a", 1L)).toDF("k", "v"))  // v0
    ChangeDataFeed.enable(src)                                       // v1
    MatView.create(spark, viewPath, srcPath, Seq("k"), "v")
    TransactionWriter.append(src, Seq(("a", 2L)).toDF("k", "v"))     // v2
    assert(MatView.refresh(spark, viewPath) == 2L)                   // domain=2
    // source moves on, the view is RE-created at v3 — and the create
    // crashes before its own domain commit: the OLD incarnation's
    // domain (2) survives the overwrite. Simulate by re-creating and
    // rolling the domain back to the stale value.
    TransactionWriter.append(src, Seq(("a", 4L)).toDF("k", "v"))     // v3
    MatView.create(spark, viewPath, srcPath, Seq("k"), "v")          // base@v3
    Domains.set(DeltaLog.forPath(spark, viewPath), MatView.StateDomain,
      """{"sourceVersion":2}""")
    // the base already contains v3's rows; folding from the stale
    // domain would re-apply the v3 window (fresh instance UUID — the
    // txn marker can't catch it). The createVersion floor must win.
    TransactionWriter.append(src, Seq(("a", 8L)).toDF("k", "v"))     // v4
    assert(MatView.refresh(spark, viewPath) == 4L)
    assert(rollup(viewPath) == Map("a" -> ((4L, 15L))),
      "stale prior-incarnation watermark must not double-apply the " +
        "window the new base already contains")
  }

  test("create rejects duplicate aggregate clauses") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-dup")
    val srcPath = base.resolve("src").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src, Seq(("a", 1L)).toDF("k", "v"))
    ChangeDataFeed.enable(src)
    val e = intercept[IllegalArgumentException] {
      MatView.create(spark, base.resolve("view").toString, srcPath,
        Seq("k"), Seq("sum" -> "v", "sum" -> "v"))
    }
    assert(e.getMessage.contains("sum(v)"), s"got: ${e.getMessage}")
  }

  test("create rejects a source without CDF; refresh rejects non-matviews") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-err")
    val srcPath = base.resolve("src").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src, Seq(("a", 1L)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      MatView.create(spark, base.resolve("view").toString, srcPath,
        Seq("k"), "v")
    }
    intercept[IllegalArgumentException] {
      MatView.refresh(spark, srcPath) // a plain table, not a matview
    }
  }

  test("create rejects aggregate columns the spec grammar cannot round-trip") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-col")
    val srcPath = base.resolve("src").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", 1L)).toDF("k", "n-chars"))
    ChangeDataFeed.enable(src)
    // "n-chars" would create fine but silently drop out of parseAggs
    // at refresh (round-9 advice) — refused at create instead
    val e = intercept[IllegalArgumentException] {
      MatView.create(spark, base.resolve("view").toString, srcPath,
        Seq("k"), Seq("sum" -> "n-chars"))
    }
    assert(e.getMessage.contains("\\w+"), s"got: ${e.getMessage}")
  }

  test("AVG matview stores the exact ratio; WHERE filters every slice") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-aw")
    val srcPath = base.resolve("src").toString
    val avgView = base.resolve("avg").toString
    val whView = base.resolve("wh").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", 10L), ("a", 21L), ("b", 5L), ("b", 100L)).toDF("k", "v")) // v0
    ChangeDataFeed.enable(src)                                            // v1
    MatView.create(spark, avgView, srcPath, Seq("k"), Seq("avg" -> "v"))
    MatView.create(spark, whView, srcPath, Seq("k"),
      Seq("sum" -> "v"), Some("v < 50"))
    // update flips b's 100 INTO the filter (100 → 7) and moves a's 10
    Mutations.update(src, col("v") === 100L, Map("v" -> lit(7L)))         // v2
    Mutations.update(src, col("v") === 10L, Map("v" -> lit(60L)))         // v3: a's 60 leaves the filter
    MatView.refresh(spark, avgView)
    MatView.refresh(spark, whView)
    val avg = DeltaLog.forPath(spark, avgView).snapshot.read()
      .collect().map(r => r.getString(0) -> r.getAs[Double]("avg_v")).toMap
    assert(avg("a") == (60.0 + 21.0) / 2 && avg("b") == (5.0 + 7.0) / 2)
    val wh = DeltaLog.forPath(spark, whView).snapshot.read()
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("sum_v")))).toMap
    // a: only 21 matches now (60 left the filter); b: 5 + 7 both match
    assert(wh("a") == ((1L, 21L)) && wh("b") == ((2L, 12L)), s"got $wh")
  }

  test("AVG matview: a key born from an all-NULL slice heals when values arrive") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-an")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("v").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", java.lang.Long.valueOf(10L))).toDF("k", "v"))
    ChangeDataFeed.enable(src)
    MatView.create(spark, viewPath, srcPath, Seq("k"), Seq("avg" -> "v"))
    // key "c" is BORN from a slice that is all-NULL in the avg column:
    // the hidden (sum, count) pair must insert as ZERO, not NULL — a
    // NULL running sum would poison every later fold (t + delta = NULL)
    // and freeze avg_v at NULL forever
    TransactionWriter.append(src,
      Seq(("c", null.asInstanceOf[java.lang.Long]),
        ("c", null.asInstanceOf[java.lang.Long])).toDF("k", "v"))
    MatView.refresh(spark, viewPath)
    def avgOf(k: String): Option[Double] =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .where(col("k") === k).collect().headOption
        .map(_.getAs[java.lang.Double]("avg_v")).map(Option(_))
        .flatten.map(_.doubleValue)
    assert(avgOf("c").isEmpty, "an all-null group's avg must be NULL")
    // now non-null rows arrive — avg must become the direct AVG
    TransactionWriter.append(src,
      Seq(("c", java.lang.Long.valueOf(6L)),
        ("c", java.lang.Long.valueOf(10L))).toDF("k", "v"))
    MatView.refresh(spark, viewPath)
    assert(avgOf("c").contains(8.0),
      s"avg must heal to 8.0 after non-null rows, got ${avgOf("c")}")
    assert(avgOf("a").contains(10.0))
  }

  test("SUM matview: a key born from an all-NULL slice stays NULL then heals (SQL SUM semantics)") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-sn")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("v").toString
    val src = DeltaLog.forPath(spark, srcPath)
    TransactionWriter.overwrite(src,
      Seq(("a", java.lang.Long.valueOf(10L))).toDF("k", "v"))
    ChangeDataFeed.enable(src)
    MatView.create(spark, viewPath, srcPath, Seq("k"), Seq("sum" -> "v"))
    TransactionWriter.append(src,
      Seq(("c", null.asInstanceOf[java.lang.Long]),
        ("c", null.asInstanceOf[java.lang.Long])).toDF("k", "v"))
    MatView.refresh(spark, viewPath)
    def sumOf(k: String): Option[Long] =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .where(col("k") === k).collect().headOption
        .flatMap(r => Option(r.getAs[java.lang.Long]("sum_v")))
        .map(_.longValue)
    // SQL SUM over an all-null group is NULL — not 0
    assert(sumOf("c").isEmpty, s"all-null group must report NULL sum")
    // values arrive: sum folds to the direct SUM, not frozen at NULL
    TransactionWriter.append(src,
      Seq(("c", java.lang.Long.valueOf(6L)),
        ("c", java.lang.Long.valueOf(10L))).toDF("k", "v"))
    MatView.refresh(spark, viewPath)
    assert(sumOf("c").contains(16L),
      s"sum must heal to 16 after non-null rows, got ${sumOf("c")}")
    assert(sumOf("a").contains(10L))
  }

  test("SUM matview: retracting a mixed group's last non-null rows folds back to NULL (recompute semantics)") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-sr")
    val srcPath = base.resolve("src").toString
    val viewPath = base.resolve("v").toString
    val src = DeltaLog.forPath(spark, srcPath)
    // mixed group c: two non-null rows + two null rows; control group a
    TransactionWriter.overwrite(src,
      Seq(("a", java.lang.Long.valueOf(10L)),
        ("c", java.lang.Long.valueOf(6L)),
        ("c", java.lang.Long.valueOf(10L)),
        ("c", null.asInstanceOf[java.lang.Long]),
        ("c", null.asInstanceOf[java.lang.Long])).toDF("k", "v"))
    ChangeDataFeed.enable(src)
    MatView.create(spark, viewPath, srcPath, Seq("k"), Seq("sum" -> "v"))
    def row(k: String): (Long, Option[Long]) =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .where(col("k") === k).collect().headOption
        .map(r => (r.getAs[Long]("n_rows"),
          Option(r.getAs[java.lang.Long]("sum_v")).map(_.longValue)))
        .getOrElse(fail(s"no rollup row for $k"))
    assert(row("c") == ((4L, Some(16L))))
    // delete EVERY non-null row of c: a direct SUM over the surviving
    // all-null rows is NULL — the hidden non-null count makes the fold
    // agree (the pair-less fold left 0 here, the old residue)
    Mutations.delete(src, col("k") === "c" && col("v").isNotNull)
    MatView.refresh(spark, viewPath)
    assert(row("c") == ((2L, None)),
      s"full retraction must fold to NULL, got ${row("c")}")
    // and it still heals: a value arriving re-derives the true sum
    TransactionWriter.append(src,
      Seq(("c", java.lang.Long.valueOf(7L))).toDF("k", "v"))
    MatView.refresh(spark, viewPath)
    assert(row("c") == ((3L, Some(7L))))
    assert(row("a") == ((1L, Some(10L))))
    // the helper column is maintenance state, not surface: the visible
    // read hides it
    assert(!MatView.read(spark, viewPath).columns.exists(_.startsWith("__")))
    assert(DeltaLog.forPath(spark, viewPath).snapshot.read()
      .columns.contains("__sc_v"))
  }

  test("join-rollup SUM: full retraction of a group's non-null values reports NULL like a recompute") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-jsr")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("v").toString
    val fact = DeltaLog.forPath(spark, factPath)
    val dim = DeltaLog.forPath(spark, dimPath)
    TransactionWriter.overwrite(fact,
      Seq((1L, 10L, java.lang.Long.valueOf(5L)),
        (2L, 10L, null.asInstanceOf[java.lang.Long]),
        (3L, 20L, java.lang.Long.valueOf(7L)))
        .toDF("pk", "fk", "x"))                                        // f v0
    ChangeDataFeed.enable(fact)                                        // f v1
    TransactionWriter.overwrite(dim,
      Seq((10L, "g1"), (20L, "g2")).toDF("dk", "cat"))                 // d v0
    ChangeDataFeed.enable(dim)                                         // d v1
    MatView.createJoinAgg(spark, viewPath, factPath, dimPath,
      "fk", "dk", Seq("cat"), Seq("sum" -> "x"))
    def row(cat: String): (Long, Option[Long]) =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .where(col("cat") === cat).collect().headOption
        .map(r => (r.getAs[Long]("n_rows"),
          Option(r.getAs[java.lang.Long]("sum_x")).map(_.longValue)))
        .getOrElse(fail(s"no rollup row for $cat"))
    assert(row("g1") == ((2L, Some(5L))))
    // delete g1's only non-null fact row: the signed join fold must
    // derive NULL from the hidden count, not leave 0
    Mutations.delete(fact, col("pk") === 1L)                           // f v2
    MatView.refresh(spark, viewPath)
    assert(row("g1") == ((1L, None)),
      s"full retraction must fold to NULL, got ${row("g1")}")
    assert(row("g2") == ((1L, Some(7L))))
  }

  test("join view: describe, dim-only window, and vanished-group delete") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-j")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("v").toString
    val fact = DeltaLog.forPath(spark, factPath)
    val dim = DeltaLog.forPath(spark, dimPath)
    TransactionWriter.overwrite(fact,
      Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0))
        .toDF("pk", "fk", "x"))                                        // f v0
    ChangeDataFeed.enable(fact)                                        // f v1
    TransactionWriter.overwrite(dim,
      Seq((10L, "ten"), (20L, "twenty")).toDF("dk", "name"))           // d v0
    ChangeDataFeed.enable(dim)                                         // d v1
    MatView.createJoin(spark, viewPath, factPath, dimPath,
      Seq("pk"), "fk", "dk", Seq("name"))
    val (srcDesc, keys, cols, wm) = MatView.describe(spark, viewPath)
    assert(srcDesc.contains("JOIN") && keys == Seq("pk") &&
      cols == "cols(name)" && wm == 1L)
    // dim-only change window (fact side exercises the empty-CDF path):
    // deleting dim key 10 must drop BOTH referencing view rows
    Mutations.delete(dim, col("dk") === 10L)                           // d v2
    MatView.refresh(spark, viewPath)
    val got = DeltaLog.forPath(spark, viewPath).snapshot.read()
      .select("pk", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSet == Set((2L, "twenty")), s"got ${got.toSeq}")
    // refresh with nothing new: pure no-op
    val wm2 = MatView.refresh(spark, viewPath)
    assert(DeltaLog.forPath(spark, viewPath).snapshot.read().count() == 1L)
    assert(wm2 >= 1L)
    // createJoin validates the spec-grammar round-trip
    intercept[IllegalArgumentException] {
      MatView.createJoin(spark, base.resolve("v2").toString, factPath,
        dimPath, Seq("pk"), "fk", "dk", Seq("bad-col"))
    }
  }

  test("join-rollup view: multi-SUM fold, ONE commit per refresh, atomic watermark") {
    val base = java.nio.file.Files.createTempDirectory("graft-mv-ja")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("v").toString
    val fact = DeltaLog.forPath(spark, factPath)
    val dim = DeltaLog.forPath(spark, dimPath)
    TransactionWriter.overwrite(fact,
      (0L until 60L).map(i => (i, i % 6, i * 10, i % 7))
        .toDF("pk", "fk", "x", "y"))                                   // f v0
    ChangeDataFeed.enable(fact)                                        // f v1
    TransactionWriter.overwrite(dim,
      (0L until 6L).map(i => (i, s"g${i % 3}")).toDF("dk", "name"))    // d v0
    ChangeDataFeed.enable(dim)                                         // d v1
    // group key from the DIM side, two summed FACT columns
    MatView.createJoinAgg(spark, viewPath, factPath, dimPath,
      "fk", "dk", Seq("name"), Seq("sum" -> "x", "sum" -> "y"))
    def expected(): Set[(String, Long, Long, Long)] = {
      val f = DeltaLog.forPath(spark, factPath).snapshot.read()
      val d = DeltaLog.forPath(spark, dimPath).snapshot.read()
        .select(col("dk").as("fk"), col("name"))
      f.join(d, "fk").groupBy("name")
        .agg(count(lit(1)), sum("x"), sum("y"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
    }
    def got(): Set[(String, Long, Long, Long)] =
      DeltaLog.forPath(spark, viewPath).snapshot.read()
        .select("name", "n_rows", "sum_x", "sum_y")
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
    assert(got() == expected())
    // mutations on BOTH sources: append + delete facts; dim update
    // moves dk=4 from g1 to g9 (whole-key group move); dim delete
    // kills dk=5 (inner join drops its facts)
    TransactionWriter.append(fact,
      (60L until 90L).map(i => (i, i % 6, i * 10, i % 7))
        .toDF("pk", "fk", "x", "y"))                                   // f v2
    Mutations.delete(fact, col("pk") % 4 === 1L)                       // f v3
    Mutations.update(dim, col("dk") === 4L, Map("name" -> lit("g9")))  // d v2
    Mutations.delete(dim, col("dk") === 5L)                            // d v3
    val vBefore = DeltaLog.forPath(spark, viewPath).snapshot.version
    MatView.refresh(spark, viewPath)
    val after = DeltaLog.forPath(spark, viewPath).snapshot
    // the whole multi-commit dual-source window folds in ONE commit,
    // which carries the watermark domain (atomic with the fold)
    assert(after.version == vBefore + 1,
      s"refresh took ${after.version - vBefore} commits, expected 1")
    assert(got() == expected())
    val (_, keys, aggs, wm) = MatView.describe(spark, viewPath)
    assert(keys == Seq("name") && aggs == "sum(x),sum(y)" && wm == 3L)
    // idle refresh: no commit at all
    MatView.refresh(spark, viewPath)
    assert(DeltaLog.forPath(spark, viewPath).snapshot.version == after.version)
    // unsupported aggregate functions still refuse at create
    val err = intercept[IllegalArgumentException] {
      MatView.createJoinAgg(spark, base.resolve("v2").toString, factPath,
        dimPath, "fk", "dk", Seq("name"), Seq("median" -> "x"))
    }
    assert(err.getMessage.contains("unsupported"))
    // MIN over the join is now maintained by changed-key rederive:
    // delete the g0 group's current-min fact row — a signed fold can
    // never RAISE a min, only the rederive can
    val v3 = base.resolve("v3").toString
    MatView.createJoinAgg(spark, v3, factPath, dimPath, "fk", "dk",
      Seq("name"), Seq("min" -> "x", "avg" -> "x"))
    def joined() = DeltaLog.forPath(spark, factPath).snapshot.read()
      .join(DeltaLog.forPath(spark, dimPath).snapshot.read()
        .select(col("dk").as("fk"), col("name")), Seq("fk"))
    // the current g0-group minimum row (group spans dk 0 AND 3)
    val minRow = joined().where(col("name") === "g0")
      .orderBy(col("x")).select("pk").head.getLong(0)
    Mutations.delete(DeltaLog.forPath(spark, factPath),
      col("pk") === minRow)
    MatView.refresh(spark, v3)
    val fnl = joined().where(col("name") === "g0").agg(
      org.apache.spark.sql.functions.min("x"),
      org.apache.spark.sql.functions.avg("x")).head
    val viewRow = DeltaLog.forPath(spark, v3).snapshot.read()
      .where(col("name") === "g0").select("min_x", "avg_x").head
    assert(viewRow.getLong(0) == fnl.getLong(0),
      s"view min ${viewRow.getLong(0)} != source min ${fnl.getLong(0)}")
    assert(math.abs(viewRow.getDouble(1) - fnl.getDouble(1)) < 1e-9)
  }
}
