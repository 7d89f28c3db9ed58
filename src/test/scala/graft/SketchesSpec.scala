package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch-profiling operators: Count-Min invariants, HyperLogLog
  * accuracy against exact distinct counts, and range-boundary census
  * conservation — the sublinear statistics of Sketches.scala. */
class SketchesSpec extends SparkTestBase {

  private def tokensDf(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("tk")
  }

  test("CMS estimates never undercount and each row conserves total mass") {
    // 3 heavy keys + 200 light keys, known exact frequencies.
    val data = Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(100)("gamma") ++ (0 until 200).flatMap(i => Seq(s"t$i"))
    val df = tokensDf(data)
    val sketch = Sketches.cmsSketch(df, col("tk"), depth = 4, width = 1024)
    // Every row of the sketch holds the full stream mass.
    val rowMass = sketch.groupBy("row").agg(sum("cnt").as("mass"))
      .collect().map(_.getLong(1)).toSeq
    assert(rowMass == Seq.fill(4)(data.size.toLong), s"row mass $rowMass")
    val keys = tokensDf(data.distinct)
    val est = Sketches.cmsEstimate(keys, sketch, depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: est ${est(k)} < exact $n")
    }
    // The heavy keys dominate any collision noise from 203 keys in
    // 1024 buckets: their estimates must rank them correctly.
    assert(est("alpha") > est("beta") && est("beta") > est("gamma"))
  }

  test("CMS reports 0 for a key absent from the build corpus") {
    // The sketch stores only occupied cells; an absent cell must count
    // as 0 in the min (left join), not vanish from it — and a key with
    // no occupied cells must still appear with est 0.
    val sketch = Sketches.cmsSketch(tokensDf(Seq("present")), col("tk"), 4, 4096)
    val est = Sketches.cmsEstimate(
      tokensDf(Seq("never-seen-key")), sketch, 4, 4096).collect()
    assert(est.length == 1 && est.head.getLong(1) == 0L,
      s"unseen key must estimate 0, got ${est.toSeq}")
  }

  test("HLL rejects register counts whose harmonic sum could wrap Long") {
    // m·2^50 reaches 2^63 at b=13 — the require() bound is load-bearing.
    intercept[IllegalArgumentException] {
      Sketches.hllSummary(tokensDf(Seq("x")), col("tk"), b = 13)
    }
  }

  test("range bounds work on a non-double value column") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i * 3 % 997)).toDF("id", "v")
    val out = Sketches.rangeBounds(df, "id", "v", buckets = 8, rate = 0.5)
    assert(out.agg(sum("n_table")).collect().head.getLong(0) == 1000L)
  }

  test("CMS sketches of shards add up to the sketch of the union") {
    val a = tokensDf(Seq.fill(50)("x") ++ (0 until 40).map(i => s"a$i"))
    val b = tokensDf(Seq.fill(30)("x") ++ (0 until 40).map(i => s"b$i"))
    val merged = Sketches.cmsSketch(a, col("tk"), 4, 256)
      .unionByName(Sketches.cmsSketch(b, col("tk"), 4, 256))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsSketch(a.unionByName(b), col("tk"), 4, 256)
    assertSameRows(merged, whole, "shard-sum vs union sketch")
  }

  test("HLL estimate lands within 10% of the exact distinct count") {
    // 1.04/sqrt(1024) ≈ 3.25% expected standard error; 10% is ~3σ.
    for (n <- Seq(5000, 20000)) {
      val df = spark.range(n).select(concat(lit("v"), col("id")).as("tk"))
        .unionAll(spark.range(n / 10).select(concat(lit("v"), col("id")).as("tk")))
      val row = Sketches.hllSummary(df, col("tk"), b = 10).collect().head
      val (m, zero, s, est) =
        (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(m == 1024L && s > 0L)
      // E[empty buckets] = m·(1−1/m)^n ≈ 7.7 at n=5000, ≈ 0 at n=20000.
      assert(zero < 30L, s"implausibly many empty buckets at n=$n: $zero")
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.10, s"HLL est $est vs exact $n: ${err * 100}%")
    }
  }

  test("per-group HLL equals the global HLL run on each group alone") {
    val df = spark.range(6000).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("v"), col("id")).as("tk"))
    val by = Sketches.hllSummarizeBy(
        Sketches.hllRegistersBy(df, col("g"), col("tk"), b = 10), b = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(by.keySet == Set("0", "1", "2"))
    for (g <- Seq("0", "1", "2")) {
      val solo = Sketches.hllSummary(
        df.where(col("g") === g), col("tk"), b = 10).collect().head
      assert(by(g) == ((solo.getLong(0), solo.getLong(1),
        solo.getLong(2), solo.getLong(3))),
        s"group $g diverges from its solo summary")
    }
  }

  test("HLL is duplicate-insensitive: registers depend on the distinct set") {
    val once = spark.range(2000).select(concat(lit("k"), col("id")).as("tk"))
    val thrice = once.unionAll(once).unionAll(once)
    assertSameRows(Sketches.hllSummary(once, col("tk")),
      Sketches.hllSummary(thrice, col("tk")), "duplicates changed the summary")
  }

  test("streaming CMS heavy hitters equal the batch query bit-for-bit") {
    val batch = graft.queries.Queries.queries("q_cms_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
    val stream = graft.queries.Queries.queries("q_stream_cms")(
      spark, "/root/testdata/sf0.001")
    assertSameRows(stream, batch, "streamed sketch diverged from batch")
  }

  test("streaming HLL registers equal the batch summary bit-for-bit") {
    val batch = graft.queries.Queries.queries("q_hll_distinct")(
      spark, "/root/testdata/sf0.001")
    val stream = graft.queries.Queries.queries("q_stream_hll")(
      spark, "/root/testdata/sf0.001")
    assertSameRows(stream, batch, "stream registers diverged from batch")
  }

  test("hllSummarize re-maxes a union of shard registers") {
    val a = spark.range(100).select(concat(lit("a"), col("id")).as("tk"))
    val b = spark.range(100, 300).select(concat(lit("a"), col("id")).as("tk"))
    val whole = Sketches.hllSummary(a.unionAll(b), col("tk"))
    val sharded = Sketches.hllSummarize(
      Sketches.hllRegisters(a, col("tk"))
        .unionByName(Sketches.hllRegisters(b, col("tk"))))
    assertSameRows(sharded, whole, "shard-merged registers diverged")
  }

  test("sorted export equals the global row_number without a global sort") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val out = Sketches.sortedExport(orders, "o_orderkey", "o_totalprice",
      buckets = 16, rate = 0.25)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val oracle = orders.select(col("o_orderkey"),
      (row_number().over(w).cast("long") - 1L).as("pos"))
    assertSameRows(out.select("o_orderkey", "pos"), oracle,
      "decomposed ranks diverge from the global order")
    // The plan's windows partition by bucket — parallel slice sorts,
    // never one global range sort of the table.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning(o_totalprice"),
      s"table-wide range sort found in plan:\n$plan")
  }

  test("range bounds census conserves the table and orders the buckets") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val out = Sketches.rangeBounds(orders, "o_orderkey", "o_totalprice",
      buckets = 16, rate = 0.25).orderBy("bucket").collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 16), "buckets not contiguous")
    assert(out.map(_.getLong(3)).sum == orders.count(),
      "bucket census does not sum to the table row count")
    val his = out.map(_.getDouble(1)).toSeq
    assert(his == his.sorted, "boundaries not nondecreasing")
    // Sample counts balance to within the NTILE ±1 guarantee.
    val ns = out.map(_.getLong(2))
    assert(ns.max - ns.min <= 1, s"NTILE imbalance: ${ns.toSeq}")
  }

  // ---- bottom-k quantile sketch ---------------------------------------------

  private def qskDocs(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (if (i % 3 == 0) "a" else "b", i, i * 7 % 1000))
      .toDF("g", "id", "v")
  }

  test("quantile sketch is EXACTLY the bottom-k by hash, threshold or not") {
    val df = qskDocs(2000)
    val sk = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // brute bottom-k: full window, no threshold pre-filter
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(graft.functions.TextFunctions
        .hash28(concat(lit("qs|"), col("id").cast("string"))), col("id"))
    val brute = df.withColumn("r", row_number().over(w)).where(col("r") <= 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sk == brute, "threshold pre-filter changed the bottom-k")
    assert(sk.groupBy(_._1).forall(_._2.size == 32))
  }

  test("merged shard sketches equal the whole-data sketch (associativity)") {
    val df = qskDocs(3000)
    def sk(d: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSketch(d, Seq("g"), "id", "v", k = 16)
    val merged = Sketches.mergeQuantileSketches(
      Seq(sk(df.where(col("id") % 2 === 0)),
        sk(df.where(col("id") % 2 === 1))), Seq("g"), "id", k = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val whole = sk(df)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == whole, "bottom-k merge is not the sketch of the union")
  }

  test("groups smaller than k give EXACT quantiles; ranks hit min and max") {
    import spark.implicits._
    // 10-row group, values 10..100 by 10: sketch = all rows, so
    // p10 → rank 1 (min), p50 → rank 5, p100 → rank 10 (max)
    val df = (1L to 10L).map(i => ("g", i, i * 10)).toDF("g", "id", "v")
    val sk = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 64)
    val q = Sketches.quantileFromSketch(sk, Seq("g"), "id", "v",
      Seq(10, 50, 100))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(q == Map(10 -> 10L, 50 -> 50L, 100 -> 100L), s"got $q")
    // p=0 or >100 refuses
    intercept[IllegalArgumentException] {
      Sketches.quantileFromSketch(sk, Seq("g"), "id", "v", Seq(0))
    }
  }

  test("aggregate-form sketch (bounded heap) equals the window-form sketch") {
    val df = qskDocs(5000)
    val viaWindow = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = Sketches.sketchRows(
      Sketches.quantileSketchAgg(df, Seq("g"), "id", "v", k = 32),
      Seq("g"), "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow,
      "TypedImperativeAggregate bottom-k diverged from the window form")
  }

  test("streaming quantile sketch equals the batch sketch bit-for-bit") {
    val batch = graft.queries.Queries.queries("q_quantile_sketch")(
      spark, "/root/testdata/sf0.001")
    val stream = graft.queries.Queries.queries("q_stream_quantile")(
      spark, "/root/testdata/sf0.001")
    assertSameRows(stream, batch, "streamed sketch diverged from batch")
  }

  test("sketch p50 lands near the exact median on a large group") {
    val df = qskDocs(20000)
    val sk = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 64)
    val est = Sketches.quantileFromSketch(sk, Seq("g"), "id", "v", Seq(50))
      .where(col("g") === "b").collect().head.getLong(2)
    // v is ~uniform on [0, 1000): the sample median's true percentile
    // must land within ±20 points of the median (k=64 ⇒ σ ≈ 6.25)
    val below = df.where(col("g") === "b" && col("v") <= est).count().toDouble
    val n = df.where(col("g") === "b").count().toDouble
    val pct = below / n * 100
    assert(pct > 30 && pct < 70, f"sketch p50 sits at true pct $pct%.1f")
  }

  test("quantile sketch keeps NULL group keys, matching the agg form") {
    import spark.implicits._
    val df = (0L until 300L)
      .map(i => (if (i % 3 == 0) null else "g", i, i % 97))
      .toDF("g", "id", "v")
    val win = Sketches.quantileSketch(df, Seq("g"), "id", "v", k = 16)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val agg = Sketches.sketchRows(
      Sketches.quantileSketchAgg(df, Seq("g"), "id", "v", k = 16),
      Seq("g"), "id", "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(win == agg, "null-group sketches diverge between forms")
    assert(win.exists(_._1.isEmpty), "the null group must be sketched")
  }

  test("quantileSketchAgg refuses non-integral id/value columns") {
    import spark.implicits._
    val df = Seq(("g", "doc-1", 5L)).toDF("g", "id", "v")
    val err = intercept[IllegalArgumentException] {
      Sketches.quantileSketchAgg(df, Seq("g"), "id", "v", k = 4)
    }
    assert(err.getMessage.contains("integral"))
  }
}
