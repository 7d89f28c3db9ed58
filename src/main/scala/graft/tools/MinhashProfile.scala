package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the minhash family's shared pipeline — the
  * round-8 kernel study: where do q_minhash_dedup/_cc/_pipeline spend
  * their ~5 s at sf0.1?
  * `runMain graft.tools.MinhashProfile [sfDir] [runs]` */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Queries.registerViews(spark, sfDir)
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    // stage 1: tokenize + 3-gram + distinct + hash28 (the kernel)
    val ngram = """CASE WHEN size(toks) < 3 THEN array()
      ELSE transform(sequence(1, size(toks)-2),
        i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))) END"""
    val hshSql = s"""
      WITH t AS (SELECT /*+ REPARTITION(32) */ doc_id, lang,
        split(text, ' ') AS toks FROM documents),
      n AS (SELECT doc_id, lang, array_distinct($ngram) AS ng FROM t),
      hsh AS (SELECT doc_id, lang, vec_hash28(ng) AS hs FROM n)
      SELECT doc_id, lang, hs FROM hsh"""
    // broken-down kernel variants
    time("tokens-only       ")(spark.sql(
      "SELECT doc_id, split(text, ' ') AS toks FROM documents")
      .selectExpr("doc_id", "size(toks) AS s").count())
    time("tokens+ngrams     ")(spark.sql(s"""
      WITH t AS (SELECT /*+ REPARTITION(32) */ doc_id,
        split(text, ' ') AS toks FROM documents)
      SELECT doc_id, $ngram AS ng FROM t""")
      .selectExpr("doc_id", "size(ng) AS s").count())
    time("+distinct         ")(spark.sql(s"""
      WITH t AS (SELECT /*+ REPARTITION(32) */ doc_id,
        split(text, ' ') AS toks FROM documents)
      SELECT doc_id, array_distinct($ngram) AS ng FROM t""")
      .selectExpr("doc_id", "size(ng) AS s").count())
    time("+vec_hash28 (hsh) ")(spark.sql(hshSql)
      .selectExpr("doc_id", "size(hs) AS s").count())
    time("+minhash16 (sig)  ")(spark.sql(
      s"WITH h AS ($hshSql) SELECT doc_id, minhash16(hs) AS sig FROM h")
      .selectExpr("doc_id", "size(sig) AS s").count())
    // persist-strategy variants of the dedup pipeline: which stages
    // earn their persist() cost? (the final reads g_buckets twice,
    // g_hsh/g_sig once each)
    val sigSql = {
      val mhs = (0 until 16).map(j => s"element_at(_sig, ${j + 1}) AS mh$j").mkString(", ")
      s"SELECT doc_id, $mhs FROM (SELECT doc_id, minhash16(hs) AS _sig FROM g_hsh)"
    }
    // same stage with a shuffle barrier between the minhash16 projection
    // and the element_at unroll: CollapseProject cannot merge across an
    // Exchange, so the signature kernel runs ONCE per row
    val sigSqlBarrier = {
      val mhs = (0 until 16).map(j => s"element_at(_sig, ${j + 1}) AS mh$j").mkString(", ")
      s"SELECT doc_id, $mhs FROM (SELECT /*+ REPARTITION($cpus) */ doc_id, minhash16(hs) AS _sig FROM g_hsh)"
    }
    val bucketsSql = {
      val ks = (0 until 4).map { b =>
        s"concat_ws(',', CAST(mh${4 * b} AS STRING), CAST(mh${4 * b + 1} AS STRING), CAST(mh${4 * b + 2} AS STRING), CAST(mh${4 * b + 3} AS STRING))"
      }.mkString(", ")
      s"SELECT doc_id, band, k FROM (SELECT doc_id, array($ks) AS ks FROM g_sig) LATERAL VIEW posexplode(ks) t AS band, k"
    }
    val finalSql = """WITH mins AS (SELECT band, k, MIN(doc_id) AS m FROM g_buckets GROUP BY band, k),
      keep AS (SELECT b.doc_id, MIN(m.m) AS mm FROM g_buckets b
        JOIN mins m ON b.band = m.band AND b.k = m.k GROUP BY b.doc_id)
      SELECT doc_id FROM keep WHERE doc_id = mm"""
    def pipeline(persistStages: Set[String]): Long = {
      val frames = Seq("g_hsh" -> hshSql, "g_sig" -> sigSql,
        "g_buckets" -> bucketsSql).map { case (v, sql) =>
        val df = spark.sql(sql)
        if (persistStages(v)) df.persist()
        df.createOrReplaceTempView(v)
        df
      }
      val n = spark.sql(finalSql).count()
      frames.foreach(_.unpersist(blocking = false))
      n
    }
    // finer grain: where inside the final does the time go?
    spark.sql(hshSql).createOrReplaceTempView("g_hsh")
    spark.sql(sigSql).createOrReplaceTempView("g_sig")
    spark.sql(bucketsSql).createOrReplaceTempView("g_buckets")
    time("buckets count     ")(spark.sql("SELECT * FROM g_buckets").count())
    spark.sql(sigSqlBarrier).createOrReplaceTempView("g_sig")
    spark.sql(bucketsSql).createOrReplaceTempView("g_buckets")
    time("buckets barrier   ")(spark.sql("SELECT * FROM g_buckets").count())
    spark.sql(sigSql).createOrReplaceTempView("g_sig")
    spark.sql(bucketsSql).createOrReplaceTempView("g_buckets")
    time("mins only         ")(spark.sql(
      "SELECT band, k, MIN(doc_id) AS m FROM g_buckets GROUP BY band, k").count())
    time("join only         ")(spark.sql(
      """SELECT b.doc_id, m.m FROM g_buckets b JOIN
        (SELECT band, k, MIN(doc_id) AS m FROM g_buckets GROUP BY band, k) m
        ON b.band = m.band AND b.k = m.k""").count())
    time("dedup persist all ")(pipeline(Set("g_hsh", "g_sig", "g_buckets")))
    time("dedup persist bkts")(pipeline(Set("g_buckets")))
    time("dedup persist none")(pipeline(Set.empty))
    // full dedup final via the production path (stage cache machinery)
    time("full dedup 1-shot ")(graft.SparkEntry.queries("q_minhash_dedup")(spark, sfDir).count())
    spark.stop()
  }
}
