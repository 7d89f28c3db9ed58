package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{MinHashLsh, Similarity}

/** End-to-end training-data pipeline demo over the synthetic corpus:
  * fingerprint → exact dedup → quality/lang annotate → MinHash-LSH
  * near-dup removal → embedding kNN.
  * `runMain graft.tools.PipelineDemo [sfDir]`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n0 = docs.count()

      val annotated = docs
        .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .withColumn("quality_e6", TextFunctions.qualityScoreE6(col("text")))
        .withColumn("lang_pred", TextFunctions.langIdHeuristic(col("text")))
      val exact = annotated.dropDuplicates("fingerprint")
      val n1 = exact.count()

      val nearPairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.5)
      val deduped = MinHashLsh.dedup(exact, "doc_id", "text")
      val n2 = deduped.count()

      val quality = deduped.where(col("quality_e6") >= 500000L)
      val n3 = quality.count()

      println(s"corpus         : $n0 docs")
      println(s"after exact    : $n1 (${n0 - n1} exact dups)")
      println(s"near-dup pairs : ${nearPairs.count()} (jaccard>=0.5 via LSH)")
      println(s"after lsh dedup: $n2")
      println(s"quality>=0.5   : $n3")
      annotated.select("doc_id", "lang_pred", "n_tokens", "quality_e6")
        .orderBy("doc_id").show(5)

      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val knn = Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding", 3)
      println("kNN sample:")
      knn.orderBy("query_id", "rnk").show(6)
    } finally spark.stop()
  }
}
