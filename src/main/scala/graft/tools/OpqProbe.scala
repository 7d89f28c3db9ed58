package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the OPQ/PQ pipeline pieces: times the encode
  * projection and the ADC join in isolation (noop sink) and prints
  * whether the encode projection whole-stage-compiles — used to
  * attribute the opq gate's cost between training, encode, and ADC. */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.queries.Queries.registerViews(s, sf)
    val emb = s.table("embeddings")
    val skew = emb.select(col("vec_id"),
      graft.functions.VectorExpressions.vecScale(
        col("embedding"), Seq.fill(16)(4.0), 0.25).as("embedding"))
    var t0 = System.nanoTime()
    val perm = graft.operators.Pq.trainPermutation(skew, "embedding", m = 4)
    println(f"trainPermutation: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val permuted = skew.select(col("vec_id"),
      graft.operators.Pq.permute(col("embedding"), perm).as("embedding"))
    t0 = System.nanoTime()
    val books = graft.operators.Pq.trainCodebooks(
      permuted, "vec_id", "embedding", m = 4, k = 16, iterations = 2)
    println(f"trainCodebooks: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val codes = graft.operators.Pq.encode(permuted, "vec_id", "embedding", books)
    val plan = codes.queryExecution.executedPlan.toString
    println("== encode executedPlan head ==")
    println(plan.linesIterator.take(10).mkString("\n").take(2000))
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      codes.write.format("noop").mode("overwrite").save()
      println(f"encode noop pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val top = graft.operators.Pq.adcTopK(
      codes, permuted.where(col("vec_id") % 25 === 0),
      "vec_id", "embedding", books, kNeighbors = 3)
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      top.write.format("noop").mode("overwrite").save()
      println(f"adcTopK noop pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("== adcTopK executedPlan ops ==")
    println(top.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(90)).take(30).mkString("\n"))
    s.stop()
  }
}
