package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftshims.SqlShims

/** Generation-swapped parquet sidecar store — the publication
  * discipline shared by the advisory index sidecars ([[BloomIndex]],
  * [[LshIndex]]).
  *
  * The naive swap (`delete(dir); rename(tmp, dir)`) has two failure
  * modes at exactly the moment a refresh races a probe: a reader that
  * listed the directory between the delete and the rename hits
  * execution-time FileNotFound and fails the USER'S query, and a
  * rename returning false (concurrent refresh re-created the dir;
  * object-store rename semantics) silently loses the index. Here a
  * generation is immutable once written and the only mutable object is
  * a tiny pointer file:
  *
  *   <dir>/_current          — text file naming the live generation
  *   <dir>/gen_<n>/          — one complete parquet relation each
  *
  * Writers publish by writing a COMPLETE new generation directory,
  * then atomically re-pointing (pointer written to a tmp name, then
  * delete+rename — both return values checked, failure thrown loudly).
  * Readers resolve the pointer, then read an immutable directory — a
  * probe can never observe a half-written relation. The previous
  * generation is retained through the swap (a reader holding the old
  * pointer keeps working) and garbage-collected by the NEXT swap;
  * storage overhead is bounded at two generations.
  *
  * Failure posture: the pointer delete+rename leaves a sub-millisecond
  * window with no pointer; readers treat "no pointer" as "no sidecar"
  * and degrade to their conservative path (full scan / full rebuild) —
  * the sidecars are advisory by design, so every race costs IO, never
  * correctness.
  */
object Sidecar {

  private val PointerName = "_current"
  private val GenPrefix = "gen_"
  private val MetaName = "_meta"

  /** Index self-description: `(kind, target columns, build params)`,
    * persisted as a tiny `_meta` text file beside the pointer.
    * Directory names alone cannot be parsed back (column names may
    * contain the separator), and the descriptor is what lets generic
    * machinery — SHOW INDEXES, the write-path auto-refresh hook —
    * dispatch without guessing. Params ride as trailing `#key=value`
    * lines (a `#`-prefixed line can never be a column name the
    * validators accept), so a gauge-triggered retrain can reuse the
    * ORIGINAL build's knobs (k-means iterations, …) instead of
    * silently rebuilding with defaults.
    *
    * Repair-and-update-on-write: absent/empty `_meta` (crash between
    * create and write, legacy pre-descriptor sidecar) is re-published
    * until complete, and a descriptor whose content DIFFERS (a rebuild
    * with new params) is rewritten — the tmp-write + rename keeps
    * readers from ever observing a partial descriptor (rename failure
    * falls through to the next refresh). */
  def writeMeta(spark: SparkSession, dir: String, kind: String,
      cols: Seq[String], params: Map[String, String] = Map.empty): Unit = {
    val (fs, base) = fsOf(spark, dir)
    val lines = (kind +: cols) ++
      params.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" }
    val want = Some((kind, cols, params))
    if (readMetaFull(spark, dir) != want) {
      val p = new Path(base, MetaName)
      val tmp = new Path(base, MetaName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(lines.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (fs.exists(p)) fs.delete(p, false)
      fs.rename(tmp, p)
    }
  }

  /** [[writeMeta]] preserving whatever params the existing descriptor
    * carries — the REFRESH-path spelling (a refresh repairs an absent
    * descriptor but must not strip the build's recorded params). */
  def repairMeta(spark: SparkSession, dir: String, kind: String,
      cols: Seq[String]): Unit =
    writeMeta(spark, dir, kind, cols,
      readMetaFull(spark, dir).map(_._3).getOrElse(Map.empty))

  /** The index descriptor as `(kind, columns)`, None for
    * pre-descriptor sidecars (callers fall back to name heuristics or
    * skip generic dispatch). Param lines are stripped — dispatchers
    * match on the column list shape. */
  def readMeta(spark: SparkSession, dir: String): Option[(String, Seq[String])] =
    readMetaFull(spark, dir).map { case (k, cs, _) => (k, cs) }

  /** The full descriptor including build params. */
  def readMetaFull(spark: SparkSession, dir: String)
      : Option[(String, Seq[String], Map[String, String])] = {
    val (fs, base) = fsOf(spark, dir)
    try {
      val in = fs.open(new Path(base, MetaName))
      val text = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      val lines = text.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      if (lines.isEmpty) None
      else {
        val (paramLines, cols) = lines.tail.partition(_.startsWith("#"))
        val params = paramLines.flatMap { l =>
          l.drop(1).split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
        Some((lines.head, cols, params))
      }
    } catch { case _: java.io.FileNotFoundException => None }
  }

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readPointer(fs: FileSystem, dir: Path): Option[String] = {
    val ptr = new Path(dir, PointerName)
    try {
      val in = fs.open(ptr)
      try {
        val bytes = new Array[Byte](256)
        val n = in.read(bytes)
        if (n <= 0) None
        else Some(new String(bytes, 0, n, java.nio.charset.StandardCharsets.UTF_8).trim)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** The live generation's relation, None when the sidecar is absent
    * (never built, dropped, or mid-pointer-swap — callers degrade).
    * The returned frame reads an immutable directory, so downstream
    * execution cannot hit missing files unless TWO swaps complete
    * between this call and the consumption (callers still guard their
    * terminal action — see [[BloomIndex.candidateFiles]]). */
  // generation-keyed SCHEMA cache: a schema-less parquet read runs a
  // footer-merging Spark job (SchemaMergeUtils.mergeSchemasInParallel,
  // sampled at ~280 ms per indexed-gate iteration in the round-13
  // profile) on EVERY Sidecar.read — but generations are immutable, so
  // the inferred schema for a (dir, gen) pair can never change. Same
  // lifecycle/eviction reasoning as coverageCache below; metadata only
  // (never rows), so bench/oracle results are unaffected.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), org.apache.spark.sql.types.StructType]()

  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (fs, base) = fsOf(spark, dir)
    readPointer(fs, base).flatMap { gen =>
      val genPath = new Path(base, gen)
      try {
        val key = (fs.makeQualified(base).toString, gen)
        val cached = schemaCache.get(key)
        if (cached != null) Some(spark.read.schema(cached).parquet(genPath.toString))
        else {
          val df = spark.read.parquet(genPath.toString)
          // bounded by wholesale clear like coverageCache, but at a
          // higher water mark: entries are one StructType each, and a
          // 64-entry clear was measured to re-trigger the footer-merge
          // schema job mid-bench (the exact cost this cache removes)
          if (schemaCache.size > 512) schemaCache.clear()
          schemaCache.put(key, df.schema)
          Some(df)
        }
      }
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
  }

  // generation-keyed coverage cache: generations are immutable, so a
  // (dir, gen) summary never goes stale — repeat searches in one JVM
  // plan with zero IO. Bounded by wholesale clear (the simple eviction
  // that can never pin unbounded memory). Values are
  // (max version, entry count; count -1 for legacy two-field lines).
  private val coverageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Map[String, (Long, Long)]]()

  /** Drop cached summaries for `dir` — probes/tests that edit or
    * delete a `_coverage` file to exercise fallback/invariant paths
    * need this; the production paths never do (generations are
    * immutable). Matching is normalization-aware: readers cache under
    * whatever spelling reached them (a `listStatus`-qualified URI vs
    * the builder's root-relative join), and a test invalidating by one
    * spelling must hit entries cached under the other. The SAME
    * `fsOf`-based qualification [[readCoverageFull]] keys the cache
    * with derives the key here — deriving it from `SparkSession.active`
    * instead could qualify under a different spelling on a thread
    * whose active session differs from the reader's, leaving exactly
    * the stale entry this call exists to evict. */
  private[graft] def invalidateCoverage(spark: SparkSession, dir: String): Unit = {
    val n =
      try { val (fs, base) = fsOf(spark, dir); fs.makeQualified(base).toString }
      catch { case scala.util.control.NonFatal(_) => dir }
    coverageCache.keySet.removeIf(_._1 == n)
    schemaCache.keySet.removeIf(_._1 == n)
  }

  /** The live generation's planning summary: stored file_path → max
    * entry version (markers included — callers filter). None when the
    * sidecar is absent OR the generation predates the summary (legacy;
    * callers fall back to a distinct over the entry relation). Reads
    * one file-count-sized text file — never the entry relation — and
    * memoizes per immutable generation. */
  def readCoverage(spark: SparkSession, dir: String): Option[Map[String, Long]] =
    readCoverageFull(spark, dir).map(_.map { case (p, (v, _)) => p -> v })

  /** Full summary including per-path entry COUNTS: file_path →
    * (max version, entry count). Count is -1 when the generation's
    * summary predates the count field — callers must treat -1 as
    * "unknown", never as a mismatch. The count is the log-plane
    * integrity handle: a row-keyed sidecar must hold exactly one entry
    * per logical row of a covered file, so count vs the add's
    * `numRecords` is checkable with no data read. */
  def readCoverageFull(spark: SparkSession, dir: String)
      : Option[Map[String, (Long, Long)]] = {
    val (fs, base) = fsOf(spark, dir)
    readPointer(fs, base).flatMap { gen =>
      val key = (fs.makeQualified(base).toString, gen)
      Option(coverageCache.get(key)).orElse {
        try {
          val in = fs.open(new Path(base, new Path(gen, "_coverage").toString))
          val text = try scala.io.Source.fromInputStream(in).mkString
            finally in.close()
          val m = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
            .flatMap { l =>
              l.split("\t") match {
                case Array(p, v) => v.toLongOption.map(vv => p -> ((vv, -1L)))
                case Array(p, v, n) => for {
                  vv <- v.toLongOption; nn <- n.toLongOption
                } yield p -> ((vv, nn))
                case _ => None
              }
            }.toMap
          if (coverageCache.size > 64) coverageCache.clear()
          coverageCache.put(key, m)
          Some(m)
        } catch { case _: java.io.FileNotFoundException => None }
      }
    }
  }

  /** Publish `df` as the new live generation: write it complete, then
    * atomically re-point, then GC generations older than the one just
    * superseded. Throws when the pointer swap cannot be completed —
    * a silent failure here would mean a silently vanished index.
    *
    * Every generation also carries a `_coverage` summary (one
    * `path\tmaxVersion\tcount` line per distinct stored file_path) —
    * the planning surface [[readCoverage]]/[[readCoverageFull]] serves,
    * so a refresh or a search plans from a file-count-sized summary
    * instead of running a distinct over the corpus-row-sized entry
    * relation per call. The summary is OBSERVED during the write job
    * itself ([[org.apache.spark.sql.graftshims.PathStatsAgg]] — a
    * file-count-bounded map aggregate riding the write as a
    * `Dataset.observe` metric): publication costs zero extra passes
    * over the entries, and the spellings are exactly what the entry
    * rows store because the metric evaluates the very rows written
    * (the keep-semi-join equality match on the next refresh). */
  /** Ordering number of a generation dir name; -1 when unparsable.
    * Names are `gen_<n8>[_<nonce>]` — the nonce (see [[swapIn]]) makes
    * CONCURRENT publishers collision-free while `n` keeps GC ordered. */
  private def genNum(name: String): Long = {
    val digits = name.stripPrefix(GenPrefix).takeWhile(_.isDigit)
    if (digits.isEmpty) -1L else digits.toLong
  }

  def swapIn(spark: SparkSession, dir: String, df: DataFrame): Unit = {
    val (fs, base) = fsOf(spark, dir)
    val prev = readPointer(fs, base)
    // next generation number: max over EXISTING gen dirs, not just the
    // pointer — a crashed writer's orphan generation must not collide.
    // A random nonce suffixes the name: two RACING refreshes (explicit
    // + the post-commit auto-refresh hook) can compute the same number,
    // and without the nonce both would write.mode(overwrite) INTO ONE
    // directory — interleaved deletes mid-write, a corrupt generation
    // behind whichever pointer wins. With it each racer writes its own
    // complete dir and the pointer swap below arbitrates.
    val existingGens: Seq[String] =
      if (!fs.exists(base)) Nil
      else fs.listStatus(base).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(GenPrefix))
    val nextN = (existingGens.map(genNum) :+ -1L).max + 1
    val gen = f"$GenPrefix$nextN%08d" + "_" +
      java.util.UUID.randomUUID().toString.take(8)
    val obs = org.apache.spark.sql.Observation()
    val (toWrite, observed) =
      try (df.observe(obs,
        SqlShims.pathStatsAgg(
          org.apache.spark.sql.functions.col("file_path"),
          org.apache.spark.sql.functions.col("version")).as("pv")), true)
      catch { case scala.util.control.NonFatal(_) => (df, false) }
    toWrite.write.mode("overwrite").parquet(new Path(base, gen).toString)
    try {
      val summary: Seq[String] =
        (if (observed) {
          // the metric lands via an async listener shortly after the
          // write action returns — BOUNDED wait only (Observation.get
          // blocks forever; a deploy where metrics never propagate
          // would wedge the publish instead of degrading), and an
          // absent/mis-shaped "pv" key falls through to the re-read
          // pass rather than throwing past the _coverage write
          val row =
            try Some(scala.concurrent.Await.result(obs.future,
              scala.concurrent.duration.Duration(30, "seconds")))
            catch { case scala.util.control.NonFatal(_) => None }
          row.flatMap(r =>
            scala.util.Try(r.getAs[Any]("pv")).toOption).flatMap {
            case rows: scala.collection.Seq[_] => Some(rows.collect {
              case r: org.apache.spark.sql.Row =>
                s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}"
            }.toSeq)
            case _ => None
          }
        } else None).getOrElse {
          // fallback: one narrow (file_path, version) pass over the
          // written generation — slower, never wrong
          spark.read.parquet(new Path(base, gen).toString)
            .groupBy("file_path")
            .agg(org.apache.spark.sql.functions.max("version").as("v"),
              org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("n"))
            .collect().map(r =>
              s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}").toSeq
        }
      val covTmp = new Path(base, new Path(gen, "_coverage.tmp").toString)
      val cov = new Path(base, new Path(gen, "_coverage").toString)
      val cout = fs.create(covTmp, true)
      try cout.write(summary.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally cout.close()
      fs.rename(covTmp, cov)
    } catch {
      // best-effort: a generation without a summary plans through the
      // fallback distinct (slower, never wrong)
      case scala.util.control.NonFatal(_) => ()
    }
    // pointer swap: tmp write, then delete+rename with BOTH results
    // checked (HDFS rename does not overwrite; a false return without
    // a check is a silently lost index). The tmp name carries the
    // generation's nonce: a SHARED tmp name under racing publishers
    // means one racer's rename steals the other's half-written tmp
    // (observed as a create/chmod crash mid-race).
    val ptr = new Path(base, PointerName)
    val tmp = new Path(base, PointerName + ".tmp." +
      gen.substring(gen.length - 8))
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(ptr) && !fs.delete(ptr, false) && fs.exists(ptr))
      throw new java.io.IOException(
        s"sidecar pointer swap: could not delete stale pointer $ptr")
    if (!fs.rename(tmp, ptr)) {
      // LOST a publish race: if another refresh re-pointed since we
      // read `prev`, ITS generation is complete and at least as fresh —
      // advisory indexes tolerate either winner (staleness costs IO,
      // never a wrong row). Drop our orphan quietly and keep the
      // winner's. Only an UNEXPLAINED failure (pointer unchanged, no
      // racer) is a silently lost index and must throw.
      val now = readPointer(fs, base)
      try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
      if (now.isDefined && now != prev) {
        try fs.delete(new Path(base, gen), true)
        catch { case _: java.io.IOException => () }
        return
      }
      throw new java.io.IOException(
        s"sidecar pointer swap: rename $tmp -> $ptr failed (concurrent " +
          "refresh?) — the previous generation is still live")
    }
    // GC: keep the new current and the generation it superseded (a
    // reader that resolved the old pointer just before the swap is
    // still scanning it), and delete only generations NUMBERED AT OR
    // BELOW the superseded one — a RACING publisher's same-or-higher-
    // numbered directory may be about to become current, so deleting it
    // here would put a dangling pointer behind the racer's swap; such
    // orphans are collected one swap later, when their number falls at
    // or below the then-superseded generation. Best-effort — an orphan
    // costs storage, never correctness.
    val keep = Set(Some(gen), prev).flatten
    val prevNum = prev.map(genNum).getOrElse(-1L)
    existingGens.filterNot(keep).filter(genNum(_) <= prevNum).foreach { g =>
      try fs.delete(new Path(base, g), true)
      catch { case _: java.io.IOException => () }
    }
    // tmp pointer files abandoned by a CRASHED publisher are left in
    // place deliberately (bytes-sized litter): sweeping them here could
    // delete a live racer's not-yet-renamed tmp and turn its quiet
    // lost-race path into a spurious failure
  }
}
