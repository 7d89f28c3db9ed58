package graft.delta

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshims.SqlShims

/** Per-file Bloom filter index: point-lookup file skipping for
  * high-cardinality columns where min/max stats prune nothing.
  *
  * Stats-interval skipping ([[Skipping]]) kills range predicates, but
  * an equality probe on a column whose values scatter across files
  * (ids, fingerprints, request keys) straddles every [min, max]
  * interval — a needle lookup scans the whole table. A per-file Bloom
  * filter answers "can this file contain v?" with no false negatives,
  * so a point SELECT on an unclustered 100 TB table reads the handful
  * of files whose filter fires instead of every file. (Commercial
  * Delta offers the same concept as a bloom-filter index; this is an
  * independent sidecar design over public Spark primitives —
  * `BloomFilterAggregate` + xxhash64.)
  *
  * Layout: `<table>/_graft_index/bloom_<column>/` holds one parquet
  * relation (file_path, n_rows, bloom, version). The underscore prefix
  * keeps it invisible to data scans, and it lives OUTSIDE the Delta
  * log: the index is advisory, the log stays the source of truth.
  *
  * Staleness is handled by construction: lookups prune only files the
  * sidecar covers with a NEGATIVE filter. Files added after the build
  * (or rewritten by OPTIMIZE — new path, same rows) are absent from
  * the sidecar and conservatively scanned, so a stale index can cost
  * IO but never correctness. Rebuild after large ingests to restore
  * selectivity.
  *
  * Scale shape: the build is ONE distributed scan — per-file filters
  * come from groupBy on the scan's row-lineage file column (map-side
  * partial Bloom merge; DV-deleted rows never enter the filter). The
  * sidecar is file-count-sized, i.e. planner-scale: probing it on the
  * driver is the same order of work as the stats pruning the reader
  * already does per query.
  */
object BloomIndex {

  def indexDir(log: DeltaLog, column: String): String =
    new org.apache.hadoop.fs.Path(
      log.rootPath, s"_graft_index/bloom_$column").toString

  /** Build (or rebuild) the index for `column` at the current
    * snapshot. `expectedItemsPerFile` sizes each filter (Spark's
    * BloomFilterAggregate default false-positive rate ≈ 3% at the
    * expected count); 0 = derive from the log's max recorded per-file
    * numRecords (falls back to 1M when stats are absent).
    * Returns the indexed snapshot version. */
  def build(log: DeltaLog, column: String,
      expectedItemsPerFile: Long = 0L): Long = {
    val snap = log.snapshot
    require(snap.schema.fieldNames.contains(column),
      s"column $column not in table schema " +
        snap.schema.fieldNames.mkString("[", ", ", "]"))
    val perFile =
      if (expectedItemsPerFile > 0) expectedItemsPerFile
      else Option(snap.addsFlat.agg(max(col("num_records"))).head.get(0))
        .map(_.asInstanceOf[Long]).filter(_ > 0).getOrElse(1L << 20)
    snap.readFilesLineage(snap.planFiles())
      .groupBy(col("__file").as("file_path"))
      .agg(count(lit(1)).as("n_rows"),
        SqlShims.bloomFilterAgg(xxhash64(col(column)), perFile).as("bloom"))
      .withColumn("version", lit(snap.version))
      .write.mode("overwrite").parquet(indexDir(log, column))
    snap.version
  }

  /** The active files that may contain ANY of `values` in `column`:
    * sidecar-covered files whose filter rejects every probe are
    * pruned; files the sidecar does not cover are kept. Returns
    * (candidates, nPruned). */
  def candidateFiles(log: DeltaLog, column: String,
      values: Seq[Any]): (Seq[AddFile], Long) = {
    require(values.nonEmpty, "need at least one probe value")
    val snap = log.snapshot
    val all = snap.planFiles()
    val sidecar: Array[Row] =
      try log.spark.read.parquet(indexDir(log, column))
        .select("file_path", "bloom").collect()
      catch { case _: org.apache.spark.sql.AnalysisException =>
        return (all, 0L) } // no index built: full candidate set
    // hash the probes EXACTLY as the build did (Spark's xxhash64)
    val hashed = log.spark.range(1)
      .select(values.map(v => xxhash64(lit(v))): _*)
      .head.toSeq.map(_.asInstanceOf[Long])
    val negative = sidecar.iterator.flatMap { r =>
      Option(r.getAs[Array[Byte]]("bloom")).flatMap { bytes =>
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(bytes))
        if (hashed.exists(bf.mightContainLong)) None
        else Some(Mutations.normalize(r.getString(0)))
      }
    }.toSet
    val kept = all.filterNot(f =>
      snap.pathCandidates(f).map(Mutations.normalize).exists(negative))
    (kept, (all.size - kept.size).toLong)
  }

  /** Index-pruned point lookup: `SELECT * WHERE column IN (values)`
    * scanning only Bloom-positive (or uncovered) files. */
  def readIn(log: DeltaLog, column: String, values: Seq[Any]): DataFrame = {
    val (files, _) = candidateFiles(log, column, values)
    log.snapshot.readFiles(files)
      .where(col(column).isin(values: _*))
  }
}
