package graft.delta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Min/max data-skipping predicate compiler.
  *
  * Reference semantics: `filter_to_sql` / `filters_to_sql`
  * (/root/reference/levi/__init__.py:27-47) rewrite a `(col, op, val)`
  * predicate into the interval-overlap test over a file's `[min, max]`
  * stats — a file may contain matching rows iff its interval intersects
  * the predicate. The reference only *simulates* skipping
  * (`skipped_stats`); here the same expression is promoted to execution:
  * [[prunedFiles]] picks the surviving file set fed to the parquet scan,
  * so skipping actually prunes IO (SURVEY.md §4).
  */
object Skipping {

  /** One `(column, op, value)` conjunct over the flattened adds frame
    * (`min.<col>` / `max.<col>` columns). Unknown op →
    * IllegalArgumentException (mirrors the reference's ValueError). */
  def filterToColumn(c: String, op: String, value: Any): Column = {
    val lo = col(s"min.$c")
    val hi = col(s"max.$c")
    op match {
      case "=" => lo <= lit(value) && hi >= lit(value)
      case "<" => lo < lit(value)
      case "<=" => lo <= lit(value)
      case ">" => hi > lit(value)
      case ">=" => hi >= lit(value)
      case other => throw new IllegalArgumentException(
        s"filter operator '$other' is not supported (=, <, <=, >, >=)")
    }
  }

  /** Conjunction of filters (the reference joins with " and "). */
  def filtersToColumn(filters: Seq[(String, String, Any)]): Column =
    filters.map { case (c, op, v) => filterToColumn(c, op, v) }
      .reduceLeft(_ && _)

  /** String form, for parity with `filter_to_sql`'s output contract. */
  def filterToSql(c: String, op: String, value: Any): String = {
    val v = value match {
      case s: String => s"'$s'"
      case other => other.toString
    }
    op match {
      case "=" => s"(`min.$c` <= $v and `max.$c` >= $v)"
      case "<" => s"(`min.$c` < $v)"
      case "<=" => s"(`min.$c` <= $v)"
      case ">" => s"(`max.$c` > $v)"
      case ">=" => s"(`max.$c` >= $v)"
      case other => throw new IllegalArgumentException(
        s"filter operator '$other' is not supported (=, <, <=, >, >=)")
    }
  }

  def filtersToSql(filters: Seq[(String, String, Any)]): String =
    filters.map { case (c, op, v) => filterToSql(c, op, v) }.mkString(" and ")

  /** Execute skipping: the active files that may contain matches —
    * partition columns prune EXACTLY on the log's `partitionValues`
    * (delta-style partition pruning: a partition predicate eliminates
    * whole partitions before any IO), other columns prune on the
    * min/max stats interval (files without stats are conservatively
    * kept — an absent min/max proves nothing). */
  def prunedFiles(snap: Snapshot, filters: Seq[(String, String, Any)]): Seq[AddFile] = {
    if (filters.isEmpty) return snap.activeFiles
    val partCols = snap.metadata.partitionColumns.toSet
    val (partFilters, statsFilters) = filters.partition(f => partCols.contains(f._1))
    val partPredicate: Option[Column] =
      if (partFilters.isEmpty) None
      else Some(partFilters.map { case (c, op, v) =>
        val dt = snap.schema(c).dataType
        val pv = element_at(col("partition_values"), snap.physicalNameOf(c)).cast(dt)
        op match {
          case "=" => pv === lit(v)
          case "<" => pv < lit(v)
          case "<=" => pv <= lit(v)
          case ">" => pv > lit(v)
          case ">=" => pv >= lit(v)
          case other => throw new IllegalArgumentException(
            s"filter operator '$other' is not supported (=, <, <=, >, >=)")
        }
      }.reduceLeft(_ && _))
    val statsPredicate: Option[Column] =
      if (statsFilters.isEmpty) None
      else {
        // addsFlat exposes stats under LOGICAL names (it casts the
        // physical-keyed JSON positionally), so logical filter names are
        // correct here even across column mapping and ALTER RENAME
        val mayMatch = filtersToColumn(statsFilters)
        val haveStats = statsFilters.map { case (c, _, _) =>
          col(s"min.$c").isNotNull && col(s"max.$c").isNotNull
        }.reduceLeft(_ && _)
        Some(!haveStats || mayMatch)
      }
    val predicate = (partPredicate.toSeq ++ statsPredicate.toSeq).reduceLeft(_ && _)
    // Pruning runs IN SPARK over the metadata relation; only surviving
    // AddFiles are collected to the driver. At 10⁷ files with a
    // selective predicate this is the difference between collecting a
    // handful of rows and collecting hundreds of driver MB.
    val survivors = snap.addsFlat.where(predicate).select("path")
    snap.adds.join(survivors, Seq("path"), "left_semi")
      .collect().toSeq.map(snap.rowToAddFile)
  }

  /** Pruned scan: stats-based file pruning + row-level predicate pushed
    * to the parquet reader by Catalyst. */
  def readWhere(snap: Snapshot, filters: Seq[(String, String, Any)]) = {
    val df = snap.readFiles(prunedFiles(snap, filters))
    if (filters.isEmpty) df
    else df.where(filters.map { case (c, op, v) =>
      op match {
        case "=" => col(c) === lit(v)
        case "<" => col(c) < lit(v)
        case "<=" => col(c) <= lit(v)
        case ">" => col(c) > lit(v)
        case ">=" => col(c) >= lit(v)
        case other => throw new IllegalArgumentException(s"bad op $other")
      }
    }.reduceLeft(_ && _))
  }
}
