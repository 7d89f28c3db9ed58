package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to the interval rows that
  * contain them — events to sessions, readings to maintenance windows,
  * errors to incident spans.
  *
  * Engine-side addition (the reference has no interval ops). Spark
  * plans a naive `p JOIN i ON key AND t BETWEEN s AND e` as an
  * equi-join on the key with the range conjunct as a POST-JOIN filter:
  * every point × every interval of the same key materializes first —
  * quadratic in per-key density. This operator uses the standard
  * bin-join instead: intervals explode to the fixed-width time bins
  * they cover, points map to exactly one bin, and the join is a pure
  * equi-join on (key, bin) + a residual containment filter. Candidate
  * volume is then per-bin-local: O(points_in_bin × intervals_covering
  * _bin) per (key, bin), and each true (interval, point) pair is
  * produced exactly once (a point lives in one bin; an interval covers
  * that bin once) — no dedup pass needed.
  *
  * Pick `binWidth` near the typical interval length: wider bins mean
  * fewer explode rows but more false candidates per bin; narrower bins
  * the reverse. Interval explode factor is `len/binWidth + 1`.
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` whose
    * `[startCol, endCol]` (inclusive both ends) contains `pointCol`,
    * matching on `keyCols`. Non-key column names must be disjoint
    * across the two inputs; all of them are carried to the output.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val missingP = (keyCols :+ pointCol).filterNot(points.columns.contains)
    require(missingP.isEmpty, s"points side is missing columns: ${missingP.mkString(",")}")
    val missingI = (keyCols ++ Seq(startCol, endCol)).filterNot(intervals.columns.contains)
    require(missingI.isEmpty, s"intervals side is missing columns: ${missingI.mkString(",")}")
    val clash = (points.columns.toSet -- keyCols) intersect (intervals.columns.toSet -- keyCols)
    require(clash.isEmpty, s"non-key columns must be disjoint, both sides have: ${clash.mkString(",")}")

    val p = points.withColumn("__bin", binOf(pointCol, binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(startCol, binWidth), binOf(endCol, binWidth))))
    p.join(i, keyCols :+ "__bin")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Floor-division bin, computed in INTEGER arithmetic. `floor(col/w)`
    * divides in DOUBLE, which above 2^53 (e.g. raw epoch-nanos) can
    * round point and interval coordinates into different bins and
    * silently drop true matches — the same hazard Packing guards with
    * integer DIV. Coordinates are cast to BIGINT (they are integral in
    * every supported use; fractional inputs would truncate). */
  private def binOf(colName: String, w: Long): org.apache.spark.sql.Column = {
    val v = col(colName).cast("long")
    when(v >= 0, expr(s"CAST(`$colName` AS BIGINT) DIV ${w}L"))
      .otherwise(expr(s"((CAST(`$colName` AS BIGINT) + 1) DIV ${w}L) - 1"))
  }
}
