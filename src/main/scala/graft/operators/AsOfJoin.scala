package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, attach the latest
  * right row with the same key whose time is <= the left row's time —
  * the standard operation for joining events to the state that was
  * current when they happened (CDC snapshots, sensor readings, quotes
  * before trades).
  *
  * The reference library has no such operator (tables only, no
  * time-series ops); this is an engine-side addition for the
  * training-data/eventlog pipeline, with DuckDB's native `ASOF JOIN` as
  * the independent correctness oracle.
  *
  * Plan shape — built for scale, NOT as a range join: both sides are
  * tagged and unioned, then a single window per key carries the most
  * recent right-side values forward (`last(..., ignoreNulls)` over
  * rows-unbounded-preceding). One shuffle on the key columns, one sort
  * by (time, tag) inside each partition, zero row expansion — where a
  * naive `l JOIN r ON key AND r.t <= l.t` + window explodes
  * O(|matches per key|^2) and a broadcast-range join needs the whole
  * right side per executor. Skewed keys behave like any window-by-key
  * op (AQE handles the shuffle; a hot single key is inherent to the
  * ordering semantics).
  *
  * Tie semantics: a right row at exactly the left row's time IS visible
  * (`<=`, DuckDB `ASOF JOIN ... ON l.t >= r.t` semantics) — right rows
  * sort before left rows at equal times. If the right side has several
  * rows at the same (key, time), the last one in `rightOrder` wins;
  * pass an explicit tie-break column to make results deterministic.
  */
object AsOfJoin {

  /** @param left       rows to enrich (kept as-is, inner-join semantics:
    *                    rows with no as-of match are dropped)
    * @param right      state/event rows providing the carried values
    * @param keyCols    equi-join key columns (present on both sides)
    * @param leftTime   left event-time column (orderable)
    * @param rightTime  right event-time column (same type)
    * @param valueCols  right columns to attach, each emitted as
    *                   `asof_<name>`; `rightTime` is always attached as
    *                   `asof_<rightTime>`
    * @param rightOrder extra right-side tie-break columns (ascending,
    *                   last wins) applied after the time ordering
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      rightOrder: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(keyCols.nonEmpty, "asOf requires at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val missingL = (keyCols :+ leftTime).filterNot(left.columns.contains)
    require(missingL.isEmpty, s"left side is missing columns: ${missingL.mkString(",")}")
    val missingR = ((keyCols :+ rightTime) ++ valueCols ++ rightOrder)
      .filterNot(right.columns.contains)
    require(missingR.isEmpty, s"right side is missing columns: ${missingR.mkString(",")}")
    // Reserved-name guards (mirroring RangeJoin's disjointness check):
    // the operator stages `__t/__tag/__r/__l_<c>/__ord_<c>` internally
    // and emits `asof_<c>` — an input column already spelled one of
    // those ways would collide into duplicate output columns or a
    // confusing analysis error deep inside the plan.
    val reservedL = left.columns.filter(c =>
      c == "__t" || c == "__tag" || c == "__r" || c.startsWith("__l_") ||
        c.startsWith("__ord_") || c.startsWith("asof_"))
    require(reservedL.isEmpty,
      s"left columns collide with asOf's reserved names: ${reservedL.mkString(",")}")
    val reservedR = right.columns.filter(c =>
      c == "__t" || c == "__tag" || c == "__r" || c.startsWith("__l_") ||
        c.startsWith("__ord_"))
    require(reservedR.isEmpty,
      s"right columns collide with asOf's reserved names: ${reservedR.mkString(",")}")
    require(!valueCols.contains(rightTime),
      s"valueCols must not repeat rightTime ($rightTime): it is always " +
        s"attached as asof_$rightTime")
    require(valueCols.distinct == valueCols,
      s"valueCols contains duplicates: ${valueCols.diff(valueCols.distinct).mkString(",")}")

    val carried = rightTime +: valueCols
    val leftCols = left.columns.toSeq

    // The carried right values travel as ONE struct, not per-column:
    // per-column last(..., ignoreNulls) would skip a legitimately-NULL
    // value back to an older right row, stitching together a row that
    // never existed. The struct is non-null exactly when the row IS a
    // right row, so one last(ignoreNulls) carries the whole latest row
    // atomically, NULL members included.
    val carriedStructType = org.apache.spark.sql.types.StructType(
      carried.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    // Common layout: keys, __t, __tag, left payload (null on right rows),
    // carried right struct (null on left rows). Right rows tag 0 so they
    // sort before left rows at equal times (inclusive <= semantics).
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        rightOrder.map(c => col(c).as(s"__ord_$c")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(carried.map(c => col(c).as(c)): _*).as("__r"): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        rightOrder.map(c => lit(null).cast(right.schema(c).dataType).as(s"__ord_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(carriedStructType).as("__r"): _*)

    // forward direction scans time DESC, so the carried "last right row
    // seen" is the EARLIEST right row at-or-after the left time; the
    // tag tie keeps an equal-time right row visible in both directions
    val timeOrd =
      if (direction == "backward") col("__t").asc else col("__t").desc
    val ordering: Seq[Column] =
      timeOrd +: col("__tag").asc +: rightOrder.map(c => col(s"__ord_$c").asc_nulls_last)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withCarried = taggedRight.unionByName(taggedLeft)
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__tag")) ++
          leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c")) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__asof"): _*)

    val joined = withCarried
      .where(col("__tag") === 1 && col("__asof").isNotNull)
      .select(
        keyCols.map(col) ++
          leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c").as(c)) ++
          carried.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
    // tolerance: drop matches farther than `tolerance` in the time
    // columns' own subtraction semantics (long epoch diff stays a
    // long; timestamp diff is a day-time interval — pass an INTERVAL
    // literal then)
    tolerance match {
      case None => joined
      case Some(tol) =>
        val lt = col(leftTime)
        val rt = col(s"asof_$rightTime")
        joined.where(
          if (direction == "backward") lt - rt <= tol else rt - lt <= tol)
    }
  }
}
