package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 upsert as a pure DataFrame
  * transform: given the current table state and an updates frame,
  * produce the post-merge table state.
  *
  * Semantics pinned by the reference's `type_2_scd_upsert`
  * (/root/reference/levi/__init__.py:169-295) and its five golden tests:
  *  - changed keys: the old current row is closed (`is_current=false`,
  *    `end = update.effective`) AND a new current row is inserted;
  *  - brand-new keys: inserted as current;
  *  - identical rows (no attribute changed): no-op;
  *  - non-current history rows: untouched.
  * Works with any orderable "time" column, including integer versions.
  *
  * Plan shape: two equi-joins on the primary key (broadcast when the
  * updates side is small — typical for CDC batches) + unions; no
  * windows, no driver-side loops.
  */
object Scd2 {

  def upsert(
      base: DataFrame,
      updates: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String = "is_current",
      effectiveTimeColName: String = "effective_time",
      endTimeColName: String = "end_time"): DataFrame = {

    // Strict schema contract, as sets (reference :212-232).
    val baseRequired = Set(primaryKey) ++ attrColNames ++
      Set(isCurrentColName, effectiveTimeColName, endTimeColName)
    val updatesRequired = Set(primaryKey) ++ attrColNames + effectiveTimeColName
    require(base.columns.toSet == baseRequired,
      s"base table columns ${base.columns.sorted.mkString(",")} must be exactly ${baseRequired.toSeq.sorted.mkString(",")}")
    require(updates.columns.toSet == updatesRequired,
      s"updates columns ${updates.columns.sorted.mkString(",")} must be exactly ${updatesRequired.toSeq.sorted.mkString(",")}")

    val baseCols = base.columns.toSeq
    val current = base.where(col(isCurrentColName))
    val history = base.where(!col(isCurrentColName) || col(isCurrentColName).isNull)

    // updates ⋈ current on pk, current side suffixed (reference :243-247).
    val curSuffixed = current.select(
      col(primaryKey) +:
        attrColNames.map(a => col(a).as(s"${a}__base")) :+
        lit(true).as("__cur_exists"): _*)
    val joinedFlagged = updates.join(curSuffixed, Seq(primaryKey), "left")
    val isMatched = col("__cur_exists").isNotNull

    // Kleene OR of attr != attr_base: null comparisons don't count as a
    // change (matches pyarrow's != filter semantics, reference :248-250).
    val anyChanged = attrColNames
      .map(a => col(a) =!= col(s"${a}__base"))
      .reduceLeft(_ || _)

    val insertShape: DataFrame => DataFrame = df => df.select(
      baseCols.map {
        case c if c == isCurrentColName => lit(true).as(isCurrentColName)
        case c if c == endTimeColName =>
          lit(null).cast(base.schema(endTimeColName).dataType).as(endTimeColName)
        case c => col(c)
      }: _*)

    // Rows whose key exists as current AND at least one attribute changed.
    val changed = joinedFlagged.where(isMatched && anyChanged)
    // Rows whose key has no current row at all.
    val brandNew = joinedFlagged.where(col("__cur_exists").isNull)

    val inserts = insertShape(
      changed.select(updates.columns.map(col).toSeq: _*)
        .unionByName(brandNew.select(updates.columns.map(col).toSeq: _*)))

    // Close the old current row of every changed key: attributes keep
    // their OLD values; end time = the update's effective time.
    val changedKeys = changed.select(
      col(primaryKey), col(effectiveTimeColName).as("__new_eff"))
    val closed = current.join(F.broadcast(changedKeys), Seq(primaryKey), "inner")
      .select(baseCols.map {
        case c if c == isCurrentColName => lit(false).as(isCurrentColName)
        case c if c == endTimeColName => col("__new_eff").as(endTimeColName)
        case c => col(c)
      }: _*)
    val untouchedCurrent = current.join(
      F.broadcast(changedKeys.select(primaryKey)), Seq(primaryKey), "left_anti")

    history.select(baseCols.map(col): _*)
      .unionByName(untouchedCurrent.select(baseCols.map(col): _*))
      .unionByName(closed)
      .unionByName(inserts)
  }
}
