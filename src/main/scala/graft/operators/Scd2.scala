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

  /** The decomposed merge inputs shared by the full-table and the
    * targeted (file-rewrite) execution paths:
    *  - `changedKeys`: (pk, __new_eff) for keys whose current row must
    *    be closed;
    *  - `inserts`: the new current rows (changed keys + brand-new keys)
    *    in base column order.
    */
  final case class MergePlan(changedKeys: DataFrame, inserts: DataFrame)

  def plan(
      base: DataFrame,
      updates: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String,
      effectiveTimeColName: String,
      endTimeColName: String): MergePlan = {

    // Strict schema contract, as sets (reference :212-232).
    val baseRequired = Set(primaryKey) ++ attrColNames ++
      Set(isCurrentColName, effectiveTimeColName, endTimeColName)
    val updatesRequired = Set(primaryKey) ++ attrColNames + effectiveTimeColName
    require(base.columns.toSet == baseRequired,
      s"base table columns ${base.columns.sorted.mkString(",")} must be exactly ${baseRequired.toSeq.sorted.mkString(",")}")
    require(updates.columns.toSet == updatesRequired,
      s"updates columns ${updates.columns.sorted.mkString(",")} must be exactly ${updatesRequired.toSeq.sorted.mkString(",")}")

    // Eager uniqueness guard: >1 update row per key would fan the base's
    // current row out into duplicate closed rows AND insert multiple new
    // 'current' rows — silent corruption. delta-rs MERGE (the reference's
    // engine) raises a multiple-source-rows-matched error; so do we.
    // countDistinct ignores NULL, but `select(pk).distinct().count()`
    // semantics (one distinct NULL group) are the contract — add the
    // NULL group back so a single NULL-keyed update row stays legal and
    // two of them still fail the guard.
    val guard = updates.agg(
      F.count(lit(1)).as("n"),
      (F.countDistinct(col(primaryKey)) +
        F.coalesce(F.max(when(col(primaryKey).isNull, 1L).otherwise(0L)),
          lit(0L))).as("k")).head()
    val (updTotal, updKeys) = (guard.getLong(0), guard.getLong(1))
    require(updTotal == updKeys,
      s"updates contain $updTotal rows but only $updKeys distinct '$primaryKey' " +
        "keys; at most one update row per primary key is allowed in an SCD2 merge")

    val baseCols = base.columns.toSeq
    val current = base.where(col(isCurrentColName))

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

    val changedKeys = changed.select(
      col(primaryKey), col(effectiveTimeColName).as("__new_eff"))
    MergePlan(changedKeys, inserts)
  }

  /** Close matched current rows and pass everything else through; used
    * on the full base (here) or on just the touched-file scan (targeted
    * path). Attributes keep their OLD values; end = update's effective. */
  def applyCloses(
      rows: DataFrame, changedKeys: DataFrame, primaryKey: String,
      isCurrentColName: String, endTimeColName: String): DataFrame = {
    val cols = rows.columns.toSeq.filterNot(_ == "__new_eff")
    rows.join(F.broadcast(changedKeys), Seq(primaryKey), "left")
      .select(cols.map {
        case c if c == isCurrentColName =>
          when(col("__new_eff").isNotNull && col(isCurrentColName), lit(false))
            .otherwise(col(isCurrentColName)).as(isCurrentColName)
        case c if c == endTimeColName =>
          when(col("__new_eff").isNotNull && col(isCurrentColName), col("__new_eff"))
            .otherwise(col(endTimeColName)).as(endTimeColName)
        case c => col(c)
      }: _*)
  }

  def upsert(
      base: DataFrame,
      updates: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String = "is_current",
      effectiveTimeColName: String = "effective_time",
      endTimeColName: String = "end_time"): DataFrame = {
    val p = plan(base, updates, primaryKey, attrColNames,
      isCurrentColName, effectiveTimeColName, endTimeColName)
    applyCloses(base, p.changedKeys, primaryKey, isCurrentColName, endTimeColName)
      .unionByName(p.inserts)
  }
}
