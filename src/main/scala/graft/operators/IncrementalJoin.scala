package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the second
  * half of the IVM story next to [[IncrementalAgg]]: keep
  * `view = fact ⨝ dim` (inner equi-join on fact.fk = dim.pk, the view
  * keyed by the fact primary key) fresh for the cost of the CHANGES,
  * not a view rebuild.
  *
  * Standard derivation: a fact insert/update joins against the NEW dim
  * (one delta, no double counting); a fact delete removes its view row;
  * a dim change (update or delete) re-derives exactly the CURRENT fact
  * rows referencing the changed dim keys — re-joined rows that find no
  * dim match (dim delete) leave the view, matching inner-join
  * semantics.
  *
  * Scale shape: fact-side changes cost O(change slice) — the slice
  * joins the dim with the usual broadcast. Dim-side changes cost one
  * fact scan PRUNED to the changed dim keys (at 100 TB that's where a
  * fk Bloom index or fk-clustered layout pays for itself); the
  * affected set is bounded by fan-out × changed dim keys. The apply is
  * an anti-join of the view against the touched-PK set + a union —
  * never a view rebuild.
  */
object IncrementalJoin {

  /** View-maintenance delta from the two change feeds (CDF frames with
    * `_change_type`, as produced by `ChangeDataFeed.tableChanges`).
    *
    * @param factChanges fact CDF slice (fact schema + _change_type)
    * @param dimChanges  dim CDF slice (dim schema + _change_type)
    * @param factNew     fact table AFTER the change window
    * @param dimNew      dim table AFTER the change window
    * @param factPk      fact primary key = view key
    * @param fk          fact foreign-key column joining dim
    * @param dimPk       dim primary-key column
    * @param dimCols     dim attribute columns carried into the view
    * @return (touchedKeys, upserts): every view row whose key is in
    *         `touchedKeys` must be dropped, then `upserts` (already
    *         joined against the new dim) appended — see [[applyDelta]].
    */
  def viewDelta(
      factChanges: DataFrame, dimChanges: DataFrame,
      factNew: DataFrame, dimNew: DataFrame,
      factPk: Seq[String], fk: String, dimPk: String,
      dimCols: Seq[String]): (DataFrame, DataFrame) = {
    require(factPk.nonEmpty, "view needs a fact primary key")
    val pkCols = factPk.map(col)
    // A multi-commit window can touch one PK several times (insert at
    // v, delete at v+1) — only the LATEST change per PK decides the
    // view row, so rank by _commit_version before splitting into
    // upserts/deletes. Preimages participate AS the retraction of
    // their own PK: an UPDATE that changes the fact PK emits the old
    // key only as an update_preimage, so dropping preimages would
    // leave the old key's view row stale forever (and an insert
    // earlier in the window would even rank as its latest change and
    // resurrect it with stale values). Within ONE version the
    // insert/postimage wins over the delete/preimage: a CDF-
    // synthesized overwrite emits remove-as-delete AND add-as-insert
    // for every surviving row, and a PK-preserving update emits
    // pre+post for the same key, at the same commit — the row lives.
    val retractTypes = Seq("delete", "update_preimage")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pkCols: _*).orderBy(col("_commit_version").desc,
        when(col("_change_type").isin(retractTypes: _*), 0).otherwise(1).desc)
    val factLatest = factChanges
      .select(factNew.columns.map(col).toSeq ++
        Seq(col("_change_type"), col("_commit_version")): _*)
      .where(col("_change_type").isin(
        "insert" +: "update_postimage" +: retractTypes: _*))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val factUpserted = factLatest
      .where(!col("_change_type").isin(retractTypes: _*))
      .select(factNew.columns.map(col).toSeq: _*)
    val factDeleted = factLatest
      .where(col("_change_type").isin(retractTypes: _*))
      .select(pkCols: _*)
    // dim keys whose attribute rows changed (update pre+post, delete)
    val dimChangedKeys = dimChanges.select(col(dimPk).as("__dk")).distinct()
    // CURRENT fact rows referencing changed dim keys (the pruned scan)
    val factViaDim = factNew
      .join(dimChangedKeys.withColumnRenamed("__dk", fk), Seq(fk), "left_semi")
    // affected = changed facts ∪ dim-affected facts, one row per PK
    // (both sides carry post-window values, so any winner is correct)
    val affected = factUpserted.unionByName(factViaDim)
      .dropDuplicates(factPk)
    val upserts = affected.join(
      dimNew.select(col(dimPk).as(fk) +: dimCols.map(col): _*), Seq(fk))
    // touched = every PK whose view row must be replaced or dropped:
    // deleted facts, plus ALL affected PKs (an affected row that found
    // no dim match — dim delete — is dropped and never re-added)
    val touched = factDeleted
      .unionByName(affected.select(pkCols: _*)).distinct()
    (touched, upserts)
  }

  /** SIGNED multiset delta of the inner join `F ⨝ D` (on `fact.fk =
    * dim.dimPk`) across a change window, for aggregate-over-join
    * maintenance ([[graft.delta.MatView]] join-rollup views): each
    * output row is one joined row gained (+1) or lost (−1) by the
    * window, carrying all fact columns, the requested `dimCols`, and
    * `__sign`. Fold it per group key into a rollup and the rollup
    * tracks the join without either the join or the rollup ever being
    * rebuilt.
    *
    * Derivation (exact multiset algebra — no latest-per-key ranking;
    * every CDF row participates with its sign, so multi-commit windows
    * and same-version overwrite pairs cancel arithmetically):
    *
    *   F_new⨝D_new − F_old⨝D_old = ΔF⨝D_new + F_new⨝ΔD − ΔF⨝ΔD
    *
    * where ΔF/ΔD are the signed change multisets (insert/postimage +1,
    * delete/preimage −1). The cross term is what keeps group-key moves
    * exact: a fact row deleted while its dim row's attribute also
    * changed retracts from the OLD group, not the new one — the first
    * two terms alone would retract from the wrong group and the third
    * corrects it (sign −sf·sd).
    *
    * Scale shape: term 1 is O(fact slice) joined to the dim (broadcast
    * as usual); term 2 is the fact scan PRUNED to the changed dim keys
    * (semi-join pushed below the attribute join — the same place an fk
    * Bloom index pays off); term 3 is delta×delta. Nothing rescans the
    * dim, nothing rebuilds anything. */
  def signedJoinDelta(
      factChanges: DataFrame, dimChanges: DataFrame,
      factNew: DataFrame, dimNew: DataFrame,
      fk: String, dimPk: String, dimCols: Seq[String]): DataFrame = {
    def sign(ct: Column): Column =
      when(ct.isin("insert", "update_postimage"), lit(1L))
        .when(ct.isin("delete", "update_preimage"), lit(-1L))
        .otherwise(lit(0L))
    val dF = factChanges
      .select(factNew.columns.map(col).toSeq :+
        sign(col("_change_type")).as("__sf"): _*)
      .where(col("__sf") =!= 0L)
    // dim delta rows renamed to join directly on the fact fk; each CDF
    // row carries the attribute values OF ITS SIDE of the change
    // (preimage = old attrs, postimage = new), which is exactly what
    // the algebra needs
    val dD = dimChanges
      .select(col(dimPk).as(fk) +: dimCols.map(col) :+
        sign(col("_change_type")).as("__sd"): _*)
      .where(col("__sd") =!= 0L)
    val dimNewSel = dimNew.select(col(dimPk).as(fk) +: dimCols.map(col): _*)
    val t1 = dF.join(dimNewSel, Seq(fk))
      .withColumn("__sign", col("__sf")).drop("__sf")
    // prune the fact scan to changed dim keys BEFORE the attribute join
    val changedDimKeys = dD.select(fk).distinct()
    val t2 = factNew.join(changedDimKeys, Seq(fk), "left_semi")
      .join(dD, Seq(fk))
      .withColumn("__sign", col("__sd")).drop("__sd")
    val t3 = dF.join(dD, Seq(fk))
      .withColumn("__sign", -(col("__sf") * col("__sd")))
      .drop("__sf", "__sd")
    t1.unionByName(t2).unionByName(t3)
  }

  /** Apply a [[viewDelta]] to the materialized view DataFrame:
    * anti-join out the touched keys, append the re-derived rows.
    * O(|touched| + |upserts|) beyond the view pass-through; with a
    * Delta-backed view, feed the same pair to a MERGE instead. */
  def applyDelta(
      view: DataFrame, touched: DataFrame, upserts: DataFrame,
      factPk: Seq[String]): DataFrame =
    view.join(touched, factPk, "left_anti")
      .unionByName(upserts.select(view.columns.map(col).toSeq: _*))
}
