package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: assign documents to
  * fixed-token-budget bins so downstream tokenization can concatenate
  * each bin into one training sequence with minimal padding.
  *
  * Engine-side addition (the reference has no training-pipeline ops);
  * the assignment is the standard deterministic greedy fill: documents
  * are taken in a stable order and bin `b` holds the rows whose
  * exclusive prefix token sum lands in `[b*budget, (b+1)*budget)` —
  * concat-then-chunk semantics, so a document may START mid-bin and
  * straddle the boundary into following bins (an over-budget document
  * always does). How straddling rows are split/truncated at bin edges
  * is downstream's tokenizer policy, deliberately NOT this operator's
  * job; `bin_offset` tells it where inside the bin the row begins.
  *
  * Plan shape: one shuffle on `groupCols` + one in-partition sort — a
  * single window, no self-joins, no iteration. The serial constraint is
  * inherent to packing (bin of row N depends on all earlier rows in its
  * group); at 100 TB keep groups bounded by adding a shard column to
  * `groupCols` (e.g. `hash(id) % numShards`) — packing quality is
  * unchanged (greedy fill is shard-local anyway) and each shard packs
  * independently in parallel.
  */
object Packing {

  /** @param df        input rows
    * @param idCol     stable ordering column within each group
    * @param tokensCol per-row token count (integer)
    * @param budget    max tokens per bin (> 0)
    * @param groupCols partition columns; bins never span groups
    * @return input columns + `bin_id` (0-based within group) +
    *         `bin_offset` (token offset of this row inside its bin)
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      budget: Long,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val missing = (Seq(idCol, tokensCol) ++ groupCols).filterNot(df.columns.contains)
    require(missing.isEmpty, s"input is missing columns: ${missing.mkString(",")}")

    val w0 = if (groupCols.isEmpty) Window.partitionBy(lit(1))
             else Window.partitionBy(groupCols.map(col): _*)
    val w = w0.orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before: Column = coalesce(sum(col(tokensCol)).over(w), lit(0L))
    // Integral DIV, not floor(a/b): long/long Divide is a DOUBLE
    // division in Spark, which mis-bins once a group's prefix sum
    // passes 2^53 (and diverges from an integer-`//` oracle).
    df.withColumn("__bf", before.cast("long"))
      .withColumn("bin_id", expr(s"__bf DIV ${budget}L"))
      .withColumn("bin_offset", col("__bf") - col("bin_id") * budget)
      .drop("__bf")
  }
}
