package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MetadataBuilder, StructField, StructType}

/** Generated columns (Delta protocol "Default Columns / Generated
  * Columns", writer version 4 / feature `generatedColumns`): a field
  * whose metadata carries `delta.generationExpression` is COMPUTED from
  * the expression when a write omits it, and VALIDATED against the
  * expression (null-safe equality, delta-spark's rule) when a write
  * provides it explicitly. Both paths ride the write job — filling is a
  * projection, validation joins the [[Constraints]] assert_true probe.
  */
object GeneratedColumns {

  val Key = "delta.generationExpression"

  /** Declare a generated field for a create-table schema:
    * {{{
    * TransactionWriter.overwrite(log, df, declaredSchema = Some(StructType(Seq(
    *   StructField("ts", TimestampType),
    *   GeneratedColumns.field("day", DateType, "CAST(ts AS DATE)")))))
    * }}} */
  def field(name: String, dataType: DataType, genExpr: String): StructField =
    StructField(name, dataType, nullable = true,
      new MetadataBuilder().putString(Key, genExpr).build())

  /** Top-level generated columns of a schema: name -> expression. */
  private[delta] def of(schema: StructType): Map[String, String] =
    schema.fields.collect {
      case f if f.metadata.contains(Key) => f.name -> f.metadata.getString(Key)
    }.toMap

  /** Add every generated column the frame omits, computed from its
    * expression; when anything was filled the result is reordered to
    * the declared field order (so the schema-equality writer gate sees
    * the table shape). */
  private[delta] def fill(df: DataFrame, declared: StructType): DataFrame = {
    val missing = of(declared).filterNot { case (n, _) => df.columns.contains(n) }
    if (missing.isEmpty) df
    else {
      val filled = missing.foldLeft(df) { case (acc, (name, gen)) =>
        acc.withColumn(name, expr(gen).cast(declared(name).dataType))
      }
      if (declared.fieldNames.forall(filled.columns.contains))
        filled.select(declared.fieldNames.toSeq.map(col): _*)
      else filled
    }
  }

  /** Violation probes for EXPLICITLY-provided generated columns: the
    * provided value must null-safe-equal the expression result. */
  private[delta] def probes(df: DataFrame, declared: StructType): Seq[(String, Column)] =
    of(declared).toSeq.sortBy(_._1).collect {
      case (name, gen) if df.columns.contains(name) =>
        (s"generated column $name ($gen)",
          !(col(name) <=> expr(gen).cast(declared(name).dataType)))
    }
}
