package graft.delta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField, StructType}

/** Identity columns (Delta protocol "Identity Columns", writer
  * version 6 / feature `identityColumns`): a LONG field whose metadata
  * carries `delta.identity.{start,step,highWaterMark,
  * allowExplicitInsert}`. Writes that omit the column get generated
  * values on the `start + k·step` lattice, strictly beyond the current
  * high-water mark; the mark advances in the SAME commit via an
  * updated `metaData` action (so a concurrent writer loses the race at
  * the metaData-conflict gate rather than double-allocating).
  *
  * Values are unique and lattice-aligned but NOT dense — generation
  * uses `monotonically_increasing_id()` per write job, which leaves
  * gaps between partitions (the same contract as delta-spark: identity
  * guarantees uniqueness and monotonic direction, never contiguity).
  * The new high-water mark costs nothing: it is read off the per-file
  * min/max stats the writer already collects.
  */
object IdentityColumns {

  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HwmKey = "delta.identity.highWaterMark"
  val AllowExplicitKey = "delta.identity.allowExplicitInsert"

  /** Declare an identity field for a create-table schema:
    * {{{
    * TransactionWriter.overwriteWithSchema(log, df, StructType(Seq(
    *   IdentityColumns.field("id"),
    *   StructField("payload", StringType))))
    * }}} */
  def field(name: String, start: Long = 1L, step: Long = 1L,
      allowExplicitInsert: Boolean = false): StructField = {
    require(step != 0L, "identity step must be non-zero")
    StructField(name, LongType, nullable = false,
      new MetadataBuilder()
        .putLong(StartKey, start)
        .putLong(StepKey, step)
        .putBoolean(AllowExplicitKey, allowExplicitInsert)
        .build())
  }

  final case class Spec(
      name: String, start: Long, step: Long,
      highWaterMark: Option[Long], allowExplicitInsert: Boolean)

  /** The identity specs declared by a schema (empty when none). */
  def of(schema: StructType): Seq[Spec] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(StartKey) || f.metadata.contains(StepKey) =>
        Spec(f.name,
          if (f.metadata.contains(StartKey)) f.metadata.getLong(StartKey) else 1L,
          if (f.metadata.contains(StepKey)) f.metadata.getLong(StepKey) else 1L,
          if (f.metadata.contains(HwmKey)) Some(f.metadata.getLong(HwmKey)) else None,
          f.metadata.contains(AllowExplicitKey) &&
            f.metadata.getBoolean(AllowExplicitKey))
    }

  /** Generate omitted identity columns (lattice-aligned, beyond the
    * high-water mark) and refuse explicitly-provided ones unless the
    * column allows explicit insert. Reorders to the declared field
    * order when anything was filled. */
  private[delta] def fill(df: DataFrame, declared: StructType,
      internalRewrite: Boolean = false): DataFrame = {
    val specs = of(declared)
    if (specs.isEmpty) return df
    // Targeted rewrites re-emit EXISTING rows (their identity values
    // travel with them) — only user-facing inserts are gated.
    if (!internalRewrite) specs.foreach { s =>
      require(!df.columns.contains(s.name) || s.allowExplicitInsert,
        s"cannot provide values for identity column ${s.name}: it is " +
          "GENERATED ALWAYS (declare allowExplicitInsert to override)")
    }
    val missing = specs.filterNot(s => df.columns.contains(s.name))
    if (missing.isEmpty) return df
    val filled = missing.foldLeft(df) { (acc, s) =>
      val base = s.highWaterMark.getOrElse(s.start - s.step)
      acc.withColumn(s.name,
        (lit(base) + (monotonically_increasing_id() + 1L) * s.step)
          .cast(LongType))
    }
    if (declared.fieldNames.forall(filled.columns.contains))
      filled.select(declared.fieldNames.toSeq.map(col): _*)
    else filled
  }

  /** The declared schema with identity high-water marks advanced to
    * cover the values just written (read from the per-file stats, keyed
    * by `statsNameOf(logical)`); None when no mark moved. For positive
    * steps the mark tracks the max, for negative the min. */
  private[delta] def bumpHwm(
      declared: StructType,
      statsJsons: Seq[String],
      statsNameOf: String => String): Option[StructType] = {
    val specs = of(declared)
    if (specs.isEmpty || statsJsons.isEmpty) return None
    val parsed = statsJsons.map(JsonUtil.mapper.readTree)
    var moved = false
    val newFields = declared.fields.map { f =>
      specs.find(_.name == f.name) match {
        case None => f
        case Some(s) =>
          val key = statsNameOf(s.name)
          val section = if (s.step > 0) "maxValues" else "minValues"
          val extremes = parsed.flatMap { n =>
            val v = n.path(section).path(key)
            if (v.isMissingNode || v.isNull) None else Some(v.asLong())
          }
          if (extremes.isEmpty) f
          else {
            val ext = if (s.step > 0) extremes.max else extremes.min
            val beyond = s.highWaterMark.forall(h =>
              if (s.step > 0) ext > h else ext < h)
            if (!beyond) f
            else {
              moved = true
              f.copy(metadata = new MetadataBuilder()
                .withMetadata(f.metadata).putLong(HwmKey, ext).build())
            }
          }
      }
    }
    if (moved) Some(StructType(newFields)) else None
  }
}
