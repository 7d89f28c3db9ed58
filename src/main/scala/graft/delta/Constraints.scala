package graft.delta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CHECK constraints and NOT NULL invariants (Delta protocol
  * "CHECK Constraints" / writer version 3, feature `checkConstraints`).
  *
  * A constraint lives in the table configuration as
  * `delta.constraints.<name> -> <sql expression>`; a row satisfies it
  * when the expression is TRUE or NULL (SQL CHECK semantics). NOT NULL
  * comes from `nullable = false` in the declared table schema (the
  * protocol's `invariants` writer feature, top-level columns — same
  * scope delta-spark enforces).
  *
  * Enforcement RIDES THE WRITE JOB: the violation probe is an
  * `assert_true` filter fused into the same scan that writes the
  * parquet, so a 100 TB append pays zero extra passes — the first
  * violating row aborts the job before the commit (files staged so far
  * are cleaned by the staging-dir delete). This is the delta-spark
  * posture (an `Invariants` check operator in the write plan), not the
  * validate-then-write double scan.
  */
object Constraints {

  val ConfPrefix = "delta.constraints."

  /** Declared CHECK constraints of a table: name -> SQL expression. */
  def of(metadata: Metadata): Map[String, String] =
    of(metadata.configuration)

  def of(configuration: Map[String, String]): Map[String, String] =
    configuration.collect {
      case (k, v) if k.startsWith(ConfPrefix) => k.stripPrefix(ConfPrefix) -> v
    }

  /** Predicate that is true iff the row VIOLATES `sqlExpr` (false →
    * violation; true or NULL → satisfied, per SQL CHECK). */
  private def violates(sqlExpr: String): Column =
    !coalesce(expr(sqlExpr), lit(true))

  /** NOT NULL checks for the non-nullable top-level fields of the
    * declared schema that are present in `df`. */
  private def notNullChecks(
      declared: org.apache.spark.sql.types.StructType,
      df: DataFrame): Seq[(String, Column)] =
    declared.fields.toSeq
      .filter(f => !f.nullable && df.columns.contains(f.name))
      .map(f => s"NOT NULL constraint on ${f.name}" -> col(f.name).isNull)

  /** Wrap `df` so that the write job itself throws on the first
    * violating row. No-op when nothing is declared. `extraProbes` lets
    * other invariants (generated-column equality) ride the same guard. */
  def enforced(
      df: DataFrame,
      checks: Map[String, String],
      declaredSchema: org.apache.spark.sql.types.StructType,
      extraProbes: Seq[(String, Column)] = Nil): DataFrame = {
    val probes: Seq[(String, Column)] =
      checks.toSeq.sortBy(_._1).map { case (name, sql) =>
        s"CHECK constraint $name ($sql)" -> violates(sql)
      } ++ notNullChecks(declaredSchema, df) ++ extraProbes
    if (probes.isEmpty) df
    else {
      // assert_true(cond) is NULL when cond holds and throws otherwise;
      // keeping it inside a WHERE clause stops column pruning from
      // dropping the probe while never filtering a surviving row.
      val guard = probes.map { case (label, bad) =>
        assert_true(!bad, lit(s"$label violated by a row being written"))
          .isNull
      }.reduce(_ && _)
      df.where(guard)
    }
  }

  /** ALTER TABLE ADD CONSTRAINT: validates EXISTING rows first (one
    * probe scan — inherent to the operation), then commits the table
    * property plus the writer-protocol upgrade (v3 legacy form, or the
    * `checkConstraints` feature on a v7 table — delta spec "CHECK
    * Constraints"). Returns the committed version. */
  def addCheckConstraint(log: DeltaLog, name: String, sqlExpr: String): Long = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9_]+"),
      s"constraint name '$name' must be [A-Za-z0-9_]+")
    val snap = log.snapshot
    val key = ConfPrefix + name.toLowerCase(java.util.Locale.ROOT)
    require(!snap.metadata.configuration.contains(key),
      s"constraint '$name' already exists on ${log.tablePath}")
    val bad = snap.read().where(violates(sqlExpr)).limit(1).count()
    require(bad == 0L,
      s"cannot add CHECK constraint $name ($sqlExpr): existing rows violate it")
    val p = snap.protocol
    val proto =
      if (p.minWriterVersion >= 7)
        p.copy(writerFeatures = p.writerFeatures + "checkConstraints")
      else if (p.minWriterVersion < 3)
        p.copy(minWriterVersion = 3)
      else p
    val m = snap.metadata
    val newMeta = m.copy(configuration = m.configuration + (key -> sqlExpr))
    val v = snap.version + 1
    val actions = Seq(
      CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "ADD CONSTRAINT", Map("name" -> name, "expr" -> sqlExpr))),
      MetadataAction(newMeta)) ++
      (if (proto != p) Seq(ProtocolAction(proto)) else Nil)
    log.commit(v, actions, ictEnabled = m.configuration
      .get("delta.enableInCommitTimestamps").contains("true"))
    v
  }

  /** ALTER TABLE DROP CONSTRAINT. Returns the committed version
    * (current version when the constraint doesn't exist). */
  def dropCheckConstraint(log: DeltaLog, name: String): Long = {
    val snap = log.snapshot
    val key = ConfPrefix + name.toLowerCase(java.util.Locale.ROOT)
    if (!snap.metadata.configuration.contains(key)) return snap.version
    val m = snap.metadata
    val newMeta = m.copy(configuration = m.configuration - key)
    val v = snap.version + 1
    log.commit(v, Seq(
      CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "DROP CONSTRAINT", Map("name" -> name))),
      MetadataAction(newMeta)), ictEnabled = m.configuration
      .get("delta.enableInCommitTimestamps").contains("true"))
    v
  }
}
