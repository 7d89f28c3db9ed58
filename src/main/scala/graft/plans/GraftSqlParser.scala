package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.delta.{DeltaLog, Maintenance}

/** SQL surface for table maintenance, injected through
  * `SparkSessionExtensions.injectParser` (the same extension point
  * delta-spark uses for VACUUM/OPTIMIZE). Recognized statements —
  * everything else delegates verbatim to Spark's parser:
  *
  * {{{
  * GRAFT VACUUM '<path>' [RETAIN <n> HOURS]
  * GRAFT OPTIMIZE '<path>' [ZORDER BY (c1, c2)]
  * GRAFT CHECKPOINT '<path>'
  * GRAFT HISTORY '<path>'
  * GRAFT RESTORE '<path>' TO VERSION <v>
  * }}}
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Vacuum =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*""".r
  private val Optimize =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val Checkpoint = """(?is)\s*GRAFT\s+CHECKPOINT\s+'([^']+)'\s*""".r
  private val History = """(?is)\s*GRAFT\s+HISTORY\s+'([^']+)'\s*""".r
  private val Restore =
    """(?is)\s*GRAFT\s+RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+(\d+)\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(path, hours) =>
      val retention = Option(hours).map(_.toLong * 3600 * 1000L)
        .getOrElse(Maintenance.DefaultVacuumRetentionMs)
      GraftMaintenanceCommand(path, "vacuum",
        Seq("deleted_files"), s => {
          val n = Maintenance.vacuum(DeltaLog.forPath(s, path), retention).size
          Seq(Row(n.toLong))
        })
    case Optimize(path, zcols) =>
      GraftMaintenanceCommand(path, "optimize",
        Seq("version"), s => {
          val log = DeltaLog.forPath(s, path)
          val v = Option(zcols) match {
            case Some(cs) =>
              Maintenance.zorder(log, cs.split(",").map(_.trim).toSeq)
            case None => Maintenance.compact(log)
          }
          Seq(Row(v))
        })
    case Checkpoint(path) =>
      GraftMaintenanceCommand(path, "checkpoint",
        Seq("version"), s => Seq(Row(Maintenance.checkpoint(DeltaLog.forPath(s, path)))))
    case History(path) =>
      GraftMaintenanceCommand(path, "history",
        Seq("version", "operation"), s => {
          Maintenance.history(DeltaLog.forPath(s, path))
            .select("version", "operation")
            .collect().toSeq
        })
    case Restore(path, v) =>
      GraftMaintenanceCommand(path, "restore",
        Seq("version"), s => Seq(Row(Maintenance.restore(DeltaLog.forPath(s, path), v.toLong))))
    case _ => delegate.parsePlan(sqlText)
  }

  private val GraftPrefix = """(?is)\s*GRAFT\s.*""".r

  override def parsePlanWithParameters(
      sqlText: String,
      parameterContext: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    // cheap prefix check first — matching through parsePlan would parse
    // every ordinary parameterized statement twice
    if (GraftPrefix.matches(sqlText)) parsePlan(sqlText)
    else delegate.parsePlanWithParameters(sqlText, parameterContext)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Leaf command executed through Spark's own RunnableCommand machinery
  * (ExecutedCommandExec — the same path built-in DDL takes); `body`
  * runs the maintenance operation and returns the result rows. */
case class GraftMaintenanceCommand(
    path: String, op: String, outCols: Seq[String],
    body: SparkSession => Seq[Row])
    extends org.apache.spark.sql.execution.command.RunnableCommand {
  override def output: Seq[Attribute] = outCols.map { c =>
    val dt = if (c == "operation") StringType else LongType
    AttributeReference(c, dt, nullable = true)()
  }
  override def run(sparkSession: SparkSession): Seq[Row] = body(sparkSession)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): LogicalPlan = this
}
