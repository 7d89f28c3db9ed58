package graft.delta

import org.apache.spark.sql.types.{Metadata => _, _}

/** ALTER TABLE schema evolution through column mapping — the feature
  * column mapping exists FOR (Delta protocol "Column Mapping"):
  * renaming or dropping a column is a metadata-only commit because data
  * files are keyed by stable physical names, never by display names.
  *
  * [[enableColumnMapping]] upgrades an unmapped table in place by
  * assigning each field an id and a physical name EQUAL TO its current
  * logical name — exactly delta-spark's upgrade move, so every
  * already-written data file and stats blob keeps resolving without a
  * rewrite. After that, renames swap only the display name (physical
  * stays pinned), drops hide the column (bytes stay in the files,
  * ignored by the schema-driven scan), and adds assign a fresh id +
  * physical name so a later rename of the new column is equally free.
  */
object SchemaEvolution {

  private val IdKey = "delta.columnMapping.id"
  private val PhysKey = "delta.columnMapping.physicalName"

  /** Upgrade a table to name-mode column mapping (no-op when already
    * mapped). Metadata-only; existing files resolve unchanged. */
  def enableColumnMapping(log: DeltaLog): Long = {
    val snap = log.snapshot
    if (snap.columnMappingMode != "none") return snap.version
    var nextId = 0L
    def walk(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        nextId += 1
        val md = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(IdKey, nextId)
          .putString(PhysKey, f.name) // physical = current logical
          .build()
        StructField(f.name, walk(f.dataType), f.nullable, md)
      })
      case a: ArrayType => a.copy(elementType = walk(a.elementType))
      case m: MapType =>
        m.copy(keyType = walk(m.keyType), valueType = walk(m.valueType))
      case other => other
    }
    val mapped = walk(snap.schema).asInstanceOf[StructType]
    val p = snap.protocol
    val proto =
      if (p.minReaderVersion >= 3 || p.minWriterVersion >= 7)
        p.copy(
          minReaderVersion = math.max(p.minReaderVersion, 3),
          minWriterVersion = math.max(p.minWriterVersion, 7),
          readerFeatures = p.readerFeatures + "columnMapping",
          writerFeatures = p.writerFeatures + "columnMapping")
      else Protocol(
        minReaderVersion = math.max(p.minReaderVersion, 2),
        minWriterVersion = math.max(p.minWriterVersion, 5))
    val m = snap.metadata
    commitMeta(log, snap, m.copy(
      schemaString = mapped.json,
      configuration = m.configuration ++ Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> nextId.toString)),
      "SET TBLPROPERTIES",
      Map("delta.columnMapping.mode" -> "name"),
      protocol = if (proto != p) Some(proto) else None)
  }

  /** ALTER TABLE RENAME COLUMN (top level). Metadata-only: the field
    * keeps its physical name and id; stats and data files are
    * untouched. Requires column mapping. */
  def renameColumn(log: DeltaLog, oldName: String, newName: String): Long = {
    val snap = log.snapshot
    requireMapped(log, snap, "rename a column")
    val schema = snap.schema
    require(schema.fieldNames.contains(oldName),
      s"no column '$oldName' in ${schema.fieldNames.toSeq}")
    require(!schema.fieldNames.contains(newName),
      s"column '$newName' already exists")
    require(newName.nonEmpty && !newName.exists(" ,;{}()\n\t=".contains(_)),
      s"invalid column name '$newName'")
    val newSchema = StructType(schema.fields.map { f =>
      if (f.name == oldName) f.copy(name = newName) else f
    })
    val m = snap.metadata
    commitMeta(log, snap, m.copy(
      schemaString = newSchema.json,
      partitionColumns = m.partitionColumns.map(c =>
        if (c == oldName) newName else c)),
      "RENAME COLUMN", Map("from" -> oldName, "to" -> newName))
  }

  /** ALTER TABLE DROP COLUMN (top level). Metadata-only: the bytes stay
    * in the data files; the schema-driven scan stops projecting them.
    * Requires column mapping; partition columns cannot be dropped. */
  def dropColumn(log: DeltaLog, name: String): Long = {
    val snap = log.snapshot
    requireMapped(log, snap, "drop a column")
    val schema = snap.schema
    require(schema.fieldNames.contains(name),
      s"no column '$name' in ${schema.fieldNames.toSeq}")
    require(!snap.metadata.partitionColumns.contains(name),
      s"cannot drop partition column '$name'")
    require(schema.fields.length > 1, "cannot drop the only column")
    val newSchema = StructType(schema.fields.filterNot(_.name == name))
    commitMeta(log, snap,
      snap.metadata.copy(schemaString = newSchema.json),
      "DROP COLUMN", Map("column" -> name))
  }

  /** ALTER TABLE ADD COLUMN (top level, always nullable — existing
    * files surface null). On a mapped table the field gets a fresh id
    * and uuid physical name; on an unmapped table this is the explicit
    * single-column form of mergeSchema. */
  def addColumn(log: DeltaLog, name: String, dataType: DataType): Long =
    addColumns(log, Seq(name -> dataType))

  /** Add several nullable columns in ONE metadata commit. Schema
    * evolution that touches N columns must not burn N log versions
    * (history/CDF consumers see every version; at 100 TB the log is
    * the contended resource, not the data) — and a multi-column
    * evolution is either all-visible or not-visible, never partial. */
  def addColumns(log: DeltaLog, cols: Seq[(String, DataType)]): Long = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    val snap = log.snapshot
    val schema = snap.schema
    cols.foreach { case (name, _) =>
      require(!schema.fieldNames.contains(name), s"column '$name' already exists") }
    require(cols.map(_._1).distinct.size == cols.size,
      s"duplicate column names in ${cols.map(_._1)}")
    val m = snap.metadata
    val mapped = snap.columnMappingMode != "none"
    val maxId0 = m.configuration.get("delta.columnMapping.maxColumnId")
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    val fields = cols.zipWithIndex.map { case ((name, dataType), i) =>
      if (mapped) {
        val md = new MetadataBuilder()
          .putLong(IdKey, maxId0 + i + 1)
          .putString(PhysKey, s"col-${java.util.UUID.randomUUID}")
          .build()
        StructField(name, dataType, nullable = true, md)
      } else StructField(name, dataType, nullable = true)
    }
    val conf =
      if (mapped)
        m.configuration +
          ("delta.columnMapping.maxColumnId" -> (maxId0 + cols.size).toString)
      else m.configuration
    commitMeta(log, snap, m.copy(
      schemaString = StructType(schema.fields ++ fields).json,
      configuration = conf),
      "ADD COLUMNS",
      Map("columns" -> cols.map { case (n, dt) => s"$n ${dt.simpleString}" }
        .mkString(", ")))
  }

  private def requireMapped(log: DeltaLog, snap: Snapshot, what: String): Unit =
    require(snap.columnMappingMode != "none",
      s"cannot $what on ${log.tablePath}: requires column mapping " +
        "(run SchemaEvolution.enableColumnMapping first)")

  private def commitMeta(
      log: DeltaLog, snap: Snapshot, meta: Metadata,
      op: String, params: Map[String, String],
      protocol: Option[Protocol] = None): Long = {
    val v = snap.version + 1
    log.commit(v,
      Seq(CommitInfoAction(CommitInfo(System.currentTimeMillis(), op, params)),
        MetadataAction(meta)) ++ protocol.map(ProtocolAction.apply),
      ictEnabled = snap.metadata.configuration
        .get("delta.enableInCommitTimestamps").contains("true"))
    v
  }
}
