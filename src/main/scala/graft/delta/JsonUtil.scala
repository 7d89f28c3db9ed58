package graft.delta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal Jackson-based JSON (de)serialization for Delta log commit
  * lines. Driver-side only: commit files past the checkpoint are small
  * (a handful of KB each); the potentially-large checkpoint parquet is
  * read with Spark instead (see [[DeltaLog]]).
  */
object JsonUtil {
  val mapper = new ObjectMapper()

  private def optText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText())
  private def optLong(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong())
  private def strMap(n: JsonNode, f: String): Map[String, String] =
    Option(n.get(f)).filterNot(_.isNull).map { m =>
      m.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> (if (v.isNull) null else v.asText())
      }.toMap
    }.getOrElse(Map.empty)

  private def optDv(n: JsonNode): Option[DeletionVectorDescriptor] =
    Option(n.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeletionVectorDescriptor(
        storageType = d.get("storageType").asText(),
        pathOrInlineDv = d.get("pathOrInlineDv").asText(),
        offset = Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
        sizeInBytes = d.get("sizeInBytes").asInt(),
        cardinality = d.get("cardinality").asLong())
    }

  private def optStrSet(n: JsonNode, f: String): Set[String] =
    Option(n.get(f)).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)

  /** Parse one NDJSON commit line into an [[Action]] (None for lines we
    * don't model, e.g. `domainMetadata`). */
  def parseAction(line: String): Option[Action] = {
    val root = mapper.readTree(line)
    if (root.has("add")) {
      val a = root.get("add")
      Some(AddAction(AddFile(
        path = a.get("path").asText(),
        partitionValues = strMap(a, "partitionValues"),
        size = optLong(a, "size").getOrElse(0L),
        modificationTime = optLong(a, "modificationTime").getOrElse(0L),
        dataChange = Option(a.get("dataChange")).forall(_.asBoolean(true)),
        stats = optText(a, "stats"),
        deletionVector = optDv(a),
        baseRowId = optLong(a, "baseRowId"),
        defaultRowCommitVersion = optLong(a, "defaultRowCommitVersion"))))
    } else if (root.has("remove")) {
      val r = root.get("remove")
      Some(RemoveAction(RemoveFile(
        path = r.get("path").asText(),
        deletionTimestamp = optLong(r, "deletionTimestamp").getOrElse(0L),
        dataChange = Option(r.get("dataChange")).forall(_.asBoolean(true)),
        partitionValues = strMap(r, "partitionValues"),
        size = optLong(r, "size"),
        deletionVector = optDv(r))))
    } else if (root.has("metaData")) {
      val m = root.get("metaData")
      Some(MetadataAction(Metadata(
        id = optText(m, "id").getOrElse(""),
        schemaString = m.get("schemaString").asText(),
        partitionColumns = Option(m.get("partitionColumns"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
        configuration = strMap(m, "configuration"),
        createdTime = optLong(m, "createdTime"))))
    } else if (root.has("protocol")) {
      val p = root.get("protocol")
      Some(ProtocolAction(Protocol(
        p.get("minReaderVersion").asInt(1), p.get("minWriterVersion").asInt(2),
        optStrSet(p, "readerFeatures"), optStrSet(p, "writerFeatures"))))
    } else if (root.has("commitInfo")) {
      val c = root.get("commitInfo")
      // operationParameters values may be nested JSON (other writers
      // store arrays there) — render containers as their JSON text
      val params = Option(c.get("operationParameters")).filterNot(_.isNull)
        .map { m =>
          m.properties().asScala.map { e =>
            val v = e.getValue
            e.getKey -> (if (v.isNull) null
                         else if (v.isTextual) v.asText()
                         else v.toString)
          }.toMap
        }.getOrElse(Map.empty[String, String])
      Some(CommitInfoAction(CommitInfo(
        timestamp = optLong(c, "timestamp").getOrElse(0L),
        operation = optText(c, "operation").getOrElse(""),
        operationParameters = params,
        inCommitTimestamp = optLong(c, "inCommitTimestamp"))))
    } else if (root.has("txn")) {
      val t = root.get("txn")
      Some(TxnAction(SetTransaction(
        appId = t.get("appId").asText(),
        version = optLong(t, "version").getOrElse(0L),
        lastUpdated = optLong(t, "lastUpdated"))))
    } else if (root.has("checkpointMetadata")) {
      val cm = root.get("checkpointMetadata")
      Some(CheckpointMetadataAction(CheckpointMetadata(
        version = optLong(cm, "version").getOrElse(-1L),
        tags = strMap(cm, "tags"))))
    } else if (root.has("sidecar")) {
      val s = root.get("sidecar")
      Some(SidecarAction(SidecarFile(
        path = s.get("path").asText(),
        sizeInBytes = optLong(s, "sizeInBytes"),
        modificationTime = optLong(s, "modificationTime"))))
    } else if (root.has("cdc")) {
      val c = root.get("cdc")
      Some(CdcAction(AddCDCFile(
        path = c.get("path").asText(),
        partitionValues = strMap(c, "partitionValues"),
        size = optLong(c, "size").getOrElse(0L),
        dataChange = Option(c.get("dataChange")).exists(_.asBoolean(false)))))
    } else if (root.has("domainMetadata")) {
      val d = root.get("domainMetadata")
      Some(DomainMetadataAction(DomainMetadata(
        domain = d.get("domain").asText(),
        configuration = optText(d, "configuration").getOrElse(""),
        removed = Option(d.get("removed")).exists(_.asBoolean(false)))))
    } else None
  }

  private def putStrMap(o: ObjectNode, f: String, m: Map[String, String]): Unit = {
    val mn = o.putObject(f)
    m.foreach { case (k, v) => if (v == null) mn.putNull(k) else mn.put(k, v) }
  }

  private def putDv(o: ObjectNode, dv: DeletionVectorDescriptor): Unit = {
    val d = o.putObject("deletionVector")
    d.put("storageType", dv.storageType)
    d.put("pathOrInlineDv", dv.pathOrInlineDv)
    dv.offset.foreach(d.put("offset", _))
    d.put("sizeInBytes", dv.sizeInBytes)
    d.put("cardinality", dv.cardinality)
  }

  /** Render one action as a single commit JSON line. */
  def renderAction(action: Action): String = {
    val root = mapper.createObjectNode()
    action match {
      case AddAction(a) =>
        val o = root.putObject("add")
        o.put("path", a.path)
        putStrMap(o, "partitionValues", a.partitionValues)
        o.put("size", a.size)
        o.put("modificationTime", a.modificationTime)
        o.put("dataChange", a.dataChange)
        a.stats.foreach(o.put("stats", _))
        a.deletionVector.foreach(putDv(o, _))
        a.baseRowId.foreach(o.put("baseRowId", _))
        a.defaultRowCommitVersion.foreach(o.put("defaultRowCommitVersion", _))
      case RemoveAction(r) =>
        val o = root.putObject("remove")
        o.put("path", r.path)
        o.put("deletionTimestamp", r.deletionTimestamp)
        o.put("dataChange", r.dataChange)
        o.put("extendedFileMetadata", true)
        putStrMap(o, "partitionValues", r.partitionValues)
        r.size.foreach(o.put("size", _))
        r.deletionVector.foreach(putDv(o, _))
      case MetadataAction(m) =>
        val o = root.putObject("metaData")
        o.put("id", m.id)
        val fmt = o.putObject("format")
        fmt.put("provider", "parquet"); fmt.putObject("options")
        o.put("schemaString", m.schemaString)
        val pc: ArrayNode = o.putArray("partitionColumns")
        m.partitionColumns.foreach(pc.add)
        putStrMap(o, "configuration", m.configuration)
        m.createdTime.foreach(o.put("createdTime", _))
      case ProtocolAction(p) =>
        val o = root.putObject("protocol")
        o.put("minReaderVersion", p.minReaderVersion)
        o.put("minWriterVersion", p.minWriterVersion)
        // Table-features protocol: reader 3 / writer 7 MUST list their
        // feature sets explicitly (Delta spec, Table Features).
        if (p.minReaderVersion >= 3 || p.readerFeatures.nonEmpty) {
          val a = o.putArray("readerFeatures")
          p.readerFeatures.toSeq.sorted.foreach(a.add)
        }
        if (p.minWriterVersion >= 7 || p.writerFeatures.nonEmpty) {
          val a = o.putArray("writerFeatures")
          p.writerFeatures.toSeq.sorted.foreach(a.add)
        }
      case CommitInfoAction(c) =>
        val o = root.putObject("commitInfo")
        o.put("timestamp", c.timestamp)
        c.inCommitTimestamp.foreach(o.put("inCommitTimestamp", _))
        o.put("operation", c.operation)
        val op = o.putObject("operationParameters")
        c.operationParameters.foreach { case (k, v) => op.put(k, v) }
        o.put("engineInfo", "graft-spark/0.1.0")
      case TxnAction(t) =>
        val o = root.putObject("txn")
        o.put("appId", t.appId)
        o.put("version", t.version)
        t.lastUpdated.foreach(o.put("lastUpdated", _))
      case CheckpointMetadataAction(cm) =>
        val o = root.putObject("checkpointMetadata")
        o.put("version", cm.version)
        if (cm.tags.nonEmpty) putStrMap(o, "tags", cm.tags)
      case SidecarAction(s) =>
        val o = root.putObject("sidecar")
        o.put("path", s.path)
        s.sizeInBytes.foreach(o.put("sizeInBytes", _))
        s.modificationTime.foreach(o.put("modificationTime", _))
      case CdcAction(c) =>
        val o = root.putObject("cdc")
        o.put("path", c.path)
        putStrMap(o, "partitionValues", c.partitionValues)
        o.put("size", c.size)
        o.put("dataChange", c.dataChange)
      case DomainMetadataAction(d) =>
        val o = root.putObject("domainMetadata")
        o.put("domain", d.domain)
        o.put("configuration", d.configuration)
        o.put("removed", d.removed)
    }
    mapper.writeValueAsString(root)
  }
}
