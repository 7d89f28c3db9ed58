package graft.delta

/** Domain metadata (Delta protocol "Domain Metadata", writer feature
  * `domainMetadata`) and the clustered-table domain built on it
  * (writer feature `clustering`, domain `delta.clustering` — the
  * protocol surface behind delta-spark's liquid clustering).
  *
  * State model: a commit may carry `domainMetadata` actions; replay
  * keeps the latest per domain, `removed = true` tombstones delete it
  * ([[Snapshot.domainMetadata]]); checkpoints persist live domains.
  * The `delta.*` namespace is reserved for system domains — user
  * domains are free-form strings (typically JSON).
  */
object Domains {

  /** Live configuration of one domain, if set. */
  def get(snap: Snapshot, domain: String): Option[String] =
    snap.domainMetadata.get(domain).map(_.configuration)

  private def ictOn(snap: Snapshot): Boolean = snap.metadata.configuration
    .get("delta.enableInCommitTimestamps").contains("true")

  /** Protocol actions (possibly empty) upgrading the table so the
    * given writer features may be used: v7 table-features form, prior
    * legacy features carried over implicitly by version (the spec's
    * upgrade rule — Snapshot.requireReadable resolves both forms). */
  private[delta] def featureUpgrade(
      snap: Snapshot, features: Set[String]): Seq[Action] = {
    val p = snap.protocol
    if (p.minWriterVersion >= 7 && features.subsetOf(p.writerFeatures)) Nil
    else if (p.minWriterVersion >= 7)
      Seq(ProtocolAction(p.copy(writerFeatures = p.writerFeatures ++ features)))
    else {
      // Legacy→v7 upgrade must list everything the legacy version
      // already implied, or downstream writers lose those gates.
      val implied = Seq(
        2 -> "appendOnly", 2 -> "invariants", 3 -> "checkConstraints",
        4 -> "changeDataFeed", 4 -> "generatedColumns", 5 -> "columnMapping",
        6 -> "identityColumns").collect {
        case (v, f) if p.minWriterVersion >= v => f
      }.toSet
      Seq(ProtocolAction(p.copy(minWriterVersion = 7,
        writerFeatures = p.writerFeatures ++ implied ++ features)))
    }
  }

  /** SET a domain's configuration (create or replace). Upgrades the
    * protocol to carry `domainMetadata` on first use. Returns the
    * committed version. */
  def set(log: DeltaLog, domain: String, configuration: String,
      extraFeatures: Set[String] = Set.empty): Long = {
    val snap = log.snapshot
    val v = snap.version + 1
    log.commit(v,
      Seq(CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "SET DOMAIN METADATA", Map("domain" -> domain)))) ++
        featureUpgrade(snap, Set("domainMetadata") ++ extraFeatures) :+
        DomainMetadataAction(DomainMetadata(domain, configuration)),
      ictEnabled = ictOn(snap))
    v
  }

  /** Tombstone a domain. No-op (no commit) when the domain is not
    * live. Returns the current/committed version. */
  def remove(log: DeltaLog, domain: String): Long = {
    val snap = log.snapshot
    if (!snap.domainMetadata.contains(domain)) return snap.version
    val v = snap.version + 1
    log.commit(v, Seq(
      CommitInfoAction(CommitInfo(System.currentTimeMillis(),
        "REMOVE DOMAIN METADATA", Map("domain" -> domain))),
      DomainMetadataAction(DomainMetadata(domain, "", removed = true))),
      ictEnabled = ictOn(snap))
    v
  }
}

/** Clustered tables: clustering columns recorded in the
  * `delta.clustering` domain (configuration
  * `{"clusteringColumns":[["pcol1"],["pcol2"]]}` — PHYSICAL name
  * paths, as other engines expect on column-mapped tables) and applied
  * by OPTIMIZE: [[Maintenance.compact]] on a clustered table Z-orders
  * along the clustering columns instead of plain-compacting, so layout
  * maintenance continuously restores multi-column data-skipping
  * locality. Unlike partitioning, clustering changes NO path layout —
  * re-clustering with different columns is one metadata commit. */
object Clustering {

  val Domain = "delta.clustering"

  /** Declare (or change) the clustering columns. Metadata-only commit;
    * run [[Maintenance.compact]] / GRAFT OPTIMIZE to lay files out. */
  def clusterBy(log: DeltaLog, cols: Seq[String]): Long = {
    val snap = log.snapshot
    require(cols.nonEmpty && cols.size <= 4,
      "clustering needs 1-4 columns (Z-order interleave width)")
    cols.foreach { c =>
      require(snap.schema.fieldNames.contains(c),
        s"unknown clustering column $c (have ${snap.schema.fieldNames.mkString(", ")})")
      require(!snap.metadata.partitionColumns.contains(c),
        s"clustering column $c is a partition column")
    }
    val physPaths = cols.map(c =>
      JsonUtil.mapper.writeValueAsString(
        java.util.List.of(snap.physicalNameOf(c))))
    val config = s"""{"clusteringColumns":[${physPaths.mkString(",")}]}"""
    Domains.set(log, Domain, config, extraFeatures = Set("clustering"))
  }

  /** The clustering columns (LOGICAL names), empty when not clustered.
    * Unknown physical paths (e.g. a since-dropped column) are skipped. */
  def clusteringColumns(snap: Snapshot): Seq[String] =
    Domains.get(snap, Domain).toSeq.flatMap { cfg =>
      val root = JsonUtil.mapper.readTree(cfg)
      val arr = Option(root.get("clusteringColumns")).toSeq
      import scala.jdk.CollectionConverters._
      val physToLogical: Map[String, String] =
        snap.schema.fields.zip(snap.physicalSchema.fields)
          .map { case (lf, pf) => pf.name -> lf.name }.toMap
      arr.flatMap(_.elements().asScala).flatMap { path =>
        val parts = path.elements().asScala.map(_.asText()).toSeq
        // nested clustering paths are not supported by the Z-order
        // kernel; top-level columns only
        if (parts.size == 1) physToLogical.get(parts.head) else None
      }
    }

  /** Drop clustering (files keep their current layout). */
  def removeClustering(log: DeltaLog): Long = Domains.remove(log, Domain)
}
