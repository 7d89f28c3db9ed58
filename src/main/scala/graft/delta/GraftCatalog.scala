package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-session persistence for name-addressed graftdelta tables.
  *
  * `CREATE TABLE t USING graftdelta LOCATION ...` registers `t` in
  * Spark's session catalog, which (absent a Hive metastore — out of
  * scope here) forgets it when the JVM exits. This registry persists
  * the name → location mapping in one JSON file at
  * `spark.graft.catalog.path` (default
  * `<spark.sql.warehouse.dir>/_graft_catalog.json`) so the NEXT
  * session can re-register every table with one call (or
  * `GRAFT RESTORE TABLES`).
  *
  * Scale/concurrency posture: the file holds one small JSON object
  * (names + paths — never table state, which lives in each table's
  * Delta log), is written whole via tmp + rename, and last-writer-wins
  * is acceptable for a registration registry — unlike data commits,
  * re-registration is idempotent and conflicts only lose a concurrent
  * rename of the MAPPING, not data. A deployment needing a real
  * multi-writer catalog points `spark.graft.catalog.path` at a shared
  * store or swaps in a metastore; the table format is unaffected.
  */
object GraftCatalog {

  private def catalogPath(spark: SparkSession): Path = new Path(
    spark.conf.getOption("spark.graft.catalog.path").getOrElse(
      spark.conf.get("spark.sql.warehouse.dir") + "/_graft_catalog.json"))

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** The persisted name → location map (empty when none saved yet). */
  def entries(spark: SparkSession): Map[String, String] = {
    val p = catalogPath(spark)
    val f = fs(spark, p)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
    val node = JsonUtil.mapper.readTree(bytes)
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  private def write(spark: SparkSession, m: Map[String, String]): Unit = {
    val p = catalogPath(spark)
    val f = fs(spark, p)
    val root = JsonUtil.mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val tmp = new Path(p.getParent,
      s".${p.getName}.${java.util.UUID.randomUUID}.tmp")
    if (!f.exists(p.getParent)) f.mkdirs(p.getParent)
    val out = f.create(tmp, false)
    try out.write(JsonUtil.mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // plain overwrite-rename: registry updates are idempotent whole-map
    // rewrites, last writer wins by design (see class doc)
    f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"could not publish catalog update to $p")
  }

  private val NameRe = """[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?""".r

  private def requireName(name: String): Unit =
    require(NameRe.matches(name), s"bad table name '$name'")

  private def quoted(name: String): String =
    name.split('.').map(p => s"`$p`").mkString(".")

  /** Persist `name` → `path` and register it in the LIVE session
    * catalog too (idempotent). */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    requireName(name)
    write(spark, entries(spark) + (name -> path))
    if (!spark.catalog.tableExists(name))
      spark.sql(s"CREATE TABLE ${quoted(name)} USING graftdelta LOCATION '$path'")
  }

  /** Drop `name` from the persisted registry AND the session catalog.
    * Metadata-only either way — the table's files and log stay. */
  def unregister(spark: SparkSession, name: String): Unit = {
    requireName(name)
    write(spark, entries(spark) - name)
    if (spark.catalog.tableExists(name))
      spark.sql(s"DROP TABLE ${quoted(name)}")
  }

  /** Re-register every persisted table missing from the session
    * catalog; returns how many were (re-)created. A stale entry (table
    * deleted/moved out-of-band since registration) is skipped with a
    * warning instead of aborting the rest of the restore — the registry
    * itself is left untouched so the operator can inspect and
    * `unregister` deliberately. */
  def restore(spark: SparkSession): Long = {
    var n = 0L
    entries(spark).toSeq.sortBy(_._1).foreach { case (name, path) =>
      if (!spark.catalog.tableExists(name)) {
        try {
          spark.sql(s"CREATE TABLE ${quoted(name)} USING graftdelta LOCATION '$path'")
          n += 1
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft-catalog] skipping '$name' -> $path: ${e.getMessage}")
        }
      }
    }
    n
  }
}
