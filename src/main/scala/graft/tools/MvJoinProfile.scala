package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for the q_matview_join lifecycle — which of the ~14
  * commits + 3 refreshes actually costs the wall-clock. */
object MvJoinProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.graft.debug.refreshTiming", "true")
    graft.queries.Queries.registerViews(s, sf)
    s.table("orders").count() // warm
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft_mvjp_")
    val factPath = base.resolve("f").toString
    val dimPath = base.resolve("d").toString
    val viewPath = base.resolve("view").toString
    val factLog = graft.delta.DeltaLog.forPath(s, factPath)
    val dimLog = graft.delta.DeltaLog.forPath(s, dimPath)
    val orders = s.table("orders").where(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = s.table("customer").select("c_custkey", "c_mktsegment")
    t("fact create") { graft.delta.TransactionWriter.overwrite(factLog,
      orders.where(col("o_orderkey") % 3 =!= 2)) }
    t("fact cdf") { graft.delta.ChangeDataFeed.enable(factLog) }
    t("dim create") { graft.delta.TransactionWriter.overwrite(dimLog, cust) }
    t("dim cdf") { graft.delta.ChangeDataFeed.enable(dimLog) }
    t("create view") { graft.delta.MatView.createJoin(s, viewPath,
      factPath, dimPath, Seq("o_orderkey"), "o_custkey", "c_custkey",
      Seq("c_mktsegment")) }
    t("fact append") { graft.delta.TransactionWriter.append(factLog,
      orders.where(col("o_orderkey") % 3 === 2)) }
    t("fact delete") { graft.delta.Mutations.delete(factLog,
      col("o_orderkey") % 7 === 0) }
    t("refresh 1") { graft.delta.MatView.refresh(s, viewPath) }
    t("dim update") { graft.delta.Mutations.update(dimLog,
      col("c_custkey") % 10 === 5, Map("c_mktsegment" -> lit("X"))) }
    t("dim delete") { graft.delta.Mutations.delete(dimLog,
      col("c_custkey") % 13 === 3) }
    t("refresh 2") { graft.delta.MatView.refresh(s, viewPath) }
    t("refresh 3 (noop)") { graft.delta.MatView.refresh(s, viewPath) }
    val n = t("final read") {
      graft.delta.DeltaLog.forPath(s, viewPath).snapshot.read().count() }
    println(s"rows $n")
  }
}
