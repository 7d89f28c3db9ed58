package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in FIXED-POINT integer arithmetic (Page &
  * Brin 1998; damping as the classic 0.85). Scores are maintained as
  * int64 multiples of 1/`scale`, and every step — the out-degree
  * split, the damping factor, the neighbor sum — is integer division
  * and integer addition, so the result is EXACTLY reproducible on any
  * engine regardless of parallelism or summation order (float
  * PageRank sums in nondeterministic order; this one cannot).
  *
  * Scale shape per iteration: ONE shuffle — the contribution
  * aggregation keyed by destination (map-side combined longs), plus a
  * join of the score relation back onto the degree-annotated edge
  * relation, which co-locates on the same node-id key. The edge
  * relation with degrees attached is computed once and persisted;
  * lineage is truncated per round with `localCheckpoint` (same
  * reasoning as [[ConnectedComponents]] — on a cluster with a
  * checkpoint dir, reliable `checkpoint` is the drop-in upgrade). A
  * celebrity node (millions of in-links) is one skewed agg key; the
  * map-side combine absorbs it.
  *
  * Semantics notes: node set = every id appearing as src or dst.
  * Mass leaving a dangling node (out-degree 0) vanishes rather than
  * redistributing — the usual simplification; pass symmetrized edges
  * (both directions) if the graph is undirected and dangling nodes
  * must not occur. Each iteration floors, so total mass decays by at
  * most 1/`scale` per node per round — the price of exactness.
  */
object PageRank {

  /** (node, score) after `iterations` rounds; score starts at `scale`
    * (i.e. 1.0) and updates as
    * `(scale·(dampDen−dampNum))/dampDen + (dampNum·Σ contrib)/dampDen`
    * with `contrib(u) = score(u) DIV outdeg(u)` — all int64. */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping $dampNum/$dampDen must lie in [0, 1]")
    // materialize the edge relation ONCE: degree, the degree-annotated
    // join side and the node set all derive from it, and without this
    // the caller's (possibly expensive) edge derivation re-executes for
    // each — the same move ConnectedComponents makes
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    // degree-annotated edges: computed once, reused every round
    val ed = e.join(deg, "src").persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    val base = scale * (dampDen - dampNum) / dampDen
    var scores = nodes.select(col("node"), lit(scale).as("score"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = ed
        .join(scores.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("score DIV __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__m"))
      val prev = scores
      scores = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"(${dampNum}L * coalesce(__m, 0L)) DIV ${dampDen}L"))
            .as("score"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    ed.unpersist()
    nodes.unpersist()
    e.unpersist()
    scores
  }
}
