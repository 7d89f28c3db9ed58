package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete nodes
  * whose degree (within the surviving subgraph) is below k, until the
  * k-core — the maximal subgraph with min degree ≥ k — remains. The
  * standard dense-community extractor for co-occurrence and citation
  * graphs (spam rings, mutual-quotation clusters).
  *
  * Two modes:
  *  - `rounds = None` (default): peel to the FIXPOINT with a driver
  *    loop, one count per round as the stop test (survivor counts
  *    decrease monotonically, so equal counts = converged). Lineage is
  *    cut with `localCheckpoint` each round, the same hygiene as
  *    [[ConnectedComponents]].
  *  - `rounds = Some(r)`: the fixpoint CAPPED at r rounds — result
  *    identical to r unrolled relational peels (rounds past the
  *    fixpoint are no-ops, so converging early and stopping is the
  *    same answer with fewer jobs); an oracle replays it as r unrolled
  *    steps, and any r ≥ the peel depth yields the true k-core.
  *
  * BOTH modes materialize each round with an eager `localCheckpoint`:
  * a 12-round chain of semi-join+aggregate plans left unmaterialized
  * sends Catalyst into a multi-minute optimization spiral (observed
  * firsthand) — iterative graph algorithms must cut lineage per round,
  * not just for correctness of re-execution but for PLANNING cost.
  *
  * Scale shape per round: the undirected edge relation semi-joins to
  * the survivor set on BOTH endpoints, then one node-keyed count — two
  * hash semi-joins + one aggregation, all on node keys; the survivor
  * relation (broadcast-size for most graphs once peeling starts) only
  * shrinks. No collect of edges or nodes at any point. */
object KCore {

  /** Nodes of the k-core of the undirected graph given as (aCol, bCol)
    * edge endpoints. Returns a single `node` column. */
  def core(edges: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds.forall(_ >= 1), s"rounds must be >= 1: $rounds")
    // materialize the undirected relation ONCE: every peel round
    // references it, and upstream edge derivations (e.g. a
    // co-occurrence self-join) would otherwise re-execute per round
    val und = edges.select(col(aCol).as("s"), col(bCol).as("d"))
      .union(edges.select(col(bCol).as("s"), col(aCol).as("d")))
      .localCheckpoint(true)
    def peel(alive: DataFrame): DataFrame = und
      .join(alive.withColumnRenamed("node", "s"), Seq("s"), "left_semi")
      .join(alive.withColumnRenamed("node", "d"), Seq("d"), "left_semi")
      .groupBy(col("s").as("node")).agg(count(lit(1)).as("__deg"))
      .where(col("__deg") >= k)
      .select("node")
    // one loop serves both modes: peeling past the fixpoint is a
    // no-op, so the bounded mode is "fixpoint, capped at r rounds" —
    // the convergence early-exit never changes the result, only skips
    // dead rounds (each round is already materialized, so the count
    // is a cheap scan of the checkpointed relation)
    val cap = rounds.getOrElse(Int.MaxValue)
    var alive = und.select(col("s").as("node")).distinct()
      .localCheckpoint(true)
    var n = alive.count()
    var round = 0
    var done = n == 0
    while (!done && round < cap) {
      val next = peel(alive).localCheckpoint(true)
      val m = next.count()
      done = m == n || m == 0
      alive = next
      n = m
      round += 1
    }
    alive
  }
}
