package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition step for the near-duplicate graph: repeatedly
  * delete nodes of degree < k (and their edges) until every survivor has
  * at least k neighbors inside the survivor set. The k-core is the dense
  * center dedup reports care about — a mirror farm or template family
  * shows up as a large 2-core / 3-core long before pairwise counts make
  * it obvious, while one-off pair matches (the bulk of near-dup output)
  * peel away immediately.
  *
  * Deterministic by construction (peeling has a unique fixpoint — the
  * order nodes are removed in never changes the result), so a fixed
  * `rounds` count stands in for convergence detection and the SQL twin
  * replays the same rounds as plain unrolled CTEs. Each round removes
  * every currently-under-k node simultaneously; `rounds` bounds the peel
  * DEPTH (chain length of cascading removals), not the graph size —
  * near-dup graphs are unions of small dense clusters, where peeling
  * settles in 1-2 rounds.
  *
  * Scale shape (the Pregel-loop discipline shared with [[PageRank]] and
  * [[LabelProp]]): a round is one degree aggregation on the edge list
  * plus one semi-join of the edges against surviving endpoints — both
  * hash-partitioned on node id, nothing driver-side, state is the edge
  * list itself. `localCheckpoint` cuts lineage each round so the plan
  * stays one round deep no matter how far the peel cascades.
  */
object KCore {

  /** Edges of the k-core after at most `rounds` peel rounds. `edges(srcCol,
    * dstCol)` must list both directions of each undirected edge (the
    * [[LabelProp]] convention). Output: (node, core_degree) for every
    * node still in the core, with its degree inside the core.
    *
    * The peel loop stops EARLY once a round removes nothing (the alive
    * edge count is unchanged — the fixpoint, i.e. the exact k-core), so
    * `rounds` is a cap, not a count. If the cap is hit while the graph is
    * still shrinking (a deep cascade, e.g. a long path), the result is a
    * SUPERSET of the true k-core — survivors may have effective core
    * degree < k; a warning on stderr makes the under-peel visible instead
    * of silent. Raise `rounds` (cascade depth is at most the graph's
    * degeneracy ordering depth) for an exact core on such graphs. */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var alive = edges.select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .localCheckpoint()
    var prev = alive.count()
    var converged = prev == 0L
    var round = 0
    while (round < rounds && !converged) {
      val keep = alive.groupBy(col("__u")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= k)
        .select(col("__u").as("__node"))
      alive = alive
        .join(keep, col("__u") === col("__node")).drop("__node")
        .join(keep.withColumnRenamed("__node", "__node2"),
          col("__v") === col("__node2")).drop("__node2")
        .localCheckpoint()
      val n = alive.count()
      converged = n == prev || n == 0L
      prev = n
      round += 1
    }
    if (!converged)
      System.err.println(s"[graft.KCore] round cap $rounds hit while still " +
        s"peeling ($prev edges alive): result is a SUPERSET of the $k-core; " +
        "raise `rounds` for the exact core")
    alive.groupBy(col("__u").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }
}
