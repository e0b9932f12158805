package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous majority label propagation — the semi-supervised finisher
  * for the near-duplicate graph: spread a per-document label (language,
  * quality tier, spam verdict) across near-dup links so a cluster
  * converges on one consistent label even when per-member classifiers
  * disagree. Deterministic by construction: each round every node adopts
  * the MAJORITY label among itself + its neighbors, ties broken by the
  * lexicographically smallest label; a fixed iteration count replaces
  * convergence detection (label propagation on near-dup clusters settles
  * in 1-2 rounds — clusters are small and dense).
  *
  * Scale shape is the Pregel loop shared with [[PageRank]]: the edge list
  * is materialized once (`localCheckpoint` lineage cut) and re-joined per
  * round; a round is one hash join of the slim (node, label) table
  * against the edges plus one count aggregation and one per-node
  * `min_by` arg-max AGGREGATE over struct(-count, label) — count desc,
  * label asc, exactly the majority-with-lexicographic-tie-break rule.
  * An aggregate rather than a window because it partial-combines
  * map-side: a celebrity node whose neighbors carry high-cardinality
  * labels (component ids, source domains) collapses per map task instead
  * of shipping every distinct label row to one reducer and sorting
  * there. Everything is count arithmetic + string comparison, so a SQL
  * twin replays the unrolled rounds exactly.
  */
object LabelProp {

  /** Labels after `iters` synchronous rounds. `edges(srcCol, dstCol)` must
    * list both directions of each undirected edge; isolated nodes keep
    * their seed label (they only ever see their own vote). Output:
    * (node, label). */
  def run(
      nodes: DataFrame,
      nodeCol: String,
      labelCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint()
    var labels = nodes.select(col(nodeCol).as("node"), col(labelCol).as("label"))
    for (_ <- 0 until iters) {
      val votes = e.join(labels, col("__src") === col("node"))
        .select(col("__dst").as("node"), col("label"))
        .unionByName(labels) // self-vote
      // arg-max by (count desc, label asc): min_by over struct(-count,
      // label) — the (node, label) key makes the ordering struct unique,
      // so the pick is deterministic, and the aggregate partial-combines
      // where a per-node window would sort all label rows in one task
      labels = votes.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("__c")).as("nc"), col("label").as("lb"))).as("label"))
    }
    labels
  }
}
