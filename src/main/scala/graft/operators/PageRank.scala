package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in EXACT fixed-point integer arithmetic — the
  * graph-centrality finisher for the near-duplicate pair graph: which
  * documents sit at the center of a boilerplate/mirror cluster (high
  * rank) versus its periphery. A curation pipeline can use the rank as a
  * canonicality signal next to [[ConnectedComponents]]' min-id and
  * cluster_best's quality score.
  *
  * Arithmetic is integer-only so any engine replays it bit-for-bit:
  * ranks live at a fixed scale (default 1e9 = rank mass 1.0), the
  * damping factor is the exact rational dampNum/dampDen, and every
  * division is a floor over non-negative operands (Spark's truncating
  * `div` == DuckDB's flooring `//` there). Per iteration
  *
  *   contrib(dst) = sum over in-edges of  r(src) * dampNum div (dampDen * outdeg(src))
  *   r'(v)        = (scale * (dampDen-dampNum) div dampDen) div N  +  contrib(v)
  *
  * Dangling mass (nodes with no out-edges) and floor remainders are
  * dropped, not redistributed — the fixpoint is deterministic and total
  * mass shrinks slightly, which is irrelevant for ranking use.
  *
  * Scale shape: the edge list with out-degrees is materialized ONCE
  * (`localCheckpoint`, same lineage-truncation device as
  * [[ConnectedComponents]]) and re-joined each iteration; an iteration
  * is one hash-join of the rank table (one row per node) against the
  * edge table plus one map-side-combined aggregation on dst — the
  * Pregel shape. At 1000 executors the edge table is the big side and
  * stays put (pre-partitioned by src across iterations); only the
  * slim rank table shuffles. Iteration count is a constant (ranking
  * stabilizes in a few rounds at damping 0.85), so plan depth is
  * bounded and there is no driver-side state beyond the loop counter.
  */
object PageRank {

  /** Ranks after `iters` iterations over the undirected-as-directed edge
    * list `edges(srcCol, dstCol)` (pass both directions for an undirected
    * graph). Every row of `nodes(nodeCol)` gets a rank, including
    * isolated nodes (they hold the base term). Output: (node, rank_fp)
    * with rank_fp at the given fixed-point scale. */
  def run(
      nodes: DataFrame,
      nodeCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 3,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(scale > 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"need scale > 0 and 0 <= dampNum <= dampDen, got scale=$scale damp=$dampNum/$dampDen")

    val ids = nodes.select(col(nodeCol).as("node"))
    // 1-row constants computed in-plan (broadcast scalar-subquery pattern):
    // n, the uniform start rank scale div n, and the per-iteration base term.
    val consts = ids.agg(count(lit(1)).as("n"))
      .select(
        expr(s"${scale}L div n").as("__r0"),
        expr(s"(${scale}L * ${dampDen - dampNum}L div ${dampDen}L) div n").as("__base"))

    // Edge table with out-degrees, materialized once and reused per round.
    val deg = edges.groupBy(col(srcCol).as("__src")).agg(count(lit(1)).as("__deg"))
    val edgesDeg = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(deg, "__src")
      .localCheckpoint()

    var ranks = ids.crossJoin(broadcast(consts))
      .select(col("node"), col("__r0").as("rank_fp"))
    for (_ <- 0 until iters) {
      val contrib = ranks
        .join(edgesDeg, col("node") === col("__src"))
        .select(col("__dst"),
          expr(s"rank_fp * ${dampNum}L div (${dampDen}L * __deg)").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__s"))
      ranks = ids.crossJoin(broadcast(consts))
        .join(contrib, col("node") === col("__dst"), "left")
        .select(col("node"),
          (col("__base") + coalesce(col("__s"), lit(0L))).as("rank_fp"))
    }
    ranks
  }
}
