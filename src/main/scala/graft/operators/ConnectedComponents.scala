package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * finisher that turns pairwise near-duplicate hits into clusters, so a
  * transitive chain a~b~c collapses to ONE canonical document even when
  * a and c never matched directly (the gap the reference's pairwise
  * deduplication, like most production LSH dedups, leaves open).
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with the minimum of its closed neighborhood; each round
  * (a) pulls the minimum label across edges and (b) shortcuts through the
  * label itself (label := label(label)), so a chain's minimum travels
  * 2^round hops and convergence is O(log diameter) rounds instead of
  * O(diameter). Each round is two shuffle-joins plus one aggregation —
  * all hash-partitioned, no driver-side state — and `localCheckpoint`
  * truncates the lineage so the plan does not grow with iteration count.
  *
  * Scale notes for the 100 TB case: the propagation join keys on node ids
  * (uniform); the pointer-jump join keys on the current label, which
  * concentrates a size-m component onto one key as it converges — benign
  * for near-dup graphs (components are boilerplate clusters, bounded
  * size) and AQE skew-split handles moderate outliers; a corpus with
  * genuinely giant components wants the large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which bounds per-key fan-in and can be swapped in behind this
  * signature.
  *
  * Determinism: labels are mins over a fixed edge set — the fixpoint is
  * the per-component minimum id regardless of partitioning or order.
  */
object ConnectedComponents {

  /** Components of the graph given by `edges(srcCol, dstCol)`.
    * Output: (node, component) for every node incident to an edge, where
    * `component` is the smallest node id reachable from `node`. Column
    * types follow the input id type (must be orderable).
    *
    * Size-gated hybrid: near-dup edge lists are tiny relative to the
    * corpus (pairs that both band-collide AND pass the Jaccard threshold),
    * so when the edge count is within `driverMaxEdges` the components are
    * solved by one collect + union-find — one job instead of O(log d)
    * shuffle rounds. Beyond the gate the distributed loop runs. Both paths
    * produce the identical (node -> min reachable id) labeling, so the
    * gate never changes results, only the plan.
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 50,
      driverMaxEdges: Long = 4000000L): DataFrame = {
    val spark = edges.sparkSession
    val integralIds = Seq(srcCol, dstCol).forall { c =>
      import org.apache.spark.sql.types._
      edges.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    if (driverMaxEdges > 0 && integralIds) {
      // limit(n+1) bounds the probe: never collects more than the gate.
      // Null ids are dropped here exactly as the distributed path's
      // null-rejecting joins drop them.
      val cap = math.min(driverMaxEdges + 1, Int.MaxValue.toLong - 8).toInt
      val probe = edges
        .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
        .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
        .limit(cap)
        .collect()
      if (probe.length <= driverMaxEdges) {
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        probe.foreach { row =>
          val (u, v) = (row.getLong(0), row.getLong(1))
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) { // union by min: the smaller root wins
            if (ru < rv) parent(rv) = ru else parent(ru) = rv
          }
          parent.getOrElseUpdate(u, find(u)); parent.getOrElseUpdate(v, find(v))
        }
        val labels = parent.keys.toArray.sorted.map(n => (n, find(n)))
        import spark.implicits._
        // cast back to the input id type: the output schema must not
        // depend on which side of the size gate the data landed
        val idType = edges.schema(srcCol).dataType
        return labels.toSeq.toDF("node", "component")
          .select(col("node").cast(idType).as("node"),
            col("component").cast(idType).as("component"))
      }
      // fall through: over the gate — run distributed
    }
    runDistributed(edges, srcCol, dstCol, maxRounds)
  }

  /** The distributed min-label-propagation loop (see object doc). */
  def runDistributed(edges: DataFrame, srcCol: String, dstCol: String, maxRounds: Int = 50): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("__u"), col(dstCol).as("__v"))
      .union(edges.select(col(dstCol).as("__u"), col(srcCol).as("__v")))
      .distinct()
      .localCheckpoint()

    // round 0 folds the first propagation into initialization: label =
    // min of the closed neighborhood
    var labels = sym
      .groupBy(col("__u"))
      .agg(min(col("__v")).as("__m"))
      .select(col("__u").as("node"), least(col("__u"), col("__m")).as("component"))
      .localCheckpoint()

    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // (a) pull the min label across edges. Checkpointed because BOTH
      // sides of the pointer-jump self-join consume it — without it the
      // two-join subtree would execute twice per round. (Old rounds'
      // checkpoint blocks are freed by the ContextCleaner once the frames
      // go out of scope.)
      val stepped = sym
        .join(labels, col("__v") === col("node"))
        .groupBy(col("__u").as("node"))
        .agg(min(col("component")).as("__prop"))
        .join(labels, "node")
        .select(col("node"), least(col("component"), col("__prop")).as("component"))
        .localCheckpoint()
      // (b) pointer jump: component := component(component); the label is
      // always an incident node, so the inner self-join is total
      val next = stepped.as("x")
        .join(
          stepped.select(col("node").as("__pn"), col("component").as("__pc")),
          col("x.component") === col("__pn"))
        .select(col("node"), least(col("component"), col("__pc")).as("component"))
        .localCheckpoint()
      // labels only ever decrease, so "changed" = strictly-smaller count
      changed = next
        .join(labels.withColumnRenamed("component", "__old"), "node")
        .filter(col("component") < col("__old"))
        .count()
      labels = next
      round += 1
    }
    require(changed == 0, s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
