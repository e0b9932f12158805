package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph — the
  * third graph finisher beside [[ConnectedComponents]] (which cluster) and
  * [[PageRank]] (how central): how CLIQUE-LIKE is each document's
  * near-duplicate neighborhood. A near-dup cluster of true mirrors is a
  * clique (triangle-dense); a chain of incremental revisions is a path
  * (triangle-free) — the per-node triangle count separates the two where
  * component size and rank cannot.
  *
  * The plan is the degree-oriented node-iterator (the standard
  * skew-killer, cf. Suri & Vassilvitskii "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11): orient every edge from its
  * (degree, id)-smaller endpoint to the larger, enumerate wedges only at
  * the ORIENTED source, and close them with a hash join back against the
  * oriented edge list. Orientation bounds every node's out-degree by
  * O(sqrt(|E|)) on any graph, so the wedge explosion a hub would cause in
  * the naive plan (deg^2 wedges at the boilerplate cluster's center)
  * cannot happen — the hub's edges all point INTO it. Output counts are
  * orientation-invariant, so the oracle can replay a naive 3-way join and
  * still match exactly. Three hash shuffles total (degree agg, wedge
  * self-join on source, closing join); nothing is driver-side.
  */
object Triangles {

  /** Per-node degree and triangle count. `pairs` must hold each undirected
    * edge once as (aCol, bCol) with aCol < bCol and no self-loops; `nodes`
    * supplies the id universe (isolated nodes report 0/0). Output:
    * (node, degree, n_triangles) one row per `nodes` row. */
  def perNode(
      nodes: DataFrame,
      nodeCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
    val deg = e.select(explode(array(col("__a"), col("__b"))).as("__n"))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    // total order for orientation: (degree, id) — ties broken by id keep
    // it a strict order, so exactly one direction per edge survives
    val keyed = e
      .join(deg.select(col("__n").as("__a"), col("__d").as("__da")), "__a")
      .join(deg.select(col("__n").as("__b"), col("__d").as("__db")), "__b")
    val ori = keyed.select(
      when(struct(col("__da"), col("__a")) < struct(col("__db"), col("__b")),
        struct(col("__a").as("u"), col("__b").as("v"),
          struct(col("__db").as("d"), col("__b").as("n")).as("kv")))
        .otherwise(
          struct(col("__b").as("u"), col("__a").as("v"),
            struct(col("__da").as("d"), col("__a").as("n")).as("kv"))).as("__e"))
      .select(col("__e.u").as("__u"), col("__e.v").as("__v"), col("__e.kv").as("__kv"))
    // wedges at the oriented source, ordered by the same key so each
    // unordered out-neighbor pair appears once; close against ori itself
    val x = ori.select(col("__u"), col("__v").as("__x"), col("__kv").as("__kx"))
    val y = ori.select(col("__u"), col("__v").as("__y"), col("__kv").as("__ky"))
    val closing = ori.select(col("__u").as("__x"), col("__v").as("__y"))
    val tri = x.join(y, "__u").filter(col("__kx") < col("__ky"))
      .join(closing, Seq("__x", "__y"))
      .select(col("__u"), col("__x"), col("__y"))
    val perN = tri
      .select(explode(array(col("__u"), col("__x"), col("__y"))).as("__n"))
      .groupBy(col("__n")).agg(count(lit(1)).as("__t"))
    nodes.select(col(nodeCol).as("node"))
      .join(deg.select(col("__n").as("node"), col("__d")), Seq("node"), "left")
      .join(perN.select(col("__n").as("node"), col("__t")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("__d"), lit(0L)).as("degree"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"))
  }
}
