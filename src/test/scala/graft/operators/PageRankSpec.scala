package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: exact agreement with a sequential integer
  * reference on a hand graph, isolated-node and mass-conservation
  * invariants, and partitioning-independence. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Sequential replay of the exact integer recurrence. */
  private def reference(
      nodes: Seq[Long],
      edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (Scale * 15L / 100L) / n
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (s, _) => r(s) * 85L / (100L * deg(s)) }.sum)
        .toMap
      r = nodes.map(v => v -> (base + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def undirected(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("matches the sequential integer reference on a path + isolated nodes") {
    val nodes = (1L to 5L)
    val edges = undirected((1L, 2L), (2L, 3L))
    val got = PageRank
      .run(nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(nodes, edges, 3))
    // the path center accumulates more rank than its endpoints, which in
    // turn beat the isolated nodes holding only the base term
    assert(got(2L) > got(1L) && got(1L) > got(4L))
    assert(got(4L) === got(5L))
  }

  test("isolated nodes hold exactly the base term; total mass never grows") {
    val nodes = (0L until 7L)
    val edges = undirected((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L))
    val got = PageRank
      .run(nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = (Scale * 15L / 100L) / 7L
    assert(got(5L) === base && got(6L) === base)
    assert(got.values.sum <= Scale)
    // a symmetric triangle is rank-uniform
    assert(got(0L) === got(1L) && got(1L) === got(2L))
  }

  test("result is independent of input partitioning") {
    val nodes = (1L to 20L)
    val edges = undirected(
      (1L to 19L).map(i => (i, i + 1)) :+ ((5L, 15L)): _*)
    val a = PageRank
      .run(nodes.toDF("id"), "id", edges.toDF("src", "dst"), "src", "dst")
    val b = PageRank
      .run(nodes.toDF("id").repartition(7), "id",
        edges.toDF("src", "dst").repartition(3, col("dst")), "src", "dst")
    assert(a.orderBy("node").collect().toSeq === b.orderBy("node").collect().toSeq)
  }

  test("zero iterations returns the uniform start vector") {
    val got = PageRank
      .run((1L to 4L).toDF("id"), "id",
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), "src", "dst", iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(Scale / 4L))
  }
}
