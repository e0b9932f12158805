package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-oriented triangle counting: exact agreement with a brute-force
  * reference, clique/path/star shapes, and partitioning independence. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: every 3-subset with all three edges present. */
  private def reference(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val counts = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    for {
      Seq(a, b, c) <- nodes.sorted.combinations(3)
      if has(a, b) && has(a, c) && has(b, c)
      n <- Seq(a, b, c)
    } counts(n) += 1L
    counts.toMap
  }

  private def run(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.perNode(nodes.toDF("id"), "id", pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("K4: every node has degree 3 and sits in 3 triangles") {
    val nodes = 1L to 4L
    val pairs = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val got = run(nodes, pairs)
    assert(got.values.toSet === Set((3L, 3L)))
  }

  test("paths and stars are triangle-free; isolated nodes report 0/0") {
    val nodes = 1L to 8L
    // path 1-2-3-4 plus star centered at 5 with leaves 6, 7, 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (5L, 7L), (5L, 8L))
    val got = run(nodes, pairs)
    assert(got.values.forall(_._2 === 0L))
    assert(got(5L)._1 === 3L && got(6L)._1 === 1L)
  }

  test("matches the brute-force reference on a dense fixed graph") {
    val nodes = 0L until 12L
    // deterministic pseudo-random graph: edge iff hash parity condition
    val pairs = for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      if (a * 7919L + b * 104729L) % 5L < 2L
    } yield (a, b)
    val got = run(nodes, pairs)
    val want = reference(nodes, pairs)
    assert(got.view.mapValues(_._2).toMap === want)
  }

  test("result is independent of input partitioning") {
    val nodes = 0L until 12L
    val pairs = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
      if (a * 31L + b * 17L) % 3L == 0L
    } yield (a, b)).toSeq
    val a = Triangles.perNode(nodes.toDF("id"), "id", pairs.toDF("a", "b"), "a", "b")
    val b = Triangles.perNode(nodes.toDF("id").repartition(5), "id",
      pairs.toDF("a", "b").repartition(3, col("b")), "a", "b")
    assert(a.orderBy("node").collect().toSeq === b.orderBy("node").collect().toSeq)
  }
}
