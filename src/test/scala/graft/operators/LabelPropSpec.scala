package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Majority label propagation: sequential-reference agreement, tie-break
  * determinism, isolated-node identity, and partitioning independence. */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential replay of the synchronous majority rule. */
  private def reference(
      labels0: Map[Long, String],
      undirected: Seq[(Long, Long)],
      iters: Int): Map[Long, String] = {
    val adj = (undirected ++ undirected.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var l = labels0
    for (_ <- 0 until iters) {
      l = l.map { case (v, own) =>
        val votes = (adj.getOrElse(v, Seq.empty).map(l) :+ own)
          .groupBy(identity).view.mapValues(_.size).toMap
        val best = votes.toSeq.map { case (lab, c) => (-c, lab) }.min._2
        v -> best
      }
    }
    l
  }

  private def run(labels0: Map[Long, String], undirected: Seq[(Long, Long)],
      iters: Int = 2): Map[Long, String] = {
    val both = undirected ++ undirected.map(_.swap)
    LabelProp.run(labels0.toSeq.toDF("id", "lab"), "id", "lab",
      both.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("a majority cluster flips its minority member; isolated nodes keep seeds") {
    val labels = Map(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "fr")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)) // triangle; 4 isolated
    val got = run(labels, edges)
    assert(got === reference(labels, edges, 2))
    assert(got(3L) === "en") // 3 sees {en, en, de}: majority en
    assert(got(4L) === "fr")
  }

  test("ties break to the lexicographically smallest label") {
    val labels = Map(1L -> "b", 2L -> "a")
    val edges = Seq((1L, 2L))
    val got = run(labels, edges, iters = 1)
    // each node sees one 'a' and one 'b': both adopt 'a'
    assert(got === Map(1L -> "a", 2L -> "a"))
  }

  test("zero iterations returns the seed labels") {
    val labels = Map(1L -> "x", 2L -> "y")
    assert(run(labels, Seq((1L, 2L)), iters = 0) === labels)
  }

  test("matches the sequential reference on a two-cluster graph and is partition-independent") {
    val labels = (0L until 14L).map(v => v -> (if (v < 8L) s"l${v % 3}" else s"l${v % 2}")).toMap
    val edges = (for { a <- 0L until 8L; b <- (a + 1) until 8L if (a + b) % 2L == 0L } yield (a, b)) ++
      Seq((8L, 9L), (9L, 10L), (10L, 11L), (11L, 12L), (12L, 13L))
    val got = run(labels, edges)
    assert(got === reference(labels, edges, 2))
    val both = (edges ++ edges.map(_.swap)).toDF("s", "d").repartition(5, col("d"))
    val rep = LabelProp.run(labels.toSeq.toDF("id", "lab").repartition(7), "id", "lab",
      both, "s", "d", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rep === got)
  }
}
