package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for the Pregel-loop operators on arbitrary
  * random graphs: PageRank equals its sequential integer reference and
  * never grows total mass; label propagation equals its sequential
  * majority-rule reference. Both distributed plans must reproduce a
  * straight-line fold bit-for-bit — partitioning, join order, and
  * aggregation order may not leak into the result. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  private val genGraph: Gen[(Int, Set[(Long, Long)])] = for {
    n <- Gen.choose(2, 9)
    all = (for { a <- 0L until n.toLong; b <- (a + 1) until n.toLong } yield (a, b)).toList
    edges <- Gen.someOf(all)
  } yield (n, edges.toSet)

  private def both(e: Set[(Long, Long)]): Seq[(Long, Long)] =
    (e ++ e.map(_.swap)).toSeq

  private def prReference(n: Int, edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = 0L until n.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (Scale * 15L / 100L) / n
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 0 until iters) {
      val contrib = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) * 85L / (100L * deg(s)) }.sum).toMap
      r = nodes.map(v => v -> (base + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def lpReference(labels0: Map[Long, String], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, String] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var l = labels0
    for (_ <- 0 until iters) {
      l = l.map { case (v, own) =>
        val votes = (adj.getOrElse(v, Seq.empty).map(l) :+ own)
          .groupBy(identity).view.mapValues(_.size).toMap
        v -> votes.toSeq.map { case (lab, c) => (-c, lab) }.min._2
      }
    }
    l
  }

  test("PageRank matches the integer reference and never grows mass") {
    val prop = Prop.forAll(genGraph) { case (n, e) =>
      val got = PageRank
        .run((0L until n.toLong).toDF("id"), "id", both(e).toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == prReference(n, both(e), 3) && got.values.sum <= Scale
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("label propagation matches the sequential majority reference") {
    val prop = Prop.forAll(genGraph) { case (n, e) =>
      val labels = (0L until n.toLong).map(v => v -> s"l${v % 3}").toMap
      val got = LabelProp
        .run(labels.toSeq.toDF("id", "lab"), "id", "lab",
          both(e).toDF("s", "d"), "s", "d", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == lpReference(labels, both(e), 2)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
