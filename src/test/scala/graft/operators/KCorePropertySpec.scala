package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for k-core peeling on arbitrary random graphs:
  * the distributed rounds must reproduce a straight-line sequential peel
  * exactly, and enough rounds must land on a true fixpoint (peeling once
  * more changes nothing). */
class KCorePropertySpec extends SparkSpec {
  import spark.implicits._

  private val genGraph: Gen[(Int, Set[(Long, Long)])] = for {
    n <- Gen.choose(2, 9)
    all = (for { a <- 0L until n.toLong; b <- (a + 1) until n.toLong } yield (a, b)).toList
    edges <- Gen.someOf(all)
  } yield (n, edges.toSet)

  private def both(e: Set[(Long, Long)]): Set[(Long, Long)] = e ++ e.map(_.swap)

  /** Sequential peel: exactly `rounds` synchronous remove-under-k rounds
    * over the symmetric edge set; returns surviving node -> degree. */
  private def reference(sym: Set[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var alive = sym
    for (_ <- 0 until rounds) {
      val deg = alive.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      alive = alive.filter { case (u, v) => keep(u) && keep(v) }
    }
    alive.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("distributed peel matches the sequential reference at k = 2 and 3") {
    val prop = Prop.forAll(genGraph, Gen.choose(2, 3)) { case ((_, e), k) =>
      e.isEmpty || {
        val got = KCore.run(both(e).toSeq.toDF("u", "v"), "u", "v", k, rounds = 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(both(e), k, 4)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("enough rounds reach a fixpoint: every survivor keeps degree >= k") {
    val prop = Prop.forAll(genGraph) { case ((n, e)) =>
      e.isEmpty || {
        // peel depth on an n-node graph is < n rounds
        val got = KCore.run(both(e).toSeq.toDF("u", "v"), "u", "v", k = 2, rounds = n)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got.values.forall(_ >= 2) && got == reference(both(e), 2, n + 1)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
