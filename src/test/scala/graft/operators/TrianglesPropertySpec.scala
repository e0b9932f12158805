package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property for the degree-oriented triangle census: exact
  * agreement with the brute-force 3-subset count on arbitrary random
  * graphs — the orientation is an optimization, never an approximation. */
class TrianglesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genGraph: Gen[(Int, Set[(Long, Long)])] = for {
    n <- Gen.choose(3, 10)
    all = (for { a <- 0L until n.toLong; b <- (a + 1) until n.toLong } yield (a, b)).toList
    edges <- Gen.someOf(all)
  } yield (n, edges.toSet)

  test("per-node counts equal the brute-force census on random graphs") {
    val prop = Prop.forAll(genGraph) { case (n, edges) =>
      val nodes = 0L until n.toLong
      val got = Triangles
        .perNode(nodes.toDF("id"), "id", edges.toSeq.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val wantTri = nodes.map { v =>
        v -> nodes.sorted.combinations(3).count { case Seq(a, b, c) =>
          Seq(a, b, c).contains(v) &&
            edges((a, b)) && edges((a, c)) && edges((b, c))
        }.toLong
      }.toMap
      val wantDeg = nodes.map(v =>
        v -> edges.count { case (a, b) => a == v || b == v }.toLong).toMap
      nodes.forall(v => got(v) == ((wantDeg(v), wantTri(v))))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
