package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("u", "v")

  test("pendant chain peels away; the triangle is the 2-core") {
    // triangle 1-2-3 with a tail 3-4-5
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val out = KCore.run(edges, "u", "v", k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("a pure path graph peels to nothing") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val out = KCore.run(edges, "u", "v", k = 2, rounds = 4).collect()
    assert(out.isEmpty)
  }

  test("peeling cascades: removing one node drops its neighbor under k") {
    // square 1-2-3-4 with chord 1-3, plus pendant 5 on node 1: round one
    // removes 5 only; the square+chord all keep degree >= 2 and survive
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (1L, 5L)))
    val out = KCore.run(edges, "u", "v", k = 2, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 2L), (3L, 3L), (4L, 2L)))
  }

  test("a cascade deeper than 4 rounds converges to the exact core under a high cap") {
    // P12: the 2-core is empty, but each peel round only removes the two
    // current endpoints — 6 rounds of genuine shrinkage. A 4-round cap
    // returns a superset (the old documented behavior); a high cap now
    // stops at the FIXPOINT, proving the loop converges rather than
    // running a fixed unroll.
    val path = sym((1L to 11L).map(i => (i, i + 1)))
    val capped = KCore.run(path, "u", "v", k = 2, rounds = 4).collect()
    assert(capped.nonEmpty) // documented superset when capped mid-cascade
    val exact = KCore.run(path, "u", "v", k = 2, rounds = 100).collect()
    assert(exact.isEmpty)
    // and a graph that converges immediately doesn't pay 100 rounds: the
    // triangle is its own 2-core, one round proves the fixpoint
    val tri = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val out = KCore.run(tri, "u", "v", k = 2, rounds = 100)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("k = 3 keeps only the clique") {
    // K4 clique {1,2,3,4} plus a triangle {4,5,6} sharing node 4
    val edges = sym(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)))
    val out = KCore.run(edges, "u", "v", k = 3, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }
}
