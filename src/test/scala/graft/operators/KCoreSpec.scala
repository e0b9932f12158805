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
