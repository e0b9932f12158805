package graft.similarity

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1f, 0f)),      // centroid of list 0
    (1L, Array(0f, 1f)),      // centroid of list 1
    (2L, Array(1f, 0.001f)),  // list 0, near-dup of 0
    (3L, Array(0f, 1f)),      // list 1, exact dup of 1
    (4L, Array(-1f, 0f)))     // list 1 (dot 0 beats -1e6), no twin above threshold
    .toDF("vec_id", "embedding")

  test("smaller-id twin in the same cluster drops the vector") {
    val out = SemanticDedup.prune(emb, "vec_id", "embedding", nlist = 2, minDot = 900000L)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => r._1 -> r._3).toMap ==
      Map(0L -> true, 1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("an unreachable threshold keeps everything") {
    val out = SemanticDedup.prune(emb, "vec_id", "embedding", nlist = 2,
        minDot = Long.MaxValue)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._3))
  }

  test("property: nlist=1 equals the global pairwise keep rule") {
    val genCase: Gen[(List[List[Float]], Long)] = for {
      n <- Gen.choose(1, 8)
      vs <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(-2, 2).map(_.toFloat)))
      minDot <- Gen.choose(-5000000L, 5000000L)
    } yield (vs, minDot)
    val prop = Prop.forAll(genCase) { case (vs, minDot) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val got = SemanticDedup.prune(df, "vec_id", "embedding", nlist = 1, minDot)
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
      // quantized integer dot, exactly as the operator scores
      def qdot(a: List[Float], b: List[Float]): Long =
        a.zip(b).map { case (x, y) =>
          Math.round(x.toDouble * 1000) * Math.round(y.toDouble * 1000)
        }.sum
      val expected = vs.zipWithIndex.map { case (v, i) =>
        i.toLong -> !vs.take(i).exists(u => qdot(u, v) >= minDot)
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
