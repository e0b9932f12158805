package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: the bucketized point-in-interval join equals the
  * obvious scan reference on arbitrary small inputs — negative axes,
  * degenerate and inverted intervals, arbitrary bucket widths (the width
  * must never change the result, only the plan). */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCase: Gen[(List[(Int, Long)], List[(Int, Long, Long)], Long)] = for {
    np <- Gen.choose(0, 12)
    ni <- Gen.choose(0, 8)
    pts <- Gen.listOfN(np, Gen.zip(Gen.choose(0, 2), Gen.choose(-60L, 60L)))
    ivs <- Gen.listOfN(ni,
      Gen.zip(Gen.choose(0, 2), Gen.choose(-60L, 60L), Gen.choose(-60L, 60L)))
    w <- Gen.choose(1L, 40L)
  } yield (pts, ivs, w)

  test("pointInInterval == brute-force reference for any bucket width") {
    val prop = Prop.forAll(genCase) { case (pts, ivs, w) =>
      val points = pts.zipWithIndex.map { case ((k, p), i) => (k, p, i.toLong) }
        .toDF("k", "p", "pid")
      val intervals = ivs.zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, i.toLong) }
        .toDF("k", "lo", "hi", "iid")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
          keys = Seq("k"), bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val expected = (for {
        ((pk, p), pi) <- pts.zipWithIndex
        ((ik, lo, hi), ii) <- ivs.zipWithIndex
        if pk == ik && p >= lo && p <= hi
      } yield (pi.toLong, ii.toLong)).sorted
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
