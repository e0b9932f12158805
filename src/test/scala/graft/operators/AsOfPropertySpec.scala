package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: the union-merge as-of join equals the obvious
  * per-row reference (latest right row at-or-before, per key) on arbitrary
  * small inputs — including duplicate timestamps on the left, empty sides,
  * and keys present on only one side. */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  // (key, tsSeconds, id): ids unique per side by construction (index)
  private val genRows: Gen[(List[(Int, Long)], List[(Int, Long)])] = for {
    nl <- Gen.choose(0, 10)
    nr <- Gen.choose(0, 8)
    l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 50L)))
    r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 50L)))
  } yield (l, r)

  test("joinAsOf == naive latest-at-or-before reference") {
    val prop = Prop.forAll(genRows) { case (lRows, rRows) =>
      // dedup right to one row per (key, ts): keep max id (the operator's
      // documented precondition)
      val rUnique = rRows.zipWithIndex
        .groupBy { case ((k, t), _) => (k, t) }
        .map { case (_, vs) => vs.maxBy(_._2) }
        .toList
      val left = lRows.zipWithIndex.map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rUnique.map { case ((k, t), i) => (k, ts(t), i.toLong + 1000) }
        .toDF("k", "ts", "rid")
      val got = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts")
        .collect()
        .map(r => (r.getAs[Long]("lid"),
          Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)))
        .toMap
      val expected = lRows.zipWithIndex.map { case ((k, t), i) =>
        val m = rUnique.filter { case ((rk, rt), _) => rk == k && rt <= t }
        i.toLong -> (if (m.isEmpty) None
                     else Some(m.maxBy { case ((_, rt), ri) => (rt, ri) }._2.toLong + 1000))
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
