package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for the bucketized joins and the as-of
  * directions on random inputs: the bucket plans must emit EXACTLY the
  * brute-force pair set (no duplicate emission from multi-bucket
  * overlaps, no missed boundary touch), and each as-of direction must
  * match a straight-line nearest-scan reference including equal-ts
  * inclusivity and tie rules. */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genIntervals: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 8)
    xs <- Gen.listOfN(n, for {
      lo <- Gen.choose(-40L, 40L)
      len <- Gen.choose(0L, 30L)
    } yield (lo, lo + len))
  } yield xs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }

  test("intervalOverlap emits exactly the brute-force pair set, once each") {
    val prop = Prop.forAll(genIntervals, genIntervals, Gen.oneOf(3L, 7L, 64L)) {
      (as, bs, width) =>
        val got = RangeJoin.intervalOverlap(
            as.toDF("aid", "alo", "ahi"), "alo", "ahi",
            bs.toDF("bid", "blo", "bhi"), "blo", "bhi",
            bucketWidth = width)
          .select("aid", "bid").as[(Long, Long)].collect().toSeq
        val want = for {
          (ai, alo, ahi) <- as
          (bi, blo, bhi) <- bs
          if alo <= bhi && blo <= ahi
        } yield (ai, bi)
        got.sorted == want.sorted && got.size == got.distinct.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("pointInInterval emits exactly the brute-force containment set") {
    val genPoints: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 10)
      xs <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield xs.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val prop = Prop.forAll(genPoints, genIntervals, Gen.oneOf(3L, 7L, 64L)) {
      (ps, is, width) =>
        val got = RangeJoin.pointInInterval(
            ps.toDF("pid", "p"), "p",
            is.toDF("iid", "lo", "hi"), "lo", "hi",
            bucketWidth = width)
          .select("pid", "iid").as[(Long, Long)].collect().toSeq
        val want = for {
          (pi, p) <- ps
          (ii, lo, hi) <- is
          if p >= lo && p <= hi
        } yield (pi, ii)
        got.sorted == want.sorted
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  private val genAsOf: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    nl <- Gen.choose(1, 8)
    nr <- Gen.choose(0, 6)
    lts <- Gen.listOfN(nl, Gen.choose(0L, 50L))
    rts0 <- Gen.listOfN(nr, Gen.choose(0L, 50L))
    rts = rts0.distinct // right side must be unique per (key, ts)
  } yield (
    lts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    rts.zipWithIndex.map { case (t, i) => (100L + i, t) })

  test("every as-of direction matches the nearest-scan reference") {
    val prop = Prop.forAll(genAsOf, Gen.oneOf("backward", "forward", "nearest")) {
      case ((ls, rs), dir) =>
        val left = ls.map { case (id, t) => ("k", ts(t), id) }.toDF("k", "ts", "lid")
        val right = rs.map { case (id, t) => ("k", ts(t), id) }.toDF("k", "ts", "rid")
        val got = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", direction = dir)
          .select("lid", "rid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .toMap
        val want = ls.map { case (lid, t) =>
          val back = rs.filter(_._2 <= t).sortBy(r => (r._2, r._1)).lastOption
          val fwd = rs.filter(_._2 >= t).sortBy(r => (r._2, r._1)).headOption
          val m = dir match {
            case "backward" => back
            case "forward" => fwd
            case "nearest" => (back, fwd) match {
              case (Some(b), Some(f)) =>
                if (f._2 - t < t - b._2) Some(f) else Some(b) // ties backward
              case (b, f) => b.orElse(f)
            }
          }
          lid -> m.map(_._1)
        }.toMap
        got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
