package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties of sessionization: sessions tile each key's
  * events exactly, intra-session gaps never exceed the threshold, and
  * consecutive sessions are separated by more than it. */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  private val genEvents: Gen[List[(Int, Long)]] =
    Gen.choose(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 400L))))

  test("sessions tile the events; gaps split iff strictly greater than threshold") {
    val gap = 60L
    val prop = Prop.forAll(genEvents) { events =>
      val df = events.zipWithIndex
        .map { case ((k, t), i) => (k, ts(t), i.toLong) }
        .toDF("k", "ts", "id")
      val out = Sessionize.sessions(df, Seq("k"), "ts", "id", gapSeconds = gap)
        .collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[Long]("session_id"),
          r.getAs[Long]("session_start_us") / 1000000L,
          r.getAs[Long]("session_end_us") / 1000000L,
          r.getAs[Long]("n_events")))
        .toSeq
      val total = out.map(_._5).sum == events.size
      val perKey = out.groupBy(_._1).forall { case (k, sessions) =>
        val sorted = sessions.sortBy(_._2)
        val ids = sorted.map(_._2) == sorted.indices.map(_.toLong)
        val ordered = sorted.forall(s => s._3 <= s._4)
        // consecutive sessions separated by MORE than the gap
        val separated = sorted.sliding(2).forall {
          case Seq(a, b) => b._3 - a._4 > gap
          case _         => true
        }
        // reference: sequential scan splits exactly where diff > gap
        val times = events.filter(_._1 == k).map(_._2).sorted
        val expectedSessions = times.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: done, t) =>
            if (t - cur.head <= gap) (t :: cur) :: done else List(t) :: cur :: done
        }.reverse.map(_.reverse)
        val matches = sorted.map(s => (s._3, s._4, s._5)) ==
          expectedSessions.map(sess => (sess.head, sess.last, sess.size.toLong))
        ids && ordered && separated && matches
      }
      total && perKey
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
