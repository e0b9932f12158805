package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sessionization: quiet gaps longer than the threshold split sessions;
  * ids are 0-based per key in time order; bounds are epoch micros. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("sessions split at gaps strictly greater than gapSeconds") {
    val df = Seq(
      // u1: events at 0, 100, 2000 (gap 1900 > 1800 splits), 2100
      ("u1", ts(0), 1L), ("u1", ts(100), 2L), ("u1", ts(2000), 3L), ("u1", ts(2100), 4L),
      // u2: single event
      ("u2", ts(500), 5L),
      // u3: gap of exactly 1800 does NOT split (strictly greater)
      ("u3", ts(0), 6L), ("u3", ts(1800), 7L))
      .toDF("user", "ts", "id")
    val out = Sessionize.sessions(df, Seq("user"), "ts", "id", gapSeconds = 1800L)
      .orderBy("user", "session_id")
      .collect()
      .map(r => (r.getAs[String]("user"), r.getAs[Long]("session_id"),
        r.getAs[Long]("session_start_us") / 1000000L,
        r.getAs[Long]("session_end_us") / 1000000L,
        r.getAs[Long]("n_events")))
      .toSeq
    assert(out == Seq(
      ("u1", 0L, 0L, 100L, 2L),
      ("u1", 1L, 2000L, 2100L, 2L),
      ("u2", 0L, 500L, 500L, 1L),
      ("u3", 0L, 0L, 1800L, 2L)))
  }

  test("assign gives every event its session id in order") {
    val df = Seq(("u", ts(0), 1L), ("u", ts(10000), 2L), ("u", ts(10010), 3L))
      .toDF("user", "ts", "id")
    val ids = Sessionize.assign(df, Seq("user"), "ts", "id", gapSeconds = 60L)
      .orderBy("id").select("session_id").as[Long].collect().toSeq
    assert(ids == Seq(0L, 1L, 1L))
  }
}
