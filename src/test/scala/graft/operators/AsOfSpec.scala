package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: latest right row at-or-before each left row, per
  * key; inclusive at equal timestamps; null payload when nothing precedes.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("joinAsOf matches the latest right row at-or-before each left row") {
    val left = Seq(
      ("u1", ts(100), 1L), // after r at 90 -> 90
      ("u1", ts(200), 2L), // after r at 90 and 150 -> 150
      ("u1", ts(50), 3L),  // before any right row -> null
      ("u2", ts(100), 4L)) // u2 has a right row at exactly 100 -> inclusive
      .toDF("user", "ts", "event_id")
    val right = Seq(
      ("u1", ts(90), 900L),
      ("u1", ts(150), 901L),
      ("u2", ts(100), 902L),
      ("u3", ts(10), 903L)) // key never on the left: no output row
      .toDF("user", "ts", "ref_id")
    val out = AsOf.joinAsOf(left, right, Seq("user"), "ts", "ts")
      .orderBy("event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Long]("ref_id")).map(_.toLong)))
      .toSeq
    assert(out == Seq(
      (1L, Some(900L)), (2L, Some(901L)), (3L, None), (4L, Some(902L))))
  }

  test("joinAsOf returns the matched row verbatim, even with null payload fields") {
    val left = Seq(("k", ts(12), 1L), ("k", ts(7), 2L)).toDF("k", "ts", "event_id")
    val right = Seq(
      ("k", ts(5), Option(0L), Option(7L)),
      ("k", ts(10), Option(1L), Option.empty[Long])) // b null in the matched row
      .toDF("k", "ts", "a", "b")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts")
      .orderBy("event_id").collect()
    // event 1 (ts=12) matches the ts=10 row AS IT WAS: a=1, b=null —
    // not a column-wise mix (a=1, b=7) of two different right rows
    assert(out(0).getAs[java.lang.Long]("a") == 1L && out(0).isNullAt(out(0).fieldIndex("b")))
    // event 2 (ts=7) matches the ts=5 row: a=0, b=7
    assert(out(1).getAs[java.lang.Long]("a") == 0L && out(1).getAs[java.lang.Long]("b") == 7L)
  }

  test("null timestamps: right rows never match, left rows stay unmatched") {
    // a null right ts sorts nulls-first in the ascending backward frame —
    // without the guard its non-null payload struct becomes the running
    // `last` for left rows that precede every REAL right row; a null left
    // ts sorts last in the descending forward frame and would pick up the
    // minimum-ts right row as a bogus forward match (pandas merge_asof
    // refuses null keys outright)
    val left = Seq(
      ("k", Option(ts(5)), 1L),            // before the only real right row -> no match
      ("k", Option.empty[java.sql.Timestamp], 2L)) // null ts -> no match, either direction
      .toDF("k", "ts", "event_id")
    val right = Seq(
      ("k", Option.empty[java.sql.Timestamp], 666L), // must never match anything
      ("k", Option(ts(10)), 901L))
      .toDF("k", "ts", "ref_id")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", direction = dir)
        .orderBy("event_id").collect()
      assert(out.length == 2, s"$dir: row count")
      val refs = out.map(r => Option(r.getAs[java.lang.Long]("ref_id")).map(_.toLong)).toSeq
      val expect = dir match {
        case "backward" => Seq(None, None) // nothing at-or-before either row
        case _          => Seq(Some(901L), None) // ts=5 forward-matches ts=10; null ts never
      }
      assert(refs == expect, s"$dir: $refs")
    }
  }

  test("joinAsOf tolerance discards matches older than the lookback window") {
    val left = Seq(("k", ts(100), 1L), ("k", ts(500), 2L)).toDF("k", "ts", "event_id")
    val right = Seq(("k", ts(90), 7L)).toDF("k", "ts", "ref_id")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts",
      toleranceSeconds = Some(60L))
      .orderBy("event_id").collect()
    // ts=100 is 10s after the match: within tolerance; ts=500 is 410s: out
    assert(out(0).getAs[java.lang.Long]("ref_id") == 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("ref_id")))
  }

  test("forward direction matches the first right row at-or-after, inclusively") {
    val left = Seq(("k", ts(10), 1L), ("k", ts(25), 2L), ("k", ts(40), 3L))
      .toDF("k", "ts", "event_id")
    val right = Seq(("k", ts(10), 100L), ("k", ts(30), 200L)).toDF("k", "ts", "ref_id")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", direction = "forward")
      .orderBy("event_id").collect()
    // ts=10 matches the equal-ts row; ts=25 looks ahead to 30; ts=40 has none
    assert(out(0).getAs[java.lang.Long]("ref_id") == 100L)
    assert(out(1).getAs[java.lang.Long]("ref_id") == 200L)
    assert(out(2).isNullAt(out(2).fieldIndex("ref_id")))
  }

  test("nearest direction picks the closer side and breaks ties backward") {
    val left = Seq(
      ("k", ts(12), 1L),  // back 10 (d=2) vs fwd 30 (d=18) -> back
      ("k", ts(29), 2L),  // back 10 (d=19) vs fwd 30 (d=1) -> fwd
      ("k", ts(20), 3L),  // back 10 (d=10) vs fwd 30 (d=10) -> tie -> back
      ("k", ts(30), 4L))  // exact-ts match -> distance 0 backward
      .toDF("k", "ts", "event_id")
    val right = Seq(("k", ts(10), 100L), ("k", ts(30), 200L)).toDF("k", "ts", "ref_id")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts", direction = "nearest")
      .orderBy("event_id").collect()
    assert(out.map(_.getAs[java.lang.Long]("ref_id")).toSeq ==
      Seq(100L, 200L, 100L, 200L))
  }

  test("nearest with tolerance drops matches beyond the window on either side") {
    val left = Seq(("k", ts(100), 1L), ("k", ts(300), 2L)).toDF("k", "ts", "event_id")
    val right = Seq(("k", ts(90), 7L), ("k", ts(430), 8L)).toDF("k", "ts", "ref_id")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts",
      toleranceSeconds = Some(60L), direction = "nearest")
      .orderBy("event_id").collect()
    // ts=100: back 90 at d=10 ok; ts=300: nearest is fwd 430 at d=130 -> dropped
    assert(out(0).getAs[java.lang.Long]("ref_id") == 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("ref_id")))
  }

  test("joinAsOf preserves all left columns and row count") {
    val left = Seq(("k", ts(10), "a", 1.5), ("k", ts(20), "b", 2.5))
      .toDF("k", "ts", "tag", "score")
    val right = Seq(("k", ts(15), 7L)).toDF("k", "ts", "pay")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts", "ts")
    assert(out.columns.toSeq == Seq("k", "ts", "tag", "score", "pay"))
    val rows = out.orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(4) && rows(1).getLong(4) == 7L)
    assert(rows.map(_.getAs[String]("tag")).toSeq == Seq("a", "b"))
  }
}
