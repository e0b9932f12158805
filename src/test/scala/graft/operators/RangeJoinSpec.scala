package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized join equals the brute-force range join") {
    val points = Seq(
      (1L, 0L), (2L, 5L), (3L, 10L), (4L, 99L), (5L, 100L), (6L, 250L), (7L, -7L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, 0L, 9L), (11L, 5L, 250L), (12L, 100L, 100L), (13L, 300L, 400L),
      (14L, 20L, 10L)) // hi < lo: dropped
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        keys = Nil, bucketWidth = 16L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.as("p").join(intervals.as("i"),
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains((1L, 10L)))  // inclusive lo
    assert(want.contains((5L, 12L)))  // degenerate [100,100]
    assert(want.contains((6L, 11L)))  // interval spanning many buckets
    assert(!want.exists(_._2 == 14L)) // inverted interval emits nothing
  }

  test("negative coordinates bucket by floor division, not truncation") {
    val points = Seq((1L, -1L), (2L, -16L), (3L, -17L)).toDF("pid", "p")
    val intervals = Seq((20L, -20L, -2L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        keys = Nil, bucketWidth = 16L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("an interval wider than maxBucketsPerInterval fails loudly, not OOM") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((10L, 0L, Long.MaxValue / 2)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        keys = Nil, bucketWidth = 16L, maxBucketsPerInterval = 1000L).count()
    }
    assert(ex.getMessage != null)
  }

  test("equi-keys restrict matches and each pair is emitted exactly once") {
    val points = Seq(("u1", 1L, 50L), ("u2", 2L, 50L)).toDF("u", "pid", "p")
    val intervals = Seq(("u1", 10L, 0L, 100L), ("u2", 11L, 60L, 100L))
      .toDF("u", "iid", "lo", "hi")
    val rows = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        keys = Seq("u"), bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 10L))) // u2's point is outside u2's interval
  }

  test("intervalOverlap finds exactly the overlapping pairs, once each") {
    val a = Seq((1L, 0L, 100L), (2L, 200L, 210L)).toDF("aid", "alo", "ahi")
    val b = Seq(
      (10L, 50L, 300L),   // overlaps BOTH a-intervals, spanning many buckets
      (20L, 100L, 110L),  // touches a1 at exactly hi=100 (inclusive)
      (30L, 101L, 150L),  // disjoint from a1, inside a2's gap
      (40L, 400L, 500L))  // disjoint from everything
      .toDF("bid", "blo", "bhi")
    val rows = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
        bucketWidth = 7L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq.sorted
    assert(rows == Seq((1L, 10L), (1L, 20L), (2L, 10L)))
  }

  test("a bucket-span long overflow trips the too-wide guard, not a sequence error") {
    // hi near Long.MaxValue and lo near Long.MinValue: hiB - loB =
    // 2^64 - 33 wraps to -33 at bucketWidth 1, skipping the >= arm — the
    // guard's `< 0` arm (it is overflow protection, not dead code) must
    // raise the same loud message
    val a = Seq((1L, Long.MinValue + 16, Long.MaxValue - 16)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, 0L, 1L)).toDF("bid", "blo", "bhi")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
        bucketWidth = 1L).count()
    }
    assert(ex.getMessage != null)
  }

  test("intervalOverlap handles negative axes and rejects shared columns") {
    val a = Seq((1L, -50L, -10L)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, -20L, 5L), (20L, -200L, -60L)).toDF("bid", "blo", "bhi")
    val rows = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
        bucketWidth = 16L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 10L)))
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(a, "alo", "ahi",
        Seq((1L, 1L, 2L)).toDF("aid", "blo", "bhi"), "blo", "bhi")
    }
    assert(ex.getMessage.contains("disjoint"))
  }
}
