package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed gaps-and-islands + anti-join pruning (SURVEY §2.4 A1,
  * §2.6 J1/J2).
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("toRanges coalesces consecutive offsets into islands per group") {
    val df = Seq(
      ("t", 0, 0L), ("t", 0, 1L), ("t", 0, 2L), ("t", 0, 5L), ("t", 0, 6L),
      ("t", 1, 10L), ("u", 0, 2L), ("u", 0, 4L))
      .toDF("topic", "partition", "offset")
    val out = Intervals.toRanges(df, Seq("topic", "partition"), "offset")
      .orderBy("topic", "partition", "range_from")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      ("t", 0, 0L, 2L, 3L), ("t", 0, 5L, 6L, 2L),
      ("t", 1, 10L, 10L, 1L),
      ("u", 0, 2L, 2L, 1L), ("u", 0, 4L, 4L, 1L)))
  }

  test("unseen drops rows covered by a range, even with shared lineage") {
    val records = Seq(("t", 1L), ("t", 5L), ("t", 9L), ("u", 5L))
      .toDF("topic", "offset")
    val ranges = records
      .filter(col("topic") === "t" && col("offset") <= 5)
      .groupBy("topic")
      .agg(min("offset").as("range_from"), max("offset").as("range_to"))
    val out = Intervals.unseen(records, ranges, Seq("topic"), "offset")
      .orderBy("topic", "offset")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // t:[1..5] covered; t:9 outside; u untouched (no range for u)
    assert(out == Seq(("t", 9L), ("u", 5L)))
  }

  test("unseenByState keeps rewritten-file records (mtime newer than lastProcessed)") {
    import graft.state.{OffsetRangeSet, TopicPartition}
    val state = new OffsetRangeSet
    state.add(TopicPartition("t", 0), 0L, 9L, java.time.Instant.ofEpochMilli(1000L))
    val records = Seq(
      ("t", 0, 5L, new java.sql.Timestamp(2000L)), // rewritten AFTER processing (W5)
      ("t", 0, 6L, new java.sql.Timestamp(500L)),  // already covered
      ("t", 0, 15L, new java.sql.Timestamp(500L))) // outside the range
      .toDF("topic", "partition", "offset", "mtime")
    val kept = Intervals
      .unseenByState(spark, records, state, "topic", "partition", "offset", Some("mtime"))
      .select("offset").collect().map(_.getLong(0)).toSeq.sorted
    // the rewritten record (mtime 2s > lastProcessed 1s) must be re-extracted;
    // a seconds-vs-millis unit mix-up here silently drops it forever
    assert(kept == Seq(5L, 15L))
  }

  test("unseenByState keeps null-keyed records (the anti-join twin's semantics)") {
    import graft.state.{OffsetRangeSet, TopicPartition}
    // the primitive-typed UDF null-skips: `seen` evaluates to NULL for a
    // null mtime/partition and filter(!NULL) would DROP the record —
    // treating an unknown row as seen is silent data loss, and the
    // anti-join twin (unseen) keeps null-keyed rows as unseen
    val state = new OffsetRangeSet
    state.add(TopicPartition("t", 0), 0L, 9L, java.time.Instant.ofEpochMilli(1000L))
    val records = Seq(
      ("t", Option(0), 5L, Option(new java.sql.Timestamp(500L))), // covered -> dropped
      ("t", Option(0), 6L, Option.empty[java.sql.Timestamp]),     // null mtime -> KEPT
      ("t", Option.empty[Int], 7L, Option(new java.sql.Timestamp(500L)))) // null partition -> KEPT
      .toDF("topic", "partition", "offset", "mtime")
    val kept = Intervals
      .unseenByState(spark, records, state, "topic", "partition", "offset", Some("mtime"))
      .select("offset").collect().map(_.getLong(0)).toSeq.sorted
    assert(kept == Seq(6L, 7L))
  }

  test("toRanges round-trips through the driver state set") {
    val df = Seq(("t", 0, 3L), ("t", 0, 4L), ("t", 0, 9L))
      .toDF("topic", "partition", "offset")
      .withColumn("mtime", lit(java.sql.Timestamp.from(java.time.Instant.EPOCH)))
    val ranges = Intervals.toRanges(df, Seq("topic", "partition"), "offset", Some("mtime"))
    val state = Intervals.collectRanges(ranges)
    import graft.state.TopicPartition
    assert(state.contains(TopicPartition("t", 0), 3, java.time.Instant.EPOCH))
    assert(state.contains(TopicPartition("t", 0), 9, java.time.Instant.EPOCH))
    assert(!state.contains(TopicPartition("t", 0), 5, java.time.Instant.EPOCH))
  }
}
