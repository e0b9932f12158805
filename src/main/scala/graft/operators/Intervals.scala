package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.{OffsetRangeSet, TopicPartition}

/** Distributed offset-interval algebra (SURVEY §2.4 A1, §2.6 J1/J2).
  *
  * The reference maintains a sorted disjoint interval set per
  * topic-partition (accounting/OffsetIntervals.kt). The scale-out
  * formulation is the classic gaps-and-islands aggregation: one hash
  * exchange on the partition keys, a window to flag gaps, and a groupBy —
  * all whole-stage-codegen'd built-ins. The result is O(gaps) rows, small
  * enough to collect to the driver-side [[graft.state.OffsetRangeSet]] and
  * broadcast back as a pruning predicate.
  */
object Intervals {

  /** Coalesce a column of observed offsets into disjoint closed ranges per
    * group ("islands"). Output: groupCols ++ (range_from, range_to, n_offsets
    * [, last_processed]).
    *
    * At 100 TB this shuffles only (groupCols, offset[, mtime]) pairs — keep
    * the projection narrow before calling.
    */
  def toRanges(
      df: DataFrame,
      groupCols: Seq[String],
      offsetCol: String,
      mtimeCol: Option[String] = None): DataFrame = {
    // island id = offset - rank of offset within group: constant per
    // maximal run of consecutive offsets. row_number semantics hold
    // because offsets are distinct within a group (Kafka offsets are).
    // The rank comes from ShardedPrefix's range-sharded prefix (not a
    // per-group window): a topic-partition holds billions of offsets at
    // crawl scale, and offsets are dense, so range-sharding the offset
    // axis keeps every task's sort at group/shards while the island
    // arithmetic stays exact. Empty groupCols (one global island set)
    // ride a constant group key.
    val (keys, projected0) =
      if (groupCols.nonEmpty)
        (groupCols,
          df.select((groupCols :+ offsetCol).map(col) ++ mtimeCol.map(col).toSeq: _*))
      else
        (Seq("__g"),
          df.select(Seq(col(offsetCol)) ++ mtimeCol.map(col).toSeq: _*)
            .withColumn("__g", lit(0)))
    val withIsland = ShardedPrefix
      .withRankAndSum(projected0, keys, offsetCol, offsetCol, rankName = "__rn")
      .withColumn("__island", col(offsetCol) - col("__rn"))
      .drop("__rn", "__g")
    val aggs =
      Seq(
        min(col(offsetCol)).as("range_from"),
        max(col(offsetCol)).as("range_to"),
        count(lit(1)).as("n_offsets")) ++
        mtimeCol.map(m => max(col(m)).as("last_processed")).toSeq
    withIsland
      .groupBy((groupCols :+ "__island").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop("__island")
  }

  /** Collect a ranges DataFrame (topic, partition, range_from, range_to,
    * last_processed) into the driver-side state set. Row count is O(gaps),
    * so the collect is safe by construction. */
  def collectRanges(ranges: DataFrame): OffsetRangeSet = {
    val set = new OffsetRangeSet
    ranges
      .select("topic", "partition", "range_from", "range_to", "last_processed")
      .collect()
      .foreach { r =>
        set.add(
          TopicPartition(r.getString(0), r.getInt(1)),
          r.getLong(2),
          r.getLong(3),
          r.getTimestamp(4).toInstant)
      }
    set
  }

  /** J1/J2 — anti-join of records against a seen-ranges DataFrame: keep rows
    * whose (groupCols, offset) is NOT covered by any range. The ranges side
    * is O(gaps) rows, so it is always broadcast — Spark executes this as a
    * broadcast nested-loop anti-join, which is the right plan (the probe side
    * streams, nothing shuffles). */
  def unseen(
      records: DataFrame,
      ranges: DataFrame,
      groupCols: Seq[String],
      offsetCol: String): DataFrame = {
    // rename the build side up front: ranges is often derived from `records`
    // itself, and shared lineage would make records(c) === ranges(c) resolve
    // to a trivially-true self-comparison
    val renamed = ranges.select(
      groupCols.map(c => col(c).as(s"__r_$c")) ++
        Seq(col("range_from"), col("range_to")): _*)
    val cond = groupCols
      .map(c => col(c) === col(s"__r_$c"))
      .reduce(_ && _) &&
      col(offsetCol) >= col("range_from") &&
      col(offsetCol) <= col("range_to")
    records.join(broadcast(renamed), cond, "left_anti")
  }

  /** Same predicate evaluated against a broadcast driver-side state set —
    * zero join, a single filter that pipelines inside the scan stage.
    * Used by the restructure job where the state lives on the driver. */
  def unseenByState(
      spark: SparkSession,
      records: DataFrame,
      state: OffsetRangeSet,
      topicCol: String,
      partitionCol: String,
      offsetCol: String,
      mtimeCol: Option[String] = None): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      state.entries.map { case (tp, r) =>
        (tp.topic, tp.partition, r.from, r.to, r.lastProcessed.toEpochMilli)
      })
    val seen = udf { (topic: String, partition: Int, offset: Long, mtimeMs: Long) =>
      bc.value.exists { case (t, p, f, to, lp) =>
        t == topic && p == partition && offset >= f && offset <= to && mtimeMs <= lp
      }
    }
    // lastProcessed above is epoch MILLIS, so the column must be too: a
    // TimestampType cast to long yields epoch SECONDS, which would make
    // mtime <= lastProcessed near-always true and silently drop every
    // record of a rewritten file (W5 reprocessing guarantee).
    val mtime = mtimeCol.map { c =>
      records.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
        case _                                        => col(c).cast("long")
      }
    }.getOrElse(lit(0L))
    // coalesce, not a bare NOT: the primitive-typed UDF null-skips when any
    // input is null (a null mtime or partition makes `seen` NULL, and
    // filter(!NULL) DROPS the row — treating an unknown record as seen is
    // silent data loss). The anti-join twin above keeps null-keyed rows as
    // unseen; this filter must agree.
    records.filter(
      !coalesce(seen(col(topicCol), col(partitionCol), col(offsetCol), mtime), lit(false)))
  }
}
