package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: group each key's events into sessions separated by
  * quiet gaps longer than `gapSeconds` — the batch twin of a session
  * window, expressed as gaps-and-islands over event time.
  *
  * Physical shape: one hash exchange on the key, one sort, two stacked
  * windows (lag -> running sum) that share the exchange, then a partial
  * (map-side combined) aggregate. Nothing driver-side, no state store;
  * at 100 TB the only pressure point is the per-key sort, which is the
  * floor for any order-dependent session semantics.
  *
  * `tieBreakCol` makes the within-key order total when timestamps can
  * repeat, so session ids are deterministic on any partitioning.
  */
object Sessionize {

  /** Per-event session assignment: input columns + `session_id` (0-based
    * per key, in time order). */
  def assign(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieBreakCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol), col(tieBreakCol))
    val us = unix_micros(col(tsCol))
    // first event of a key: lag is null -> comparison null -> flag 0
    val newSession =
      when(us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id", sum(newSession).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: keyCols ++ (session_id, session_start_us,
    * session_end_us, n_events). Bounds are epoch micros (exact integers,
    * engine-portable). */
  def sessions(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieBreakCol: String,
      gapSeconds: Long): DataFrame =
    assign(df, keyCols, tsCol, tieBreakCol, gapSeconds)
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(
        min(unix_micros(col(tsCol))).as("session_start_us"),
        max(unix_micros(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"))
}
