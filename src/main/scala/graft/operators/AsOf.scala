package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single most
  * recent right row whose timestamp is <= the left row's timestamp, per key.
  *
  * Spark has no built-in as-of join (a naive formulation is a range join
  * that explodes to a broadcast-nested-loop). The scale-first formulation
  * here is the union-merge: tag both sides, union them, sort within each key
  * by (ts, side) once, and carry the right side's payload forward with
  * `last(_, ignoreNulls)` over the running window. Cost: ONE hash exchange
  * per side on the key plus one sort — no cross product at any data size,
  * no driver-side state, skew bounded by the hottest key like any window.
  *
  * Contract: the right side must be unique per (key, rightTsCol) — dedup it
  * first (e.g. [[Dedup.keepLast]]) so the matched row is deterministic.
  * Right rows at exactly the left timestamp DO match (inclusive, the same
  * convention as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
  */
object AsOf {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String): DataFrame = {
    val leftData = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTsCol)
    val payload = right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTsCol)
    require(
      payload.intersect(leftData).isEmpty && !payload.contains(leftTsCol),
      s"right payload columns ${payload.mkString(",")} must not collide with left columns")

    def side(df: DataFrame, ts: String, tag: Int, own: Seq[String], other: Seq[String]): DataFrame = {
      val otherTyped = other.map { c =>
        val dt = (if (tag == 1) right else left).schema(c).dataType
        lit(null).cast(dt).as(c)
      }
      df.select(
        keyCols.map(col) ++ Seq(col(ts).as("__ts"), lit(tag).as("__side")) ++
          own.map(col) ++ otherTyped: _*)
        // align both branches on one column order for the union
        .select((keyCols ++ Seq("__ts", "__side") ++ leftData ++ payload).map(col): _*)
    }

    val unioned = side(left, leftTsCol, 1, leftData, payload)
      .unionByName(side(right, rightTsCol, 0, payload, leftData))
    // right rows (__side=0) sort before left rows at the same timestamp, so
    // an exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++ Seq(col("__ts").as(leftTsCol)) ++
          (leftData ++ payload).map(col): _*)
  }
}
