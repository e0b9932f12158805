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

  /** `toleranceSeconds`: when set, a match older than the tolerance is
    * discarded (null payload) — the bounded-lookback variant every
    * point-in-time feature join wants, applied as a post-window filter so
    * the plan shape is unchanged. */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftData = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTsCol)
    val payload = right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTsCol)
    require(
      payload.intersect(leftData).isEmpty && !payload.contains(leftTsCol),
      s"right payload columns ${payload.mkString(",")} must not collide with left columns")
    val reserved = Seq("__ts", "__side", "__payload", "__matched", "__rts")
    require(
      (left.columns ++ right.columns).intersect(reserved).isEmpty,
      s"columns named ${reserved.mkString("/")} are reserved by joinAsOf")
    toleranceSeconds.foreach { _ =>
      require(
        left.schema(leftTsCol).dataType == org.apache.spark.sql.types.TimestampType &&
          right.schema(rightTsCol).dataType == org.apache.spark.sql.types.TimestampType,
        "toleranceSeconds requires TimestampType ts columns on both sides " +
          "(a numeric epoch would silently use the wrong unit)")
    }

    // the right payload travels as ONE struct column: carrying columns
    // independently (last(c, ignoreNulls) per column) would stitch values
    // from DIFFERENT right rows whenever a matched row holds a null field,
    // and would skip an all-null-payload right row entirely — both diverge
    // from ASOF semantics (the matched row, exactly as it was)
    val payloadExpr = struct(col(rightTsCol).as("__rts") +: payload.map(col): _*)
    val payloadType = right.select(payloadExpr).schema.head.dataType
    val leftSide = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftData.map(col): _*)
    val rightSide = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__ts"), lit(0).as("__side"),
        payloadExpr.as("__payload")) ++
        leftData.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right rows (__side=0) sort before left rows at the same timestamp, so
    // an exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftSide.unionByName(rightSide)
      .withColumn("__matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTolerance = toleranceSeconds match {
      case Some(tol) =>
        matched.withColumn("__matched",
          when(unix_micros(col("__ts")) - unix_micros(col("__matched.__rts")) <= tol * 1000000L,
            col("__matched")))
      case None => matched
    }
    inTolerance.select(
      keyCols.map(col) ++ Seq(col("__ts").as(leftTsCol)) ++
        leftData.map(col) ++
        payload.map(c => col(s"__matched.$c").as(c)): _*)
  }
}
