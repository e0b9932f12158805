package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Spark plans a bare `p.ts BETWEEN i.lo AND i.hi` join as a broadcast
  * nested loop — fine when one side is tiny, quadratic when both sides are
  * large. This operator turns the range predicate into an EQUI-join on a
  * bucketized axis: every interval explodes to the fixed-width buckets it
  * covers, every point maps to exactly one bucket, and the hash join on
  * (keys…, bucket) followed by the exact BETWEEN filter reproduces the
  * range semantics. Each qualifying (point, interval) pair is emitted
  * exactly once because a point owns a single bucket.
  *
  * Scale: shuffle volume is linear — |points| + Σ(interval span /
  * bucketWidth) rows — so pick `bucketWidth` near the typical interval
  * length to keep the per-interval bucket count O(1). Time-skewed hot
  * buckets shard further over any equi-keys supplied in `keys`; with no
  * keys and heavy skew, salt the bucket id on both sides.
  */
object RangeJoin {

  /** Floor-division bucket id as an exact integer expression (`div` after
    * subtracting the positive modulus, so negative values floor instead of
    * truncating toward zero). */
  private def bucketExpr(c: String, width: Long): String =
    s"(($c) - pmod($c, ${width}L)) div ${width}L"

  /** Inner-join `points` to the `intervals` rows whose `[loCol, hiCol]`
    * (inclusive) range contains `pointCol`, matching equal `keys` columns.
    * All three bound columns must be integral (e.g. epoch micros). Output:
    * key columns + point columns + interval columns.
    *
    * `maxBucketsPerInterval` fails the job LOUDLY (raise_error, naming the
    * offending span) instead of letting one corrupt open-ended interval —
    * a year-9999 sentinel against an hour-wide bucket — expand to a
    * billion-element sequence and OOM a task. Size it to the widest
    * legitimate interval / bucketWidth.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 3600L * 1000000L,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val pb = points.withColumn("__bucket", expr(bucketExpr(pointCol, bucketWidth)))
    val loB = expr(bucketExpr(loCol, bucketWidth))
    val hiB = expr(bucketExpr(hiCol, bucketWidth))
    // after the hi >= lo filter the true bucket span is non-negative, so a
    // NEGATIVE hiB - loB means the subtraction wrapped past Long.MaxValue —
    // treat it as too-wide rather than falling through to a confusing
    // sequence() length error
    val ib = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket", explode(sequence(
        when(hiB - loB >= maxBucketsPerInterval || hiB - loB < 0, raise_error(concat(
          lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval " +
            s"buckets of width $bucketWidth ([" ),
          col(loCol), lit(", "), col(hiCol),
          lit("]); widen bucketWidth or fix the interval")))).otherwise(loB),
        hiB)))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-x-interval overlap join on the same bucketized axis: both
    * sides explode to their covered buckets, the hash join runs on
    * (keys…, bucket), and the exact inclusive-overlap predicate
    * `loL <= hiR && loR <= hiL` restores the semantics. A qualifying pair
    * shares every bucket their overlap covers, so it is emitted EXACTLY
    * once by keeping only the first shared bucket — the later of the two
    * interval start buckets (`bucket == greatest(loB_left, loB_right)`),
    * which is by construction inside the overlap. Same linear shuffle
    * (Σ span/bucketWidth rows per side) and the same loud too-wide guard
    * as [[pointInInterval]]; both sides' column sets must be disjoint
    * apart from `keys`. */
  def intervalOverlap(
      left: DataFrame,
      loL: String,
      hiL: String,
      right: DataFrame,
      loR: String,
      hiR: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 3600L * 1000000L,
      maxBucketsPerInterval: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"left/right column sets must be disjoint apart from keys; shared: ${shared.mkString(",")}")
    def exploded(df: DataFrame, lo: String, hi: String, startTag: String): DataFrame = {
      val loB = expr(bucketExpr(lo, bucketWidth))
      val hiB = expr(bucketExpr(hi, bucketWidth))
      // the `hiB - loB < 0` arm below is NOT dead code: after the
      // hi >= lo filter the true bucket span is non-negative, so a
      // negative difference means the long subtraction wrapped past
      // Long.MaxValue (extreme lo/hi at small bucketWidth) — treat it as
      // too-wide rather than falling through to a confusing sequence()
      // length error (same guard as pointInInterval)
      df.filter(col(hi) >= col(lo))
        .withColumn(startTag, loB)
        .withColumn("__bucket", explode(sequence(
          when(hiB - loB >= maxBucketsPerInterval || hiB - loB < 0, raise_error(concat(
            lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval " +
              s"buckets of width $bucketWidth (["),
            col(lo), lit(", "), col(hi),
            lit("]); widen bucketWidth or fix the interval")))).otherwise(loB),
          hiB)))
    }
    exploded(left, loL, hiL, "__loBL")
      .join(exploded(right, loR, hiR, "__loBR"), keys :+ "__bucket")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("__bucket") === greatest(col("__loBL"), col("__loBR")))
      .drop("__bucket", "__loBL", "__loBR")
  }
}
