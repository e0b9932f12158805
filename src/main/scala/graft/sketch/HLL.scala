package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Hashing.{P, TokenHashA, TokenHashB}

/** HyperLogLog distinct-count sketch in EXACT integer arithmetic — the
  * cardinality sketch beside the count-min frequency sketch
  * (heavy_hitters): how many distinct values does a group hold, answered
  * from m=64 five-bit registers instead of a distinct shuffle.
  *
  * Unlike `approx_count_distinct` (whose HLL++ registers are an engine
  * implementation detail, checkable only within a tolerance —
  * sketch_events), every number here is reproducible bit-for-bit on any
  * engine: the register index is `h mod 64`, the rank is leading-zero
  * count via binary-string length (`bin()`, identical in Spark and
  * DuckDB), and the estimate is the raw HLL harmonic mean evaluated in
  * fixed point — alpha_64 = 709/1000, S = sum 2^(30-M[j]) as exact
  * BIGINTs, E = (709 * 64^2 * 2^30) div (1000 * S). Every division is a
  * floor over positive integers, so the DuckDB twin replays the sketch
  * AND the estimate exactly.
  *
  * Scale shape: registers are ONE map-side-combined aggregation
  * collapsing each partition's contribution to at most 64 rows per group
  * before the exchange — the same "sketch first, shuffle counters"
  * discipline as the CMS. Registers MERGE by elementwise max (tested),
  * which is exactly what the partial-aggregate does; a 1000-executor run
  * shuffles 64 longs per group, never the values. Accuracy is the
  * standard 1.04/sqrt(64) ~ 13% relative error; the query surfaces
  * `err_bp` against the exact count so the tradeoff is measured, not
  * asserted.
  *
  * Input hashes must be uniform in [0, 2^31-1) (the minhash domain P):
  * bucket = h mod 64, the remaining 25 bits w = h div 64 give
  * rho = 26 - bitlength(w) in [1, 26] (rho = 26 when w = 0).
  */
object HLL {
  /** Register count m = 2^6. */
  val Buckets = 64
  /** Max register value: 25 payload bits + 1. */
  val MaxRho = 26
  /** alpha_64 in thousandths (0.709 exactly). */
  val AlphaMil = 709L

  /** Full-avalanche mix of a non-negative long into the register hash
    * domain [0, P): two multiply-mod-P rounds interleaved with xor-shift
    * folds. A single multiplicative map is NOT enough — x*A mod P is a
    * lattice, so sequential inputs break the register rank statistics
    * (measured +67% estimate bias at n=5000); the xor folds destroy the
    * linearity. Every step is exact BIGINT arithmetic with the same
    * operators in DuckDB (`xor`, `>>`), so the twin replays it. */
  def mix(x: Column): Column = {
    val a1 = (x % P) * TokenHashA % P
    val a2 = a1.bitwiseXOR(shiftright(a1, 15))
    val a3 = (a2 % P) * TokenHashB % P
    val a4 = a3.bitwiseXOR(shiftright(a3, 13))
    (a4 % P) * TokenHashA % P
  }

  /** Register rank of a hash column uniform in [0, 2^31-1). */
  def rho(h: Column): Column = {
    val w = shiftright(h, 6) // h >= 0: == h div 64, exact integer
    when(w === 0L, lit(MaxRho.toLong))
      .otherwise(lit(MaxRho.toLong) - length(bin(w)).cast(LongType))
  }

  /** Sparse registers: one row per (group, bucket) seen, `m` = max rank.
    * Empty buckets are absent (estimate() restores them as 0). */
  def registers(df: DataFrame, groupCols: Seq[String], hashCol: String): DataFrame =
    df.groupBy((groupCols.map(col) :+ pmod(col(hashCol), lit(Buckets.toLong)).as("b")): _*)
      .agg(max(rho(col(hashCol))).as("m"))

  /** Fixed-point raw HLL estimate per group from sparse registers:
    * (group..., hll_est, v_zero) with v_zero = number of empty registers
    * (the linear-counting signal, surfaced rather than applied — applying
    * it needs a log, which engines disagree on). */
  def estimate(reg: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    val dense = reg.select(gc: _*).distinct()
      .select(gc :+ explode(sequence(lit(0L), lit(Buckets - 1L))).as("b"): _*)
      .join(reg, groupCols :+ "b", "left")
      .withColumn("m", coalesce(col("m"), lit(0L)))
    // 2^(30-m) = 2^30 div 2^m: shiftleft needs an int column in SQL form
    val term = expr("1073741824L div shiftleft(1L, cast(m as int))")
    dense.groupBy(gc: _*)
      .agg(sum(term).as("__s"), sum(when(col("m") === 0L, 1L).otherwise(0L)).as("v_zero"))
      .select(gc :+
        expr(s"(${AlphaMil * Buckets * Buckets}L * 1073741824L) div (1000L * __s)")
          .as("hll_est") :+
        col("v_zero"): _*)
  }
}
