package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Hashing._
import graft.text.Text

/** SimHash near-duplicate fingerprinting.
  *
  * Each token's word code is hashed to a bit pattern; per bit position the
  * document accumulates +1/-1 votes over its tokens; the sign of each vote
  * sum yields one fingerprint bit. Near-duplicate docs differ in few bits
  * (Hamming distance).
  *
  * The `SimHashBits`-bit variant below is exact-integer and SQL-expressible
  * (it is what the DuckDB oracle checks); `simhash64` is the
  * production-width variant of the same construction.
  */
object SimHash {

  /** Token bit source: (code * TokenHashA) mod P. */
  private def tokenHash(c: Column): Column = (c * TokenHashA) % P

  /** Vote sum for bit `i`: sum over tokens of 2*bit_i - 1. */
  private def bitVote(codes: Column, i: Int): Column =
    aggregate(codes, lit(0L), (acc, c) =>
      acc + (shiftright(tokenHash(c), i).bitwiseAND(lit(1L)) * 2L - 1L))

  /** SQL-width simhash: bit i set iff its vote sum is strictly positive. */
  def simhash(text: Column, bits: Int = SimHashBits): Column = {
    val codes = Text.wordCodes(text)
    (0 until bits)
      .map(i => when(bitVote(codes, i) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** 64-bit simhash: same construction with two 32-bit halves drawn from
    * independent multipliers to fill 64 bits with exact arithmetic. */
  def simhash64(text: Column): Column = {
    val codes = Text.wordCodes(text)
    def half(mult: Long, base: Int): Column =
      (0 until 32).map { i =>
        val vote = aggregate(codes, lit(0L), (acc, c) =>
          acc + (shiftright((c * mult) % P, i).bitwiseAND(lit(1L)) * 2L - 1L))
        when(vote > 0, lit(1L << (base + i))).otherwise(lit(0L))
      }.reduce(_ + _)
    half(TokenHashA, 0) + half(2246822519L, 32)
  }

  /** Hamming distance between two simhash columns. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by simhash: docs whose fingerprints differ in at
    * most `maxBits` bits. Blocks on the full fingerprint bucket first
    * (exact-dup fast path), then compares within +/- neighborhoods via a
    * band split of the fingerprint (each half must match exactly for
    * maxBits <= bits/2 by pigeonhole). */
  def nearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBits: Int = 2,
      bits: Int = SimHashBits,
      native: Boolean = false): DataFrame = {
    val half = bits / 2
    // repartition materializes the signature computation once as a shuffle
    // stage that all four join branches (2 blocks x 2 sides) reuse — the
    // 16 interpreted bit-vote aggregates are the dominant cost here
    val sigExpr =
      if (native) { require(bits == SimHashBits); call_function("graft_simhash16", col(textCol)) }
      else simhash(col(textCol), bits)
    val withSig = df.select(col(idCol).as("__id"), sigExpr.as("__sig"))
      .withColumn("__lo", col("__sig").bitwiseAND(lit((1L << half) - 1)))
      .withColumn("__hi", shiftright(col("__sig"), half))
      .repartition(col("__id"))
    // pigeonhole: <= maxBits differing bits with 2 blocks means at least one
    // block matches exactly (holds when maxBits < 2, generally a candidate
    // generator; the hamming filter below is the exact check)
    // an OR join would force a nested-loop cross product; two equi-joins
    // (hash exchanges on small keys) unioned + distinct scale instead
    def block(key: String): DataFrame = {
      val l = withSig.as("l")
      val r = withSig.as("r")
      l.join(r, col(s"l.$key") === col(s"r.$key") && col("l.__id") < col("r.__id"))
        .select(
          col("l.__id").as("id_1"),
          col("r.__id").as("id_2"),
          hamming(col("l.__sig"), col("r.__sig")).as("hamming"))
    }
    block("__lo").unionByName(block("__hi"))
      .filter(col("hamming") <= maxBits)
      .distinct()
  }
}
