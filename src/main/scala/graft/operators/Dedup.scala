package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.5).
  *
  * The reference dedups within one output file; here each is a distributed
  * operator over an arbitrary DataFrame. Both are single-shuffle window
  * formulations (hash exchange on the key, no sort of the full data), so they
  * scale with the number of distinct keys rather than file sizes.
  */
object Dedup {

  /** D1 — keep-LAST occurrence per key, output in original order
    * (reference: format/CsvAvroConverterFactory.kt:22-56). `orderCol` stands
    * in for the original line number: the row with the greatest `orderCol`
    * per key survives.
    *
    * Note `dropDuplicates` keeps an arbitrary FIRST row and does not
    * preserve order, so it is not semantics-equivalent.
    */
  def keepLast(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The ONE owner of `ignoreFields` key derivation: all columns minus the
    * ignored ones minus the order column — shared by [[keepLastIgnoring]]
    * and the restructure job's strategy dispatch so the windowed and
    * salted paths can never drift. */
  def keysIgnoring(df: DataFrame, ignore: Seq[String], orderCol: String): Seq[String] =
    df.columns.filterNot(c => ignore.contains(c) || c == orderCol).toSeq

  /** D1 with `ignoreFields` semantics: key = all columns minus the ignored
    * ones (reference: format/CsvAvroConverterFactory.kt:158-171 —
    * `distinctFields` wins over `ignoreFields` when both are set). */
  def keepLastIgnoring(df: DataFrame, ignore: Seq[String], orderCol: String): DataFrame =
    keepLast(df, keysIgnoring(df, ignore, orderCol), orderCol)

  /** D2 — keep-FIRST whole-row distinct, preserving first-occurrence order
    * (reference: format/RecordConverterFactory.kt:62-84; JSON format).
    * Key = all columns except `orderCol`; the row with the least `orderCol`
    * per distinct content survives. */
  def keepFirstDistinct(df: DataFrame, orderCol: String): DataFrame = {
    val keys = df.columns.filterNot(_ == orderCol).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact whole-row dedup at scale: groupBy the content hash first so the
    * shuffle carries (hash, min-order) pairs instead of full rows when the
    * caller only needs the surviving keys. Returns one representative id per
    * distinct `contentCols` combination (the minimum of `idCol`), plus the
    * duplicate count. */
  def exactGroups(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Skew-tolerant keep-last: same result as [[keepLast]] via a two-phase
    * max_by aggregation instead of a window. Phase 1 reduces per
    * (key, salt) with map-side partial aggregation, phase 2 reduces the
    * per-salt winners — a hot key's rows spread over `saltBuckets`
    * reducers instead of landing on one. Column order of the output matches
    * the input; `orderCol` must be unique per key (it is a row index).
    *
    * Use when a dedup key is pathologically hot (boilerplate documents,
    * null-ish keys). The window formulation is one shuffle + sort; this is
    * two light shuffles with partial aggregation and no sort.
    */
  def keepLastSalted(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      saltBuckets: Int = 64): DataFrame = {
    val all = df.columns.toSeq
    val rowStruct = struct(all.map(col): _*)
    // hash-based salt so orderCol may be ANY orderable type (e.g. a
    // (offset, partition) struct), not just numeric; pmod keeps the
    // bucket non-negative for negative hashes. Plan-only — the salt only
    // spreads phase-1 groups, winners are still decided by orderCol.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(orderCol)), lit(saltBuckets.toLong)))
    // keys may be NESTED field references (e.g. value.time): phase 1's
    // groupBy output would auto-alias them to the bare leaf name, which
    // phase 2 could not resolve — pin stable aliases instead
    val keyAliases = keys.indices.map(i => s"__k$i")
    val phase1 = salted
      .groupBy(keys.zip(keyAliases).map { case (k, a) => col(k).as(a) } :+ col("__salt"): _*)
      .agg(max_by(rowStruct, col(orderCol)).as("__row"))
    val phase2 = phase1
      .groupBy(keyAliases.map(col): _*)
      .agg(max_by(col("__row"), col(s"__row.$orderCol")).as("__row"))
    phase2.select(all.map(c => col(s"__row.$c").as(c)): _*)
  }
}
