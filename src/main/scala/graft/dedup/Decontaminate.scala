package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-corpus decontamination: score every training document by how many
  * of its distinct shingles occur in a held-out eval corpus.
  *
  * Two physical forms with IDENTICAL results:
  *
  *  - `overlap(useBloom = false)` — the eval shingle set joins directly;
  *    right for eval sets that broadcast (the common case: benchmarks are
  *    tiny next to the training corpus). This is the shape of the
  *    `decontaminate` catalog query.
  *  - `overlap(useBloom = true)` — the 100 TB shape for a LARGE eval side:
  *    a bloom filter over the eval shingles (~1.2 GB per 10^9 shingles at
  *    1% fpp, vs tens of GB for the exact set) prunes the exploded train
  *    side map-side BEFORE any exchange, and the surviving candidates
  *    re-check against the exact eval set in the join — bloom false
  *    positives are eliminated there, so the bloom changes shuffle volume,
  *    never the answer. The per-doc shingle count is computed row-locally
  *    (no second pass over the explode), so the only shuffled data is the
  *    bloom-surviving fraction.
  */
object Decontaminate {

  /** Per-train-doc overlap report: (doc_id, n_sh, n_overlap, overlap_bp,
    * contaminated). Docs whose text yields no shingles (< 3 tokens) are
    * excluded, matching the exploded form. */
  def overlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: Column,
      contaminatedBp: Long = 2000L,
      useBloom: Boolean = false,
      expectedEvalShingles: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), isEval.as("__eval"),
      array_distinct(call_function("graft_shingles", col(textCol))).as("__sh"))
    val evalSh = sh.filter(col("__eval")).select(explode(col("__sh")).as("x")).distinct()
    val train = sh.filter(!col("__eval"))
    val trainEx = train.select(col("doc_id"), explode(col("__sh")).as("x"))
    val candidates = if (useBloom) {
      // driver-built sketch over the eval side, broadcast to every task; a
      // UDF over a broadcast sketch is the right tool here (same pattern as
      // Intervals.unseenByState) — there is no built-in bloom probe column
      val bf = evalSh.stat.bloomFilter("x", expectedEvalShingles, fpp)
      val bfB = docs.sparkSession.sparkContext.broadcast(bf)
      val mightContain = udf((x: Long) => bfB.value.mightContainLong(x))
      trainEx.filter(mightContain(col("x")))
    } else trainEx
    val overlap = candidates
      .join(evalSh, Seq("x"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
    train
      .select(col("doc_id"), size(col("__sh")).cast(LongType).as("n_sh"))
      .filter(col("n_sh") > 0)
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_bp", expr("n_overlap * 10000 div greatest(n_sh, 1)"))
      .withColumn("contaminated", col("overlap_bp") >= contaminatedBp)
  }
}
