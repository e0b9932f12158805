package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a word-frequency vocabulary —
  * the actual trainer loop, not just the candidate table
  * (bpe_merge_pairs is its step zero): each round counts adjacent symbol
  * pairs weighted by word frequency, picks the argmax (ties to the
  * lexicographically smallest pair, so the choice is total), and applies
  * the merge greedily left-to-right to every word's symbol sequence.
  *
  * Scale shape: everything runs over the VOCABULARY (one row per
  * distinct word), never the corpus — pair counting is a vocab-bounded
  * explode with map-side combine down to the distinct-pair table, and
  * the winning pair is a 1-row collect (a driver literal, the same
  * device as the IVF centroids). The merge application is a codegen'd
  * `aggregate` fold per word; `localCheckpoint` after every round cuts
  * the otherwise step-nested lambda lineage, keeping plan depth constant
  * in the number of merges.
  *
  * The greedy fold (merge when the accumulator's last symbol is `lhs`
  * and the next is `rhs`) reproduces classic BPE's non-overlapping
  * left-to-right application: after a merge the new last symbol is
  * `lhs+rhs`, which can only chain when the text genuinely repeats —
  * "aaaa" under (a,a) becomes [aa][aa], "aaa" becomes [aa][a]. The
  * DuckDB twin replays the same semantics with marker-bracketed strings
  * and non-overlapping replace(), avoiding list_reduce's outer-capture
  * bug entirely.
  */
object BPE {

  /** The first `steps` greedy merges of the vocabulary `(wordCol,
    * freqCol)`. Output: (step, lhs, rhs, merged, cnt) — one row per
    * merge, in training order. */
  def trainMerges(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = vocab.sparkSession
    import spark.implicits._
    var syms = vocab.select(
      col(freqCol).as("__f"),
      expr(s"transform(sequence(1, length($wordCol)), i -> substring($wordCol, i, 1))")
        .as("__syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (i <- 1 to steps) {
      val best = syms
        .filter(size(col("__syms")) >= 2)
        .select(col("__f"), explode(expr(
          "transform(sequence(1, size(__syms) - 1), j -> " +
            "struct(element_at(__syms, j) AS l, element_at(__syms, j + 1) AS r))"))
          .as("__p"))
        .groupBy(col("__p.l").as("__l"), col("__p.r").as("__r"))
        .agg(sum(col("__f")).as("__cnt"))
        .orderBy(col("__cnt").desc, col("__l").asc, col("__r").asc)
        .limit(1).collect()
      require(best.nonEmpty, s"vocabulary exhausted after ${i - 1} merges")
      val (l, r, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((i.toLong, l, r, l + r, cnt))
      val lL = lit(l); val rL = lit(r); val mL = lit(l + r)
      syms = syms.withColumn("__syms",
        aggregate(col("__syms"), array().cast("array<string>"), (acc, x) =>
          when(size(acc) > 0 && element_at(acc, -1) === lL && x === rL,
            concat(slice(acc, lit(1), size(acc) - 1), array(mL)))
            .otherwise(concat(acc, array(x)))))
        .localCheckpoint()
    }
    merges.result().toDF("step", "lhs", "rhs", "merged", "cnt")
  }
}
