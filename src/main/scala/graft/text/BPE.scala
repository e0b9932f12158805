package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a word-frequency vocabulary —
  * the actual trainer loop, not just the candidate table
  * (bpe_merge_pairs is its step zero): each round counts adjacent symbol
  * pairs weighted by word frequency, picks the argmax (ties to the
  * lexicographically smallest pair, so the choice is total), and applies
  * the merge greedily left-to-right to every word's symbol sequence.
  * [[encodeVocab]] is the consumer side: it re-applies a learned merge
  * table from scratch, reproducing the trainer's final symbol state
  * exactly (pinned by BPESpec's round-trip test), so a merge table
  * trained once can tokenize any later corpus.
  *
  * Scale shape: everything runs over the VOCABULARY (one row per
  * distinct word), never the corpus — pair counting is a vocab-bounded
  * explode with map-side combine down to the distinct-pair table, and
  * the winning pair is a 1-row collect (a driver literal, the same
  * device as the IVF centroids). The merge application is a codegen'd
  * `aggregate` fold per word; `localCheckpoint` after every round (and
  * every [[EncodeCheckpointEvery]] merges in [[encodeVocab]]) cuts the
  * otherwise step-nested lambda lineage, keeping plan depth constant
  * in the number of merges. Document-level encoding
  * ([[encode]]/[[tokenCounts]]) is one explode + one join against the
  * encoded vocabulary — the corpus-sized side shuffles once on the word
  * key and every word's fold runs once per DISTINCT word, not per
  * occurrence.
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

  /** One learned merge: `step` is 1-based training order. */
  final case class Merge(step: Int, lhs: String, rhs: String) {
    def merged: String = lhs + rhs
  }

  /** One left-to-right greedy pass of a single merge over a symbol
    * array — the shared device of the trainer and the encoder (they MUST
    * agree, or a trained table would not reproduce training tokens). */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val lL = lit(l); val rL = lit(r); val mL = lit(l + r)
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lL && x === rL,
        concat(slice(acc, lit(1), size(acc) - 1), array(mL)))
        .otherwise(concat(acc, array(x))))
  }

  /** Character-split of a word column: the symbol state before any
    * merge. The empty-word guard matters: `sequence(1, 0)` DESCENDS in
    * Spark (yielding two phantom symbols), it is not an empty range. */
  private def charSyms(wordCol: String): Column =
    expr(s"CASE WHEN length(`$wordCol`) < 1 THEN cast(array() as array<string>) " +
      s"ELSE transform(sequence(1, length(`$wordCol`)), " +
      s"i -> substring(`$wordCol`, i, 1)) END")

  /** The first `steps` greedy merges of the vocabulary `(wordCol,
    * freqCol)`. Output: (step, lhs, rhs, merged, cnt) — one row per
    * merge, in training order. */
  def trainMerges(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      steps: Int): DataFrame =
    trainMergesWithState(vocab, wordCol, freqCol, steps)._1

  /** [[trainMerges]] plus the trainer's FINAL symbol state — one row per
    * vocabulary word with its post-merge symbol array (`__syms`). The
    * state is what [[encodeVocab]] must reproduce from the merge table
    * alone; exposing it makes that contract testable. */
  def trainMergesWithState(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      steps: Int): (DataFrame, DataFrame) = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val spark = vocab.sparkSession
    import spark.implicits._
    var syms = vocab.select(
      col(wordCol),
      col(freqCol).as("__f"),
      charSyms(wordCol).as("__syms"))
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
      syms = syms.withColumn("__syms", applyMerge(col("__syms"), l, r))
        .localCheckpoint()
    }
    (merges.result().toDF("step", "lhs", "rhs", "merged", "cnt"),
      syms.select(col(wordCol), col("__syms")))
  }

  /** Lineage-depth bound for [[encodeVocab]]: localCheckpoint after this
    * many chained merge folds. */
  val EncodeCheckpointEvery = 8

  /** Applies a learned merge table to a one-column frame of DISTINCT
    * words: chars, then every merge in training order — the same greedy
    * pass the trainer ran, so encode∘train is the identity on the
    * training vocabulary. Returns (wordCol, symsName). Vocab-bounded:
    * this is the once-per-distinct-word side that [[encode]] joins the
    * corpus against. */
  def encodeVocab(
      words: DataFrame,
      wordCol: String,
      merges: Seq[Merge],
      symsName: String = "syms"): DataFrame = {
    var out = words.select(col(wordCol), charSyms(wordCol).as(symsName))
    merges.sortBy(_.step).zipWithIndex.foreach { case (m, i) =>
      out = out.withColumn(symsName, applyMerge(col(symsName), m.lhs, m.rhs))
      if ((i + 1) % EncodeCheckpointEvery == 0 && i + 1 < merges.size)
        out = out.localCheckpoint()
    }
    out
  }

  /** BPE-encodes every whitespace word of `textCol`: one row per (doc,
    * word position) with the word's symbol array. The fold runs once per
    * DISTINCT word ([[encodeVocab]]); the corpus side is one explode and
    * one equi-join on the word key (shuffle-hash — the vocabulary of a
    * web corpus is itself large; Spark may still pick broadcast under
    * AQE when it measures small). */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge]): DataFrame = {
    // Empty words (doubled/leading/trailing spaces) are dropped on BOTH
    // engines: charSyms('') is 0 symbols here but the oracle's
    // string_split device would yield 1, so the contract must not
    // depend on corpus whitespace hygiene.
    val words = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("wpos", "__w")))
      .filter(col("__w") =!= "")
    val enc = encodeVocab(words.select(col("__w")).distinct(), "__w", merges)
    words.join(enc.hint("shuffle_hash"), "__w")
      .select(col(idCol), col("wpos"), col("__w").as("word"), col("syms"))
  }

  /** Real BPE token counts per document — the opt-in counter for the
    * token-denominated packing/budget operators (whitespace counts are
    * the default; a trained merge table makes the budgets match what a
    * tokenizer would actually emit). One vocab encode + one count join;
    * empty-text docs keep count 0 via the left join. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[Merge],
      outCol: String = "n_bpe"): DataFrame = {
    val perDoc = encode(docs, idCol, textCol, merges)
      .groupBy(col(idCol))
      .agg(sum(size(col("syms"))).cast("long").as(outCol))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(outCol), lit(0L)).as(outCol))
  }

  /** Collects a merge frame (the [[trainMerges]] output shape) into the
    * driver-side table [[encodeVocab]] consumes. Merge tables are
    * vocabulary metadata — tens of thousands of rows at most — the same
    * bounded-collect device as the IVF centroids. */
  def collectMerges(mergesDf: DataFrame): Seq[Merge] =
    mergesDf.select(col("step").cast("int"), col("lhs"), col("rhs"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_.step)
}
