package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gopher-style repetition quality signals — the "excessive repetition"
  * filters (Rae et al. 2021 §A1, reused by RefinedWeb/Dolma) that catch
  * boilerplate and degenerate text which per-token quality scores miss:
  * a document whose mass concentrates in one repeated phrase reads as
  * fluent locally but is worthless training signal.
  *
  * Two integer-exact signals per document over whitespace tokens:
  *  - top-bigram character fraction (`top2gram_char_bp`): characters
  *    claimed by ALL occurrences of the single most frequent bigram
  *    (count x gram char length — overlapping occurrences counted per
  *    occurrence, as Gopher does), over the document's total
  *    token-character mass;
  *  - duplicate n-gram character coverage (`dup{n}gram_char_bp`): the
  *    union of token positions covered by any n-gram occurring at least
  *    twice, each position's characters counted ONCE — the
  *    position-union semantics of the span-dedup family, so chained
  *    repeats are not double-billed.
  *
  * Scale shape: gram keys are built ROW-LOCALLY from each document's
  * token array (the bpe_merge_pairs device — a codegen'd transform, no
  * self-join, no window), so the only exchanges are (doc, gram) count
  * aggregates with map-side combine, a (doc, pos) distinct for the
  * coverage union, and per-doc sums. The per-doc "most frequent bigram"
  * is a `min_by` over (-count, gram) — ties break to the
  * lexicographically smallest gram, keeping the report engine-exact —
  * never a rank window. Every key is doc-scoped, so group sizes are
  * bounded by document length, not corpus size.
  */
object Repetition {

  /** Per-document signals: (idCol, n_tokens, n_chars_tok, top_bigram,
    * top_bigram_n, top2gram_char_bp, dup{dupN}gram_char_bp). Documents
    * too short for a gram report 0 for the fractions and null for the
    * top bigram. */
  def signals(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dupN: Int = 5): DataFrame = {
    require(dupN >= 2, s"dupN must be >= 2, got $dupN")
    // `toks` feeds every consumer leg UNMATERIALIZED, so the tokenization
    // recomputes per leg — deliberate: the split is a cheap codegen'd
    // projection, while forcing one shared exchange (repartition on id,
    // the curate pipeline's trick for its expensive annotate lineage)
    // shuffles the materialized token ARRAYS and measured 0.30 -> 1.10 s
    // warm at sf0.1 — at corpus scale the array shuffle only gets worse
    // relative to re-splitting strings the scan already delivers
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__ts"))
      .withColumn("__L",
        aggregate(col("__ts"), lit(0L), (a, x) => a + length(x)))
      .withColumn("__n", size(col("__ts")).cast(LongType))

    // top bigram: row-local gram build -> (doc, gram) counts -> min_by
    // over (-count, gram) = argmax with smallest-gram tie-break
    val bi = toks.filter(size(col("__ts")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ts) - 1), i -> " +
          "concat_ws(' ', element_at(__ts, i), element_at(__ts, i + 1)))"))
        .as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(min_by(
        struct(col("__g"), col("__c")),
        struct(negate(col("__c")), col("__g"))).as("__top"))
      // a bigram's char mass is its joined length minus the one space
      .select(col(idCol), col("__top.__g").as("top_bigram"),
        col("__top.__c").as("top_bigram_n"),
        (col("__top.__c") * (length(col("__top.__g")) - 1).cast(LongType))
          .as("__topchars"))

    // duplicate n-gram coverage: (doc, gram) -> occurrence positions of
    // grams seen >= 2 times -> union of covered positions -> char mass
    val g5 = toks.filter(size(col("__ts")) >= dupN)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(__ts) - ${dupN - 1}), i -> struct(" +
          s"i AS p, array_join(slice(__ts, i, $dupN), ' ') AS g))")).as("__q"))
    val covered = g5
      .groupBy(col(idCol), col("__q.g").as("__g"))
      .agg(count(lit(1)).as("__c"), collect_list(col("__q.p")).as("__ps"))
      .filter(col("__c") >= 2)
      .select(col(idCol), explode(col("__ps")).as("__p0"))
      .select(col(idCol),
        explode(sequence(col("__p0"), col("__p0") + lit(dupN - 1))).as("__cp"))
      .distinct()
    val posLen = toks.select(col(idCol),
      posexplode(col("__ts")).as(Seq("__i", "__w")))
      .select(col(idCol), (col("__i") + 1).as("__cp"), length(col("__w")).as("__wl"))
    val dupChars = covered.join(posLen, Seq(idCol, "__cp"))
      .groupBy(col(idCol))
      .agg(sum(col("__wl")).cast(LongType).as("__dupchars"))

    toks.select(col(idCol), col("__n").as("n_tokens"), col("__L").as("n_chars_tok"))
      .join(bi, Seq(idCol), "left")
      .join(dupChars, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_chars_tok"),
        col("top_bigram"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        when(col("n_chars_tok") > 0,
          floor(coalesce(col("__topchars"), lit(0L)) * 10000 / col("n_chars_tok")))
          .otherwise(0L).cast(LongType).as("top2gram_char_bp"),
        when(col("n_chars_tok") > 0,
          floor(coalesce(col("__dupchars"), lit(0L)) * 10000 / col("n_chars_tok")))
          .otherwise(0L).cast(LongType).as(s"dup${dupN}gram_char_bp"))
  }
}
