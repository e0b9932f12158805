package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM (SentencePiece-style) tokenizer training beside [[BPE]] —
  * the other dominant subword algorithm: instead of growing tokens by
  * merging pairs, START from a substring candidate inventory and let an
  * EM loop keep the pieces the corpus actually uses, scored by a unigram
  * likelihood.
  *
  * This is the deterministic, engine-replayable member of that family:
  * likelihoods are INTEGER bit costs (cost(p) = bitlen(total) -
  * bitlen(count), the surprisal family's integer log2), the E-step is a
  * hard (Viterbi-style greedy) segmentation of every DISTINCT word under
  * the current costs — at each position the piece minimizing scaled
  * bits-per-character (cost * (12/len), exact since 12 = lcm(1..4)),
  * longer piece on ties — and the M-step re-estimates costs from the
  * segmentation's usage counts, dropping multi-char pieces that went
  * unused. Single-character pieces are never dropped, so segmentation
  * stays total. Everything is integer and tie-broken, so the DuckDB
  * oracle replays seed, both EM rounds, and the final piece table bit
  * for bit (the decoder recursion runs as a LATERAL-ordered recursive
  * CTE).
  *
  * Scale shape (the BPE trainer's vocab-not-corpus discipline): the
  * candidate explode, every segmentation, and the usage counts run over
  * the VOCABULARY (one row per distinct word, frequency-weighted); piece
  * tables are driver literals of O(topMulti + alphabet) entries (the
  * merge-table device), and document encoding is one corpus explode +
  * one join against the segmented vocabulary.
  */
object Unigram {

  /** Longest candidate piece; 12 = lcm(1..4) makes the bits-per-char
    * comparison exact in integers. */
  val MaxPieceLen = 4
  private val Lcm = 12L

  /** Fallback bit cost for a character outside the piece table (never
    * hit on the training vocabulary — every character is seeded — but
    * keeps encoding total on unseen corpora). */
  val UnkCostBits = 64L

  /** One trained piece: usage count and integer bit cost. */
  final case class Piece(piece: String, nUses: Long, costBits: Long)

  private def bitlen(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong

  /** cost(p) = bitlen(total) - bitlen(count) over the CURRENT table —
    * unused singles (count 0, bin(0)='0') land one under the max. */
  private def withCosts(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.map(_._2).sum
    require(total > 0, "Unigram.train: empty vocabulary")
    counts.map { case (p, c) => Piece(p, c, bitlen(total) - bitlen(c)) }
  }

  /** All substrings of length 1..MaxPieceLen (per occurrence — the seed
    * candidate inventory), engine-portable empty guards included. */
  private def substringsExpr(wordCol: String): Column = {
    val parts = (1 to MaxPieceLen).map { l =>
      expr(s"CASE WHEN length(`$wordCol`) >= $l THEN " +
        s"transform(sequence(1, length(`$wordCol`) - $l + 1), " +
        s"i -> substring(`$wordCol`, i, $l)) " +
        "ELSE cast(array() as array<string>) END")
    }
    concat(parts: _*)
  }

  /** The greedy minimal-bits segmentation of one word as a single fold:
    * at each unconsumed position, candidates are the table pieces
    * matching at lengths 4..1 keyed by (cost * 12/len, 4 - len); the
    * array_min struct comparison picks the cheapest-per-char, longest on
    * ties. Single chars always resolve (UnkCostBits fallback). */
  private def segSyms(wordCol: Column, costs: Map[String, Long]): Column = {
    val costMap = map(costs.toSeq.sortBy(_._1)
      .flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
    val w = wordCol
    val folded = aggregate(
      sequence(lit(1), length(w)),
      struct(lit(0L).as("pos"), array().cast("array<string>").as("syms")),
      (acc, i) => {
        val pos = acc.getField("pos")
        val cands = (MaxPieceLen to 1 by -1).map { l =>
          val sub = call_function("substring", w, (pos + 1).cast("int"), lit(l))
          val k = try_element_at(costMap, sub) * lit(Lcm / l)
          val valid =
            if (l == 1) coalesce(k, lit(UnkCostBits * Lcm))
            else when(length(sub) === l, k)
          struct(coalesce(valid, lit(Long.MaxValue)).as("k"),
            lit((MaxPieceLen - l).toLong).as("t"), lit(l.toLong).as("l"))
        }
        val best = array_min(array(cands: _*))
        when(i <= pos, acc).otherwise(struct(
          (pos + best.getField("l")).as("pos"),
          concat(acc.getField("syms"), array(call_function("substring",
            w, (pos + 1).cast("int"), best.getField("l").cast("int")))).as("syms")))
      })
    when(length(w) < 1, array().cast("array<string>"))
      .otherwise(folded.getField("syms"))
  }

  /** Segment a one-column frame of DISTINCT words with a trained table:
    * (wordCol, symsName). The once-per-distinct-word side [[encode]]
    * joins the corpus against. */
  def segmentVocab(
      words: DataFrame,
      wordCol: String,
      pieces: Seq[Piece],
      symsName: String = "syms"): DataFrame =
    words.select(col(wordCol),
      segSyms(col(wordCol), pieces.map(p => p.piece -> p.costBits).toMap).as(symsName))

  /** Train the piece table over a `(wordCol, freqCol)` vocabulary:
    * seed = every single character plus the `topMulti` most frequent
    * multi-char substrings (count desc, piece asc — total order), then
    * `iters` hard-EM rounds of segment -> usage-count -> re-cost.
    * Output rows: (piece, n_uses, cost_bits), the final table. */
  def train(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      topMulti: Int = 48,
      iters: Int = 2): DataFrame = {
    require(topMulti >= 0, s"topMulti must be >= 0, got $topMulti")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = vocab.sparkSession
    import spark.implicits._
    val v = vocab
      .select(col(wordCol).as("__w"), col(freqCol).cast(LongType).as("__f"))
      .filter(col("__w") =!= "")
      .persist()
    try {
      // seed selection stays distributed: only the alphabet (bounded by
      // the charset) and the top-k multis (bounded by topMulti) ever
      // reach the driver — never the full substring inventory
      val seed = v
        .select(col("__f"), explode(substringsExpr("__w")).as("__p"))
        .groupBy(col("__p")).agg(sum(col("__f")).as("__cnt"))
        .persist()
      val (singles, multis) = try {
        val s = seed.filter(length(col("__p")) === 1)
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
        val m = seed.filter(length(col("__p")) > 1)
          .orderBy(col("__cnt").desc, col("__p").asc).limit(topMulti)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        (s, m)
      } finally seed.unpersist()
      // the single-char alphabet is permanent; multi-char pieces must
      // earn their keep each round
      val alphabet = singles.map(_._1)
      var table: Seq[Piece] = withCosts(singles ++ multis)
      for (_ <- 1 to iters) {
        val costs = table.map(p => p.piece -> p.costBits).toMap
        val usage = v
          .select(col("__f"), explode(segSyms(col("__w"), costs)).as("__p"))
          .groupBy(col("__p")).agg(sum(col("__f")).as("__cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val nextSingles = alphabet.map(c => (c, usage.getOrElse(c, 0L)))
        // codePointCount, not String.length: the seed's single/multi split
        // uses Spark's length() (codepoints), and a supplementary-plane
        // char (1 codepoint, 2 UTF-16 units) must not land in BOTH the
        // permanent alphabet and the multi list
        val nextMultis = usage
          .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
          .toSeq.sortBy(_._1)
        table = withCosts(nextSingles ++ nextMultis)
      }
      table.sortBy(_.piece)
        .map(p => (p.piece, p.nUses, p.costBits))
        .toDF("piece", "n_uses", "cost_bits")
    } finally v.unpersist()
  }

  /** Collect a trained table (the [[train]] output shape) into the
    * driver-side form the segmentation folds consume — vocabulary
    * metadata, the merge-table device. */
  def collectPieces(table: DataFrame): Seq[Piece] =
    table.select(col("piece"), col("n_uses").cast(LongType),
        col("cost_bits").cast(LongType))
      .collect().map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** Per-document unigram tokenization stats: (idCol, n_pieces,
    * total_bits) — piece count and summed bit cost under the trained
    * table. The fold runs once per DISTINCT word; blank docs keep an
    * n=0 row (the tokenCounts convention). */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pieces: Seq[Piece]): DataFrame = {
    val costs = pieces.map(p => p.piece -> p.costBits).toMap
    val costMap = map(costs.toSeq.sortBy(_._1)
      .flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
    val words = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val enc = segmentVocab(words.select(col("__w")).distinct(), "__w", pieces)
      .select(col("__w"), size(col("syms")).cast(LongType).as("__n"),
        aggregate(col("syms"), lit(0L),
          (acc, s) => acc + coalesce(try_element_at(costMap, s), lit(UnkCostBits)))
          .as("__bits"))
    val perDoc = words.join(enc.hint("shuffle_hash"), "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_pieces"), sum(col("__bits")).as("total_bits"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("total_bits"), lit(0L)).as("total_bits"))
  }
}
