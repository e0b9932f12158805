package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge training: agreement with a sequential reference (including
  * the greedy-overlap case), tie-break determinism, and partitioning
  * independence. */
class BPESpec extends SparkSpec {
  import spark.implicits._

  /** Classic sequential BPE over a (word -> freq) vocabulary. */
  private def reference(vocab: Map[String, Long], steps: Int): Seq[(Long, String, String, String, Long)] = {
    var syms: Map[String, List[String]] = vocab.map { case (w, _) => w -> w.map(_.toString).toList }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (i <- 1 to steps) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, f) <- vocab; Seq(a, b) <- syms(w).sliding(2) if syms(w).size >= 2)
        pc((a, b)) = pc.getOrElse((a, b), 0L) + f
      val ((l, r), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      out += ((i.toLong, l, r, l + r, cnt))
      syms = syms.map { case (w, s) =>
        val acc = scala.collection.mutable.ListBuffer.empty[String]
        for (x <- s) {
          if (acc.nonEmpty && acc.last == l && x == r) acc(acc.size - 1) = l + r
          else acc += x
        }
        w -> acc.toList
      }
    }
    out.result()
  }

  private def run(vocab: Map[String, Long], steps: Int, parts: Int = 1): Seq[(Long, String, String, String, Long)] =
    BPE.trainMerges(vocab.toSeq.toDF("w", "freq").repartition(parts), "w", "freq", steps)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq

  test("matches the sequential trainer, including greedy overlap on runs") {
    // 'aaaa' stresses non-overlapping application: (a,a) then (aa,aa)
    val vocab = Map("aaaa" -> 10L, "aab" -> 4L, "abab" -> 3L, "b" -> 7L)
    assert(run(vocab, 4) === reference(vocab, 4))
  }

  test("first merge on a crafted vocabulary is the weighted argmax") {
    val vocab = Map("xy" -> 5L, "xz" -> 3L, "yz" -> 4L)
    val got = run(vocab, 1)
    assert(got === Seq((1L, "x", "y", "xy", 5L)))
  }

  test("ties break to the lexicographically smallest pair") {
    val vocab = Map("ab" -> 2L, "aa" -> 2L) // (a,a) and (a,b) both count 2
    assert(run(vocab, 1).head === ((1L, "a", "a", "aa", 2L)))
  }

  test("result is independent of vocabulary partitioning") {
    val vocab = ("the quick brown fox jumps over the lazy dog and the cat" * 3)
      .split(' ').groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(run(vocab, 3, parts = 7) === reference(vocab, 3))
  }

  test("encode∘train round-trips the training vocabulary (incl. checkpointed path)") {
    // 9 steps > EncodeCheckpointEvery exercises encodeVocab's
    // lineage-cutting branch too
    val vocab = ("the quick brown fox jumps over the lazy dog and the cat" * 3)
      .split(' ').groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val df = vocab.toSeq.toDF("w", "freq")
    val (mergesDf, state) = BPE.trainMergesWithState(df, "w", "freq", steps = 9)
    val merges = BPE.collectMerges(mergesDf)
    assert(merges.size == 9 && merges.map(_.step) == (1 to 9))
    val enc = BPE.encodeVocab(df.select("w"), "w", merges)
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("w").collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toList)).toSeq
    assert(rows(enc) == rows(state),
      "re-applying the merge table must reproduce the trainer's final symbols")
  }

  test("encoding is lossless and applies to unseen words") {
    val merges = Seq(BPE.Merge(1, "t", "h"), BPE.Merge(2, "th", "e"), BPE.Merge(3, "a", "n"))
    val words = Seq("theater", "anthem", "", "x", "ththe").toDF("w")
    val out = BPE.encodeVocab(words, "w", merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    out.foreach { case (w, syms) =>
      assert(syms.mkString == w, s"lossless: $w")
      assert(syms.forall(_.nonEmpty), s"no empty symbols: $w")
    }
    assert(out("anthem") == List("an", "the", "m"))
    assert(out("theater") == List("the", "a", "t", "e", "r"))
    assert(out("ththe") == List("th", "the"), "greedy left-to-right, non-overlapping")
    assert(out("") == Nil)
  }

  test("tokenCounts: real per-doc BPE counts; blank docs count zero but STAY") {
    // Blank docs (empty or all-whitespace) must emit an n=0 ROW, not
    // vanish: the packing/budget operators consume this frame and their
    // row set must not depend on corpus hygiene. The oracle's bcnt CTE
    // LEFT JOINs documents for the same reason (Oracles.bpeCountCte) —
    // verified end-to-end against DuckDB on a blank-doc-injected corpus
    // (token_pack_bpe emits all 502 rows, hash-matched).
    val merges = Seq(BPE.Merge(1, "a", "b"))
    val docs = Seq((1L, "ab ab c"), (2L, "abc"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val out = BPE.tokenCounts(docs, "doc_id", "text", merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 2L), (3L, 0L), (4L, 0L)))
  }

  test("whitespace hygiene: doubled/leading/trailing spaces add no tokens") {
    // split(' ') yields empty words at every extra space; those must be
    // dropped (0 symbols), not counted — the oracle's string_split device
    // would give them 1 symbol, so this pins the engine-portable contract
    val merges = Seq(BPE.Merge(1, "a", "b"))
    val docs = Seq((1L, "ab  ab c"), (2L, " abc "), (3L, "ab ab c")).toDF("doc_id", "text")
    val counts = BPE.tokenCounts(docs, "doc_id", "text", merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(counts == Seq((1L, 3L), (2L, 2L), (3L, 3L)))
    val enc = BPE.encode(docs, "doc_id", "text", merges)
      .filter(col("word") === "").count()
    assert(enc == 0L, "no empty-word rows survive encode")
  }
}
