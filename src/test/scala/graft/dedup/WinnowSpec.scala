package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing: the SIGMOD'03 guarantee is that any shared token run of at
  * least w + shingleWidth - 1 tokens (4 + 3 - 1 = 6 here) yields at least
  * one identical fingerprint in both documents.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Unique tokens with DIVERSE word codes (first char and length both
    * pseudo-randomly spread): wordCode = length*96 + ascii(first), so
    * same-first-letter same-length tokens collide and degenerate the
    * window minima into long tie runs. */
  private def uniqueTokens(prefix: String, n: Int): String =
    (1 to n).map { i =>
      val h = (i * 2654435761L + 104729L) % 1000003L
      s"${('a' + (h % 26)).toChar}$prefix$i${"z" * ((h / 26) % 6).toInt}"
    }.mkString(" ")

  test("a planted 10-token shared run is always caught (local-overlap guarantee)") {
    val run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, s"${uniqueTokens("aa", 30)} $run ${uniqueTokens("ab", 30)}"),
      (2L, s"${uniqueTokens("ba", 25)} $run ${uniqueTokens("bb", 35)}"),
      (3L, uniqueTokens("cc", 70))) // no overlap with anyone
      .toDF("doc_id", "text")
    val pairs = Winnow.pairs(docs, "doc_id", "text", w = 4, minShared = 1L)
      .select("id_1", "id_2", "n_shared").as[(Long, Long, Long)].collect()
    val shared12 = pairs.collectFirst { case (1L, 2L, n) => n }
    assert(shared12.nonEmpty, "the planted run must produce a shared fingerprint")
    // the weak 2-feature word code CAN collide doc 3 into a stray shared
    // hash; the planted run must still dominate any accidental overlap
    val stray = pairs.collect { case (a, b, n) if a == 3L || b == 3L => n }
    assert(stray.forall(_ < shared12.get),
      s"accidental overlap $stray should stay below the planted run ${shared12.get}")
  }

  test("the fingerprint sketch is denser than 0 but sparser than the shingle set") {
    val docs = Seq((1L, uniqueTokens("w", 200))).toDF("doc_id", "text")
    val nFp = Winnow.fingerprints(docs, "doc_id", "text", w = 4).count()
    val nShingles = 198L // 200 tokens -> n-2 shingles
    assert(nFp > 0)
    assert(nFp < nShingles / 2,
      s"winnowing should thin the sketch (expected density ~2/(w+1)), got $nFp/$nShingles")
  }

  test("fingerprint positions point at the window minimum") {
    val docs = Seq((1L, uniqueTokens("t", 40))).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", w = 4)
      .select("pos", "fp").as[(Long, Long)].collect()
    val sh = docs.select(
      MinHash.shinglesFromCodes(
        graft.text.Text.wordCodes(col("text"))).as("sh"))
      .as[Seq[Long]].collect().head
    fps.foreach { case (pos, fp) =>
      assert(sh(pos.toInt - 1) == fp, s"pos $pos does not hold fp $fp")
    }
  }

  test("robust winnowing bounds density on constant content; plain does not") {
    // 150 identical tokens: every shingle hash is equal, so every window
    // of the plain variant charts a fresh leftmost position
    val docs = Seq((1L, Seq.fill(150)("aaaa").mkString(" "))).toDF("doc_id", "text")
    val nSh = 148L
    val plain = Winnow.fingerprints(docs, "doc_id", "text", w = 4).count()
    val robust = Winnow.robustFingerprints(docs, "doc_id", "text", w = 4).count()
    assert(plain > nSh * 9 / 10, s"plain should degenerate to ~1 density, got $plain/$nSh")
    assert(robust <= nSh / 4 + 1, s"robust should charter ~1/w, got $robust/$nSh")
  }

  test("robust == plain on tie-free content") {
    val docs = Seq(
      (1L, uniqueTokens("pa", 120)),
      (2L, uniqueTokens("pb", 80))).toDF("doc_id", "text")
    def dedupWindows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "pos", "fp")
      .as[(Long, Long, Long)].collect().toSet
    val plain = dedupWindows(Winnow.fingerprints(docs, "doc_id", "text", w = 4))
    val robust = dedupWindows(Winnow.robustFingerprints(docs, "doc_id", "text", w = 4))
    // identical when every window minimum is unique in its window
    assert(robust == plain)
  }

  test("docs under 3 tokens are excluded, short docs keep their global min") {
    val docs = Seq((1L, "a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", w = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(!fps.contains(1L))
    assert(fps.count(_ == 2L) == 1) // 2 shingles < w -> single global-min fp
  }
}
