package graft.text

import graft.SparkSpec

/** Repetition signals on crafted documents: the oracle corpus has no
  * repeated 5-grams (random words), so the coverage-union path is pinned
  * here — overlap never double-bills, chained repeats union, ties break
  * to the smallest gram. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: (Long, String)*): Map[Long, (Long, Long, String, Long, Long, Long)] =
    Repetition.signals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("top bigram: count, char fraction, and smallest-gram tie-break") {
    val out = run(
      (1L, "x y x y x y"), // "x y" x3 beats "y x" x2; 3*2 chars of 6
      (2L, "b c b c a a a")) // tie "b c" x2 vs "a a" x2 -> "a a" wins
    assert(out(1L) == ((6L, 6L, "x y", 3L, 10000L, 0L)))
    val (n2, l2, g2, c2, bp2, _) = out(2L)
    assert((n2, l2, g2, c2) == ((7L, 7L, "a a", 2L)))
    assert(bp2 == 2L * 2 * 10000 / 7)
  }

  test("duplicate 5-gram coverage: chained repeats union to full cover") {
    // "a b c d e" occurs at positions 1, 6, 11 -> every position covered
    val out = run((1L, "a b c d e a b c d e a b c d e"))
    assert(out(1L)._6 == 10000L)
  }

  test("coverage counts overlapping duplicated grams' positions ONCE") {
    // 6 a's: the 5-gram "a a a a a" occurs at p1 and p2 (count 2);
    // covered = union(1..5, 2..6) = all 6 chars, not 10
    val out = run((1L, "a a a a a a"))
    assert(out(1L)._6 == 10000L)
    // and a doc with a single occurrence of every 5-gram covers nothing
    val none = run((2L, "q w e r t y u"))
    assert(none(2L)._6 == 0L)
  }

  test("short and empty documents report zeros and a null top gram") {
    val out = run((1L, "solo"), (2L, ""))
    assert(out(1L) == ((1L, 4L, null, 0L, 0L, 0L)))
    assert(out(2L) == ((1L, 0L, null, 0L, 0L, 0L)))
  }
}
