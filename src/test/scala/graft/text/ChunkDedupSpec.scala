package graft.text

import graft.SparkSpec

class ChunkDedupSpec extends SparkSpec {
  import spark.implicits._

  test("corpus-global keep-first over fixed-width chunks, docs re-assembled") {
    val docs = Seq(
      (1L, "a b c d a b"), // chunk "a b" repeats within the doc
      (2L, "c d x"),       // "c d" already seen in doc 1
      (3L, "a b"))         // fully duplicated -> empty survivor
      .toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "x"),
      (3L, 1L, 0L, "")))
  }

  test("first occurrence is ordered by (doc id, chunk index)") {
    val docs = Seq((5L, "z z q q"), (4L, "q q z z")).toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 4 wins both chunks; doc 5 keeps nothing
    assert(out == Seq((4L, 2L, 2L, "q q z z"), (5L, 2L, 0L, "")))
  }

  test("a short tail chunk is its own unit") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 tail chunk "c" claims the text; doc 2's whole text is that chunk
    assert(out == Seq((1L, 2L, 2L, "a b c"), (2L, 1L, 0L, "")))
  }

  test("string doc ids take the struct-min fallback, ordered lexicographically") {
    // "a10" < "a2" lexicographically even though 10 > 2 numerically — the
    // keep-first winner must follow STRING order, proving the generic
    // struct path (not the integral decimal encoding) is in effect
    val docs = Seq(("a2", "q q z z"), ("a10", "z z q q")).toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id")
      .as[(String, Long, Long, String)].collect().toSeq
    // doc "a10" wins both chunks; "a2" keeps nothing
    assert(out == Seq(("a10", 2L, 2L, "z z q q"), ("a2", 2L, 0L, "")))
  }

  test("negative integral ids keep the exact (id, idx) order on the decimal path") {
    val docs = Seq((-5L, "z z q q"), (3L, "q q z z")).toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // -5 precedes 3, so it wins both chunks
    assert(out == Seq((-5L, 2L, 2L, "z z q q"), (3L, 2L, 0L, "")))
  }
}
