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
}
