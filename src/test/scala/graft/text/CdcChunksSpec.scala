package graft.text

import graft.SparkSpec

class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  test("unique corpus survives intact (n_kept == n_chunks, text round-trips)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = ChunkDedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    out.zip(Seq("alpha beta gamma delta epsilon zeta",
      "one two three four five six seven eight")).foreach {
      case ((_, nChunks, nKept, dedup), orig) =>
        assert(nChunks == nKept)
        assert(dedup == orig)
    }
  }

  test("an exact duplicate document is fully dropped") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = ChunkDedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0)._3 == out(0)._2) // doc 1 keeps everything
    assert(out(1)._3 == 0L && out(1)._4 == "") // doc 2 loses everything
  }

  test("boundaries re-synchronize after a prefix insertion (the CDC point)") {
    // doc 2 is doc 1 with one junk token prepended: fixed-width chunking
    // shifts every frame and keeps almost all of doc 2; CDC re-cuts only
    // until the first content boundary and dedups the rest
    val base = (1 to 200).map(i => s"tok${i % 67}v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"zzz $base")).toDF("doc_id", "text")

    val cdc = ChunkDedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val fixed = ChunkDedup.dedupChunks(docs, "doc_id", "text", chunkTokens = 16)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

    val cdcKeptFrac = cdc(1)._3.toDouble / cdc(1)._2
    val fixedKeptFrac = fixed(1)._3.toDouble / fixed(1)._2
    assert(cdcKeptFrac < 0.5,
      s"CDC should dedup most of the shifted duplicate, kept $cdcKeptFrac")
    assert(fixedKeptFrac > 0.5,
      s"fixed-width should mostly MISS the shifted duplicate, kept $fixedKeptFrac")
  }

  test("chunk ids partition the token stream in order") {
    val docs = Seq((9L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = ChunkDedup.cdcChunks(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().head
    // unique doc: reassembly must reproduce the original token order
    assert(out._4 == (1 to 50).map(i => s"w$i").mkString(" "))
  }
}
