package graft.text

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a repeated span is excised whole from the later document") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),       // owns the span
      (2L, "x a b c d e f g h i j y"))   // 10-token repeat, k=4 anchors
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // every anchor of the repeated span in doc 2 is redundant; the union of
    // their 4-token windows covers all 10 tokens — maximal-span removal
    assert(out == Seq(
      (1L, 10L, 0L, "a b c d e f g h i j"),
      (2L, 12L, 10L, "x y")))
  }

  test("sub-anchor repeats survive; docs shorter than k pass through") {
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r z"),  // only a 3-token overlap at k=4 -> untouched
      (3L, "p q"))      // shorter than k -> no anchors at all
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 6L, 0L, "p q r s t u"),
      (2L, 4L, 0L, "p q r z"),
      (3L, 2L, 0L, "p q")))
  }

  test("within-doc repetition keeps only the first occurrence") {
    val docs = Seq((7L, "a b c d a b c d")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((7L, 8L, 4L, "a b c d")))
  }

  test("a gram over the occurrence cap is excised everywhere, first copy included") {
    val docs = Seq(
      (1L, "h o t g r a m x"),   // first occurrence of the hot 4-gram
      (2L, "y h o t g z"),       // second
      (3L, "h o t g"),           // third -> occ 3 > cap 2: boilerplate
      (4L, "u n i q u e"))       // untouched control
      .toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4,
        maxGramDf = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // "h o t g" occurs 3 times; the cap removes ALL of them (doc 1's first
    // copy included), while keep-first alone would have spared doc 1
    assert(out == Seq(
      (1L, 8L, 4L, "r a m x"),
      (2L, 6L, 4L, "y z"),
      (3L, 4L, 4L, ""),
      (4L, 6L, 0L, "u n i q u e")))
    // with the cap off, semantics stay exactly keep-first
    val uncapped = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(uncapped.head == ((1L, 8L, 0L, "h o t g r a m x")))
  }

  test("hashed-gram path matches the exact-text path") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x a b c d e f g h i j y"),
      (3L, "q r s t"),
      (4L, "a b c d a b c d e f"))
      .toDF("doc_id", "text")
    val exact = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id").collect().toSeq
    val hashed = SpanDedup.dedupSpans(docs, "doc_id", "text", gramTokens = 4,
        hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(exact == hashed)
  }

  test("exciseAgainst removes only reference-matched spans; persisted grams round-trip") {
    val ref = Seq((100L, "m n o p q")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "z z m n o p q z"),    // ref anchors cover "m n o p q" -> excised
      (2L, "w x w x w x w x"))    // batch-internal repeat, NOT ref-matched
      .toDF("doc_id", "text")
    val grams = SpanDedup.referenceGrams(ref, "doc_id", "text", gramTokens = 4)
    val out = SpanDedup.exciseAgainst(docs, grams, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 loses the 5 ref positions; doc 2 keeps its internal repeats —
    // exciseAgainst is cross-corpus only (dedupSpans handles within-batch)
    assert(out == Seq(
      (1L, 8L, 5L, "z z z"),
      (2L, 8L, 0L, "w x w x w x w x")))
    // the gram set survives a parquet round-trip unchanged
    val dir = java.nio.file.Files.createTempDirectory("grams").toString + "/g"
    SpanDedup.saveGrams(grams, dir)
    val reloaded = SpanDedup.loadGrams(spark, dir)
    val out2 = SpanDedup.exciseAgainst(docs, reloaded, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out2 == out)
  }

  test("the reference-gram join is broadcast when asked, shuffle-hash otherwise") {
    val ref = Seq((100L, "m n o p q")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "z z m n o p q z"),
      (2L, "w x w x w x w x")).toDF("doc_id", "text")
    val grams = SpanDedup.referenceGrams(ref, "doc_id", "text", gramTokens = 4)

    def planOf(broadcastRef: Boolean): String =
      SpanDedup.exciseAgainst(docs, grams, "doc_id", "text",
        gramTokens = 4, broadcastRef = broadcastRef)
        .queryExecution.executedPlan.toString

    val bPlan = planOf(broadcastRef = true)
    assert(bPlan.contains("BroadcastHashJoin"),
      "broadcastRef = true must pin the gram set as a broadcast build side")
    val sPlan = planOf(broadcastRef = false)
    assert(sPlan.contains("ShuffledHashJoin"),
      "broadcastRef = false must keep a sort-free shuffle-hash join")
    assert(!sPlan.contains("SortMergeJoin"),
      "the crawl-sized-reference fallback must never sort the probe side")
    // both shapes produce the identical answer
    def rows(broadcastRef: Boolean) =
      SpanDedup.exciseAgainst(docs, grams, "doc_id", "text",
        gramTokens = 4, broadcastRef = broadcastRef)
        .orderBy("doc_id").collect().toSeq
    assert(rows(broadcastRef = true) == rows(broadcastRef = false))
  }

  test("the benchmark-gram join in contaminationSpans is broadcast by default") {
    val bench = Seq((100L, "m n o p q")).toDF("doc_id", "text")
    val docs = Seq((1L, "z z m n o p q z")).toDF("doc_id", "text")
    val bPlan = SpanDedup.contaminationSpans(docs, bench, "doc_id", "text",
        gramTokens = 4)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      "the eval-suite gram set must broadcast so the corpus side never shuffles")
    val sPlan = SpanDedup.contaminationSpans(docs, bench, "doc_id", "text",
        gramTokens = 4, broadcastBench = false)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("ShuffledHashJoin") && !sPlan.contains("SortMergeJoin"),
      "the huge-benchmark fallback must be the sort-free shuffle-hash shape")
    // the fallback shape computes the same report
    val a = SpanDedup.contaminationSpans(docs, bench, "doc_id", "text", gramTokens = 4)
      .orderBy("doc_id").collect().toSeq
    val b = SpanDedup.contaminationSpans(docs, bench, "doc_id", "text",
        gramTokens = 4, broadcastBench = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("contamination spans count covered positions against a benchmark") {
    val bench = Seq((100L, "m n o p q")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "z z m n o p q z"),  // anchors "m n o p" and "n o p q" -> 5 covered
      (2L, "m n o z z z z"))    // only a 3-token overlap -> clean
      .toDF("doc_id", "text")
    val out = SpanDedup.contaminationSpans(docs, bench, "doc_id", "text",
        gramTokens = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 8L, 5L), (2L, 7L, 0L)))
  }
}
