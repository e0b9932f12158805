package graft.text

import graft.SparkSpec

class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  // word codes with buckets = 1024 (no wrap for short words):
  // 'x' -> 1*96+120 = 216, 'yy' -> 2*96+121 = 313, 'zzz' -> 3*96+122 = 410
  private val docs = Seq(
    (1L, "x yy x"),   // 5 + (-2) + 5 = 8 -> keep
    (2L, "zzz zzz"),  // -7 -7 = -14 -> drop
    (3L, "x qq"))     // 5 + miss(0) = 5 -> keep
    .toDF("doc_id", "text")
  private val weights = Seq((216L, 5L), (313L, -2L), (410L, -7L))
    .toDF("feature", "weight")

  test("logit is the sum of hashed-feature weights; misses score 0") {
    val out = LinearModel.score(docs, "doc_id", "text", weights,
        "feature", "weight", buckets = 1024)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 8L, true),
      (2L, 2L, -14L, false),
      (3L, 2L, 5L, true)))
  }

  test("feature hashing wraps word codes into the bucket space") {
    // buckets = 10: 'x' -> 216 % 10 = 6, 'zzz' -> 410 % 10 = 0
    val w = Seq((6L, 3L), (0L, -1L)).toDF("feature", "weight")
    val out = LinearModel.score(docs, "doc_id", "text", w,
        "feature", "weight", buckets = 10)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // 'yy' -> 313 % 10 = 3 (miss), 'qq' -> 2*96+113 = 305 % 10 = 5 (miss)
    assert(out.map(r => (r._1, r._3)) == Seq((1L, 6L), (2L, -2L), (3L, 3L)))
  }

  test("the weights join is a broadcast, not a shuffle") {
    val plan = LinearModel.score(docs, "doc_id", "text", weights,
        "feature", "weight", buckets = 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("hashWeights is deterministic and bounded to [-8, 8]") {
    val w = LinearModel.hashWeights(docs, 1024)
      .as[(Long, Long)].collect().toMap
    assert(w.size == 1024)
    assert(w.values.forall(v => v >= -8 && v <= 8))
    assert(w.values.toSet.size > 1) // not degenerate
  }

  // a linearly separable corpus: label-1 docs speak 'x', label-0 docs
  // speak 'zzz' (distinct buckets), so one perceptron round must solve it
  private val labeled = Seq(
    (1L, "x x x", 1L), (2L, "x x", 1L), (3L, "zzz zzz zzz", 0L),
    (4L, "zzz", 0L), (5L, "x zzz x", 1L))
    .toDF("doc_id", "text", "label")

  test("train learns a separating weight vector; train -> infer round-trips") {
    val w = LinearModel.train(labeled, "doc_id", "text", "label", buckets = 1024)
    val wm = w.as[(Long, Long)].collect().toMap
    assert(wm.size == 1024, "dense weight table")
    assert(wm(216L) > 0 || wm(216L) == 0, "'x' never penalized below zero-keep")
    assert(wm(410L) < 0, "'zzz' learned negative")
    val scored = LinearModel
      .score(labeled, "doc_id", "text", w, "feature", "weight", buckets = 1024)
      .orderBy("doc_id").select("doc_id", "keep").as[(Long, Boolean)].collect()
    val want = labeled.orderBy("doc_id").select("doc_id", "label")
      .as[(Long, Long)].collect().map { case (d, y) => (d, y == 1L) }
    assert(scored.toSeq == want.toSeq, "perfect training accuracy on a separable corpus")
  }

  test("training is invariant to input partitioning") {
    val a = LinearModel.train(labeled, "doc_id", "text", "label", buckets = 64)
      .orderBy("feature").as[(Long, Long)].collect().toSeq
    val b = LinearModel.train(labeled.repartition(7), "doc_id", "text", "label",
        buckets = 64)
      .orderBy("feature").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("weights persist and reload byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    val w = LinearModel.train(labeled, "doc_id", "text", "label", buckets = 64)
    LinearModel.saveWeights(w, s"$dir/w")
    val back = LinearModel.loadWeights(spark, s"$dir/w")
      .orderBy("feature").as[(Long, Long)].collect().toSeq
    assert(back == w.orderBy("feature").as[(Long, Long)].collect().toSeq)
  }
}
