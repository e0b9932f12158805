package graft.similarity

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1f, 0f)),      // centroid of list 0
    (1L, Array(0f, 1f)),      // centroid of list 1
    (2L, Array(1f, 0.001f)),  // list 0, near-dup of 0
    (3L, Array(0f, 1f)),      // list 1, exact dup of 1
    (4L, Array(-1f, 0f)))     // list 1 (dot 0 beats -1e6), no twin above threshold
    .toDF("vec_id", "embedding")

  test("smaller-id twin in the same cluster drops the vector") {
    val out = SemanticDedup.prune(emb, "vec_id", "embedding", nlist = 2, minDot = 900000L)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => r._1 -> r._3).toMap ==
      Map(0L -> true, 1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("an unreachable threshold keeps everything") {
    val out = SemanticDedup.prune(emb, "vec_id", "embedding", nlist = 2,
        minDot = Long.MaxValue)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._3))
  }
}
