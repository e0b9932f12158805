package graft.similarity

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (1L, Array(0.0f, 0.0f), 0),
    (2L, Array(0.01f, 0.0f), 0),
    (3L, Array(1.0f, 1.0f), 0), // far from group 0's center
    (4L, Array(5.0f, 5.0f), 1),
    (5L, Array(5.0f, 5.02f), 1))
    .toDF("vec_id", "embedding", "label")

  test("the farthest vector from its group centroid is flagged") {
    val out = Outliers.byCentroid(emb, "vec_id", "embedding", "label", topK = 1)
      .orderBy("vec_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // group 0 centroid on the quantized grid: (1010/3, 1000/3) = (336, 333);
    // group 1 is a distance tie (100 each), broken by the smaller vec_id
    assert(out.map(r => (r._1, r._4)) ==
      Seq((1L, false), (2L, false), (3L, true), (4L, true), (5L, false)))
    val dists = out.map(r => r._1 -> r._3).toMap
    assert(dists(3L) == 664L * 664 + 667L * 667)
  }

  test("every group flags exactly topK members when large enough") {
    val out = Outliers.byCentroid(emb, "vec_id", "embedding", "label", topK = 2)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val flagged = out.filter(_._4).groupBy(_._2).view.mapValues(_.size).toMap
    assert(flagged == Map(0L -> 2, 1L -> 2))
  }

  test("a string group column groups as itself and keeps its type") {
    val byLang = Seq(
      (1L, Array(0.0f, 0.0f), "en"),
      (2L, Array(0.01f, 0.0f), "en"),
      (3L, Array(1.0f, 1.0f), "en"),
      (4L, Array(5.0f, 5.0f), "de"),
      (5L, Array(5.0f, 5.02f), "de"))
      .toDF("vec_id", "embedding", "lang")
    val out = Outliers.byCentroid(byLang, "vec_id", "embedding", "lang", topK = 1)
      .orderBy("vec_id")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    // same geometry as the numeric fixture: were the group column cast to
    // long (the pre-fix behavior), both languages would collapse into one
    // null group and 'de' would flag nothing
    assert(out.map(r => (r._1, r._2, r._4)) == Seq(
      (1L, "en", false), (2L, "en", false), (3L, "en", true),
      (4L, "de", true), (5L, "de", false)))
  }

  test("the centroid re-join is broadcast, not a shuffle join") {
    val plan = Outliers.byCentroid(emb, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
