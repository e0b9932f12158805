package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9 retrieval/finisher queries beyond
  * their DuckDB oracle pins. */
class QueriesFinisherSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("cluster_best: every component has exactly one representative") {
    val out = Queries.clusterBest(spark, dir).cache()
    val perComp = out.groupBy("component")
      .agg(sum(when(col("is_rep"), 1L).otherwise(0L)).as("n_reps"))
    assert(perComp.filter(col("n_reps") =!= 1L).count() == 0)
    // the representative carries the component's max score
    val best = out.groupBy("component").agg(max("score").as("max_score"))
    val bad = out.filter(col("is_rep"))
      .join(best, "component")
      .filter(col("score") =!= col("max_score"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("cluster_best covers every document exactly once") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = Queries.clusterBest(spark, dir)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
  }

  test("dsir_weights separates the target language from the rest") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val scored = Queries.dsirWeights(spark, dir).join(docs, "doc_id")
      .groupBy("lang").agg(avg(col("score_millis")).as("mean_score"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scored("en") > 0, s"target slice should score positive: $scored")
    (scored - "en").foreach { case (lang, m) =>
      assert(m < scored("en"), s"$lang should score below the en target: $scored")
    }
  }

  test("bm25_topk: ranks are dense from 1 and scores non-increasing") {
    val out = Queries.bm25TopK(spark, dir).cache()
    assert(out.filter(col("doc_id") === col("query_id")).count() == 0)
    val rows = out.orderBy("query_id", "rank")
      .select("query_id", "rank", "score_millis")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).toSeq
      assert(ranks == (1L to ranks.size))
      val scores = rs.map(_.getLong(2)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not monotone: $scores")
    }
    out.unpersist()
  }
}
