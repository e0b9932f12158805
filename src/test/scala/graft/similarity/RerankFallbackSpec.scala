package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The exact-rerank tail's |Q| bound (round 14): above
  * `maxBroadcastQueries` the shortlist sliver and the query-vector
  * table stop broadcasting and the rerank joins ride shuffle_hash on
  * their keys. Forcing the threshold to 0 must change ONLY the join
  * strategy — every family's ranked output is pinned identical, and
  * the physical plans are asserted to actually use the strategies the
  * bound selects (a silently-ignored hint would leave both paths
  * broadcasting and the bound would be decorative).
  */
class RerankFallbackSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def collectRanked(df: DataFrame): Seq[Seq[Any]] = df
    .select("query_id", "neighbor_id", "dot", "rank")
    .orderBy("query_id", "rank")
    .collect().map(_.toSeq).toSeq

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("BQ rerank: shuffle_hash fallback result == broadcast result") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    val codes = BQ.encode(corpus, "vec_id", "embedding")
    val bcast = BQ.searchRerank(codes, corpus, queries, "vec_id", "embedding",
      k = 5, shortlist = 16)
    val fall = BQ.searchRerank(codes, corpus, queries, "vec_id", "embedding",
      k = 5, shortlist = 16, maxBroadcastQueries = 0L)
    assert(collectRanked(bcast) == collectRanked(fall))
    assert(plan(bcast).contains("BroadcastHashJoin"))
    assert(plan(fall).contains("ShuffledHashJoin"))
  }

  test("PQ rerank: shuffle_hash fallback result == broadcast result") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16)
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
    val bcast = PQ.searchRerank(cb, codes, corpus, queries, "vec_id", "embedding",
      k = 5, shortlist = 16)
    val fall = PQ.searchRerank(cb, codes, corpus, queries, "vec_id", "embedding",
      k = 5, shortlist = 16, maxBroadcastQueries = 0L)
    assert(collectRanked(bcast) == collectRanked(fall))
    assert(plan(fall).contains("ShuffledHashJoin"))
  }

  test("IVFPQ rerank: shuffle_hash fallback result == broadcast result") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    val index = IVFPQ.build(corpus, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 16)
    val bcast = IVFPQ.search(index, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 4, shortlist = 16)
    val fall = IVFPQ.search(index, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 4, shortlist = 16, maxBroadcastQueries = 0L)
    assert(collectRanked(bcast) == collectRanked(fall))
    assert(plan(fall).contains("ShuffledHashJoin"))
  }

  test("IVFPQ salted fallback: result identical, salt key actually joins") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    val index = IVFPQ.build(corpus, "vec_id", "embedding",
      nlist = 2, m = 8, ksub = 16)
    val plain = IVFPQ.search(index, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 16, maxBroadcastQueries = 0L)
    val salted = IVFPQ.search(index, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 16, maxBroadcastQueries = 0L,
      saltBuckets = 4)
    assert(collectRanked(plain) == collectRanked(salted))
    // the salt must reach the physical shortlist join's EQUI-KEY list (a
    // salt column that survives only in a Project/Exchange would leave
    // "__salt" in the plan text while the exchange silently collapses
    // back to the nlist-bounded shape this knob exists to split)
    val shjKeyLines = plan(salted).linesIterator
      .filter(l => l.contains("ShuffledHashJoin") && l.contains("__list"))
      .toSeq
    assert(shjKeyLines.nonEmpty && shjKeyLines.forall(_.contains("__salt")),
      s"shortlist SHJ keys missing __salt:\n${shjKeyLines.mkString("\n")}")
    // salting the broadcast path is a no-op by construction
    val bsalt = IVFPQ.search(index, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 16, saltBuckets = 4)
    assert(collectRanked(plain) == collectRanked(bsalt))
    assert(!plan(bsalt).contains("__salt"))
  }

  test("auto salt (default 0) engages in the capped regime, stays neutral otherwise") {
    // shared test session is local[4]: defaultParallelism = 4
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    // tiny nlist (2 < 4 cores) + forced fallback: auto derives
    // ceil(4*4/2) = 8 buckets — the salt reaches the physical join keys
    // and the output equals an explicitly tuned salt
    val tiny = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 2, m = 8, ksub = 16)
    val tuned = IVFPQ.search(tiny, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 16, maxBroadcastQueries = 0L, saltBuckets = 4)
    val auto = IVFPQ.search(tiny, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, shortlist = 16, maxBroadcastQueries = 0L)
    assert(collectRanked(auto) == collectRanked(tuned))
    val autoKeys = plan(auto).linesIterator
      .filter(l => l.contains("ShuffledHashJoin") && l.contains("__list")).toSeq
    assert(autoKeys.nonEmpty && autoKeys.forall(_.contains("__salt")),
      s"IVFPQ auto salt missing from SHJ keys:\n${autoKeys.mkString("\n")}")
    // production-shaped nlist (4 >= 4 cores): the auto stays at 1 and the
    // fallback plan is byte-for-byte the unsalted shape
    val wide = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 4, m = 8, ksub = 16)
    val neutral = IVFPQ.search(wide, corpus, queries, "vec_id", "embedding",
      k = 5, nprobe = 4, shortlist = 16, maxBroadcastQueries = 0L)
    assert(!plan(neutral).contains("__salt"))
    // the IVF rung mirrors both behaviors
    val ivfTiny = IVF.build(corpus, "vec_id", "embedding", nlist = 2)
    val ivfTuned = IVF.search(ivfTiny, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, saltBuckets = 2, maxBroadcastQueries = 0L)
    val ivfAuto = IVF.search(ivfTiny, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, maxBroadcastQueries = 0L)
    assert(collectRanked(ivfAuto) == collectRanked(ivfTuned))
    val ivfKeys = plan(ivfAuto).linesIterator
      .filter(l => l.contains("ShuffledHashJoin") && l.contains("__list")).toSeq
    assert(ivfKeys.nonEmpty && ivfKeys.forall(_.contains("__salt")),
      s"IVF auto salt missing from SHJ keys:\n${ivfKeys.mkString("\n")}")
    val ivfWide = IVF.build(corpus, "vec_id", "embedding", nlist = 4)
    val ivfNeutral = IVF.search(ivfWide, queries, "vec_id", "embedding",
      k = 5, nprobe = 4, maxBroadcastQueries = 0L)
    assert(!plan(ivfNeutral).contains("__salt"))
    // broadcast-sized batch under a tiny nlist: auto must NOT salt (the
    // probed side broadcasts; there is no capped exchange to split)
    val ivfBcast = IVF.search(ivfTiny, queries, "vec_id", "embedding",
      k = 5, nprobe = 2)
    assert(collectRanked(ivfBcast) == collectRanked(ivfAuto))
    assert(!plan(ivfBcast).contains("__salt"))
  }

  test("IVF salted search: result identical, salt key actually joins") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    val index = IVF.build(corpus, "vec_id", "embedding", nlist = 2)
    val plain = IVF.search(index, queries, "vec_id", "embedding",
      k = 5, nprobe = 2)
    val salted = IVF.search(index, queries, "vec_id", "embedding",
      k = 5, nprobe = 2, saltBuckets = 4)
    assert(collectRanked(plain) == collectRanked(salted))
    // as in the IVFPQ twin above: the salt must reach the physical probe
    // join's EQUI-KEY list, not merely survive in a projection while the
    // exchange collapses back to the nlist-bounded shape
    val shjKeyLines = plan(salted).linesIterator
      .filter(l => l.contains("ShuffledHashJoin") && l.contains("__list"))
      .toSeq
    assert(shjKeyLines.nonEmpty && shjKeyLines.forall(_.contains("__salt")),
      s"IVF probe SHJ keys missing __salt:\n${shjKeyLines.mkString("\n")}")
    assert(!plan(plain).contains("__salt"))
  }
}
