package graft.similarity

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generator-driven pin of the auto-salt derive rule
  * ([[Similarity.autoSaltBuckets]], the `saltBuckets = 0` default of
  * [[IVF.search]] / [[IVFPQ.search]]): over random (par, nlist,
  * broadcastable) triples the auto must be 1 EXACTLY when the probed
  * exchange is not genuinely capped (nlist >= par, or the query batch
  * broadcasts), and `ceil(4 * par / nlist)` buckets otherwise — plus the
  * laziness contract (the broadcastability probe, a `queries.count()`
  * Spark job in IVF's caller, must not be evaluated when nlist >= par
  * already decides) and setting-invariance of actual search results on a
  * tiny corpus across auto / unsalted / tuned-salt settings.
  * RerankFallbackSpec pins the fixed points (engage / neutral /
  * broadcast + plan markers); this suite protects the formula itself
  * from a future edit. */
class AutoSaltPropertySpec extends SparkSpec {

  test("auto == 1 iff uncapped; else ceil(4*par/nlist); probe lazy when cores decide") {
    val prop = Prop.forAll(
      Gen.choose(1, 256), Gen.choose(1, 512), Gen.oneOf(true, false)) {
      (par, nlist, bcast) =>
        var probed = false
        val auto = Similarity.autoSaltBuckets(par, nlist, { probed = true; bcast })
        val expected =
          if (nlist >= par || bcast) 1
          else ((4L * par + nlist - 1) / nlist).toInt
        val rule = auto == expected
        // engaged buckets are a real split: nlist < par makes 4*par/nlist > 4
        val engaged = (nlist >= par || bcast) || auto > 4
        // the by-name probe runs ONLY when the core count leaves the
        // question open — nlist >= par must skip the count job entirely
        val lazyProbe = if (nlist >= par) !probed else probed
        rule && engaged && lazyProbe
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def ranked(df: DataFrame): Seq[Seq[Any]] = df
    .select("query_id", "neighbor_id", "rank")
    .orderBy("query_id", "rank")
    .collect().map(_.toSeq).toSeq

  test("IVF + IVFPQ search results are salt-setting-invariant on a tiny corpus") {
    val corpus = emb.limit(64)
    val queries = corpus.filter(col("vec_id") < 4)
    // nlist 2 < 4 test cores: the capped regime where the settings differ
    val ivf = IVF.build(corpus, "vec_id", "embedding", nlist = 2)
    val ivfRuns = Seq(0, 1, 3, 7).map(s =>
      ranked(IVF.search(ivf, queries, "vec_id", "embedding", k = 5, nprobe = 2,
        saltBuckets = s, maxBroadcastQueries = 0L)))
    assert(ivfRuns.distinct.size == 1,
      "IVF results must be identical across auto/unsalted/tuned salts")
    val ivfpq = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 2, m = 8, ksub = 16)
    val ivfpqRuns = Seq(0, 1, 3, 7).map(s =>
      ranked(IVFPQ.search(ivfpq, corpus, queries, "vec_id", "embedding",
        k = 5, nprobe = 2, shortlist = 16, saltBuckets = s,
        maxBroadcastQueries = 0L)))
    assert(ivfpqRuns.distinct.size == 1,
      "IVFPQ results must be identical across auto/unsalted/tuned salts")
  }
}
