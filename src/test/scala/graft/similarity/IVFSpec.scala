package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF ANN: exhaustive probing equals brute force; partial probing returns
  * a ranked subset.
  */
class IVFSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("nprobe = nlist is exactly brute force") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx = IVF.build(corpus, "vec_id", "embedding", nlist = 8)
    val ivf = IVF.search(idx, queries, "vec_id", "embedding", k = 10, nprobe = 8)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(ivf == bf)
  }

  test("Lloyd refinement keeps exhaustive search exact and balances lists") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx0 = IVF.build(corpus, "vec_id", "embedding", nlist = 8)
    val idx2 = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = 2)
    // exactness at nprobe = nlist is independent of centroid quality
    val a = IVF.search(idx2, queries, "vec_id", "embedding", k = 10, nprobe = 8)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val b = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(a == b)
    // refinement must not grow the largest list (it rebalances toward the
    // data's actual clusters); both indexes cover all 200 vectors
    def sizes(i: IVF.Index) = i.assigned.groupBy("__list").count()
      .collect().map(_.getLong(1))
    assert(sizes(idx2).sum == 200 && sizes(idx0).sum == 200)
    assert(sizes(idx2).max <= sizes(idx0).max)
  }

  test("spherical refinement keeps centroids on the quantized unit sphere") {
    val corpus = emb.limit(200)
    val spherical = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = 1)
    val plain = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = 1,
      spherical = false)
    def norms(i: IVF.Index) =
      i.centroids.map(c => math.sqrt(c.map(x => (x * x).toDouble).sum))
    // rescaled centroids sit within a floor-rounding of QuantScale; the
    // plain Lloyd means visibly shrink (the max-dot bias the rescale fixes)
    val qs = graft.text.Hashing.QuantScale.toDouble
    assert(norms(spherical).forall(n => n > qs * 0.98 && n < qs * 1.02))
    assert(norms(plain).min < qs * 0.9)
  }

  test("successive Lloyd rounds improve the quantizer objective and hold recall") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    // spherical k-means objective: total assigned dot (higher = tighter
    // lists). Deterministic build -> these relations are pinned, not flaky.
    def objective(iters: Int): Long = {
      val idx = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = iters)
      val cents = idx.centroids
      idx.assigned.select(col("__v"), col("__list")).collect().map { r =>
        val v = r.getSeq[Long](0)
        val c = cents(r.getLong(1).toInt)
        v.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum
      }.sum
    }
    val (o0, o1, o2) = (objective(0), objective(1), objective(2))
    assert(o1 > o0, s"round 1 must improve the objective: $o1 vs $o0")
    assert(o2 >= o1, s"round 2 must not regress the objective: $o2 vs $o1")
    // partial-probe recall vs brute force must not degrade with the extra
    // round (the claim ann_recall makes for the 1-round production build)
    def recall(iters: Int): Long = {
      val idx = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = iters)
      val approx = IVF.search(idx, queries, "vec_id", "embedding", k = 10, nprobe = 2)
        .select("query_id", "neighbor_id")
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
        .join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
    }
    val (r1, r2) = (recall(1), recall(2))
    assert(r2 >= r1, s"the second Lloyd round must not lose recall: $r2 vs $r1")
  }

  test("persisted index round-trips: load-then-search == inline search; encodeNew matches") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx = IVF.build(corpus, "vec_id", "embedding", nlist = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfindex").toString
    IVF.saveIndex(idx, dir)
    val loaded = IVF.loadIndex(spark, dir)
    // the coarse quantizer survives bit for bit
    assert(loaded.centroids.length == idx.centroids.length)
    idx.centroids.indices.foreach { l =>
      assert(java.util.Arrays.equals(loaded.centroids(l), idx.centroids(l)))
    }
    // the assignment table survives row for row
    def rows(i: IVF.Index) = i.assigned
      .select(col("__id"), col("__list"), col("__v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList)).toSet
    assert(rows(loaded) == rows(idx))
    // search over the loaded index is the search over the built one
    def run(i: IVF.Index) =
      IVF.search(i, queries, "vec_id", "embedding", k = 10, nprobe = 3)
        .select("query_id", "neighbor_id", "dot", "rank")
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(run(loaded) == run(idx))
    // a refresh encodes NEW vectors against the loaded centroids only,
    // and re-encoding already-indexed vectors reproduces their rows
    val fresh = emb.filter(col("vec_id").between(200, 249))
    val freshRows = IVF.encodeNew(loaded.centroids, fresh, "vec_id", "embedding")
    assert(freshRows.count() == fresh.count())
    val reRows = IVF.encodeNew(loaded.centroids, corpus, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getSeq[Long](1).toList)).toSet
    assert(reRows == rows(idx).map { case (i, l, v) => (i, l, v) })
  }

  test("nprobe = 1 returns k results from the probed list, ranked") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") === 0)
    val idx = IVF.build(corpus, "vec_id", "embedding", nlist = 8)
    val out = IVF.search(idx, queries, "vec_id", "embedding", k = 5, nprobe = 1)
      .orderBy("rank").collect()
    assert(out.nonEmpty && out.length <= 5)
    // ranks are 1..n and dots non-increasing
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length))
    val dots = out.map(_.getAs[Long]("dot")).toSeq
    assert(dots == dots.sorted.reverse)
    // a partial probe never invents results: every pair appears in brute force full ranking
    val bfAll = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 200)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("neighbor_id")).forall(bfAll.contains))
  }
}
