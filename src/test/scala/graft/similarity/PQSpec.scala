package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: exact when the codebook can represent every
  * vector, lossy-but-ranked otherwise, deterministic always.
  */
class PQSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ksub >= corpus with m = 1 reproduces brute force exactly") {
    // one subspace spanning the whole vector and a codeword per distinct
    // vector: every reconstruction is the vector itself, so ADC == exact
    val corpus = emb.limit(16)
    val queries = corpus.filter(col("vec_id") < 4)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 1, ksub = 16)
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
    val pq = PQ.search(cb, codes, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "adot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(_.toSeq).toSeq
    assert(pq == bf)
  }

  test("codes are within range and deterministic across runs") {
    val corpus = emb.limit(100)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
    assert(cb.m == 8 && cb.subDim == 8)
    assert(cb.books.forall(_.length == 16))
    val a = PQ.encode(cb, corpus, "vec_id", "embedding").orderBy("__id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSeq
    val b = PQ.encode(cb, corpus, "vec_id", "embedding").orderBy("__id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSeq
    assert(a == b)
    assert(a.forall { case (_, cs) =>
      cs.length == 8 && cs.forall(c => c >= 0 && c < 16)
    })
  }

  test("a seed vector encodes to a codeword equal to its own subvector") {
    // the 16 smallest ids ARE codewords pre-refinement, so each must pick
    // a codeword identical to its subvector (distance 0 wins any tie)
    val corpus = emb.limit(64)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16)
    val seedIds = corpus.orderBy("vec_id").limit(16)
      .select("vec_id").collect().map(_.getLong(0))
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
      .filter(col("__id").isin(seedIds: _*))
      .orderBy("__id").collect()
    assert(codes.length == 16)
    codes.zipWithIndex.foreach { case (row, i) =>
      val cs = row.getSeq[Long](1)
      (0 until 8).foreach { mi =>
        assert(java.util.Arrays.equals(cb.books(mi)(cs(mi).toInt), cb.books(mi)(i)),
          s"seed $i subspace $mi picked a non-equal codeword")
      }
    }
  }

  test("Lloyd refinement does not hurt recall@10 on the test corpus") {
    val corpus = emb.limit(300)
    val queries = corpus.filter(col("vec_id") < 8)
    def recall(iters: Int): Double = {
      val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16, iters = iters)
      val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
      val approx = PQ.search(cb, codes, queries, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
      val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
      hit.toDouble / exact.count()
    }
    val r0 = recall(0)
    val r1 = recall(1)
    assert(r1 >= r0 - 0.01, s"refinement dropped recall: $r0 -> $r1")
  }

  test("successive Lloyd rounds monotonically shrink reconstruction error") {
    // Lloyd's objective IS the summed squared reconstruction error; the
    // deterministic build makes these relations pinned, not flaky. This is
    // the convergence evidence for the looped trainer (iters > 1), not
    // just the single unroll the catalog queries run.
    val corpus = emb.limit(200)
    val q = corpus.select(col("vec_id"),
        call_function("graft_quantize", col("embedding")).as("__v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def sqErr(iters: Int): BigInt = {
      val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16,
        iters = iters)
      val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
      codes.iterator.map { case (id, cs) =>
        val v = q(id)
        cs.iterator.zipWithIndex.map { case (code, mi) =>
          val cw = cb.books(mi)(code.toInt)
          cw.indices.iterator.map { d =>
            val diff = BigInt(v(mi * cb.subDim + d) - cw(d))
            diff * diff
          }.sum
        }.sum
      }.sum
    }
    val (e0, e1, e2) = (sqErr(0), sqErr(1), sqErr(2))
    assert(e1 < e0, s"round 1 must shrink distortion: $e1 vs $e0")
    assert(e2 <= e1, s"round 2 must not grow distortion: $e2 vs $e1")
  }

  test("exact rerank of the ADC shortlist recovers high recall@10") {
    // raw ADC@10 sits near 0.4 on these near-random embeddings; the
    // production shortlist(100)+rerank shape must clear 0.85 (measured
    // 0.90 at ksub=16 over the full sf0.01 corpus)
    val corpus = emb
    val queries = corpus.filter(col("vec_id") < 8)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
    val approx = PQ.searchRerank(cb, codes, corpus, queries,
      "vec_id", "embedding", k = 10, shortlist = 100)
      .select("query_id", "neighbor_id")
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    assert(recall >= 0.85, s"rerank recall too low: $recall")
  }

  test("rerank with shortlist >= corpus reproduces brute force exactly") {
    val corpus = emb.limit(60)
    val queries = corpus.filter(col("vec_id") < 4)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
    val pq = PQ.searchRerank(cb, codes, corpus, queries,
      "vec_id", "embedding", k = 5, shortlist = 60)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(pq == bf)
  }

  test("persisted index round-trips: load-then-search == inline search") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 4)
    val cb = PQ.train(corpus, "vec_id", "embedding", m = 8, ksub = 16, iters = 1)
    val codes = PQ.encode(cb, corpus, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pqindex").toString
    PQ.saveIndex(cb, codes, dir)
    val (cb2, codes2) = PQ.loadIndex(spark, dir)
    assert(cb2.m == cb.m && cb2.subDim == cb.subDim && cb2.ksub == cb.ksub)
    (0 until cb.m).foreach { mi =>
      (0 until cb.ksub).foreach { c =>
        assert(java.util.Arrays.equals(cb2.books(mi)(c), cb.books(mi)(c)))
      }
    }
    def run(b: PQ.Codebooks, cd: org.apache.spark.sql.DataFrame) =
      PQ.search(b, cd, queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "adot", "rank")
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(run(cb2, codes2) == run(cb, codes))
    // a refresh batch encodes against the LOADED codebooks only
    val fresh = emb.filter(col("vec_id").between(200, 249))
    val freshCodes = PQ.encode(cb2, fresh, "vec_id", "embedding")
    assert(freshCodes.count() == fresh.count())
  }

  test("dim not divisible by m is rejected") {
    intercept[IllegalArgumentException] {
      PQ.train(emb.limit(16), "vec_id", "embedding", m = 7, ksub = 4)
    }
  }
}
