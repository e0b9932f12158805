package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ composition: with every list probed and a shortlist covering the
  * whole corpus, the lossy ADC stage only ORDERS the shortlist — the exact
  * rerank then reproduces brute force exactly. Partial probing still
  * returns well-formed ranked output.
  */
class IVFPQSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("exhaustive probe + full shortlist equals brute force") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
    val got = IVFPQ.search(idx, corpus, queries, "vec_id", "embedding",
        k = 10, nprobe = 8, shortlist = 200)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == bf)
  }

  test("residual codes are m codes in [0, ksub)") {
    val corpus = emb.limit(100)
    val idx = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 4, m = 8, ksub = 8)
    val rows = idx.codes.select(col("__codes")).collect().map(_.getSeq[Long](0))
    assert(rows.nonEmpty && rows.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 8)))
    // every vector lands in exactly one list
    assert(idx.codes.count() == 100L)
  }

  test("save/load round-trips the index and search results exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
    IVFPQ.saveIndex(idx, dir)
    val loaded = IVFPQ.loadIndex(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
    assert(loaded.cb.books.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.cb.books.map(_.map(_.toSeq).toSeq).toSeq)
    val a = IVFPQ.search(idx, corpus, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, shortlist = 30)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val b = IVFPQ.search(loaded, corpus, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, shortlist = 30)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("encodeNew reproduces the built codes without retraining") {
    val corpus = emb.limit(200)
    val idx = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
    val built = idx.codes.orderBy("__id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSeq
    val re = IVFPQ.encodeNew(idx, corpus, "vec_id", "embedding").orderBy("__id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSeq
    assert(re == built)
  }

  test("partial probe output is ranked 1..k per query with exact dots") {
    val corpus = emb.limit(200)
    val queries = corpus.filter(col("vec_id") < 5)
    val idx = IVFPQ.build(corpus, "vec_id", "embedding", nlist = 8, m = 8, ksub = 16)
    val out = IVFPQ.search(idx, corpus, queries, "vec_id", "embedding",
        k = 10, nprobe = 2, shortlist = 30)
      .collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length))
      // dots are genuinely descending in rank order
      val sorted = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("dot"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }
}
