package graft.similarity

import graft.SparkSpec
import graft.catalyst.VectorKernels
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions._

/** Binary quantization: packing is bit-exact against a driver-side
  * reference, the kernels reject misuse loudly, and shortlist+rerank
  * converges to brute force.
  */
class BQSpec extends SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  private def arr(xs: Long*): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("kernel packing matches a driver-side bit-twiddling reference") {
    // codegen path: the DataFrame projection; reference: plain Scala over
    // the same quantized longs
    val rows = emb.limit(50)
      .select(col("vec_id"),
        call_function("graft_quantize", col("embedding")).as("v"),
        call_function("graft_bq_encode",
          call_function("graft_quantize", col("embedding")), lit(32)).as("code"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Long](1)
      val code = r.getSeq[Long](2)
      val expect = Array.fill[Long]((v.length + 31) / 32)(0L)
      v.zipWithIndex.foreach { case (x, d) =>
        if (x > 0) expect(d / 32) |= 1L << (d % 32)
      }
      assert(code == expect.toSeq, s"vec ${r.getLong(0)}")
      assert(code.forall(w => w >= 0 && w <= 0xFFFFFFFFL), "packed words must stay positive")
    }
  }

  test("eval path: encode round-trips through hamming (self-distance 0, symmetric)") {
    val a = VectorKernels.bqEncode(arr(1L, -2L, 0L, 5L, -1L, 3L), 2)
    val b = VectorKernels.bqEncode(arr(1L, 2L, 0L, -5L, -1L, 3L), 2)
    assert(a.numElements() == 3 && b.numElements() == 3)
    assert(VectorKernels.hamming(a, a) == 0L)
    assert(VectorKernels.hamming(a, b) == VectorKernels.hamming(b, a))
    // bits differing: dim 1 (+2 vs -2) and dim 3 (+5 vs -5)
    assert(VectorKernels.hamming(a, b) == 2L)
    // boundary: 0 is NOT a positive sign bit
    assert(VectorKernels.bqEncode(arr(0L), 32).getLong(0) == 0L)
  }

  test("kernels reject misuse: bad wordBits and mismatched code lengths") {
    for (bad <- Seq(0, -1, 33, 64))
      intercept[IllegalArgumentException](VectorKernels.bqEncode(arr(1L), bad))
    intercept[IllegalArgumentException](
      VectorKernels.hamming(arr(1L, 2L), arr(1L)))
    // through SQL + codegen too: the task must fail, not truncate
    val thrown = intercept[Exception] {
      emb.limit(1).select(call_function("graft_hamming",
        call_function("graft_bq_encode",
          call_function("graft_quantize", col("embedding")), lit(32)),
        array(lit(0L)))).collect()
    }
    assert(thrown.getMessage != null)
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Some(Array(1.0, -1.0)), None: Option[Array[Double]]))
      .toDF("id", "v", "missing")
    val r = df.select(
      call_function("graft_bq_encode",
        call_function("graft_quantize", col("missing")), lit(32)).as("e"),
      call_function("graft_hamming",
        call_function("graft_bq_encode",
          call_function("graft_quantize", col("v")), lit(32)),
        call_function("graft_bq_encode",
          call_function("graft_quantize", col("missing")), lit(32))).as("h"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("search ranks by ascending hamming with neighbor-id tie-break") {
    val corpus = emb.limit(100)
    val codes = BQ.encode(corpus, "vec_id", "embedding")
    val got = BQ.search(codes, corpus.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 10)
      .orderBy("query_id", "rank").collect()
    assert(got.length == 20)
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          val (hx, hy) = (x.getLong(2), y.getLong(2))
          assert(hx < hy || (hx == hy && x.getLong(1) < y.getLong(1)))
        case _ =>
      }
    }
  }

  test("searchRerank with shortlist >= corpus reproduces brute force exactly") {
    val corpus = emb.limit(60)
    val queries = corpus.filter(col("vec_id") < 4)
    val codes = BQ.encode(corpus, "vec_id", "embedding")
    val bq = BQ.searchRerank(codes, corpus, queries, "vec_id", "embedding",
        k = 5, shortlist = 60)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val bf = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(bq == bf)
  }
}
