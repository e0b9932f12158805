package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binary quantization (BQ) — the memory-lean rung BELOW [[PQ]] on the
  * compressed-embedding ladder: one SIGN BIT per dimension, packed
  * `WordBits` bits to a long, so a 64-dim vector carries 2 longs instead
  * of 64 floats (~16x less scan bandwidth than raw, and unlike PQ there is
  * no codebook to train, ship, or refresh — the "index" IS the codes
  * projection, refreshable by encoding only new vectors).
  *
  * Search is Hamming distance over the packed codes (XOR + popcount, the
  * cheapest similarity kernel that exists), which approximates angular
  * distance the same way 1-bit SimHash does: vectors on the same side of
  * every axis hyperplane collide. Raw Hamming@k recall is mediocre by
  * construction (1 bit/dim), so the production shape is
  * [[searchRerank]] — Hamming shortlist over the compressed codes, exact
  * integer-dot rerank of the |Q| x shortlist sliver against the full
  * vectors — mirroring [[PQ.searchRerank]] (FAISS's refine step).
  *
  * 100 TB shape: encode is a pure codegen'd projection
  * (graft_quantize -> graft_bq_encode, both native kernels); search
  * broadcasts the tiny query-code side and scans the codes projection
  * once; ranking rides [[Similarity.topKPerQuery]]'s bounded `graft_topk`
  * aggregate so the candidate stream is never sorted; the rerank join
  * touches only the shortlist. Everything is integer-exact, so codes,
  * distances, and ranks hash-match the DuckDB replay bit for bit.
  */
object BQ {

  /** 32 sign bits per packed word: every word stays a small POSITIVE
    * long, so the oracle's `1::BIGINT << b` replays the packing exactly
    * and codes compare portably across engines. Enforced by the kernel
    * (VectorKernels.bqEncode requires 1 <= wordBits <= 32). */
  val WordBits = 32

  /** id + quantized vector, the shared front of encode/rerank. */
  private def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      call_function("graft_quantize", col(vecCol)).as("__v"))

  /** id + `__code` (ceil(dim / WordBits) packed sign-bit words) — the
    * compressed corpus. This projection, persisted as parquet, IS the BQ
    * index: no codebooks, so a refresh is just encoding the new rows. */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    quantize(df, idCol, vecCol)
      .select(col("__id"),
        call_function("graft_bq_encode", col("__v"), lit(WordBits)).as("__code"))

  /** Hamming top-k: (query_id, neighbor_id, hamming, rank), ascending
    * distance, ties to the LOWER neighbor id (the oracle's
    * ORDER BY hamming ASC, neighbor_id ASC). Query codes broadcast; the
    * corpus side touches only the codes projection. */
  def search(
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shards: Int = 32,
      maxBroadcastQueries: Long = Similarity.RerankBroadcastMaxQueries): DataFrame =
    searchImpl(codes, queries, idCol, vecCol, k, shards,
      Similarity.broadcastableQueries(queries, maxBroadcastQueries))

  private def searchImpl(
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shards: Int,
      broadcastSmall: Boolean): DataFrame = {
    val qc = encode(queries, idCol, vecCol)
      .select(col("__id").as("query_id"), col("__code").as("__qcode"))
    // topKPerQuery ranks DESCENDING; negate so smaller Hamming wins. The
    // frame stays exactly (query, id, score) so ranking rides the
    // graft_topk bounded aggregate; hamming is recovered by un-negating.
    // Above the broadcast bound the query codes ride a partitioned
    // cartesian instead — a |Q| in the millions exceeds broadcast
    // budgets, and the full |corpus| x |Q| scan is the declared cost of
    // exhaustive Hamming search at any join strategy
    val cand = codes.crossJoin(if (broadcastSmall) broadcast(qc) else qc)
      .filter(col("__id") =!= col("query_id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        (-call_function("graft_hamming", col("__code"), col("__qcode")))
          .as("__score"))
    Similarity.topKPerQuery(cand, "__score", k, shards = shards)
      .select(col("query_id"), col("neighbor_id"),
        (-col("__score")).as("hamming"), col("rank"))
  }

  /** Hamming shortlist + exact rerank — the production recall shape:
    * top-`shortlist` by Hamming over the packed codes, then ONLY those
    * |Q| x shortlist pairs scored with the exact integer dot against the
    * full vectors, keeping the top-`k`. Output: (query_id, neighbor_id,
    * dot, rank) — same shape as [[Similarity.bruteForceTopK]], so with
    * `shortlist >= |corpus|` it reproduces brute force exactly. */
  def searchRerank(
      codes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int,
      shards: Int = 32,
      maxBroadcastQueries: Long = Similarity.RerankBroadcastMaxQueries): DataFrame = {
    // ONE broadcastability decision for the whole plan — the shortlist
    // stage's query codes AND the rerank tail's sliver/vector joins
    val bcast = Similarity.broadcastableQueries(queries, maxBroadcastQueries)
    val short = searchImpl(codes, queries, idCol, vecCol, shortlist, shards, bcast)
      .select(col("query_id"), col("neighbor_id"))
    val qv = quantize(queries, idCol, vecCol)
      .select(col("__id").as("query_id"), col("__v").as("__qv"))
    val cv = quantize(corpus, idCol, vecCol)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"))
    Similarity.rerankExact(cv, short, qv, k, shards, bcast)
  }
}
