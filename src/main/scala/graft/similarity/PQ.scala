package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the compressed-embedding search path beside
  * [[IVF]]'s list pruning and [[Similarity]]'s brute force.
  *
  * The vector space is split into `m` contiguous subspaces; each subspace
  * gets a `ksub`-entry codebook, and every corpus vector is encoded as `m`
  * small integer codes (its nearest codeword per subspace, by exact
  * squared-L2 over the quantized integers). A query never touches corpus
  * vectors: it precomputes an m x ksub lookup table of exact integer dot
  * products against the codewords, and the approximate dot against any
  * corpus vector is m table lookups summed (ADC — asymmetric distance
  * computation).
  *
  * Why this is THE 100 TB embedding path: the corpus side of the search
  * carries m small codes per vector instead of dim floats (64-dim float32
  * -> 8 codes is a ~32x cut in memory and scan bandwidth), the codebooks
  * and per-query LUTs are driver-side literals (KBs), and scoring is a
  * pure projection — encode, LUT, and ADC all run as native codegen'd
  * kernels (graft_pq_encode / graft_pq_lut / graft_pq_adc), never
  * interpreted lambdas or deep CASE chains. Composes with IVF (encode
  * residuals per list) when the corpus also needs pruning, and with an
  * exact rerank of the ADC shortlist when recall must be exact.
  *
  * Determinism (and hence oracle-ability): codebooks are seeded from the
  * quantized subvectors of the `ksub` smallest ids — no random init — and
  * the optional Lloyd refinement uses EXACT integer floor means
  * ((s - pmod(s, n)) div n, exactly divisible numerator), so codes,
  * LUTs, and ADC scores are bit-identical across engines, partitionings,
  * and runs. Nearest-codeword assignment breaks ties toward the lower
  * code index. Production systems train codebooks offline on a sample
  * (a la FAISS); the deterministic seed+Lloyd here IS that training, just
  * reproducible.
  */
object PQ {

  /** books(sub)(code) = codeword vector (quantized longs, length subDim). */
  final case class Codebooks(m: Int, subDim: Int, books: Array[Array[Array[Long]]]) {
    def ksub: Int = books.head.length
    /** Flattened [sub][code][dim] literal for the native kernels. */
    private[graft] def flatLit: Column =
      array(books.flatten.flatten.map(lit): _*)
  }

  /** Persist a trained index: the codes projection (the compressed corpus)
    * plus the codebooks as one (sub, code, dim, w) parquet table. A
    * refresh encodes NEW vectors against the loaded codebooks without
    * touching the original corpus — the [[graft.dedup.Incremental.Index]]
    * pattern for the embedding side. */
  def saveIndex(cb: Codebooks, codes: DataFrame, path: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$path/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    val rows = for {
      mi <- cb.books.indices
      c <- cb.books(mi).indices
      d <- cb.books(mi)(c).indices
    } yield (mi, c, d, cb.books(mi)(c)(d))
    rows.toDF("sub", "code", "dim", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reload a persisted index — pure parquet scans, no retraining. The
    * codebook table is KBs (m x ksub x subDim rows), so the collect is
    * driver-trivial. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): (Codebooks, DataFrame) = {
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .select(col("sub"), col("code"), col("dim"), col("w")).collect()
    require(cbRows.nonEmpty, s"empty codebooks at $path")
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val subDim = cbRows.map(_.getInt(2)).max + 1
    val books = Array.ofDim[Long](m, ksub, subDim)
    cbRows.foreach(r => books(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getLong(3))
    (Codebooks(m, subDim, books), spark.read.parquet(s"$path/codes"))
  }

  /** id + quantized vector, the shared front of train/encode/search. */
  private def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      call_function("graft_quantize", col(vecCol)).as("__v"))

  private def encodeCol(cb: Codebooks, v: Column): Column =
    call_function("graft_pq_encode", v, cb.flatLit, lit(cb.m), lit(cb.ksub))

  /** Train codebooks: seed each subspace's ksub codewords from the
    * quantized subvectors of the ksub smallest ids, then run `iters` Lloyd
    * rounds — assign every subvector to its nearest codeword, recompute
    * each codeword as the exact integer floor mean of its members (a
    * codeword that loses all members keeps its previous value). Each round
    * is ONE exchange of (subspace, code, dim) partials; the collected
    * m x ksub x subDim result is KBs. */
  def train(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iters: Int = 0): Codebooks =
    trainOn(quantize(df, idCol, vecCol), m, ksub, iters)

  /** Same training but over an ALREADY-QUANTIZED (id, array<long>) frame —
    * the entry point the IVF-PQ composition uses to train on residuals
    * (which are integer differences, never re-quantized doubles). */
  private[similarity] def trainOn(
      q: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int): Codebooks = {
    val seeds = q.orderBy(col("__id")).limit(ksub).collect()
      .map(_.getSeq[Long](1).toArray)
    require(seeds.length == ksub,
      s"PQ.train: corpus has only ${seeds.length} vectors for ksub=$ksub codewords")
    val dim = seeds.head.length
    require(dim % m == 0, s"PQ.train: dim $dim not divisible by m=$m")
    val subDim = dim / m
    var cb = Codebooks(m, subDim, Array.tabulate(m, seeds.length) { (mi, c) =>
      seeds(c).slice(mi * subDim, (mi + 1) * subDim)
    })
    for (_ <- 1 to iters) {
      val means = q
        .select(col("__v"), posexplode(encodeCol(cb, col("__v"))).as(Seq("__sp", "__code")))
        .select(col("__sp"), col("__code"),
          posexplode(slice(col("__v"), col("__sp") * subDim + 1, lit(subDim)))
            .as(Seq("__d", "__x")))
        .groupBy(col("__sp"), col("__code"), col("__d"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .withColumn("__mean", expr("(__s - pmod(__s, __n)) div __n"))
        .select(col("__sp"), col("__code"), col("__d"), col("__mean"))
        .collect()
      val next = cb.books.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getLong(1).toInt)(r.getInt(2)) = r.getLong(3)
      }
      cb = Codebooks(m, subDim, next)
    }
    cb
  }

  /** id + `__codes` (array of m codes) — the compressed corpus
    * representation (this projection, persisted, IS the PQ index). */
  def encode(cb: Codebooks, df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = quantize(df, idCol, vecCol)
    q.select(col("__id"), encodeCol(cb, col("__v")).as("__codes"))
  }

  /** ADC top-k: (query_id, neighbor_id, adot, rank), `adot` the exact
    * integer dot of the query against each corpus vector's codeword
    * reconstruction. The corpus side is the codes projection only; queries
    * (with their LUT column, built once per query from the codebook
    * literal) broadcast, so the scan is a codegen'd projection with m
    * lookups per (query, vector). */
  def search(
      cb: Codebooks,
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shards: Int = 32,
      maxBroadcastQueries: Long = Similarity.RerankBroadcastMaxQueries): DataFrame =
    searchImpl(cb, codes, queries, idCol, vecCol, k, shards,
      Similarity.broadcastableQueries(queries, maxBroadcastQueries))

  private def searchImpl(
      cb: Codebooks,
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shards: Int,
      broadcastSmall: Boolean): DataFrame = {
    val luts = quantize(queries, idCol, vecCol)
      .select(col("__id").as("query_id"),
        call_function("graft_pq_lut", col("__v"), cb.flatLit, lit(cb.m), lit(cb.ksub))
          .as("__lut"))
    // LUTs are ~m x ksub longs PER QUERY: above the broadcast bound they
    // ride a partitioned cartesian instead of an 8 GiB-capped broadcast
    // (the |corpus| x |Q| ADC scan is exhaustive search's declared cost
    // under any join strategy)
    val cand = codes.crossJoin(if (broadcastSmall) broadcast(luts) else luts)
      .filter(col("__id") =!= col("query_id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        call_function("graft_pq_adc", col("__codes"), col("__lut"), lit(cb.ksub))
          .as("adot"))
    // the ADC scan scores the WHOLE codes table per query — rank it with
    // the graft_topk bounded aggregate so the corpus-scale candidate
    // stream is pruned to k per query before the exchange, never sorted
    Similarity.topKPerQuery(cand, "adot", k, shards = shards)
  }

  /** ADC shortlist + exact rerank — the production recall shape (FAISS's
    * IVFPQ + refine): take the top-`shortlist` by ADC over the compressed
    * codes, then score ONLY those |Q| x shortlist pairs with the exact
    * integer dot against the full vectors and keep the top-`k`. The
    * expensive full-vector scan shrinks from the whole corpus to the
    * shortlist (a broadcast-joinable sliver), which is what buys back
    * recall (~0.40 raw ADC -> ~0.90 at shortlist=100 on the test corpus's
    * near-random embeddings) without giving up the 32x scan compression.
    * Output: (query_id, neighbor_id, dot, rank) — same shape as
    * [[Similarity.bruteForceTopK]]. */
  def searchRerank(
      cb: Codebooks,
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
    // stage's LUT table AND the rerank tail's sliver/vector joins
    val bcast = Similarity.broadcastableQueries(queries, maxBroadcastQueries)
    val short = searchImpl(cb, codes, queries, idCol, vecCol, shortlist, shards, bcast)
      .select(col("query_id"), col("neighbor_id"))
    val qv = quantize(queries, idCol, vecCol)
      .select(col("__id").as("query_id"), col("__v").as("__qv"))
    val cv = quantize(corpus, idCol, vecCol)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"))
    Similarity.rerankExact(cv, short, qv, k, shards, bcast)
  }
}
