package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF-PQ — the composed production ANN index: [[IVF]]'s list pruning over
  * [[PQ]]'s compressed residual codes (the FAISS IVFPQ shape re-expressed
  * as Spark plans).
  *
  * Index build: assign every vector to its max-dot coarse centroid
  * (IVF.build, optionally Lloyd-refined), subtract the centroid to get the
  * integer residual (`graft_qsub` — residuals cluster far tighter than raw
  * vectors, which is why PQ codebooks trained on them quantize better),
  * then PQ-train/encode the residuals. The stored index is (id, list,
  * m codes): for 64-dim vectors at m=8 that is ~32x less scan bandwidth
  * than the raw corpus, AND a query only touches nprobe/nlist of it.
  *
  * Search, for max-inner-product: <q, v> = <q, c_list> + <q, r> ~=
  * <q, c_list> + ADC(q, codes). The centroid term is exact (nlist dots per
  * query against a literal array); the residual term is m table lookups
  * into ONE per-query LUT built from the FULL query vector against the
  * residual codebooks — unlike the L2 formulation, no per-probed-list LUT
  * is needed, so the query side stays a single broadcast row per (query,
  * probed list). The ADC shortlist is then reranked with exact integer
  * dots against the full vectors (PQ.searchRerank's recall shape).
  *
  * Everything is deterministic (seeded centroids and codebooks, exact
  * integer Lloyd means, ties to lower id/code), so the whole composition
  * is pinned by a DuckDB oracle twin. Scale story: one corpus exchange at
  * index build (repartition by list), the probe/LUT side broadcasts, the
  * candidate scan is codegen'd projection over nprobe/nlist of the codes,
  * and the rerank join touches |Q| x shortlist full vectors only.
  */
object IVFPQ {

  /** The persistable index: coarse centroids (KBs, driver-side), residual
    * codebooks (KBs), and the compressed codes projection (__id, __list,
    * __codes) — everything search needs; the raw assignment frame is not
    * retained. */
  final case class Index(
      centroids: Array[Array[Long]],
      cb: PQ.Codebooks,
      codes: DataFrame)

  private def centMatrixLit(centroids: Array[Array[Long]]): Column =
    array(centroids.map(c => array(c.map(lit): _*)): _*)

  /** Build the composed index: coarse assign -> integer residual -> PQ
    * train+encode on residuals. One shuffle (the IVF list repartition);
    * the residual and encode steps are narrow projections over it. */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      m: Int,
      ksub: Int,
      ivfIters: Int = 1,
      pqIters: Int = 1): Index = {
    val ivf = IVF.build(corpus, idCol, vecCol, nlist, iters = ivfIters)
    val cents = centMatrixLit(ivf.centroids)
    val res = ivf.assigned.withColumn("__r",
      call_function("graft_qsub", col("__v"),
        element_at(cents, (col("__list") + 1).cast("int"))))
    val cb = PQ.trainOn(
      res.select(col("__id"), col("__r").as("__v")), m, ksub, pqIters)
    val codes = res.select(col("__id"), col("__list"),
      call_function("graft_pq_encode", col("__r"), cb.flatLit, lit(m), lit(ksub))
        .as("__codes"))
    Index(ivf.centroids, cb, codes)
  }

  /** Encode NEW vectors against an existing index's centroids and
    * codebooks — assign, residual, PQ-encode, all narrow codegen'd
    * projections with no retraining and no shuffle (the refresh path a
    * crawl uses: the index grows by appending these rows). */
  def encodeNew(index: Index, df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cents = centMatrixLit(index.centroids)
    // argmax dot, ties to the LOWER list id — the same kernel (and
    // therefore the same tie-break) as IVF.build's assignment
    df.select(col(idCol).as("__id"),
        call_function("graft_quantize", col(vecCol)).as("__v"))
      .withColumn("__list",
        call_function("graft_argmax_dot", col("__v"),
          array(index.centroids.flatten.map(lit): _*), lit(index.centroids.length)))
      .withColumn("__r",
        call_function("graft_qsub", col("__v"),
          element_at(cents, (col("__list") + 1).cast("int"))))
      .select(col("__id"), col("__list"),
        call_function("graft_pq_encode", col("__r"), index.cb.flatLit,
          lit(index.cb.m), lit(index.cb.ksub)).as("__codes"))
  }

  /** Persist the index: the codes projection plus centroids and codebooks
    * as tiny (l/sub, code, dim, w) parquet tables. */
  def saveIndex(index: Index, path: String): Unit = {
    index.codes.write.mode("overwrite").parquet(s"$path/codes")
    val spark = index.codes.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .flatMap { case (c, l) => c.zipWithIndex.map { case (w, d) => (l, d, w) } }
      .toSeq.toDF("l", "d", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val cb = index.cb
    (for {
      mi <- cb.books.indices
      c <- cb.books(mi).indices
      d <- cb.books(mi)(c).indices
    } yield (mi, c, d, cb.books(mi)(c)(d)))
      .toDF("sub", "code", "dim", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reload a persisted index — pure parquet scans, driver-trivial
    * collects (nlist x dim and m x ksub x subDim rows). */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val centRows = spark.read.parquet(s"$path/centroids")
      .select(col("l"), col("d"), col("w")).collect()
    require(centRows.nonEmpty, s"empty centroids at $path")
    val nlist = centRows.map(_.getInt(0)).max + 1
    val dim = centRows.map(_.getInt(1)).max + 1
    val centroids = Array.ofDim[Long](nlist, dim)
    centRows.foreach(r => centroids(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .select(col("sub"), col("code"), col("dim"), col("w")).collect()
    require(cbRows.nonEmpty, s"empty codebooks at $path")
    val m = cbRows.map(_.getInt(0)).max + 1
    val ksub = cbRows.map(_.getInt(1)).max + 1
    val subDim = cbRows.map(_.getInt(2)).max + 1
    val books = Array.ofDim[Long](m, ksub, subDim)
    cbRows.foreach(r => books(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getLong(3))
    Index(centroids, PQ.Codebooks(m, subDim, books), spark.read.parquet(s"$path/codes"))
  }

  /** ADC-shortlist-then-exact-rerank top-k within the nprobe nearest lists.
    * Output: (query_id, neighbor_id, dot, rank) — same shape as
    * [[Similarity.bruteForceTopK]] and [[PQ.searchRerank]].
    *
    * `saltBuckets` (default 1 = off) applies only to the non-broadcast
    * shortlist fallback, whose exchange is keyed on `__list` alone: with
    * a deliberately tiny nlist under a huge query batch the join runs at
    * most nlist active partitions and each build side holds ALL of its
    * list's |Q|*nprobe/nlist LUTs. Salting splits every (list) bucket
    * into `saltBuckets` (list, salt) buckets by query hash — each probed
    * row lands in exactly one, each code row is replicated across all of
    * them — multiplying fallback parallelism and dividing per-partition
    * build memory by the bucket count at the price of scanning the
    * (compact) codes projection `saltBuckets` times. Results are
    * identical for any value (RerankFallbackSpec pins it); 1 = off, the
    * right setting when nlist already exceeds cluster parallelism (the
    * usual sqrt(N)-sized index).
    *
    * The DEFAULT (`saltBuckets = 0`) derives the bucket count from the
    * regime — the unknown caller carries the tuned call's scale posture:
    * 1 (plan untouched) on the broadcast path or when nlist covers
    * `defaultParallelism`, else `ceil(4 * defaultParallelism / nlist)`
    * (~4 buckets per core — the measured knee of the round-17 salt
    * curve: nlist 8, 32 cores read 10.3/5.6/4.8/4.8/5.0 s at salt
    * 4/8/16/32/64), riding the `broadcastableQueries` decision the plan
    * already pays for. */
  def search(
      index: Index,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      shortlist: Int,
      shards: Int = 32,
      maxBroadcastQueries: Long = Similarity.RerankBroadcastMaxQueries,
      saltBuckets: Int = 0): DataFrame = {
    require(saltBuckets >= 0, "saltBuckets must be >= 0 (0 = auto)")
    // ONE broadcastability decision for the whole plan — the probed
    // (query, list, LUT) table of the shortlist stage AND the rerank
    // tail's sliver/vector joins
    val bcast = Similarity.broadcastableQueries(queries, maxBroadcastQueries)
    val cb = index.cb
    val cents = centMatrixLit(index.centroids)
    val q = queries.select(col(idCol).as("query_id"),
      call_function("graft_quantize", col(vecCol)).as("__qv"))
    // rank all centroids per query, keep nprobe — literal-array projection,
    // no join (ties break toward the higher list id, as in IVF.search)
    val centScores = index.centroids.zipWithIndex.map { case (c, i) =>
      struct(call_function("graft_qdot", col("__qv"), array(c.map(lit): _*)).as("s"),
        lit(i).as("l"))
    }
    val probed = q
      .withColumn("__probe",
        slice(reverse(array_sort(array(centScores: _*))), 1, nprobe))
      .select(col("query_id"), col("__qv"),
        explode(col("__probe")).as("__pr"))
      .select(col("query_id"),
        col("__pr.l").as("__list"), col("__pr.s").as("__centdot"),
        call_function("graft_pq_lut", col("__qv"), cb.flatLit,
          lit(cb.m), lit(cb.ksub)).as("__lut"))
    // probed is |Q| x nprobe rows each carrying an m x ksub LUT — above
    // the broadcast bound it joins shuffle_hash on __list (each list
    // partition builds only its own queries' LUTs). Parallelism bound:
    // __list has only nlist distinct values, so the fallback exchange
    // runs at most nlist active partitions and each build side holds all
    // |Q|*nprobe/nlist LUTs for its list — size nlist for the corpus
    // (the usual sqrt(N) sizing gives parallelism far beyond any
    // executor count), not for the query batch; a deliberately tiny
    // nlist under a huge |Q| concentrates the build side, which is what
    // `saltBuckets` splits (see the search scaladoc)
    val saltResolved =
      if (saltBuckets > 0) saltBuckets
      else Similarity.autoSaltBuckets(
        queries.sparkSession.sparkContext.defaultParallelism,
        index.centroids.length, bcast) // bcast already computed for the join
    val joined =
      if (bcast) index.codes.join(broadcast(probed), "__list")
      else if (saltResolved == 1) index.codes.join(probed.hint("shuffle_hash"), "__list")
      else {
        val saltedProbed = probed
          .withColumn("__salt", pmod(hash(col("query_id")), lit(saltResolved)))
        index.codes
          .withColumn("__salt", explode(array((0 until saltResolved).map(lit): _*)))
          .join(saltedProbed.hint("shuffle_hash"), Seq("__list", "__salt"))
      }
    val cand = joined
      .filter(col("__id") =!= col("query_id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        (col("__centdot") +
          call_function("graft_pq_adc", col("__codes"), col("__lut"), lit(cb.ksub)))
          .as("adot"))
    val short = Similarity
      .topKPerQuery(cand, "adot", shortlist, rankCol = "__rk", shards = shards)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank: |Q| x shortlist full-vector dots through the shared
    // tail ([[Similarity.rerankExact]]), reusing the same decision
    val qv = q.select(col("query_id"), col("__qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      call_function("graft_quantize", col(vecCol)).as("__cv"))
    Similarity.rerankExact(cv, short, qv, k, shards, bcast)
  }
}
