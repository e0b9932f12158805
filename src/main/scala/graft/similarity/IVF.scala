package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Hashing.QuantScale

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * list-partitioned scale path beside [[Similarity]]'s brute force and
  * SRP-LSH.
  *
  * Deterministic coarse quantizer: the centroids are the quantized vectors
  * of the `nlist` smallest ids (no random init — results are reproducible
  * across engines and runs). Every corpus vector is assigned to its
  * max-inner-product centroid; a query probes the `nprobe` nearest lists
  * and reranks exactly (integer dot product) inside them.
  *
  * Scale design: the corpus shuffles ONCE at index build (hash exchange on
  * list id); each query touches nprobe/nlist of the data. Centroids are a
  * driver-side literal array (nlist * dim longs — KBs), so assignment and
  * probing are pure projections; the only per-query join is an equi-join on
  * list id against the (pre-partitioned, optionally persisted) assignment.
  * With nprobe = nlist the search is exhaustive and exactly equals brute
  * force (property-tested).
  */
object IVF {

  final case class Index(assigned: DataFrame, centroids: Array[Array[Long]])

  /** Persist a built index: the coarse quantizer (centroids, a
    * (list, dim, w) table of nlist x dim rows — KBs) plus the assignment
    * projection (__id, __v, __list — the list-partitioned corpus the
    * search scans). At 100 TB the centroids are exactly what's trained
    * offline and refreshed incrementally: a reload + [[encodeNew]] over
    * arriving vectors extends the index without re-reading (or
    * re-clustering) the base corpus — the [[PQ.saveIndex]] /
    * [[graft.dedup.Incremental.Index]] pattern for the IVF rung. */
  def saveIndex(index: Index, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val rows = for {
      l <- index.centroids.indices
      d <- index.centroids(l).indices
    } yield (l, d, index.centroids(l)(d))
    rows.toDF("list", "dim", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
  }

  /** Just the coarse quantizer from a persisted index — nlist x dim rows
    * (KBs, driver-trivial), never touching the corpus-sized assignment
    * table. The encode-only consumers ([[encodeNew]], ivfEncodeStream)
    * load this, not [[loadIndex]]: at production scale even LISTING the
    * assignment parquet is an object-store walk they have no use for. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Long]] = {
    val cRows = spark.read.parquet(s"$path/centroids")
      .select(col("list"), col("dim"), col("w")).collect()
    require(cRows.nonEmpty, s"empty centroids at $path")
    val nlist = cRows.map(_.getInt(0)).max + 1
    val dim = cRows.map(_.getInt(1)).max + 1
    val centroids = Array.ofDim[Long](nlist, dim)
    cRows.foreach(r => centroids(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    centroids
  }

  /** Reload a persisted index — pure parquet scans, no re-clustering.
    * The centroid collect is nlist x dim rows (KBs, driver-trivial);
    * the assignment table comes back re-partitioned on list id, the
    * co-location [[build]] established. */
  def loadIndex(spark: SparkSession, path: String): Index = {
    val assigned = spark.read.parquet(s"$path/assigned")
      .repartition(col("__list"))
    Index(assigned, loadCentroids(spark, path))
  }

  /** Assign NEW vectors to the existing coarse quantizer — the
    * incremental-refresh half of index persistence. Same projection as
    * [[build]]'s final step (id, quantized vector, argmax-dot list id),
    * so unioning the result with a loaded index's `assigned` extends
    * the index; vectors already indexed encode to identical rows. */
  def encodeNew(
      centroids: Array[Array[Long]],
      df: DataFrame,
      idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        call_function("graft_quantize", col(vecCol)).as("__v"))
      .withColumn("__list", listId(col("__v"), centroids))

  /** Argmax-dot list id for a quantized vector column, as ONE kernel call
    * over the flat centroid literal. Ties break toward the lower list id.
    * (The previous form — nlist chained literal-dot `when` expressions —
    * blew past janino's method limits at nlist = 64 and fell back to the
    * interpreted path, measured 6x slower on the assignment leg.) */
  private def listId(q: Column, centroids: Array[Array[Long]]): Column =
    call_function("graft_argmax_dot", q,
      array(centroids.flatten.map(lit): _*), lit(centroids.length))

  /** Build the index: seed centroids from the nlist smallest ids, optionally
    * refine them with `iters` Lloyd iterations (assign -> per-list integer
    * mean), then assign every vector and pre-partition by list id.
    *
    * Refinement stays fully distributed and deterministic: each iteration is
    * one posexplode + groupBy over (list, dimension) — a single hash
    * exchange of (list, dim, coord) triples — and the new coordinate is the
    * EXACT integer floor mean, computed as (sum - pmod(sum, n)) div n so it
    * never round-trips through a double (engine-agnostic: the numerator is
    * exactly divisible, so DuckDB's truncating // computes the same floor).
    * A list that loses all members keeps its previous centroid.
    *
    * `spherical` (default, and the right geometry for an inner-product /
    * cosine quantizer): each refined centroid is rescaled back onto the
    * quantized unit sphere, floor(coord * QuantScale / ||mean||). A plain
    * Lloyd mean of near-unit vectors has norm well below 1, and with
    * MAX-DOT assignment a short centroid is unfairly penalized against the
    * full-norm data-point seeds — measured on the test corpus, plain means
    * cost ~3 recall points per iteration while spherical means hold or gain.
    * The rescale is nlist x dim driver-side arithmetic (KBs); it uses the
    * same Long-multiply-then-double-divide-then-floor shape as the SQL
    * oracle, so both engines produce bit-identical centroids. Better-
    * balanced lists mean a lower and more uniform nprobe/nlist scan
    * fraction at query time, which is what matters at corpus scale. */
  def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int = 0,
      spherical: Boolean = true): Index = {
    val q = df.select(col(idCol).as("__id"),
      call_function("graft_quantize", col(vecCol)).as("__v"))
    var centroids = q
      .orderBy(col("__id"))
      .limit(nlist)
      .collect()
      .map(_.getSeq[Long](1).toArray)
    for (_ <- 1 to iters) {
      val means = q
        .withColumn("__list", listId(col("__v"), centroids))
        .select(col("__list"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy(col("__list"), col("__d"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .withColumn("__m", expr("(__s - pmod(__s, __n)) div __n"))
        .select(col("__list"), col("__d"), col("__m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2))
      centroids =
        if (!spherical) next
        else next.map { c =>
          val dd = c.map(x => x * x).sum
          if (dd == 0L) c
          else {
            val norm = math.sqrt(dd.toDouble)
            c.map(x => math.floor(x * QuantScale / norm).toLong)
          }
        }
    }
    val assigned = q
      .withColumn("__list", listId(col("__v"), centroids))
      .repartition(col("__list"))
    Index(assigned, centroids)
  }

  /** Top-k by exact integer dot within the nprobe nearest lists of each
    * query. Output: (query_id, neighbor_id, dot, rank).
    *
    * `saltBuckets` un-caps the probed join's parallelism in the
    * tiny-nlist / huge-batch regime — the IVF twin of
    * [[IVFPQ.search]]'s knob (which measured 5.6x at nlist 8 on 32
    * cores): the join is keyed on `__list` alone, so its non-broadcast
    * exchange runs at most nlist active partitions, each streaming every
    * one of its list's corpus rows against ALL that list's probing
    * queries. With buckets, each probed (query, list) row lands in ONE
    * (list, salt) bucket by query hash and each assigned corpus row
    * replicates across all buckets — parallelism and per-partition probe
    * state improve by the bucket count for one extra scan multiple of
    * the assignment projection. Salted runs pin shuffle-hash with the
    * probed side as build (the regime's right shape: corpus streams,
    * query batch builds); `saltBuckets = 1` leaves Catalyst's choice
    * untouched. Results are identical for every setting
    * (RerankFallbackSpec pins identity + the salt reaching the physical
    * join's keys). A production-sized nlist (~sqrt(N)) already exceeds
    * any executor count — the knob matters only for deliberately coarse
    * quantizers under huge query batches.
    *
    * The DEFAULT (`saltBuckets = 0`) derives the bucket count from the
    * regime, so the unknown caller carries the same scale posture as the
    * tuned expert call: when nlist already covers `defaultParallelism`,
    * or the query batch is broadcast-sized (one count, bounded by
    * `maxBroadcastQueries` — Catalyst/AQE then broadcasts the probed
    * side and no exchange is capped at all), the auto stays at 1 and the
    * plan is untouched; only the genuinely capped regime (tiny nlist
    * under a non-broadcastable batch) gets
    * `ceil(4 * defaultParallelism / nlist)` buckets — ~4 (list, salt)
    * buckets per core, the measured knee of the round-17 salt curve on
    * the 100x corpus (nlist 8, 32 cores: salt 4/8/16/32/64 read
    * 8.0/6.0/5.4/6.3/7.3 s — finer tasks balance the skewed per-list
    * query load until the extra assignment-scan replicas win). CAVEAT
    * (mirrors PQ/IVFPQ): when nlist < defaultParallelism the auto's
    * broadcastability check runs one extra `queries.count()` Spark job,
    * executing the query frame's lineage an additional time — cache or
    * `localCheckpoint` expensive/nondeterministic query frames, or pass
    * `saltBuckets = 1` (or `maxBroadcastQueries = 0` / `Long.MaxValue`)
    * to skip the count. */
  def search(
      index: Index,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      shards: Int = 32,
      saltBuckets: Int = 0,
      maxBroadcastQueries: Long = Similarity.RerankBroadcastMaxQueries): DataFrame = {
    require(saltBuckets >= 0, "saltBuckets must be >= 0 (0 = auto)")
    val saltResolved =
      if (saltBuckets > 0) saltBuckets
      else Similarity.autoSaltBuckets(
        queries.sparkSession.sparkContext.defaultParallelism,
        index.centroids.length,
        // by-name: the count job runs only when nlist < par leaves the
        // broadcastability question open (see autoSaltBuckets scaladoc)
        Similarity.broadcastableQueries(queries, maxBroadcastQueries))
    val q = queries.select(col(idCol).as("query_id"),
      call_function("graft_quantize", col(vecCol)).as("__qv"))
    // rank all centroids per query and keep nprobe, as one kernel call over
    // the flat centroid literal (same (dot desc, id desc) order the oracle
    // replays); no join, no per-centroid expression chain
    val probed = q
      .withColumn("__probe",
        call_function("graft_probe_ids", col("__qv"),
          array(index.centroids.flatten.map(lit): _*),
          lit(index.centroids.length), lit(nprobe)))
      .select(col("query_id"), col("__qv"), explode(col("__probe")).as("__list"))
    val joined =
      if (saltResolved == 1) probed.join(index.assigned, "__list")
      else {
        val saltedProbed = probed
          .withColumn("__salt", pmod(hash(col("query_id")), lit(saltResolved)))
        index.assigned
          .withColumn("__salt", explode(array((0 until saltResolved).map(lit): _*)))
          .join(saltedProbed.hint("shuffle_hash"), Seq("__list", "__salt"))
      }
    val cand = joined
      .filter(col("__id") =!= col("query_id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        call_function("graft_qdot", col("__qv"), col("__v")).as("dot"))
    // graft_topk bounded-aggregate ranking: a query's candidate set is
    // nprobe/nlist of the corpus — at scale that must never sort at all
    // (the 100x rehearsal measured 17 GiB of window-sort spill here)
    Similarity.topKPerQuery(cand, "dot", k, shards = shards)
  }
}
