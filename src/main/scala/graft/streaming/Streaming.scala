package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.functions.Times

/** Structured Streaming facade for the engine (SURVEY §2.8).
  *
  * The reference is a micro-batch polling pipeline; its streaming-native
  * re-expression is the file source + `Trigger.AvailableNow`: each
  * invocation processes exactly the files that arrived since the last
  * checkpoint — Spark's checkpointed file-source state replaces the
  * hand-rolled offset-range set for sources Spark can track natively.
  * (The Avro restructure keeps the explicit offset table instead: its
  * unbounded-lateness model (W4) forbids watermark state eviction, and
  * its incremental unit is the Kafka offset range, not the file.)
  */
object Streaming {

  /** Incremental hourly bin counts over a parquet event stream: tumbling
    * 1-hour window + watermark bounds state; AvailableNow makes each call a
    * single catch-up batch (the reference's polling pass, W2). */
  def hourlyBinCounts(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      watermark: String = "2 hours"): StreamingQuery = {
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    val agg = in
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), Times.DefaultBinFormat).as("bin"),
        col("event_type"), col("n"))
    agg.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming twin of [[graft.operators.Sessionize]]: Spark's built-in
    * session_window merges events separated by less than `gap` into one
    * window per key; the watermark closes sessions and bounds state, and
    * AvailableNow makes each call one catch-up pass. (Boundary note: an
    * event at exactly `gap` after the previous one starts a NEW session
    * here — session windows are end-exclusive — while the batch operator
    * splits only on gaps strictly greater than the threshold.) */
  def sessionCounts(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      gap: String = "30 minutes",
      watermark: String = "2 hours"): StreamingQuery = {
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    val agg = in
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
    agg.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming twin of the keep-first dedup (D2,
    * [[graft.operators.Dedup]]): each key is emitted exactly once across
    * micro-batches, and `dropDuplicatesWithinWatermark` evicts a key's
    * state once the watermark passes its event time — so state is bounded
    * by the lateness horizon, not by the number of distinct keys ever seen
    * (the difference between a stream that survives 100 TB and one whose
    * state store grows monotonically). Duplicates arriving later than the
    * watermark are the documented trade-off, same as any watermarked
    * streaming dedup. */
  def dedupStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      keyCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours",
      tsCol: String = "ts"): StreamingQuery = {
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    in.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming URL-frontier dedup — the crawl-intake twin of the batch
    * [[graft.pipelines.CorpusPipeline.urlDedup]] stage: arriving fetches
    * key on the canonical [[graft.functions.Urls.dedupKey]], so the same
    * page under different raw spellings is admitted once per watermark
    * horizon. Un-parseable URLs fall back to a per-record key (they all
    * survive — no URL evidence is not duplicate evidence), and state
    * evicts with the watermark exactly as [[dedupStream]]: O(pages per
    * horizon), never O(frontier). The horizon is the deliberate
    * streaming trade — a re-fetch later than the watermark re-enters and
    * is caught by the periodic batch compaction, the same division of
    * labor as curateStream vs the batch pipeline. */
  def urlDedupStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      urlCol: String = "url",
      idCol: String = "doc_id",
      watermark: String = "2 hours",
      tsCol: String = "ts"): StreamingQuery = {
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    in.withColumn("__uk", coalesce(
        graft.functions.Urls.dedupKey(col(urlCol)),
        graft.functions.Urls.fallbackKey(col(idCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__uk"))
      .drop("__uk")
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming crawl-frontier refresh — [[urlDedupStream]] plus the
    * CROSS-RUN guard: each micro-batch is first anti-joined against a
    * persisted [[graft.dedup.UrlFrontier]] parquet index (a stream-static
    * join, stateless), so pages fetched in ANY earlier crawl generation
    * are never re-admitted; the watermark state then dedups within this
    * run's horizon exactly as urlDedupStream. The frontier SNAPSHOT is
    * fixed at query start: the static side's parquet file index is
    * resolved once when the DataFrame is built, so frontier files written
    * after `start()` are not seen by this query. That is exactly right
    * for the intended generation loop (AvailableNow run → UrlFrontier
    * .update → next run starts a fresh query and re-reads); a long-lived
    * query needing a LIVE frontier would re-read it inside foreachBatch
    * instead.
    * State stays O(pages per horizon) — the frontier itself never enters
    * the state store, it streams through the join as a build side. Null
    * canonical keys (un-parseable URLs) survive the anti-join by
    * construction and collapse as singletons under the shared fallback
    * sentinel — batch-identical semantics, pinned by StreamingSpec. */
  def urlFrontierRefreshStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      frontierPath: String,
      urlCol: String = "url",
      idCol: String = "doc_id",
      watermark: String = "2 hours",
      tsCol: String = "ts"): StreamingQuery = {
    val frontier = graft.dedup.UrlFrontier.loadIndex(spark, frontierPath)
      .select(col("__uk"))
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    in.withColumn("__uk", graft.functions.Urls.dedupKey(col(urlCol)))
      .join(frontier, Seq("__uk"), "left_anti")
      .withColumn("__uk2", coalesce(col("__uk"),
        graft.functions.Urls.fallbackKey(col(idCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__uk2"))
      .drop("__uk", "__uk2")
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming corpus intake — the incremental twin of CorpusPipeline's
    * stateless stages: cleanup + annotate fuse into the scan projection
    * (row-local, no state), the row-local quality gates (token-count
    * minimum + language keep-list, shared verbatim with the batch pipeline
    * via [[graft.pipelines.CorpusPipeline.rowLocalGate]]) drop docs before
    * any state is touched, and exact dedup keys on the cleaned-text
    * fingerprint inside the watermark horizon. State is bounded by the
    * lateness horizon exactly as [[dedupStream]] — fingerprints evict when
    * the watermark passes, so the store is O(docs per horizon), never
    * O(corpus). The batch pipeline's corpus-global passes (repetition
    * gate, near-dedup, split) stay batch by design: they need corpus-wide
    * aggregation; run them over this stream's output as periodic
    * compaction. */
  def curateStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      cfg: graft.pipelines.CorpusPipeline.Config = graft.pipelines.CorpusPipeline.Config(),
      watermark: String = "2 hours"): StreamingQuery = {
    val in = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
    graft.pipelines.CorpusPipeline
      .rowLocalGate(graft.pipelines.CorpusPipeline.annotate(in, textCol), cfg)
      .withWatermark(tsCol, watermark)
      // dedup on clean_text ITSELF, the batch twin's exact-dedup key
      // (CorpusPipeline.exactDedup groups on clean_text): a hash
      // fingerprint here would silently DROP real documents on collision
      // — Text.fingerprint's word codes are (length, first char) pairs, so
      // distinct docs collide routinely — and batch/stream curation would
      // diverge by losing data. The state stores the text for the
      // watermark horizon; that memory is the price of exactness, same as
      // the batch group-by key
      .dropDuplicatesWithinWatermark("clean_text")
      .select(col(idCol), col(tsCol), col("clean_text"), col("n_tokens"), col("pred_lang"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outputDir)
      .start()
  }

  /** Streaming crawl-refresh — the incremental twin of
    * [[graft.dedup.Incremental]]: each micro-batch of NEW documents is
    * deduplicated against the PERSISTED reference index
    * ([[graft.dedup.Incremental.Index]], three parquet projections built
    * once by a batch run) and the survivors append to the curated output.
    * The reference text is never read; per batch the work is the new
    * batch's own hashes plus the band-key slice of the index it collides
    * with — exactly the batch operator's refresh cost, driven by the
    * stream's checkpoint. Exactly-once despite foreachBatch's at-least-once
    * replay: each batch OVERWRITES its own `batch=<id>` partition
    * directory, so a batch replayed after a crash-between-commit-and-
    * checkpoint rewrites the same directory instead of appending
    * duplicates (read the output with `spark.read.parquet(outputDir)` —
    * `batch` surfaces as a partition column). Within-batch duplicates are
    * deliberately untouched, same contract as the batch operator; chain
    * [[dedupStream]]/[[curateStream]] upstream for in-stream dedup. */
  def incrementalDedupStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minBp: Long = 8000L): StreamingQuery = {
    val index = graft.dedup.Incremental.loadIndex(spark, indexPath)
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.dedup.Incremental
            .survivors(batch, index, idCol, textCol, minBp, native = true)
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** End-to-end STREAMING restructure for one topic: the DSv2 Avro source
    * feeds each micro-batch of new sink files through the same derive ->
    * dedup -> partitioned-write chain as the batch job, with the streaming
    * checkpoint replacing the offset-range state file. Each AvailableNow
    * call is one incremental pass (the reference's service tick, W2).
    * Delivery is AT-LEAST-ONCE into the output files: a crash between the
    * foreachBatch write and the checkpoint commit replays the batch and
    * APPENDS the same records again — exactly the batch job's own
    * write->commit crash window (W3, CrashRecoverySpec), and absorbed the
    * same way, by [[graft.restructure.Restructure.readOutput]]'s read-time
    * dedup (J4). The sibling streams here get idempotent replay from
    * batch-keyed overwrite directories; this one inherits the production
    * writer's layout (no batch= level), so it inherits the batch job's
    * crash semantics instead. */
  /** Streaming PQ index maintenance: each arriving micro-batch of vectors
    * is encoded against the PERSISTED codebooks (loaded once at stream
    * start — codebooks are KBs and training is the offline step, exactly
    * the FAISS deployment split) and written as a `batch=N` partition
    * under `outputDir`. The encode is a stateless codegen'd projection,
    * so the stream carries no state at all; exactly-once comes from the
    * idempotent per-batch overwrite (same contract as
    * [[incrementalDedupStream]]). `spark.read.parquet(outputDir)` returns
    * the STREAMED additions only; union it with the base index's
    * `indexPath/codes` for the full corpus. `outputDir` must be a fresh
    * directory, not `indexPath/codes` itself — mixing the base index's
    * flat files with `batch=N` partition dirs breaks Spark's partition
    * discovery. */
  def pqEncodeStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      indexPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery = {
    val (cb, _) = graft.similarity.PQ.loadIndex(spark, indexPath)
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.similarity.PQ.encode(cb, batch, idCol, vecCol)
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Streaming binary-quantization encode — [[pqEncodeStream]]'s sibling
    * for the BQ rung: arriving vectors are sign-bit packed
    * ([[graft.similarity.BQ.encode]]) and written as `batch=N`
    * partitions. Even simpler than PQ because BQ has NO codebook — the
    * codes projection IS the index, so there is nothing to load at
    * stream start and a refresh is exactly this stream. Stateless
    * codegen'd projection per batch; exactly-once via the idempotent
    * per-batch overwrite. `spark.read.parquet(outputDir)` returns the
    * streamed additions; union with the base codes table for the full
    * corpus. */
  def bqEncodeStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery =
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.similarity.BQ.encode(batch, idCol, vecCol)
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming IVF index maintenance — [[pqEncodeStream]]'s sibling for
    * the coarse-quantizer rung: arriving vectors are assigned to the
    * PERSISTED centroids ([[graft.similarity.IVF.loadCentroids]] once at
    * stream start — nlist x dim longs, KBs; clustering is the offline
    * step) and written as `batch=N` partitions of (__id, __v, __list)
    * rows. Stateless codegen'd projection per batch; exactly-once via
    * the idempotent per-batch overwrite. `spark.read.parquet(outputDir)`
    * returns the streamed additions; union with the base index's
    * `assigned` table (re-partitioning on __list) for the full corpus. */
  def ivfEncodeStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      indexPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery = {
    // centroids ONLY — the corpus-sized assignment table is of no use to
    // an encode stream and must not even be listed at stream start
    val centroids = graft.similarity.IVF.loadCentroids(spark, indexPath)
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.similarity.IVF.encodeNew(centroids, batch, idCol, vecCol)
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Streaming count-min-sketch maintenance — the incremental twin of the
    * heavy_hitters catalog entry. Each micro-batch of documents collapses
    * to its own 4 x 256 counter DELTA (same seed family and bucketing as
    * the batch sketch); deltas merge at read time by elementwise sum,
    * which is exact because CMS counters are linear: sketch(A ∪ B) =
    * sketch(A) + sketch(B). Per batch the output is at most 1024 rows no
    * matter the batch size, so the stream's state is the checkpoint only.
    * Exactly-once via the `batch=<id>` overwrite contract (a replayed
    * batch rewrites its own partition instead of double-counting). */
  def cmsStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      textCol: String = "text"): StreamingQuery = {
    import graft.text.Hashing.{A, B, P}
    val W = 256L
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val code = graft.text.Text.wordCode(col("w"))
          val buckets = (0 until 4).map { j =>
            struct(lit(j).as("j"), (((code % P) * A(j) + B(j)) % P % W).as("b"))
          }
          batch.select(explode(graft.text.Text.tokens(col(textCol))).as("w"))
            .select(explode(array(buckets: _*)).as("jb"))
            .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Read-time merge of [[cmsStream]] deltas into the live counter table
    * (<= 1024 rows) — what a query-time estimator loads and broadcasts. */
  def cmsCounters(spark: SparkSession, outputDir: String): DataFrame =
    spark.read.parquet(outputDir)
      .groupBy(col("j"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Streaming maintenance of the HLL distinct sketch — hll_distinct's
    * incremental twin: each micro-batch of documents collapses to its own
    * per-source register DELTA (same mix/bucket/rank pipeline as the batch
    * sketch, [[graft.sketch.HLL]]); deltas merge at read time by
    * elementwise MAX. The merge is exact because HLL registers form an
    * idempotent commutative monoid — reg(A ∪ B) = max(reg(A), reg(B)) —
    * so a replayed batch cannot even double-count; the `batch=<id>`
    * overwrite contract still applies for output hygiene. Per batch the
    * delta is <= 64 rows per source regardless of batch size. */
  def hllStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      textCol: String = "text",
      groupCol: String = "source"): StreamingQuery =
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val hashed = batch
            .select(col(groupCol),
              explode(call_function("graft_shingles", col(textCol))).as("__sh"))
            .select(col(groupCol), graft.sketch.HLL.mix(col("__sh")).as("__h"))
          graft.sketch.HLL.registers(hashed, Seq(groupCol), "__h")
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Read-time merge of [[hllStream]] deltas into the live register table
    * (<= 64 rows per group) — feed it to [[graft.sketch.HLL.estimate]]. */
  def hllRegisters(spark: SparkSession, outputDir: String,
      groupCol: String = "source"): DataFrame =
    spark.read.parquet(outputDir)
      .groupBy(col(groupCol), col("b"))
      .agg(max(col("m")).as("m"))

  /** Streaming maintenance of the bottom-k quantile sample
    * (sample_quantiles' incremental twin,
    * [[graft.sketch.SampleQuantiles]]): each micro-batch collapses to its
    * own per-group bottom-k DELTA — at most k rows per group per batch
    * regardless of batch size — and deltas merge at read time by
    * re-ranking, exact because the hash-selected bottom-k is mergeable:
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) (spec-pinned in
    * SampleQuantilesSpec). A replayed batch overwrites its own
    * `batch=<id>` delta, so recovery cannot double-select. */
  def quantileSampleStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      groupCol: String = "source",
      valueCol: String = "n_chars",
      idCol: String = "doc_id",
      k: Int = graft.sketch.SampleQuantiles.K): StreamingQuery =
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sketch.SampleQuantiles
            .bottomK(batch.select(groupCol, idCol, valueCol), Seq(groupCol), idCol, k)
            .write.mode("overwrite").parquet(s"$outputDir/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Read-time merge of [[quantileSampleStream]] deltas into the live
    * sample (<= k rows per group) and its quantile table — the streaming
    * answer to feed dashboards without ever re-reading the corpus. */
  def quantileSample(spark: SparkSession, outputDir: String,
      groupCol: String = "source",
      valueCol: String = "n_chars",
      idCol: String = "doc_id",
      k: Int = graft.sketch.SampleQuantiles.K): DataFrame =
    graft.sketch.SampleQuantiles.quantilesOfSample(
      graft.sketch.SampleQuantiles.bottomK(
        spark.read.parquet(outputDir).drop("h"), Seq(groupCol), idCol, k),
      Seq(groupCol), valueCol, idCol)

  /** Streaming maintenance of the per-user integer EWMA (user_ewma's
    * incremental twin). EWMA is an ORDER-DEPENDENT fold, not a mergeable
    * sketch, so the stream carries explicit state: each micro-batch folds
    * its (event_id-ordered) new events on top of the prior state's ewma
    * — fold(fold(0, xs1), xs2) = fold(0, xs1 ++ xs2) exactly, provided
    * event ids arrive non-decreasing across batches — and writes the full
    * state table to `state/batch=<id>`. Keying state by batch id makes
    * replay idempotent (a re-run of batch k rebuilds state k from state
    * k-1 instead of double-folding); [[ewmaState]] reads the latest
    * snapshot. State is one row per user — the same size as the answer. */
  def ewmaStream(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val prior = latestStateBatch(spark, s"$outputDir/state", batchId) match {
            case Some(b) => spark.read.parquet(s"$outputDir/state/batch=$b")
            case None =>
              spark.emptyDataFrame
                .select(lit(0L).as("user_id"), lit(0L).as("n_events"),
                  lit(0L).as("ewma_cents")).limit(0)
          }
          val folded = batch
            .select(col("user_id"), col("event_id"),
              round(col("value") * 100).cast("long").as("cents"))
            .groupBy(col("user_id"))
            .agg(
              sort_array(collect_list(struct(col("event_id"), col("cents"))))
                .as("xs"),
              count(lit(1)).as("n_new"))
            .join(prior, Seq("user_id"), "full_outer")
            .select(col("user_id"),
              (coalesce(col("n_events"), lit(0L)) + coalesce(col("n_new"), lit(0L)))
                .as("n_events"),
              when(col("xs").isNull, col("ewma_cents")).otherwise(expr(
                "aggregate(transform(xs, x -> x.cents), " +
                  "coalesce(ewma_cents, 0L), (acc, x) -> (acc + x) div 2)"))
                .as("ewma_cents"))
          folded.write.mode("overwrite").parquet(s"$outputDir/state/batch=$batchId")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The latest [[ewmaStream]] state snapshot (one row per user). */
  def ewmaState(spark: SparkSession, outputDir: String): DataFrame =
    latestStateBatch(spark, s"$outputDir/state", Long.MaxValue) match {
      case Some(b) => spark.read.parquet(s"$outputDir/state/batch=$b")
      case None => throw new IllegalStateException(s"no state under $outputDir")
    }

  /** Largest batch id < `before` among `dir`'s batch=<id> children. */
  private def latestStateBatch(
      spark: SparkSession, dir: String, before: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
      .filter(_ < before)
      .sorted(Ordering[Long].reverse)
      .headOption
  }

  /** Crash-window test seams (StreamingCrashSpec — the streaming analog
    * of [[graft.restructure.Restructure]]'s `beforeCommit`): `batchSeam`
    * transforms the incoming micro-batch before derivation, so a spec can
    * plant a task-killing expression INSIDE the write epoch; `afterWrite`
    * runs after the sink write and before foreachBatch returns — a throw
    * there lands exactly in the written-but-checkpoint-uncommitted window
    * the docstring's at-least-once contract describes. Production callers
    * pass neither; the defaults are identity/no-op. */
  def restructureStream(
      spark: SparkSession,
      config: graft.restructure.RestructureConfig,
      topic: String,
      checkpointDir: String,
      batchSeam: DataFrame => DataFrame = identity,
      afterWrite: Long => Unit = _ => ()): StreamingQuery = {
    val job = new graft.restructure.Restructure(spark, config)
    spark.readStream
      .format("graft.avro.AvroStreamSource")
      .load(s"${config.inputDir}/$topic")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val derived = job.deriveStream(topic, batchSeam(batch))
          job.writeSidecar(topic, derived)
          job.write(topic, job.dedup(topic, derived))
          afterWrite(batchId)
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Per-key processed-offset tracking as streaming custom state (W6):
    * mapGroupsWithState keeps (maxOffset, count) per key across batches —
    * the streaming analog of the driver-side OffsetRangeSet for pipelines
    * that stay inside Structured Streaming. */
  final case class OffsetProgress(key: Long, maxOffset: Long, total: Long)

  def trackOffsets(
      events: Dataset[(Long, Long)] /* (key, offset) */): Dataset[OffsetProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), OffsetProgress](GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[(Long, Long)]) =>
          val (prevMax, prevN) = state.getOption.getOrElse((Long.MinValue, 0L))
          var mx = prevMax
          var n = prevN
          rows.foreach { case (_, off) => if (off > mx) mx = off; n += 1 }
          state.update((mx, n))
          OffsetProgress(key, mx, n)
      }
  }
}
