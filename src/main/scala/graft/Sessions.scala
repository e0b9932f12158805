package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify, Bench, and tests run
  * identically configured.
  */
object Sessions {
  /** Cores to use in local mode (the driver harness machine has 32). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // native codegen'd text-hash expressions (graft_minhash_sig, ...)
      .withExtensions(new graft.catalyst.GraftExtensions)
      // one shuffle partition per core in local mode; a real cluster would
      // size this to 2-3x total cores (or lean on AQE coalescing)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // The InferFilters* rules inline aliased expressions into derived
      // isnotnull/size>0 filters below the defining projection. Higher-order
      // array functions (transform/aggregate) are interpreted, so inlining
      // our shingle/minhash pipelines that way turns O(n) projections into
      // O(n^2)-per-row filters (measured 8x on the ngram-jaccard query and
      // 10x on explode via InferFiltersFromGenerate). Both rules only add
      // redundant pre-filters for this workload.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints," +
          "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no native
      // nanos type — read as long, Tables.load converts to micros
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
