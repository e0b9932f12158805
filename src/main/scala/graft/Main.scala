package graft

import graft.restructure.{Cleaner, ConfigLoader, Restructure, Service, YamlConfig}

/** CLI entry point, mirroring the reference application's modes
  * (Application.kt:177-207): one-shot restructure, optional cleaner, or
  * long-running service.
  *
  * {{{
  * runMain graft.Main --config app.properties            # one restructure pass
  * runMain graft.Main --config restructure.yml           # reference-shaped yaml
  * runMain graft.Main --config app.properties --clean    # + cleaner pass
  * runMain graft.Main --config app.properties --timer    # per-phase timers
  * runMain graft.Main --config app.properties --service \
  *   --interval 300000 --cleaner-interval 1260000        # polling mode
  * runMain graft.Main --config app.properties --stream   # one streaming
  *   # catch-up pass per topic via the DSv2 Avro source (checkpointed
  *   # under <output>/_checkpoints/<topic>)
  * runMain graft.Main --curate --input docs.parquet --output out/ \
  *   [--keep-langs en,de] [--keep-best] [--block-terms w1,w2]
  *   [--block-phrases "bad phrase,other phrase"] [--span-grams 8]
  *   [--url-col url]
  *   # corpus curation: cleanup -> quality gate -> exact + near dedup ->
  *   # deterministic split, written partitioned by split (no --config)
  * }}}
  *
  * A `.yml`/`.yaml` config is loaded through [[YamlConfig]]: its storage
  * credentials land in the session's Hadoop configuration, and its
  * service/cleaner sections provide the mode defaults (explicit CLI flags
  * still win).
  */
object Main {
  def main(args: Array[String]): Unit = {
    var configPath: Option[String] = None
    var service = false
    var stream = false
    var clean = false
    var timer = false
    var curate = false
    var input: Option[String] = None
    var output: Option[String] = None
    var keepLangs: Set[String] = Set.empty
    var blockTerms: Set[String] = Set.empty
    var blockPhrases: Set[String] = Set.empty
    var keepBest = false
    var spanGrams: Option[Int] = None
    var urlCol: Option[String] = None
    var interval: Option[Long] = None
    var cleanerInterval: Option[Long] = None
    var cleanerAgeMs: Option[Long] = None
    var i = 0
    // value-taking flags must not run off the end of args with an
    // ArrayIndexOutOfBoundsException — report the flag instead
    def value(j: Int): String =
      if (j < args.length) args(j)
      else {
        System.err.println(s"missing value for ${args(j - 1)}")
        sys.exit(2); throw new IllegalStateException
      }
    while (i < args.length) {
      args(i) match {
        case "--config"           => configPath = Some(value(i + 1)); i += 2
        case "--service"          => service = true; i += 1
        case "--stream"           => stream = true; i += 1
        case "--clean"            => clean = true; i += 1
        case "--timer"            => timer = true; i += 1
        case "--curate"           => curate = true; i += 1
        case "--input"            => input = Some(value(i + 1)); i += 2
        case "--output"           => output = Some(value(i + 1)); i += 2
        case "--keep-best"        => keepBest = true; i += 1
        case "--keep-langs" =>
          keepLangs = value(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSet
          i += 2
        case "--block-terms" =>
          blockTerms = value(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSet
          i += 2
        case "--block-phrases" =>
          blockPhrases = value(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSet
          i += 2
        case "--span-grams"       => spanGrams = Some(value(i + 1).toInt); i += 2
        case "--url-col"          => urlCol = Some(value(i + 1)); i += 2
        case "--interval"         => interval = Some(value(i + 1).toLong); i += 2
        case "--cleaner-interval" => cleanerInterval = Some(value(i + 1).toLong); i += 2
        case "--cleaner-age-ms"   => cleanerAgeMs = Some(value(i + 1).toLong); i += 2
        case other =>
          System.err.println(s"unknown argument: $other"); sys.exit(2)
      }
    }
    if (keepBest && !curate) {
      System.err.println("--keep-best only applies to --curate mode")
      sys.exit(2)
    }
    if (keepLangs.nonEmpty && !curate) {
      // accepting the flag while silently not applying the filter would be
      // worse than rejecting it — only the curate pipeline has a lang gate
      System.err.println("--keep-langs only applies to --curate mode")
      sys.exit(2)
    }
    if ((blockTerms.nonEmpty || blockPhrases.nonEmpty) && !curate) {
      System.err.println("--block-terms/--block-phrases only apply to --curate mode")
      sys.exit(2)
    }
    if (spanGrams.nonEmpty && !curate) {
      System.err.println("--span-grams only applies to --curate mode")
      sys.exit(2)
    }
    if (urlCol.nonEmpty && !curate) {
      System.err.println("--url-col only applies to --curate mode")
      sys.exit(2)
    }
    if (curate) {
      val (in, out) = (input, output) match {
        case (Some(a), Some(b)) => (a, b)
        case _ =>
          System.err.println("usage: graft.Main --curate --input <parquet> --output <dir>")
          sys.exit(2); throw new IllegalStateException
      }
      val spark = Sessions.build("graft-curate")
      val n = runCurate(spark, in, out, keepLangs, keepBest, blockTerms, blockPhrases,
        spanGrams, urlCol)
      println(s"[graft] curated $n docs -> $out")
      spark.stop()
      return
    }
    val path = configPath.getOrElse {
      System.err.println(
        "usage: graft.Main --config <properties|yaml> [--service] [--clean] " +
          "| --curate --input <parquet> --output <dir>")
      sys.exit(2); throw new IllegalStateException
    }
    val app = // yaml configs carry the full reference surface
      if (path.endsWith(".yml") || path.endsWith(".yaml")) Some(YamlConfig.load(path))
      else None
    val config0 = app.map(_.restructure).getOrElse(ConfigLoader.fromFile(path))
    val config = if (timer) config0.copy(enableTimers = true) else config0
    val spark = Sessions.build("graft")
    app.foreach { a =>
      a.hadoopConf.foreach { case (k, v) =>
        spark.sparkContext.hadoopConfiguration.set(k, v)
      }
      service = service || a.service.enable
      clean = clean || a.cleaner.enable
    }
    val intervalMs = interval
      .orElse(app.map(_.service.intervalMs)).getOrElse(300000L)
    val cleanerIntervalMs = cleanerInterval
      .orElse(app.map(_.cleaner.intervalMs)).getOrElse(1260000L)
    val cleanerAge = cleanerAgeMs
      .orElse(app.map(_.cleaner.ageDays * 24L * 3600 * 1000))
      .getOrElse(7L * 24 * 3600 * 1000)
    val job = new Restructure(spark, config)
    val cleaner = new Cleaner(spark, config, cleanerAge)
    if (service) {
      val svc = new Service(
        restructure = () => println(s"[graft] ${job.run()}"),
        cleaner = if (clean) Some(() => println(s"[graft] cleaned ${cleaner.run()}")) else None,
        restructureIntervalMs = intervalMs,
        cleanerIntervalMs = cleanerIntervalMs)
      svc.start()
      sys.addShutdownHook { svc.stop(); spark.stop() }
      Thread.currentThread().join() // run until interrupted
    } else if (stream) {
      println(s"[graft] streamed topics=${runStream(spark, config)}")
      spark.stop()
    } else {
      val result = job.run()
      println(s"[graft] topics=${result.topics} files=${result.files}")
      if (clean) {
        val (deleted, reprocess) = cleaner.run()
        println(s"[graft] cleaned deleted=${deleted.size} reprocess=${reprocess.size}")
      }
      spark.stop()
    }
  }

  /** The --stream mode body: one streaming catch-up pass per discovered
    * topic, all started CONCURRENTLY (they are independent queries sharing
    * the session's scheduler), then awaited — wall clock is the slowest
    * topic, not the sum. A topic dir with no readable sink files yet
    * cannot provide a stream schema: catch and skip it this pass (catch
    * rather than pre-list — a filter would re-list every topic dir the
    * source is about to list anyway). Returns the number of topics
    * streamed. */
  def runStream(
      spark: org.apache.spark.sql.SparkSession,
      config: graft.restructure.RestructureConfig): Int = {
    val job = new Restructure(spark, config)
    val queries = job.listTopics().flatMap { t =>
      try Some(t -> graft.streaming.Streaming
        .restructureStream(spark, config, t, s"${config.outputDir}/_checkpoints/$t"))
      catch {
        case e: IllegalArgumentException =>
          System.err.println(s"[graft] skipping topic $t: ${e.getMessage}")
          None
      }
    }
    queries.foreach(_._2.awaitTermination())
    queries.size
  }

  /** The --curate mode body (factored out so specs can drive it on a shared
    * session): curate `in` (a documents-shaped parquet with doc_id + text)
    * and write the result partitioned by split; returns the curated row
    * count. `keepLangs` (CLI --keep-langs en,de) applies the pipeline's
    * language keep-list — the same row-local gate the streaming intake
    * shares via CorpusPipeline.rowLocalGate. */
  def runCurate(
      spark: org.apache.spark.sql.SparkSession,
      in: String,
      out: String,
      keepLangs: Set[String] = Set.empty,
      keepBest: Boolean = false,
      blockTerms: Set[String] = Set.empty,
      blockPhrases: Set[String] = Set.empty,
      spanGrams: Option[Int] = None,
      urlCol: Option[String] = None): Long = {
    val curated = pipelines.CorpusPipeline
      .curate(spark.read.parquet(in), "doc_id", "text",
        pipelines.CorpusPipeline.Config(
          keepLangs = keepLangs, keepBestInCluster = keepBest,
          blockTerms = blockTerms, blockPhrases = blockPhrases,
          spanDedupGrams = spanGrams, urlCol = urlCol))
    // rebalance on the partition column before the dynamic-partition write —
    // same tiny-file fix as Restructure.write (without it every task writes
    // to every split directory)
    curated
      .hint("rebalance", org.apache.spark.sql.functions.col("split"))
      .write.mode("overwrite").partitionBy("split").parquet(out)
    spark.read.parquet(out).count()
  }
}
