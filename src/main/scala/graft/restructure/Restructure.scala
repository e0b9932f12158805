package graft.restructure

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.avro.AvroSource
import graft.functions.{Strings, Times}
import graft.operators.{Dedup, Flatten, Intervals}
import graft.state.{OffsetRangeSet, TopicPartition}

import java.time.Instant

/** Per-topic deduplication settings (reference: config/RestructureConfig.kt:233-265). */
final case class DedupConfig(
    enable: Boolean = false,
    distinctFields: Seq[String] = Seq.empty,
    ignoreFields: Seq[String] = Seq.empty)

/** Engine configuration (the subset of the reference's RestructureConfig
  * that affects dataflow; storage endpoints are Hadoop FS URIs).
  */
final case class RestructureConfig(
    inputDir: String,
    // additional source roots (the reference's paths.inputs is a list);
    // topics are discovered across all roots and a topic's files merge
    extraInputDirs: Seq[String] = Seq.empty,
    outputDir: String,
    stateFile: String,
    format: String = "csv", // csv | json | parquet
    compression: Option[String] = Some("gzip"),
    timeBinFormat: String = Times.DefaultBinFormat,
    excludeTopics: Set[String] = Set.empty,
    maxFilesPerTopic: Option[Int] = None,
    minimumFileAgeMs: Long = 60000L,
    dedup: Map[String, DedupConfig] = Map.empty,
    dedupDefault: DedupConfig = DedupConfig(),
    // data-dependent CSV headers for map/array payloads: per-key and
    // per-index columns measured from the batch (the reference's
    // first-record-derived header, format/RecordConverterFactory.kt:115-127,
    // as a per-topic schema union). Off -> maps/arrays JSON-encode into one
    // column.
    csvDataHeaders: Boolean = true,
    // when set, concurrent app instances coordinate through per-topic locks
    // and merge-commit the shared state file under a state lock
    // (accounting/RedisRemoteLockManager.kt:18-44 semantics, file-backed)
    lockDir: Option[String] = None,
    // storage fault tolerance (source/S3SourceStorage.kt:110-136,
    // worker/FileCache.kt:172-201): bounded retries on reads; a file that
    // still fails is quarantined as `.corrupted` and its range stays out
    // of the committed state
    faultTolerance: Boolean = true,
    retryBackoffMs: Long = 1000L,
    // A4 — per-phase timers (reference --timer flag,
    // config/CommandLineArgs.kt + Application.kt:185): off by default so
    // timed code pays nothing; when on, run() prints the sorted report the
    // reference emits from its shutdown hook
    enableTimers: Boolean = false,
    // determine a file's final offset from storage metadata instead of its
    // filename (source/S3SourceStorage.kt:40-59 reads the "endOffset" object
    // tag, AzureSourceStorage.kt:27-46 the blob metadata). Hadoop's FS API
    // has no tag surface, so the carrier is a `<file>.meta` properties
    // sidecar — the shape tag-less stores expose cheaply; filename parse
    // stays the fallback.
    endOffsetFromMetadata: Boolean = false,
    // cap records per output file within each (project, user, bin) dir:
    // at production volumes a hot bin otherwise becomes one giant
    // csv.gz/json.gz that downstream consumers cannot split (gzip is not
    // splittable) — the writer rolls to part-...-c001 etc. at the cap.
    // None = Spark's session default (spark.sql.files.maxRecordsPerFile,
    // 0 = unlimited).
    maxRecordsPerFile: Option[Long] = None,
    // keep-last dedup strategy: false (default) = one exchange on the key
    // columns + per-partition sort (window row_number) — spills the sort
    // gracefully when a task's groups exceed memory; true = two-phase
    // max_by aggregation (Dedup.keepLastSalted) — map-side partial
    // combine, no full sort. Results are identical (DedupSpec pins it).
    // MEASURED to lose in BOTH regimes on this pipeline (BENCHSCALE.md):
    // 100M all-unique keys 156.5k -> 110.5k rec/s with 5.2x the spill,
    // and 20M at 75% planted duplicate mass — the shape the aggregation
    // was hypothesized to win — 157k -> 94k input rec/s with 50x the
    // spill (the object-hash aggregate's full-row struct state costs
    // more than the 4:1 combine saves). The window sort is the default
    // everywhere; the knob stays as the measurement instrument that
    // settled it.
    dedupSalted: Boolean = false)

/** One source file of one topic: a contiguous offset range of a
  * topic-partition, metadata parsed from the filename
  * (reference: source/SourceStorage.kt:18-22). */
final case class TopicFile(
    topic: String,
    path: String,
    partition: Int,
    startOffset: Long,
    endOffset: Option[Long],
    lastModified: Long,
    length: Long)

/** The restructure job: incremental Avro -> partitioned flat CSV/JSON with
  * offset-range accounting (SURVEY §3.1 end to end, re-expressed
  * Spark-first).
  *
  * Scale design: listing, pruning, and offset accounting are driver-side
  * (state is O(gaps), file lists are O(files) metadata only); every
  * per-record step — decode, derive, flatten, dedup, write — is a narrow or
  * single-shuffle Spark stage over file-granular tasks. Nothing per-record
  * ever lands on the driver.
  */
final class Restructure(spark: SparkSession, config: RestructureConfig) {

  /** W3 crash-window test seam (CrashRecoverySpec): invoked once per topic
    * AFTER its output write (and ledger-range computation) succeeded and
    * BEFORE its state commit — the write-then-commit ordering makes a crash
    * here the design's worst case: part files are on disk with no ledger
    * entry, so the rerun must reprocess the batch and the read-time dedup
    * (J4, [[readOutput]]) must absorb the re-emitted rows. Production never
    * sets it; the default is a no-op and costs one megamorphic call per
    * topic batch (driver-side, off the data path). */
  private[graft] var beforeCommit: String => Unit = _ => ()

  private def inputRoots: Seq[Path] =
    (config.inputDir +: config.extraInputDirs).map(new Path(_))

  private def fsOf(p: Path) = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------ planning

  /** S1 — topic discovery: a directory containing `*.avro` files two levels
    * down is a topic root (`<topic>/partition=<p>/<file>.avro`);
    * `+tmp` dirs skipped; exclude filter applied (P4). Topics found in ANY
    * configured input root count once. */
  def listTopics(): Seq[String] =
    inputRoots.flatMap { root =>
      val rfs = fsOf(root)
      if (!rfs.exists(root)) Seq.empty[String]
      else rfs.listStatus(root).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.contains("+tmp"))
        .map(_.getPath.getName)
    }.distinct.filterNot(config.excludeTopics).sorted

  /** S2 — file listing for one topic with filename metadata (F6), merged
    * across all input roots. */
  def listFiles(topic: String): Seq[TopicFile] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TopicFile]
    val re = Strings.FilenameRegex.r
    inputRoots.foreach { root =>
      val dir = new Path(root, topic)
      val rfs = fsOf(dir)
      if (rfs.exists(dir)) {
        val it = rfs.listFiles(dir, true)
        while (it.hasNext) {
          val s: FileStatus = it.next()
          if (s.isFile && s.getPath.getName.endsWith(".avro")) {
            re.findFirstMatchIn(s.getPath.getName).foreach { m =>
              out += TopicFile(
                topic = topic,
                path = s.getPath.toString,
                partition = m.group(2).toInt,
                startOffset = m.group(3).toLong,
                endOffset = metadataEndOffset(rfs, s.getPath)
                  .orElse(Option(m.group(4)).map(_.toLong)),
                lastModified = s.getModificationTime,
                length = s.getLen)
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** endOffset from storage metadata (see RestructureConfig
    * .endOffsetFromMetadata): one extra metadata read per file, so it only
    * runs when enabled. A malformed sidecar is ignored — the filename
    * fallback keeps the pass alive. */
  private def metadataEndOffset(fs: org.apache.hadoop.fs.FileSystem, path: Path): Option[Long] = {
    if (!config.endOffsetFromMetadata) return None
    val sidecar = path.suffix(".meta")
    try {
      if (!fs.exists(sidecar)) None
      else {
        val in = fs.open(sidecar)
        try {
          val p = new java.util.Properties()
          p.load(in)
          Option(p.getProperty("endOffset")).flatMap(_.trim.toLongOption)
        } finally in.close()
      }
      // NonFatal, not just IOException: Properties.load throws
      // IllegalArgumentException on a malformed \uXXXX escape, and the
      // documented contract is that a broken sidecar falls back to the
      // filename, never kills the pass
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** P5/P6/P8/O1 — prune the file list against age, zero length, and the
    * processed-offset state; apply the per-pass limit. */
  def plan(topic: String, state: OffsetRangeSet, now: Long = System.currentTimeMillis): Seq[TopicFile] = {
    val pruned = listFiles(topic)
      .filter(_.length > 0)
      .filter(_.lastModified <= now - config.minimumFileAgeMs)
      .filterNot { f =>
        // files without an end offset in the filename check [start, start]:
        // if the file was fully processed its whole range (start..lastRecord)
        // is in state, so containment of the start is sufficient; the mtime
        // check still forces reprocessing of rewritten files (W5)
        state.contains(
          TopicPartition(f.topic, f.partition),
          f.startOffset, f.endOffset.getOrElse(f.startOffset),
          Instant.ofEpochMilli(f.lastModified))
      }
      .sortBy(f => (f.partition, f.startOffset))
    config.maxFilesPerTopic.fold(pruned)(pruned.take)
  }

  // ------------------------------------------------------------ dataflow

  /** Read one topic's planned files (grouped by writer schema — the
    * plan-time analog of the reference's schema-drift attempt suffix) and
    * derive the standard columns:
    * `_topic _partition _offset _mtime _project _user _source _time _bin`.
    */
  def readTopic(topic: String, files: Seq[TopicFile]): Seq[DataFrame] = {
    val byPath = files.map(f => f.path -> f).toMap
    AvroSource.schemaGroups(spark, files.map(_.path),
      tolerant = config.faultTolerance, backoffMs = config.retryBackoffMs).map { case (schema, paths) =>
      val df = AvroSource.read(spark, paths, schema,
        tolerant = config.faultTolerance, backoffMs = config.retryBackoffMs)
      val meta = spark.createDataFrame(
        paths.map { p =>
          val f = byPath(p)
          (p, f.partition, f.startOffset, new java.sql.Timestamp(f.lastModified))
        })
        .toDF("_file", "_partition", "_start_offset", "_mtime")
      val withMeta = df.join(broadcast(meta), "_file")
      val time = Times.eventTime(withMeta)
      withMeta
        .withColumn("_topic", lit(topic))
        .withColumn("_offset", col("_start_offset") + col("_row_index"))
        .withColumn("_project", sanitized(withMeta, "key.projectId", "unknown-project"))
        .withColumn("_user", sanitized(withMeta, "key.userId", "unknown-user"))
        .withColumn("_source", sanitized(withMeta, "key.sourceId", "unknown-source"))
        .withColumn("_time", time)
        .withColumn("_bin", Times.timeBin(col("_time"), config.timeBinFormat))
        .drop("_start_offset")
    }
  }

  /** Streaming twin of [[readTopic]]'s column derivation: the micro-batch
    * arrives from [[graft.avro.AvroStreamSource]] with `_file`/`_row_index`
    * already attached, so partition and offset come from the FILENAME (F6)
    * instead of a planned-file join, and `_mtime` is the processing time
    * (the stream's checkpoint, not the mtime state, provides incremental
    * exactly-once here). */
  def deriveStream(topic: String, df: DataFrame): DataFrame = {
    val fname = element_at(split(col("_file"), "/"), -1)
    val time = Times.eventTime(df)
    df.withColumn("_topic", lit(topic))
      .withColumn("_partition", Strings.filenamePartition(fname))
      .withColumn("_offset", Strings.filenameStartOffset(fname) + col("_row_index"))
      .withColumn("_mtime", current_timestamp())
      .withColumn("_project", sanitized(df, "key.projectId", "unknown-project"))
      .withColumn("_user", sanitized(df, "key.userId", "unknown-user"))
      .withColumn("_source", sanitized(df, "key.sourceId", "unknown-source"))
      .withColumn("_time", time)
      .withColumn("_bin", Times.timeBin(col("_time"), config.timeBinFormat))
  }

  private def sanitized(df: DataFrame, path: String, default: String): Column = {
    val exists = {
      val parts = path.split("\\.")
      df.schema.fields.find(_.name == parts(0)).map(_.dataType) match {
        case Some(s: StructType) => s.fields.exists(_.name == parts(1))
        case _                   => false
      }
    }
    if (exists) Strings.sanitizeId(col(path), default) else lit(default)
  }

  /** P7 — drop records whose offset is already covered by state (file
    * partially processed in a crashed run). Broadcast predicate, no join. */
  def filterSeen(df: DataFrame, state: OffsetRangeSet): DataFrame =
    if (state.isEmpty) df
    else Intervals.unseenByState(
      spark, df, state, "_topic", "_partition", "_offset", Some("_mtime"))

  /** D1/D2/D3 — per-topic dedup config applied over the flat record,
    * ordered by offset. */
  def dedup(topic: String, df: DataFrame): DataFrame = {
    val cfg = config.dedup.getOrElse(topic, config.dedupDefault)
    // keep-last needs a TOTAL order unique per record: _offset alone is
    // only unique within a Kafka partition, so equal-key records at the
    // same offset of different partitions would tie and the surviving
    // row would be strategy/partitioning-dependent. (_offset, _partition)
    // is globally unique — both strategies order by the struct and pick
    // the same winner deterministically.
    val ordered = df.withColumn("__ord", struct(col("_offset"), col("_partition")))
    def last(keys: Seq[String]): DataFrame =
      (if (config.dedupSalted) Dedup.keepLastSalted(ordered, keys, "__ord")
       else Dedup.keepLast(ordered, keys, "__ord")).drop("__ord")
    def ignoring(ignore: Seq[String]): Seq[String] =
      Dedup.keysIgnoring(ordered, ignore :+ "__ord", "__ord")
    if (!cfg.enable) df
    else if (cfg.distinctFields.nonEmpty) last(cfg.distinctFields)
    else if (cfg.ignoreFields.nonEmpty) last(ignoring(cfg.ignoreFields ++ metaCols))
    else last(ignoring(metaCols))
  }

  private val metaCols = Seq(
    "_file", "_row_index", "_topic", "_partition", "_offset", "_mtime",
    "_project", "_user", "_source", "_time", "_bin")

  /** S7/S9 — write one topic batch: flatten the payload, partition by
    * (project, user, bin), CSV-with-header or JSON lines, optional gzip;
    * schema sidecar once per topic. Returns the offset ranges written.
    */
  def write(topic: String, df: DataFrame): Unit = {
    val payload = df.schema.fields.map(_.name).filterNot(metaCols.contains)
    val payloadStruct = StructType(df.schema.fields.filter(f => payload.contains(f.name)))
    val flatCols =
      if (config.format == "csv" && config.csvDataHeaders &&
          Flatten.needsCsvLayout(payloadStruct)) {
        // two-pass data-dependent header: measure map keys (first-seen by
        // offset) and array lengths over the batch, then expand in place —
        // every bin file of the topic gets the same header (per-topic
        // schema union of the reference's per-file first-record header)
        val layout = Flatten.csvLayout(
          df.select((payload.map(n => col(s"`$n`")) :+ col("_offset")).toSeq: _*),
          Some("_offset"))
        val expanded = Flatten.csvColumns(payloadStruct, layout)
        // degenerate batch (every payload leaf inside maps/arrays that are
        // all empty): zero expansion columns would leave the writer with
        // only partition columns, which Spark rejects — fall back to the
        // JSON-encoded container columns for this batch
        if (expanded.nonEmpty) expanded else Flatten.flattenColumns(payloadStruct)
      } else Flatten.flattenColumns(payloadStruct)
    val out = df.select(
      (Seq(col("_project"), col("_user"), col("_bin"), col("_offset"), col("_partition"), col("_mtime")) ++
        flatCols): _*)
    val dir = s"${config.outputDir}/$topic"
    // rebalance on the partition columns before the dynamic-partition
    // write: without it EVERY task holds a writer (and a gzip stream) for
    // EVERY (project, user, bin) dir it encounters — tasks x dirs tiny
    // files and an open-file explosion (measured 8x slower at 200k
    // records / 1440 bins). The AQE rebalance hint both co-locates each
    // dir into one task and splits skewed bins.
    val writer0 = out
      .drop("_offset", "_partition", "_mtime")
      .hint("rebalance", col("_project"), col("_user"), col("_bin"))
      .write
      .partitionBy("_project", "_user", "_bin")
      .mode(SaveMode.Append)
    val writer = config.maxRecordsPerFile
      .fold(writer0)(n => writer0.option("maxRecordsPerFile", n))
    val withCompression = config.compression match {
      case Some(c) => writer.option("compression", c)
      case None    => writer
    }
    config.format match {
      case "csv"  => withCompression.option("header", "true").csv(dir)
      case "json" => withCompression.json(dir)
      // Beyond the reference's csv/json (format/FormatFactory.kt): a
      // columnar sink for lakehouse consumers, with the same flattened
      // record shape and (project, user, bin) layout. `compression: none`
      // maps to parquet's snappy default (parquet pages are the unit of
      // IO; an uncompressed page just wastes the scan), any other codec
      // name passes through (gzip, zstd).
      case "parquet" => withCompression.parquet(dir)
      case other  => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  /** A2 — offset ranges of a processed batch (computed over the PRE-dedup
    * records: the reference ledgers every record it read, including ones the
    * dedup pass later drops — worker/RestructureWorker.kt:127-135). */
  def processedRanges(df: DataFrame): DataFrame =
    Intervals.toRanges(
      df.select(col("_topic").as("topic"), col("_partition").as("partition"),
        col("_offset").as("offset"), col("_mtime").as("mtime")),
      Seq("topic", "partition"), "offset", Some("mtime"))

  /** Read a topic's output back (all bins, all part files), optionally
    * deduplicating whole rows across parts (J4: duplicates can only exist
    * after state loss forces reprocessing — the reference removes them at
    * append time by re-running dedup over the merged file; the read-time
    * equivalent is a whole-row distinct). */
  def readOutput(topic: String, dedup: Boolean = true): DataFrame = {
    val dir = s"${config.outputDir}/$topic"
    val reader = spark.read
      .option("header", "true")
      .option("pathGlobFilter", "part-*")
    val df = config.format match {
      case "csv"     => reader.csv(dir)
      case "json"    => reader.json(dir)
      case "parquet" => reader.parquet(dir)
      case other  => throw new IllegalArgumentException(s"unknown format: $other")
    }
    if (dedup) df.distinct() else df
  }

  /** Schema sidecar (S9): Spark schema JSON written once per topic dir. */
  def writeSidecar(topic: String, df: DataFrame): Unit = {
    val p = new Path(s"${config.outputDir}/$topic", s"schema-$topic.json")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!out.exists(p)) {
      val os = out.create(p, true)
      try os.write(df.schema.prettyJson.getBytes("UTF-8")) finally os.close()
    }
  }

  // ------------------------------------------------------------ lifecycle

  /** Full incremental pass: plan, read, filter, dedup, write, commit —
    * write-then-commit ordering per topic (W3: a crash before the state
    * write reprocesses the batch; dedup keeps the output idempotent). */
  def run(): RestructureResult = {
    if (config.enableTimers) {
      Timers.enabled = true
      Timers.attach(spark)
    }
    var state = loadState()
    val lockMgr = config.lockDir.map(d =>
      new FileRemoteLockManager(spark.sparkContext.hadoopConfiguration, new Path(d)))
    var filesProcessed = 0L
    var recordsWritten = 0L
    val topics = listTopics()
    topics.foreach { topic =>
      def process(): Unit = {
        // with concurrent instances, re-check the plan against the LATEST
        // committed state once the topic lock is held — another instance
        // may have finished this topic between our load and our lock. A
        // fresh reload, not an additive merge: merging would resurrect
        // ranges a concurrent cleaner REMOVED (readmission) in that
        // window, hiding the readmitted file from this pass's plan.
        // Nothing in-memory is lost — earlier topics' ranges were
        // committed to disk by commitState before this topic runs.
        if (lockMgr.isDefined) state = loadState()
        val files = Timers.time(spark, "restructure.plan")(plan(topic, state))
        if (files.nonEmpty) {
          filesProcessed += files.size
          // DataFrames are lazy: "read" times the driver-side work only
          // (header scans, schema grouping); the distributed scan/decode
          // executes inside the write job, so its task time lands under
          // "restructure.write" — the phase that RUNS the plan
          Timers.time(spark, "restructure.read")(readTopic(topic, files)).foreach { df =>
            val unseen = filterSeen(df, state)
            // A3 counters ride the write job itself — no extra pass. The
            // listener-based Observation is required here: DataFrameWriter
            // plans its own QueryExecution over the logical plan, so reading
            // observedMetrics off this DataFrame's QueryExecution would
            // consult a never-executed plan (always 0).
            val obs = org.apache.spark.sql.Observation()
            val observed = dedup(topic, unseen)
              .observe(obs, count(lit(1)).as("records"))
            Timers.time(spark, "restructure.write") {
              writeSidecar(topic, df)
              write(topic, observed)
            }
            recordsWritten += obs.get.get("records").map(_.asInstanceOf[Long]).getOrElse(0L)
            val added = Intervals.collectRanges(processedRanges(unseen))
            beforeCommit(topic) // W3 crash-window seam — no-op in production
            Timers.time(spark, "restructure.commit") {
              commitState(state, added, lockMgr) // S10 — commit after write
            }
          }
        }
      }
      lockMgr match {
        case Some(m) => m.withLock(topic)(process()) // None -> another instance owns it
        case None    => process()
      }
    }
    if (config.enableTimers) println(Timers.report)
    RestructureResult(topics.size, filesProcessed, recordsWritten)
  }

  /** Merge `added` into the in-memory state and commit. With a lock manager
    * the commit is read-merge-write under a dedicated state lock — two
    * instances that processed DIFFERENT topics both land their ranges in
    * the shared file with neither update lost (the reference gets this from
    * Redis's single-writer semantics,
    * accounting/OffsetRedisPersistence.kt:38-82). */
  private def commitState(
      state: OffsetRangeSet,
      added: OffsetRangeSet,
      lockMgr: Option[RemoteLockManager]): Unit = {
    state.addAll(added)
    lockMgr match {
      case Some(m) =>
        m.withLockRetrying("__state") {
          val disk = loadState()
          disk.addAll(added)
          saveState(disk)
          state.addAll(disk) // see other instances' progress for later plans
        }
      case None => saveState(state)
    }
  }

  /** The state file on a LOCAL filesystem must bypass Hadoop's
    * ChecksumFileSystem: its rename moves the data file and the `.crc`
    * sidecar as TWO renames, so a concurrent reader between them fails
    * with ChecksumException — exactly the atomic-visibility contract the
    * multi-instance deployment relies on (a peer's plan re-check and the
    * soak's progress polls read while another instance commits;
    * TwoInstanceSoak caught this live). java.nio's single rename(2) IS
    * atomic; non-local stores keep the FileContext path (HDFS rename is
    * atomic server-side and carries no client sidecar). Returns the raw
    * local path when the resolved filesystem is local. */
  private def localStatePath(p: Path,
      fs: org.apache.hadoop.fs.FileSystem): Option[java.nio.file.Path] =
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        Some(java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath))
      case _ => None
    }

  /** Load state; a legacy reference deployment's CSV offsets file
    * (`offsetFrom,offsetTo,partition,topic[,lastModified]` header,
    * accounting/OffsetFilePersistence.kt:95-121) is detected by its header
    * and imported transparently — the next save rewrites it as JSON. */
  def loadState(): OffsetRangeSet = {
    val p = new Path(config.stateFile)
    val sfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val text = localStatePath(p, sfs) match {
      case Some(lp) =>
        if (!java.nio.file.Files.exists(lp)) return new OffsetRangeSet
        new String(java.nio.file.Files.readAllBytes(lp), "UTF-8")
      case None =>
        if (!sfs.exists(p)) return new OffsetRangeSet
        val in = sfs.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
    }
    if (text.startsWith("offsetFrom,")) OffsetRangeSet.fromCsv(text)
    else OffsetRangeSet.fromJson(text)
  }

  /** Atomic state write: temp file in the same directory, then ONE
    * rename — atomic on local (rename(2), see [[localStatePath]]) and
    * HDFS filesystems, so a concurrent reader sees either the old or the
    * new state, never a truncated file and never a torn data/checksum
    * pair. */
  def saveState(state: OffsetRangeSet): Unit = {
    val p = new Path(config.stateFile)
    val sfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = state.toJson.getBytes("UTF-8")
    localStatePath(p, sfs) match {
      case Some(lp) =>
        if (lp.getParent != null) java.nio.file.Files.createDirectories(lp.getParent)
        val tmp = lp.resolveSibling(
          s".${lp.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, lp,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // a .crc left by a pre-fix Hadoop save would desync from raw
        // writes; readers above bypass verification, but keep the dir
        // clean so no other tool trips over it
        java.nio.file.Files.deleteIfExists(
          lp.resolveSibling(s".${lp.getFileName}.crc"))
      case None =>
        if (p.getParent != null) sfs.mkdirs(p.getParent)
        val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
        val os = sfs.create(tmp, true)
        try os.write(bytes) finally os.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
          spark.sparkContext.hadoopConfiguration)
        fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }
}

final case class RestructureResult(topics: Int, files: Long, records: Long = 0L)
