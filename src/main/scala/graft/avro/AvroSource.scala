package graft.avro

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed reader for Avro object-container files (the Kafka-Connect
  * sink output the reference restructures; SURVEY §2.1 S3).
  *
  * spark-avro is not on this classpath, so this is a self-contained source:
  * the unit of parallelism is the FILE (matching the reference's model where
  * a file is one contiguous offset range of a topic-partition), each task
  * streams one container file and attaches:
  *   - `_file`: the file path (for filename-metadata extraction, F6)
  *   - `_row_index`: the record's index within its file (deterministic under
  *     retries — file content defines it), which is exactly the reference's
  *     per-record offset assignment F7: kafkaOffset = startOffset + _row_index
  *     (worker/RestructureWorker.kt:116,127-128).
  *
  * At 100 TB scale the sink files are bounded (one per flush of one
  * topic-partition), so file-granular tasks parallelize naturally across
  * executors; schema drift within a topic is handled by grouping files by
  * writer-schema fingerprint BEFORE reading (schemaGroups), the plan-time
  * analog of the reference's write-retry attempt suffix.
  */
object AvroSource {

  /** Marks a DETERMINISTIC container-corruption failure (bad magic, sync
    * mismatch, truncation): the bytes on storage are wrong, so retrying is
    * pointless and quarantine is the correct response. Everything else —
    * timeouts, throttling, connection resets — is treated as transient:
    * retried, and if retries exhaust, PROPAGATED so the task fails loudly.
    * Quarantining on a transient error would silently lose a healthy
    * file's records forever (its range never commits, but listing only
    * matches *.avro so it would never be retried either). */
  final class CorruptContainerException(msg: String)
      extends java.io.IOException(msg)

  /** IMPORTANT: AvroRuntimeException is NOT corruption evidence —
    * DataFileStream wraps transient IOExceptions from the underlying
    * stream in AvroRuntimeException (hasNext/next), so treating it as
    * deterministic would quarantine a healthy file on a connection reset.
    * Only the validator's own verdict (which is length-aware, see
    * validateContainer) and the unambiguous bad-magic signal qualify. */
  private def isCorruption(e: Throwable): Boolean = e match {
    case _: CorruptContainerException => true
    case io: java.io.IOException => // DataFileStream's bad-magic signal
      Option(io.getMessage).exists(_.toLowerCase.contains("not an avro data file"))
    case _ => false
  }

  /** Bounded retry with linear backoff, the reference's storage fault
    * tolerance (source/S3SourceStorage.kt:110-136): 3 attempts, sleep
    * (attempt+1)*backoff between them. FileNotFound (a raced deletion) and
    * deterministic corruption short-circuit — neither gets better by
    * waiting. */
  def faultTolerant[T](attempts: Int = 3, backoffMs: Long = 1000L)(f: Int => T): T = {
    var last: Exception = null
    var i = 0
    while (i < attempts) {
      try return f(i)
      catch {
        case fnf: java.io.FileNotFoundException => throw fnf
        case e: Exception if isCorruption(e) => throw e
        case e: Exception =>
          last = e
          if (i < attempts - 1) Thread.sleep((i + 1) * backoffMs)
      }
      i += 1
    }
    throw last
  }

  /** Move a corrupt file aside as `<name>.corrupted[-i]` (first free
    * suffix, matching worker/FileCache.kt:172-201) so the next pass does
    * not trip over it again. Returns the quarantine path, or None if the
    * rename failed (another task may have raced it). */
  def quarantine(fs: org.apache.hadoop.fs.FileSystem,
                 path: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
    val candidates = Iterator.single("") ++ (0 until 100).iterator.map(i => s"-$i")
    val free = candidates
      .map(s => new org.apache.hadoop.fs.Path(path.getParent, s"${path.getName}.corrupted$s"))
      .find(p => !fs.exists(p))
    free.filter { target =>
      try fs.rename(path, target) catch { case _: Exception => false }
    }
  }

  /** Fetch a file's COMPLETE bytes, length-verified: a stream that ends
    * short of the file's stat'd length throws IOException (retried by
    * [[faultTolerant]]), so a returned array is proof the storage
    * delivered the whole object. That proof is what lets the tolerant
    * read classify EVERY later failure as deterministic: once the bytes
    * are complete and in memory, validation and decode are pure functions
    * of them — a failure cannot be transient IO, so quarantining is safe
    * (the failure mode the reference's corrupt-file handling covers,
    * worker/FileCache.kt:172-201). A file rewritten between stat and read
    * shows up as a length mismatch and simply retries against the new
    * stat. */
  private[graft] def readFullyVerified(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path): Array[Byte] = {
    val len = fs.getFileStatus(hp).getLen
    val in = fs.open(hp)
    try {
      val buf = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      if (buf.length != len)
        throw new java.io.IOException(
          s"stream delivered ${buf.length} of $len bytes: $hp")
      buf
    } finally in.close()
  }

  /** Structural validation of an Avro object-container: walk the blocks
    * (count, size, data, sync) at the byte level — no datum decode — and
    * verify every sync marker, with EOF legal only at a block boundary.
    * Needed because DataFileStream treats EOF ANYWHERE as a clean end of
    * file: a truncated container silently yields fewer records instead of
    * an error (the reference merely logs the count mismatch,
    * worker/RestructureWorker.kt:76-80; quarantine needs a hard signal).
    * Cost: one streamed pass over the file, IO-bound, no allocation per
    * record. */
  /** Counts bytes actually delivered by the wrapped stream, so EOF inside
    * the validator can be attributed: fewer bytes than the file's known
    * length = the STREAM died (transient), full length = the FILE is
    * truncated relative to its own structure (deterministic). */
  private final class CountingInputStream(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    var count = 0L
    override def read(): Int = { val b = super.read(); if (b >= 0) count += 1; b }
    override def read(buf: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(buf, off, len); if (n > 0) count += n; n
    }
    override def skip(n: Long): Long = { val s = super.skip(n); count += s; s }
  }

  def validateContainer(open: () => java.io.InputStream, expectedLen: Long = -1L): Boolean = {
    val in = new CountingInputStream(open())
    // EOF/decode failure with the stream short of the file's known length
    // is a transient IO fault, not evidence about the bytes on storage —
    // surface it as IOException so the retry loop re-runs validation
    def shortStream(): Boolean = expectedLen >= 0 && in.count < expectedLen
    try {
      val dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(in, null)
      val magic = new Array[Byte](4)
      dec.readFixed(magic)
      if (!java.util.Arrays.equals(magic, Array[Byte]('O', 'b', 'j', 1))) return false
      var n = dec.readMapStart()
      while (n != 0) {
        var i = 0L
        while (i < n) { dec.skipString(); dec.skipBytes(); i += 1 }
        n = dec.mapNext()
      }
      val sync = new Array[Byte](16)
      dec.readFixed(sync)
      val blockSync = new Array[Byte](16)
      while (!dec.isEnd) {
        dec.readLong() // record count
        var remaining = dec.readLong() // block byte size
        while (remaining > 0) {
          val step = math.min(remaining, Int.MaxValue.toLong).toInt
          dec.skipFixed(step)
          remaining -= step
        }
        dec.readFixed(blockSync)
        if (!java.util.Arrays.equals(sync, blockSync)) return false
      }
      true
    } catch {
      case e: java.io.EOFException =>
        if (shortStream())
          throw new java.io.IOException(
            s"stream ended after ${in.count} of $expectedLen bytes", e)
        false // EOF at the file's real end inside a block: truncated
      case e: org.apache.avro.AvroRuntimeException =>
        if (shortStream())
          throw new java.io.IOException(
            s"stream ended after ${in.count} of $expectedLen bytes", e)
        false
    } finally in.close()
  }

  /** Writer schema of one container file, read from its header (driver or
    * executor side; only the header block is consumed). STRICT: the
    * schema is round-tripped through a validating parser, because
    * DataFileStream parses header schemas leniently (name validation
    * off) — a damaged-but-JSON-valid schema (e.g. a flipped byte turning
    * a field name into `ti}e`) would otherwise pass planning here and
    * then kill the read tasks, whose per-task re-parse is strict
    * (AvroFuzzPropertySpec caught this live). The throw surfaces as a
    * deterministic header failure, which the tolerant path arbitrates
    * into quarantine. */
  def writerSchema(open: () => java.io.InputStream): Schema = {
    val in = open()
    try {
      val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try new Schema.Parser().parse(s.getSchema.toString) finally s.close()
    } finally in.close()
  }

  /** Group files by writer-schema fingerprint. Returns (schema, paths) per
    * distinct schema shape, in first-seen order. The header reads happen on
    * the driver: cheap (one small read per file) and required for planning;
    * for very large file counts this could itself be a Spark job. */
  def schemaGroups(spark: SparkSession, paths: Seq[String],
                   tolerant: Boolean = false,
                   backoffMs: Long = 1000L): Seq[(Schema, Seq[String])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val grouped = scala.collection.mutable.LinkedHashMap.empty[Long, (Schema, scala.collection.mutable.ArrayBuffer[String])]
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val schema =
        if (!tolerant) Some(writerSchema(() => fs.open(hp)))
        else
          try Some(faultTolerant(backoffMs = backoffMs)(_ => writerSchema(() => fs.open(hp))))
          catch {
            case _: java.io.FileNotFoundException => None // raced deletion: skip
            case e: Exception if isCorruption(e) => quarantine(fs, hp); None
            case _: Exception =>
              // ambiguous failure (header decode errors wrap transient IO
              // and real corruption alike): arbitrate on COMPLETE bytes —
              // fetch length-verified (retried), then re-derive the header
              // purely. Any failure on complete bytes is deterministic
              // corruption (invalid structure OR an unparseable
              // header/schema) and quarantines; a fetch that cannot
              // complete re-raises so the pass fails loudly instead of
              // silently dropping a healthy file.
              arbitrateHeader(fs, hp, backoffMs)
          }
      schema.foreach { s =>
        val fp = AvroSchemas.fingerprint(s)
        grouped.getOrElseUpdate(fp, (s, scala.collection.mutable.ArrayBuffer.empty))._2 += p
      }
    }
    grouped.values.map { case (s, ps) => (s, ps.toSeq) }.toSeq
  }

  /** Header arbitration on complete bytes (see [[schemaGroups]]): returns
    * the parsed writer schema when the earlier failure was transient after
    * all, None after quarantining a deterministically corrupt file, None
    * without quarantine for a file that vanished (raced deletion).
    * Transient fetch failures that exhaust their retries PROPAGATE. */
  private def arbitrateHeader(fs: org.apache.hadoop.fs.FileSystem,
      hp: org.apache.hadoop.fs.Path, backoffMs: Long): Option[Schema] =
    try {
      val bytes = faultTolerant(backoffMs = backoffMs)(_ => readFullyVerified(fs, hp))
      val parsed =
        if (!validateContainer(() => new java.io.ByteArrayInputStream(bytes), bytes.length))
          None
        else
          try Some(writerSchema(() => new java.io.ByteArrayInputStream(bytes)))
          catch { case scala.util.control.NonFatal(_) => None }
      if (parsed.isEmpty) quarantine(fs, hp)
      parsed
    } catch { case _: java.io.FileNotFoundException => None }

  /** Read a set of same-schema container files into a DataFrame with
    * `_file` and `_row_index` metadata columns prepended.
    *
    * `tolerant` turns on the reference's storage fault tolerance
    * (S3SourceStorage.kt:110-136 + FileCache.kt:172-201): each file is
    * read all-or-nothing with bounded retries; a file that fails the
    * byte-level container validation (truncated container, bad block) is
    * quarantined as `.corrupted` and contributes NO rows — so its offset
    * range stays out of the committed state and a repaired re-upload
    * reprocesses cleanly — while transient storage errors that exhaust
    * their retries fail the task instead (quarantining a healthy file
    * would silently lose it). All-or-nothing
    * requires buffering one file per task, safe here because sink files
    * are bounded by the upstream flush policy; the non-tolerant path
    * streams. */
  def read(spark: SparkSession, paths: Seq[String], avroSchema: Schema,
           tolerant: Boolean = false, backoffMs: Long = 1000L): DataFrame = {
    val sparkType = AvroSchemas.toSparkType(avroSchema).asInstanceOf[StructType]
    val fullSchema = StructType(
      StructField("_file", StringType, nullable = false) +:
        StructField("_row_index", LongType, nullable = false) +:
        sparkType.fields)
    val schemaJson = avroSchema.toString
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // one task per file: the file is the reference's unit of offset
    // accounting AND bounded in size by the upstream sink's flush policy
    val rdd = spark.sparkContext
      .parallelize(paths, math.max(paths.size, 1))
      .flatMap { path =>
        val schema = new Schema.Parser().parse(schemaJson)
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(serConf.value)
        def openRows(): (DataFileStream[GenericRecord], java.io.InputStream, Iterator[Row]) = {
          val in = fs.open(hp)
          val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord](schema))
          var i = -1L
          val it = stream.iterator.asScala.map { rec =>
            i += 1
            Row.fromSeq(
              path +: i +: sparkType.fields.indices.map { f =>
                AvroSchemas.toSparkValue(rec.get(f), avroFieldSchema(schema, f))
              })
          }
          (stream, in, it)
        }
        // zero-length guard (P8); in tolerant mode a vanished file (races
        // with quarantine when the plan executes more than once) reads as
        // empty rather than failing the stage
        val len =
          try fs.getFileStatus(hp).getLen
          catch { case _: java.io.FileNotFoundException if tolerant => -1L }
        if (len <= 0) Iterator.empty
        else if (!tolerant) {
          val (stream, in, it) = openRows()
          val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
          val close = () =>
            if (closed.compareAndSet(false, true)) { stream.close(); in.close() }
          // close on task completion too: AutoCloseIterator only closes on
          // exhaustion, so an early-terminating consumer (limit, failed or
          // killed task) would otherwise leak the container stream and its
          // storage connection — Spark's own file sources register the
          // same listener
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              try close() catch { case _: Exception => () }))
          new AutoCloseIterator(it, close)
        } else {
          try {
            // FETCH-then-decode: transient IO is confined to the byte
            // fetch (length-verified, retried). Everything after operates
            // on complete in-memory bytes, so any failure — structural
            // invalidity (truncated container, bad sync) OR an
            // undecodable datum inside a structurally valid block (the
            // case a stream-based read could not tell apart from a
            // connection reset) — is a deterministic property of the
            // bytes and quarantines, the reference's posture
            // (FileCache.kt:172-201). Buffering one file per task is the
            // all-or-nothing contract this path already had.
            val bytes = faultTolerant(backoffMs = backoffMs)(_ => readFullyVerified(fs, hp))
            // structural check first: DataFileStream reads a truncated
            // container as a clean short file, so corruption must be
            // detected at the byte level to be distinguishable. It also
            // bounds every declared block size by the real file length,
            // so the decode below cannot be driven into huge allocations
            if (!validateContainer(() => new java.io.ByteArrayInputStream(bytes), bytes.length))
              throw new CorruptContainerException(s"invalid avro container: $path")
            try {
              val stream = new DataFileStream(new java.io.ByteArrayInputStream(bytes),
                new GenericDatumReader[GenericRecord](schema))
              try {
                var i = -1L
                stream.iterator.asScala.map { rec =>
                  i += 1
                  Row.fromSeq(
                    path +: i +: sparkType.fields.indices.map { f =>
                      AvroSchemas.toSparkValue(rec.get(f), avroFieldSchema(schema, f))
                    })
                }.toVector.iterator // all-or-nothing: buffer before emitting
              } finally stream.close()
            } catch {
              case e if isCorruption(e) => throw e
              case scala.util.control.NonFatal(e) =>
                throw new CorruptContainerException(
                  s"undecodable avro container: $path (${e.getMessage})")
            }
          } catch {
            case _: java.io.FileNotFoundException => Iterator.empty // raced deletion
            case e if isCorruption(e) =>
              quarantine(fs, hp) // corrupt container: set it aside, emit nothing
              Iterator.empty
            // anything else propagates: Spark retries the task, and a
            // persistent storage outage fails the job instead of silently
            // dropping a healthy file's records
          }
        }
      }
    spark.createDataFrame(rdd, fullSchema)
  }

  private def avroFieldSchema(schema: Schema, pos: Int): Schema =
    schema.getFields.get(pos).schema()

  /** Iterator that closes its resource when exhausted. */
  private final class AutoCloseIterator(it: Iterator[Row], close: () => Unit)
      extends Iterator[Row] {
    private var closed = false
    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !closed) { closed = true; close() }
      h
    }
    override def next(): Row = it.next()
  }
}
