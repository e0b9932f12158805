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

  /** Writer schema of one container file, read from its header (driver or
    * executor side; only the header block is consumed). */
  def writerSchema(open: () => java.io.InputStream): Schema = {
    val in = open()
    try {
      val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    } finally in.close()
  }

  /** Group files by writer-schema fingerprint. Returns (schema, paths) per
    * distinct schema shape, in first-seen order. The header reads happen on
    * the driver: cheap (one small read per file) and required for planning;
    * for very large file counts this could itself be a Spark job. */
  def schemaGroups(spark: SparkSession, paths: Seq[String]): Seq[(Schema, Seq[String])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val grouped = scala.collection.mutable.LinkedHashMap.empty[Long, (Schema, scala.collection.mutable.ArrayBuffer[String])]
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val schema = writerSchema(() => fs.open(hp))
      val fp = AvroSchemas.fingerprint(schema)
      grouped.getOrElseUpdate(fp, (schema, scala.collection.mutable.ArrayBuffer.empty))._2 += p
    }
    grouped.values.map { case (s, ps) => (s, ps.toSeq) }.toSeq
  }

  /** Read a set of same-schema container files into a DataFrame with
    * `_file` and `_row_index` metadata columns prepended. */
  def read(spark: SparkSession, paths: Seq[String], avroSchema: Schema): DataFrame = {
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
        if (fs.getFileStatus(hp).getLen == 0) Iterator.empty // zero-length guard (P8)
        else {
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
          new AutoCloseIterator(it, () => { stream.close(); in.close() })
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
