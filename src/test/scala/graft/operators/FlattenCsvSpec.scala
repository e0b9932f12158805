package graft.operators

import graft.SparkSpec
import graft.avro.AvroSource
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions.col

import java.io.File
import java.nio.file.Files
import java.nio.ByteBuffer

/** Data-dependent CSV headers (format/RecordConverterFactory.kt:115-127):
  * map keys and array indices become columns measured from the data, in
  * place, in schema order. The golden test reproduces the reference's
  * full-type matrix expectation byte for byte
  * (CsvAvroConverterTest.kt:54-63 over data/full.avsc + full.json):
  * header `a,b,c,d,e,f,g,h,i.some,i.other,j.0,j.1,k,l.la,m`.
  */
class FlattenCsvSpec extends SparkSpec {

  // the reference's full.avsc, inlined (j's union references the enclosing
  // record recursively, exactly as the fixture does)
  private val schemaJson =
    """{"type":"record","name":"full","fields":[
      | {"name":"a","type":"string"},
      | {"name":"b","type":"bytes"},
      | {"name":"c","type":{"type":"fixed","size":1,"name":"md5"}},
      | {"name":"d","type":"long"},
      | {"name":"e","type":"double"},
      | {"name":"f","type":"float"},
      | {"name":"g","type":"int"},
      | {"name":"h","type":"null"},
      | {"name":"i","type":{"type":"map","values":"int"}},
      | {"name":"j","type":{"type":"array","items":["null","string","full"]}},
      | {"name":"k","type":{"name":"KEnum","type":"enum","symbols":["S","Y","M"]}},
      | {"name":"l","type":{"name":"LRecord","type":"record","fields":[
      |   {"name":"la","type":["null","string"]}]}},
      | {"name":"m","type":"boolean"}
      |]}""".stripMargin

  private val schema = new Schema.Parser().parse(schemaJson)

  private def fullRecord(): GenericRecord = {
    val rec = new GenericData.Record(schema)
    rec.put("a", "a")
    rec.put("b", ByteBuffer.wrap(Array(255.toByte)))
    rec.put("c", new GenericData.Fixed(schema.getField("c").schema(), Array(255.toByte)))
    rec.put("d", 1000000000000000000L)
    rec.put("e", 1.21322421e-15)
    rec.put("f", 0.1213231f)
    rec.put("g", 132101)
    rec.put("h", null)
    val m = new java.util.LinkedHashMap[String, Integer]()
    m.put("some", 1); m.put("other", -1)
    rec.put("i", m)
    val arr = new java.util.ArrayList[AnyRef]()
    arr.add(null); arr.add("some")
    rec.put("j", arr)
    rec.put("k", new GenericData.EnumSymbol(schema.getField("k").schema(), "Y"))
    val l = new GenericData.Record(schema.getField("l").schema())
    l.put("la", null)
    rec.put("l", l)
    rec.put("m", false)
    rec
  }

  private def writeAvro(records: Seq[GenericRecord]): File = {
    val dir = Files.createTempDirectory("graft-flatcsv").toFile
    val file = new File(dir, "full+0+0000000000.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file)
    records.foreach(w.append)
    w.close()
    file
  }

  private def readDf(file: File) = {
    val groups = AvroSource.schemaGroups(spark, Seq(file.toString))
    AvroSource.read(spark, Seq(file.toString), groups.head._1)
  }

  test("full-type fixture produces the reference's exact CSV bytes") {
    val df = readDf(writeAvro(Seq(fullRecord())))
    val layout = Flatten.csvLayout(
      df.drop("_file"), Some("_row_index"))
    val flat = Flatten.flattenForCsv(
      df.drop("_file", "_row_index"), layout)

    assert(flat.columns.toSeq == Seq(
      "a", "b", "c", "d", "e", "f", "g", "h",
      "i.some", "i.other", "j.0", "j.1", "k", "l.la", "m"))

    val outDir = Files.createTempDirectory("graft-flatcsv-out").toFile
    flat.coalesce(1).write.option("header", "true").csv(s"$outDir/csv")
    val part = new File(s"$outDir/csv").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv")).get
    val content = new String(Files.readAllBytes(part.toPath), "UTF-8")

    // the reference's expected keys + values (CsvAvroConverterTest.kt:54-63)
    assert(content ==
      "a,b,c,d,e,f,g,h,i.some,i.other,j.0,j.1,k,l.la,m\n" +
      "a,/w,/w,1000000000000000000,1.21322421E-15,0.1213231,132101,,1,-1,,some,Y,,false\n")
  }

  test("schema union across records: first-seen key order, max array length, null fill") {
    val r1 = fullRecord()
    val r2 = fullRecord()
    val m2 = new java.util.LinkedHashMap[String, Integer]()
    m2.put("extra", 9); m2.put("some", 3) // new key AFTER the seen ones
    r2.put("i", m2)
    val a2 = new java.util.ArrayList[AnyRef]()
    a2.add("x"); a2.add(null); a2.add("z") // longer than r1's array
    r2.put("j", a2)
    val df = readDf(writeAvro(Seq(r1, r2)))
    val layout = Flatten.csvLayout(df.drop("_file"), Some("_row_index"))

    // keys in first-appearance order across the batch; arrays at max length
    assert(layout.mapKeys("i") == Seq("some", "other", "extra"))
    assert(layout.arrayLens("j") == 3)

    val flat = Flatten.flattenForCsv(df.drop("_file"), layout)
      .orderBy(col("`_row_index`"))
    val rows = flat.collect()
    val cols = flat.columns.toSeq
    assert(cols.containsSlice(Seq("i.some", "i.other", "i.extra", "j.0", "j.1", "j.2")))
    // r1 has no "extra" key and only 2 array slots -> null cells
    assert(rows(0).isNullAt(cols.indexOf("i.extra")))
    assert(rows(0).isNullAt(cols.indexOf("j.2")))
    assert(rows(1).getAs[Int](cols.indexOf("i.extra")) == 9)
    assert(rows(1).getAs[Int](cols.indexOf("i.some")) == 3)
    assert(rows(1).isNullAt(cols.indexOf("i.other")))
    assert(rows(1).getAs[String](cols.indexOf("j.0")) == "x")
    assert(rows(1).getAs[String](cols.indexOf("j.2")) == "z")
  }

  test("restructure + LayoutExport: map/array topic gets data-dependent headers") {
    import graft.restructure.{DedupConfig, LayoutExport, Restructure, RestructureConfig}
    val envSchema = new Schema.Parser().parse(
      """{"type":"record","name":"Envelope","fields":[
        | {"name":"key","type":{"type":"record","name":"K","fields":[
        |   {"name":"projectId","type":["null","string"],"default":null},
        |   {"name":"userId","type":"string"},
        |   {"name":"sourceId","type":"string"}]}},
        | {"name":"value","type":{"type":"record","name":"V","fields":[
        |   {"name":"time","type":"double"},
        |   {"name":"props","type":{"type":"map","values":"string"}},
        |   {"name":"readings","type":{"type":"array","items":"double"}}]}}
        |]}""".stripMargin)
    def rec(time: Double, props: Seq[(String, String)], readings: Seq[Double]): GenericRecord = {
      val k = new GenericData.Record(envSchema.getField("key").schema())
      k.put("projectId", "p"); k.put("userId", "u"); k.put("sourceId", "s")
      val v = new GenericData.Record(envSchema.getField("value").schema())
      v.put("time", time)
      val m = new java.util.LinkedHashMap[String, String]()
      props.foreach { case (a, b) => m.put(a, b) }
      v.put("props", m)
      val arr = new java.util.ArrayList[java.lang.Double]()
      readings.foreach(d => arr.add(d))
      v.put("readings", arr)
      val e = new GenericData.Record(envSchema)
      e.put("key", k); e.put("value", v)
      e
    }
    val dir = Files.createTempDirectory("graft-csvhdr").toFile
    val topicDir = new File(dir, "in/sensor/partition=0")
    topicDir.mkdirs()
    val f = new File(topicDir, "sensor+0+0000000000+0000000001.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](envSchema))
    w.create(envSchema, f)
    w.append(rec(1580219940.0, Seq("battery" -> "0.9", "model" -> "m1"), Seq(1.5)))
    w.append(rec(1580219941.0, Seq("model" -> "m2", "fw" -> "2"), Seq(2.5, 3.5)))
    w.close()
    val cfg = RestructureConfig(
      inputDir = new File(dir, "in").toString,
      outputDir = new File(dir, "out").toString,
      stateFile = new File(dir, "state/offsets.json").toString,
      compression = None,
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = false))
    new Restructure(spark, cfg).run()
    val exported = LayoutExport.export(spark, cfg, "sensor", s"$dir/export")
    assert(exported.size == 1)
    val content = new String(Files.readAllBytes(new File(exported.head).toPath), "UTF-8")
    val header = content.linesIterator.next()
    // map keys in first-seen order AS THE AVRO READER YIELDS THEM (the
    // deserialized map is a HashMap in the reference too, so its converter
    // iterates the same order: model before battery here), new keys after,
    // array at max observed length, all expanded in place
    assert(header ==
      "key.projectId,key.userId,key.sourceId,value.time," +
      "value.props.model,value.props.battery,value.props.fw," +
      "value.readings.0,value.readings.1")
    val lines = content.linesIterator.toSeq
    assert(lines.size == 3)
    // row 1: no "fw" key, one reading -> empty cells
    assert(lines.exists(_ == "p,u,s,1.58021994E9,m1,0.9,,1.5,"))
    assert(lines.exists(_ == "p,u,s,1.580219941E9,m2,,2,2.5,3.5"))
  }

  test("explodeArraysByIndex null-pads ragged arrays (ANSI-safe past the end)") {
    // Spark 4 runs ANSI mode by default, where element_at THROWS past the
    // array end — and arrays shorter than the data-wide max are exactly
    // the case this null-padding expansion exists for
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y")), (2L, Seq("z")), (3L, Seq.empty[String]))
      .toDF("id", "arr")
    val out = Flatten.explodeArraysByIndex(df).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "arr.0", "arr.1"))
    val rows = out.collect()
    assert(rows(0).getString(1) == "x" && rows(0).getString(2) == "y")
    assert(rows(1).getString(1) == "z" && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("flatten casts a void (null-only avro union) column to string for csv") {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.StringType
    val df = spark.range(1).select(
      col("id"), lit(null).as("v")) // NullType leaf, as a null-only union maps
    val out = Flatten.flatten(df)
    assert(out.schema("v").dataType == StringType,
      "a raw void column cannot be written to CSV — csvColumns' twin casts")
  }

  test("container-free schema needs no layout pass") {
    assert(!Flatten.needsCsvLayout(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("y",
              org.apache.spark.sql.types.LongType))))))))
  }
}
