package graft.avro

import graft.SparkSpec
import graft.operators.Flatten
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import java.io.File
import java.nio.file.Files
import java.nio.ByteBuffer

/** Avro source + flatten against the reference's full type-matrix fixture
  * (src/test/resources/org/radarbase/output/data/full.avsc, FIXTURES.md
  * §3.3): string, bytes, fixed, long, double, float, int, map, array, enum,
  * nested record with nullable union, boolean.
  */
class AvroSourceSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"Full","fields":[
      | {"name":"a","type":"string"},
      | {"name":"b","type":"bytes"},
      | {"name":"c","type":{"type":"fixed","name":"F1","size":1}},
      | {"name":"d","type":"long"},
      | {"name":"e","type":"double"},
      | {"name":"f","type":"float"},
      | {"name":"g","type":"int"},
      | {"name":"i","type":{"type":"map","values":"int"}},
      | {"name":"j","type":{"type":"array","items":"string"}},
      | {"name":"k","type":{"type":"enum","name":"E1","symbols":["S","Y","M"]}},
      | {"name":"l","type":{"type":"record","name":"Inner","fields":[
      |   {"name":"la","type":["null","string"],"default":null}]}},
      | {"name":"m","type":"boolean"}
      |]}""".stripMargin

  private val schema = new Schema.Parser().parse(schemaJson)

  private def fixture(): File = {
    val dir = Files.createTempDirectory("graft-avro").toFile
    val file = new File(dir, "full+0+0000000000.avro")
    val rec = new GenericData.Record(schema)
    rec.put("a", "hello")
    rec.put("b", ByteBuffer.wrap(Array[Byte](104, 105))) // "hi"
    rec.put("c", new GenericData.Fixed(schema.getField("c").schema(), Array[Byte](33)))
    rec.put("d", 7L)
    rec.put("e", 2.5d)
    rec.put("f", 1.5f)
    rec.put("g", 42)
    val m = new java.util.HashMap[String, Int](); m.put("some", 1); m.put("other", 2)
    rec.put("i", m)
    val arr = new java.util.ArrayList[String](); arr.add("x"); arr.add("y")
    rec.put("j", arr)
    rec.put("k", new GenericData.EnumSymbol(schema.getField("k").schema(), "Y"))
    val inner = new GenericData.Record(schema.getField("l").schema())
    inner.put("la", null)
    rec.put("l", inner)
    rec.put("m", true)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file)
    w.append(rec)
    w.close()
    file
  }

  test("full type matrix reads, converts, and flattens with dotted names") {
    val file = fixture()
    val groups = AvroSource.schemaGroups(spark, Seq(file.toString))
    assert(groups.size == 1)
    val df = AvroSource.read(spark, Seq(file.toString), groups.head._1)
      .drop("_file", "_row_index")

    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq ==
      Seq("a", "b", "c", "d", "e", "f", "g", "i", "j", "k", "l.la", "m"))
    val row = flat.head
    assert(row.getAs[String]("a") == "hello")
    assert(row.getAs[String]("b") == "aGk") // unpadded base64 of "hi"
    assert(row.getAs[String]("c") == "IQ")  // unpadded base64 of "!"
    assert(row.getAs[Long]("d") == 7L)
    assert(row.getAs[Double]("e") == 2.5d)
    assert(row.getAs[Float]("f") == 1.5f)
    assert(row.getAs[Int]("g") == 42)
    assert(row.getAs[String]("i").contains("\"some\":1"))
    assert(row.getAs[String]("j") == """["x","y"]""")
    assert(row.getAs[String]("k") == "Y")
    assert(row.isNullAt(row.fieldIndex("l.la")))
    assert(row.getAs[Boolean]("m"))
  }

  test("explodeArraysByIndex produces data-dependent per-index columns") {
    val file = fixture()
    val groups = AvroSource.schemaGroups(spark, Seq(file.toString))
    val df = AvroSource.read(spark, Seq(file.toString), groups.head._1)
      .select("j")
    val out = Flatten.explodeArraysByIndex(df)
    assert(out.columns.toSeq == Seq("j.0", "j.1"))
    val row = out.head
    assert(row.getAs[String]("j.0") == "x" && row.getAs[String]("j.1") == "y")
  }

  test("row index is stable across many avro blocks (small sync interval)") {
    val dir = Files.createTempDirectory("graft-avro3").toFile
    val s1 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}""")
    val f = new File(dir, "t+0+0000000100.avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s1))
    w.setSyncInterval(64) // force many container blocks
    w.create(s1, f)
    (0L until 500L).foreach { i =>
      val r = new GenericData.Record(s1); r.put("x", i); w.append(r)
    }
    w.close()
    val groups = AvroSource.schemaGroups(spark, Seq(f.toString))
    val df = AvroSource.read(spark, Seq(f.toString), groups.head._1)
    // _row_index must equal the record payload written in order
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("_row_index") =!= col("x")).count() == 0)
    assert(df.count() == 500)
  }

  test("schema drift groups files separately") {
    val dir = Files.createTempDirectory("graft-avro2").toFile
    val s1 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"int"}]}""")
    val s2 = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"x","type":"int"},{"name":"y","type":"string"}]}""")
    def write(name: String, s: Schema, put: GenericData.Record => Unit): String = {
      val f = new File(dir, name)
      val rec = new GenericData.Record(s); put(rec)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](s))
      w.create(s, f); w.append(rec); w.close()
      f.toString
    }
    val p1 = write("t+0+0000000000.avro", s1, _.put("x", 1))
    val p2 = write("t+0+0000000001.avro", s2, r => { r.put("x", 2); r.put("y", "b") })
    val p3 = write("t+0+0000000002.avro", s1, _.put("x", 3))
    val groups = AvroSource.schemaGroups(spark, Seq(p1, p2, p3))
    assert(groups.map(_._2.size) == Seq(2, 1)) // s1 files grouped, s2 alone
  }

  test("toSparkValueAs keeps projecting through an additively widened union") {
    import org.apache.spark.sql.types._
    // read schema pinned to union[null, double] -> DoubleType; a later
    // writer widened the union with a string branch — a double datum must
    // still arrive as a Double, not a string rendering
    val widened = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        | {"name":"x","type":["null","double","string"]}]}""".stripMargin)
    val rec = new GenericData.Record(widened)
    rec.put("x", 1.5d)
    val out = AvroSchemas.toSparkValueAs(
      rec, widened, StructType(Seq(StructField("x", DoubleType))))
    assert(out == org.apache.spark.sql.Row(1.5d))
    // and the string branch still renders when the target IS a string
    rec.put("x", new org.apache.avro.util.Utf8("hello"))
    val asString = AvroSchemas.toSparkValueAs(
      rec, widened, StructType(Seq(StructField("x", StringType))))
    assert(asString == org.apache.spark.sql.Row("hello"))
  }
}
