package graft.restructure

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import java.io.File
import java.nio.file.Files
import java.util.zip.GZIPInputStream
import scala.io.Source

/** Exact reference layout: one `<project>/<user>/<topic>/<bin>.csv.gz` per
  * bin, attempt suffix on schema drift.
  */
class LayoutExportSpec extends SparkSpec {

  private def schemaOf(valueFields: String): Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"Envelope","fields":[
       | {"name":"key","type":{"type":"record","name":"ObservationKey","fields":[
       |   {"name":"projectId","type":["null","string"],"default":null},
       |   {"name":"userId","type":"string"},{"name":"sourceId","type":"string"}]}},
       | {"name":"value","type":{"type":"record","name":"V","fields":[$valueFields]}}]}""".stripMargin)

  private def writeFile(schema: Schema, file: File, times: Seq[Double], extra: Boolean): Unit = {
    file.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file)
    times.foreach { t =>
      val k = new GenericData.Record(schema.getField("key").schema())
      k.put("projectId", "p"); k.put("userId", "u"); k.put("sourceId", "s")
      val v = new GenericData.Record(schema.getField("value").schema())
      v.put("time", t)
      if (extra) v.put("extra", "e")
      val r = new GenericData.Record(schema); r.put("key", k); r.put("value", v)
      w.append(r)
    }
    w.close()
  }

  test("export merges parts into single bin files; schema drift gets attempt suffix") {
    val dir = Files.createTempDirectory("graft-export").toFile
    val s1 = schemaOf("""{"name":"time","type":"double"}""")
    val s2 = schemaOf("""{"name":"time","type":"double"},{"name":"extra","type":"string"}""")
    val topicDir = new File(dir, "in/t1/partition=0")
    // two files, same hour bin, drifting value schema
    writeFile(s1, new File(topicDir, "t1+0+0000000000+0000000001.avro"),
      Seq(1580219940.0, 1580219941.0), extra = false)
    writeFile(s2, new File(topicDir, "t1+0+0000000002.avro"),
      Seq(1580219950.0), extra = true)
    val cfg = RestructureConfig(
      inputDir = s"$dir/in", outputDir = s"$dir/out",
      stateFile = s"$dir/state/offsets.json", minimumFileAgeMs = 0L)
    new Restructure(spark, cfg).run()

    val written = LayoutExport.export(spark, cfg, "t1", s"$dir/export")
      .map(_.stripPrefix("file:")).sorted
    assert(written == Seq(
      s"$dir/export/p/u/t1/20200128_1300.csv.gz",
      s"$dir/export/p/u/t1/20200128_1300_1.csv.gz"))

    def lines(p: String): Seq[String] = {
      val src = Source.fromInputStream(
        new GZIPInputStream(new java.io.FileInputStream(p)), "UTF-8")
      try src.getLines().toList finally src.close()
    }
    val main = lines(written.head)
    val drift = lines(written(1))
    // one header + its rows per file; drift file carries the extra column
    val all = (main ++ drift).toSet
    assert(main.head.count(_ == ',') != drift.head.count(_ == ','))
    assert(Seq(main, drift).exists(_.head == "key.projectId,key.userId,key.sourceId,value.time"))
    assert(Seq(main, drift).exists(_.head == "key.projectId,key.userId,key.sourceId,value.time,value.extra"))
    assert((main.size - 1) + (drift.size - 1) == 3) // all three records present

    // zip export mode: same layout, single-entry level-7 archives
    val zipped = LayoutExport.export(spark, cfg, "t1", s"$dir/export-zip",
      exportCompression = Some(Some("zip")))
      .map(_.stripPrefix("file:")).sorted
    assert(zipped == Seq(
      s"$dir/export-zip/p/u/t1/20200128_1300.csv.zip",
      s"$dir/export-zip/p/u/t1/20200128_1300_1.csv.zip"))
    val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(zipped.head))
    val entry = zin.getNextEntry
    assert(entry.getName == "20200128_1300.csv")
    val content = Source.fromInputStream(zin, "UTF-8").getLines().toList
    zin.close()
    assert(content.head.startsWith("key.projectId,"))
    assert(content.size >= 2)

    // POSIX post-pass (reference LocalTargetStorage.kt:30-86): files
    // rw-r--r--, created dirs rwxr-xr-x, uid/gid applied when configured
    // (here: the current process's own ids, so the chown is exercised
    // without requiring a second user)
    import java.nio.file.attribute.PosixFilePermissions
    val self = java.nio.file.Paths.get(written.head)
    val uid = java.nio.file.Files.getAttribute(self, "unix:uid").asInstanceOf[Int]
    val gid = java.nio.file.Files.getAttribute(self, "unix:gid").asInstanceOf[Int]
    val px = LayoutExport.export(spark, cfg, "t1", s"$dir/export-px",
      posix = Some(LayoutExport.PosixSettings(userId = uid, groupId = gid)))
      .map(_.stripPrefix("file:")).sorted
    assert(px.nonEmpty)
    px.foreach { p =>
      val f = java.nio.file.Paths.get(p)
      assert(PosixFilePermissions.toString(
        java.nio.file.Files.getPosixFilePermissions(f)) == "rw-r--r--")
      assert(java.nio.file.Files.getAttribute(f, "unix:uid") == uid)
      assert(java.nio.file.Files.getAttribute(f, "unix:gid") == gid)
    }
    // the created directory chain under the export root got dir perms
    val userDir = java.nio.file.Paths.get(s"$dir/export-px/p/u/t1")
    assert(PosixFilePermissions.toString(
      java.nio.file.Files.getPosixFilePermissions(userDir)) == "rwxr-xr-x")
    assert(java.nio.file.Files.getAttribute(userDir, "unix:gid") == gid)
  }
}
