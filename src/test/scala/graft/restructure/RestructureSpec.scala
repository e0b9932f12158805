package graft.restructure

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import java.io.File
import java.nio.file.Files

/** End-to-end restructure pipeline test mirroring the reference's
  * integration golden (RestructureS3IntegrationTest.kt:40-98, FIXTURES.md
  * §3.2): Avro sink files -> per-(project,user,hour) flattened CSV with
  * dedup, schema sidecar, offset state, and incremental re-run.
  */
/** Shared avro sink fixture: two files of one topic, 4 records, 1 duplicate
  * (also used by LocksSpec's concurrent-instance test). */
object RestructureFixture {

  private val schemaJson =
    """{"type":"record","name":"Envelope","fields":[
      | {"name":"key","type":{"type":"record","name":"ObservationKey","fields":[
      |   {"name":"projectId","type":["null","string"],"default":null},
      |   {"name":"userId","type":"string"},
      |   {"name":"sourceId","type":"string"}]}},
      | {"name":"value","type":{"type":"record","name":"ServerStatus","fields":[
      |   {"name":"time","type":"double"},
      |   {"name":"serverStatus","type":"string"},
      |   {"name":"ipAddress","type":["null","string"],"default":null}]}}
      |]}""".stripMargin

  private val schema = new Schema.Parser().parse(schemaJson)

  def record(time: Double, status: String): GenericRecord = {
    val key = new GenericData.Record(schema.getField("key").schema())
    key.put("projectId", "STAGING_PROJECT")
    key.put("userId", "user1")
    key.put("sourceId", "source1")
    val value = new GenericData.Record(schema.getField("value").schema())
    value.put("time", time)
    value.put("serverStatus", status)
    value.put("ipAddress", null)
    val rec = new GenericData.Record(schema)
    rec.put("key", key)
    rec.put("value", value)
    rec
  }

  def writeAvro(file: File, records: Seq[GenericRecord]): Unit = {
    file.getParentFile.mkdirs()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file)
    records.foreach(w.append)
    w.close()
  }

  // 2020-01-28T13:59 and 14:01 UTC — the two hour bins of the reference test
  val t1 = 1580219940.0
  val t2 = 1580220060.0

  def setup(): (File, RestructureConfig) = {
    val dir = Files.createTempDirectory("graft-restructure").toFile
    val topicDir = new File(dir, "in/application_server_status/partition=1")
    // offsets 18-20: two records in bin 13:00 (one duplicated), one in 14:00
    writeAvro(
      new File(topicDir, "application_server_status+1+0000000018+0000000020.avro"),
      Seq(record(t1, "CONNECTED"), record(t1, "CONNECTED"), record(t2, "DISCONNECTED")))
    // offset 21: one more record, 14:00 bin
    writeAvro(
      new File(topicDir, "application_server_status+1+0000000021.avro"),
      Seq(record(t2, "CONNECTED")))
    val cfg = RestructureConfig(
      inputDir = new File(dir, "in").toString,
      outputDir = new File(dir, "out").toString,
      stateFile = new File(dir, "state/offsets.json").toString,
      compression = None,
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = true))
    (dir, cfg)
  }
}

class RestructureSpec extends SparkSpec {
  import RestructureFixture.{record, setup, t1, t2, writeAvro}

  test("restructure: topic discovery, hourly bins, flatten, dedup, state, incremental") {
    val (dir, cfg) = setup()
    val job = new Restructure(spark, cfg)

    assert(job.listTopics() == Seq("application_server_status"))
    val files = job.plan("application_server_status", new graft.state.OffsetRangeSet)
    assert(files.map(_.startOffset) == Seq(18L, 21L))
    assert(files.head.endOffset.contains(20L))

    val r1 = job.run()
    assert(r1.files == 2)
    // 4 records read, 1 duplicate removed by dedup -> 3 written; the count
    // must come from the executed write (Observation), not a dead plan
    assert(r1.records == 3)

    // output layout: per (project, user, bin) partitions
    val out = new File(cfg.outputDir, "application_server_status")
    def binDir(bin: String) =
      new File(out, s"_project=STAGING_PROJECT/_user=user1/_bin=$bin")
    assert(binDir("20200128_1300").exists())
    assert(binDir("20200128_1400").exists())
    assert(new File(out, "schema-application_server_status.json").exists())

    // flattened dotted columns + dedup (duplicate record removed)
    val bin13 = spark.read.option("header", "true")
      .csv(binDir("20200128_1300").toString)
    assert(bin13.columns.toSeq == Seq(
      "key.projectId", "key.userId", "key.sourceId",
      "value.time", "value.serverStatus", "value.ipAddress"))
    assert(bin13.count() == 1) // two identical records deduped to one
    val row = bin13.head
    assert(row.getAs[String]("key.projectId") == "STAGING_PROJECT")
    assert(row.getAs[String]("value.serverStatus") == "CONNECTED")

    val bin14 = spark.read.option("header", "true")
      .csv(binDir("20200128_1400").toString)
    assert(bin14.count() == 2)

    // state: offsets 18..21 of partition 1 recorded as one coalesced range
    val state = job.loadState()
    val ranges = state.entries
    assert(ranges.map { case (tp, r) => (tp.topic, tp.partition, r.from, r.to) } ==
      Seq(("application_server_status", 1, 18L, 21L)))

    // incremental: second pass plans nothing and processes nothing
    val r2 = job.run()
    assert(r2.files == 0)
  }

  test("readOutput dedups whole rows across part files after state loss") {
    val (dir, cfg) = setup()
    val job = new Restructure(spark, cfg)
    job.run()
    // simulate state loss: wipe the state file -> next pass reprocesses
    // everything and appends duplicate part files
    new File(cfg.stateFile).delete()
    val r = job.run()
    assert(r.files == 2) // reprocessed
    val raw = job.readOutput("application_server_status", dedup = false)
    val deduped = job.readOutput("application_server_status")
    assert(raw.count() == 6)    // 3 records written twice
    assert(deduped.count() == 3) // distinct restores exactly-once output
  }

  test("excludeTopics and maxFilesPerTopic bound a pass (config-driven)") {
    val (dir, _) = setup()
    val cfg = ConfigLoader.fromString(
      s"""input=$dir/in
         |output=$dir/out2
         |state=$dir/state2/offsets.json
         |compression=none
         |minimumFileAgeMs=0
         |maxFilesPerTopic=1
         |""".stripMargin)
    val job = new Restructure(spark, cfg)
    // limit: only the first file (by partition, startOffset) per pass
    val plan1 = job.plan("application_server_status", new graft.state.OffsetRangeSet)
    assert(plan1.map(_.startOffset) == Seq(18L))
    assert(job.run().files == 1)
    assert(job.run().files == 1) // second pass picks up the remaining file
    assert(job.run().files == 0)

    val excluded = ConfigLoader.fromString(
      s"""input=$dir/in
         |output=$dir/out3
         |state=$dir/state3/offsets.json
         |excludeTopics=application_server_status
         |""".stripMargin)
    assert(new Restructure(spark, excluded).listTopics().isEmpty)
  }

  test("restructure re-extracts a rewritten file's records (W5)") {
    val (dir, cfg) = setup()
    val f = new File(dir,
      "in/application_server_status/partition=1/application_server_status+1+0000000021.avro")
    // age the inputs so the first pass records an old lastProcessed
    new File(dir, "in/application_server_status/partition=1").listFiles()
      .foreach(_.setLastModified(System.currentTimeMillis - 120000))
    val job = new Restructure(spark, cfg)
    job.run()

    // upstream rewrites the offset-21 file (same name, fresh mtime)
    writeAvro(f, Seq(record(t2, "REWRITTEN")))
    val r = job.run()
    assert(r.files == 1)
    assert(r.records == 1) // the rewritten record survived the seen filter
    val out = job.readOutput("application_server_status", dedup = false)
    assert(out.filter(org.apache.spark.sql.functions.col("`value.serverStatus`") === "REWRITTEN").count() == 1)

    // state now carries the new mtime: a third pass plans nothing
    assert(job.run().files == 0)
  }

  test("streaming restructure: incremental passes through the DSv2 source") {
    val (dir, cfg) = setup()
    val cp = new File(dir, "cp").toString
    def pass(): Unit = {
      val q = graft.streaming.Streaming.restructureStream(
        spark, cfg, "application_server_status", cp)
      q.awaitTermination()
    }
    pass()
    val out = new File(cfg.outputDir, "application_server_status")
    val bin13 = spark.read.option("header", "true").csv(
      new File(out, "_project=STAGING_PROJECT/_user=user1/_bin=20200128_1300").toString)
    assert(bin13.count() == 1) // dedup applied inside the micro-batch
    assert(new File(out, "schema-application_server_status.json").exists())

    // new sink file -> only its record flows in pass 2 (checkpointed offset)
    writeAvro(
      new File(dir, "in/application_server_status/partition=1/application_server_status+1+0000000022.avro"),
      Seq(record(t2, "LATE")))
    pass()
    val all = new Restructure(spark, cfg).readOutput("application_server_status", dedup = false)
    assert(all.count() == 4) // 3 from pass 1 + 1 from pass 2, no re-reads
    pass() // nothing new: no change
    assert(new Restructure(spark, cfg).readOutput("application_server_status", dedup = false).count() == 4)
  }

  test("endOffset from a metadata sidecar overrides the filename (S3-tag shape)") {
    val (dir, cfg) = setup()
    // the open-ended file (+21, no end) gets a sidecar declaring endOffset
    val f = new File(dir,
      "in/application_server_status/partition=1/application_server_status+1+0000000021.avro")
    Files.write(f.toPath.resolveSibling(f.getName + ".meta"),
      "endOffset=23\n".getBytes)
    val without = new Restructure(spark, cfg)
      .listFiles("application_server_status").sortBy(_.startOffset)
    assert(without.map(_.endOffset) == Seq(Some(20L), None))
    val withMeta = new Restructure(spark, cfg.copy(endOffsetFromMetadata = true))
      .listFiles("application_server_status").sortBy(_.startOffset)
    assert(withMeta.map(_.endOffset) == Seq(Some(20L), Some(23L)))

    // a MALFORMED sidecar must fall back to the filename, not kill the
    // pass: Properties.load throws IllegalArgumentException (not
    // IOException) on a broken \uXXXX escape from a corrupted write
    Files.write(f.toPath.resolveSibling(f.getName + ".meta"),
      "endOffset=\\u00zz\n".getBytes)
    val broken = new Restructure(spark, cfg.copy(endOffsetFromMetadata = true))
      .listFiles("application_server_status").sortBy(_.startOffset)
    assert(broken.map(_.endOffset) == Seq(Some(20L), None))
  }

  test("a second input root contributes topics and files (paths.inputs list)") {
    val (dir, base) = setup()
    // second root: another topic, plus more files for the existing one
    val in2 = new File(dir, "in2")
    writeAvro(
      new File(in2, "application_server_status/partition=1/application_server_status+1+0000000022.avro"),
      Seq(record(t2 + 60, "EXTRA")))
    writeAvro(
      new File(in2, "other_topic/partition=0/other_topic+0+0000000000.avro"),
      Seq(record(t1, "OTHER")))
    val cfg = base.copy(extraInputDirs = Seq(in2.toString))
    val job = new Restructure(spark, cfg)
    assert(job.listTopics() == Seq("application_server_status", "other_topic"))
    assert(job.listFiles("application_server_status").size == 3) // 2 + 1 merged
    val r = job.run()
    assert(r.topics == 2 && r.files == 4)
  }

  test("restructure: late file appends to an existing bin") {
    val (dir, cfg) = setup()
    val job = new Restructure(spark, cfg)
    job.run()
    // a late record for the 13:00 bin arrives in a new file (offset 22)
    writeAvro(
      new File(dir, "in/application_server_status/partition=1/application_server_status+1+0000000022.avro"),
      Seq(record(t1 + 30, "DEGRADED"))) // 13:59:30 — still the 13:00 bin
    val r = job.run()
    assert(r.files == 1)
    val bin13 = spark.read.option("header", "true").csv(
      new File(cfg.outputDir,
        "application_server_status/_project=STAGING_PROJECT/_user=user1/_bin=20200128_1300").toString)
    assert(bin13.count() == 2) // original + late append
    assert(job.loadState().entries.map(_._2.to) == Seq(22L))
  }

  test("maxRecordsPerFile rolls output files inside a bin; content unchanged") {
    val (_, cfg0) = setup()
    val cfg = cfg0.copy(maxRecordsPerFile = Some(1L))
    val job = new Restructure(spark, cfg)
    job.run()
    // bin 14:00 holds 2 records (offsets 20, 21) — the cap of 1 forces
    // them into 2 part files instead of one
    val binDir = new File(cfg.outputDir,
      "application_server_status/_project=STAGING_PROJECT/_user=user1/_bin=20200128_1400")
    val parts = Option(binDir.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.startsWith("part-"))
    assert(parts.length >= 2, s"expected rolled files, got ${parts.length}")
    // rolling is a file-layout concern only: reading the topic back
    // yields the same records as the uncapped config
    val rolled = job.readOutput("application_server_status")
      .orderBy("`value.time`", "`value.serverStatus`").collect().map(_.toSeq).toSeq
    val (_, cfgPlain) = setup()
    val plain = new Restructure(spark, cfgPlain)
    plain.run()
    val want = plain.readOutput("application_server_status")
      .orderBy("`value.time`", "`value.serverStatus`").collect().map(_.toSeq).toSeq
    assert(rolled == want)
  }

  test("cross-partition keep-last ties break deterministically, same row both strategies") {
    // equal dedup key (value.time) at the SAME offset in two partitions:
    // _offset alone cannot order them — the (offset, partition) struct
    // must pick the partition-1 row under BOTH strategies
    def mk(salted: Boolean) = {
      val dir = Files.createTempDirectory("graft-tie").toFile
      writeAvro(
        new File(dir, "in/application_server_status/partition=0/application_server_status+0+0000000005.avro"),
        Seq(record(t1, "FROM_P0")))
      writeAvro(
        new File(dir, "in/application_server_status/partition=1/application_server_status+1+0000000005.avro"),
        Seq(record(t1, "FROM_P1")))
      val cfg = RestructureConfig(
        inputDir = new File(dir, "in").toString,
        outputDir = new File(dir, "out").toString,
        stateFile = new File(dir, "state/offsets.json").toString,
        compression = None,
        minimumFileAgeMs = 0L,
        dedupDefault = DedupConfig(enable = true, distinctFields = Seq("value.time")),
        dedupSalted = salted)
      val job = new Restructure(spark, cfg)
      job.run()
      job.readOutput("application_server_status")
        .select("`value.serverStatus`").collect().map(_.getString(0)).toSeq
    }
    assert(mk(salted = false) == Seq("FROM_P1"))
    assert(mk(salted = true) == Seq("FROM_P1"))
  }

  test("dedupSalted strategy writes the identical output (plan-only knob)") {
    // the fixture carries a real duplicate (two CONNECTED records at t1),
    // so the salted path's combine has actual work to do
    val (_, cfgW) = setup()
    new Restructure(spark, cfgW).run()
    val windowed = new Restructure(spark, cfgW).readOutput("application_server_status")
      .orderBy("`value.time`", "`value.serverStatus`").collect().map(_.toSeq).toSeq
    val (_, cfg0) = setup()
    val cfgS = cfg0.copy(dedupSalted = true)
    new Restructure(spark, cfgS).run()
    val salted = new Restructure(spark, cfgS).readOutput("application_server_status")
      .orderBy("`value.time`", "`value.serverStatus`").collect().map(_.toSeq).toSeq
    assert(salted == windowed && windowed.size == 3)
  }

  test("restructure: parquet sink keeps the flattened layout and round-trips") {
    val (_, base) = setup()
    val cfg = base.copy(format = "parquet")
    val job = new Restructure(spark, cfg)
    val r1 = job.run()
    assert(r1.files == 2 && r1.records == 3)

    val out = new File(cfg.outputDir, "application_server_status")
    val bin13 = new File(out,
      "_project=STAGING_PROJECT/_user=user1/_bin=20200128_1300")
    assert(bin13.exists(), "hourly bin layout must match the csv sink's")
    assert(bin13.listFiles().exists(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")))

    // same flattened dotted columns as csv/json, read straight back
    val back = job.readOutput("application_server_status")
    assert(back.columns.sorted.toSeq == Seq(
      "_bin", "_project", "_user",
      "key.projectId", "key.sourceId", "key.userId",
      "value.ipAddress", "value.serverStatus", "value.time").sorted)
    assert(back.count() == 3)
    assert(back.filter(
      org.apache.spark.sql.functions.col("`value.serverStatus`") === "CONNECTED")
      .count() == 2)

    // incremental: committed state makes a re-run a no-op for parquet too
    val r2 = new Restructure(spark, cfg).run()
    assert(r2.files == 0 && r2.records == 0)
  }
}
