package graft.avro

import graft.SparkSpec
import graft.restructure.{Cleaner, DedupConfig, Restructure, RestructureConfig}
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import java.io.File
import java.nio.file.Files

/** RANDOM-damage fuzz over the avro input surface (round-19 directive).
  * FaultToleranceSpec proves the posture on CRAFTED corruption; these
  * properties drive arbitrary byte damage — truncation at any offset,
  * byte flips in header/metadata/block/sync regions — through the real
  * read path and the real pass loop:
  *
  *  1. read surface (220 cases): schemaGroups + read in tolerant mode
  *     never throw on a local store (complete bytes make every failure
  *     deterministic — the fetch-then-decode discipline in
  *     [[AvroSource.read]]); the damaged file is either still present
  *     (processed — possibly as a valid prefix or with altered-but-
  *     decodable content — or skipped by the zero-length guard P8, which
  *     owns truncate-to-zero upstream in plan()) or quarantined as
  *     `.corrupted` with ZERO contributed rows, never silently deleted;
  *     and a healthy sibling file always yields all its records.
  *  2. pass loop (25 cases): a full Restructure pass over a damaged +
  *     healthy file never throws; a following Cleaner pass never deletes
  *     anything unverified (never the quarantined file, never a
  *     zero-contribution file, never the P9-protected newest); and once
  *     the damaged file is RESTORED (repaired re-upload, newer mtime)
  *     the pipeline converges: for quarantined or truncated damage the
  *     output fingerprint EQUALS the one-shot run over pristine inputs;
  *     for byte-flip damage that decoded anyway (content legitimately
  *     altered — the engine cannot know) the one-shot rows must still
  *     all be present (nothing lost).
  *
  * Reference posture: corrupt-quarantine worker/FileCache.kt:172-201. */
class AvroFuzzPropertySpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"Envelope","fields":[
      | {"name":"key","type":{"type":"record","name":"ObservationKey","fields":[
      |   {"name":"projectId","type":["null","string"],"default":null},
      |   {"name":"userId","type":"string"},
      |   {"name":"sourceId","type":"string"}]}},
      | {"name":"value","type":{"type":"record","name":"ServerStatus","fields":[
      |   {"name":"time","type":"double"},
      |   {"name":"serverStatus","type":"string"}]}}
      |]}""".stripMargin
  private val schema = new Schema.Parser().parse(schemaJson)

  private def record(time: Double, status: String): GenericRecord = {
    val key = new GenericData.Record(schema.getField("key").schema())
    key.put("projectId", "p"); key.put("userId", "u"); key.put("sourceId", "s")
    val value = new GenericData.Record(schema.getField("value").schema())
    value.put("time", time); value.put("serverStatus", status)
    val rec = new GenericData.Record(schema)
    rec.put("key", key); rec.put("value", value)
    rec
  }

  private def containerBytes(records: Seq[GenericRecord]): Array[Byte] = {
    val tmp = Files.createTempFile("graft-fuzz-base", ".avro")
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(200) // several small blocks: interesting boundaries
    w.create(schema, tmp.toFile)
    records.foreach(w.append)
    w.close()
    val b = Files.readAllBytes(tmp)
    Files.delete(tmp)
    b
  }

  // the damaged file's pristine content: 30 records over 3 hour bins
  private lazy val baseBytes =
    containerBytes((0 until 30).map(i => record(1580219940.0 + i * 240, s"S$i")))
  // the healthy sibling: 5 records, distinct payloads
  private lazy val healthyBytes =
    containerBytes((0 until 5).map(i => record(1580219941.0 + i, s"H$i")))
  // header region estimate (magic + metadata incl. schema JSON + sync):
  // an empty container is exactly that — used to weight flips toward the
  // structurally interesting bytes
  private lazy val headerLen = containerBytes(Seq.empty).length

  private sealed trait Mutation { def apply(b: Array[Byte]): Array[Byte] }
  private final case class Truncate(at: Int) extends Mutation {
    def apply(b: Array[Byte]): Array[Byte] = b.take(at)
  }
  private final case class Flip(at: Int, mask: Byte) extends Mutation {
    def apply(b: Array[Byte]): Array[Byte] = {
      val c = b.clone(); c(at) = (c(at) ^ mask).toByte; c
    }
  }

  private def genMutation(len: Int): Gen[Mutation] = {
    val flipAt = Gen.frequency(
      1 -> Gen.chooseNum(0, math.min(headerLen, len) - 1), // header/metadata
      2 -> Gen.chooseNum(0, len - 1))                      // anywhere
    Gen.oneOf(
      Gen.chooseNum(0, len - 1).map(Truncate),
      for { i <- flipAt; m <- Gen.chooseNum(1, 255) } yield Flip(i, m.toByte))
  }

  private def write(f: File, bytes: Array[Byte]): File = {
    f.getParentFile.mkdirs()
    Files.write(f.toPath, bytes)
    f
  }

  private def quarantineOf(f: File): Option[File] =
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty[File])
      .find(_.getName.startsWith(f.getName + ".corrupted"))

  private def check(name: String, cases: Int, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("fuzzed container: tolerant read quarantines or processes, never throws, never loses the healthy file") {
    check("read-surface", 220, Prop.forAll(genMutation(baseBytes.length)) { mut =>
      val dir = Files.createTempDirectory("graft-fuzz-read").toFile
      val damaged = write(
        new File(dir, "in/fuzz/partition=0/fuzz+0+0000000000.avro"), mut(baseBytes))
      val healthy = write(
        new File(dir, "in/fuzz/partition=0/fuzz+0+0000001000.avro"), healthyBytes)
      // P8 (plan-time zero-length guard) owns empty files upstream
      val eligible = Seq(damaged, healthy).filter(_.length > 0).map(_.toString)
      val fileOf = AvroSource
        .schemaGroups(spark, eligible, tolerant = true, backoffMs = 1L)
        .flatMap { case (s, paths) =>
          AvroSource.read(spark, paths, s, tolerant = true, backoffMs = 1L)
            .select("_file").collect().map(_.getString(0))
        }
      val healthyRows = fileOf.count(_.endsWith("0000001000.avro"))
      val damagedRows = fileOf.count(_.endsWith("0000000000.avro"))
      val q = quarantineOf(damaged)
      val outcomeLegal =
        if (q.isDefined) !damaged.exists() && damagedRows == 0 // quarantined
        else damaged.exists()                                  // processed/skipped
      (healthyRows == 5) :| s"healthy rows $healthyRows != 5" &&
        outcomeLegal :| s"illegal outcome: exists=${damaged.exists()} q=$q rows=$damagedRows"
    })
  }

  test("fuzzed container: full pass + cleaner never throw or delete unverified; restore converges") {
    import graft.ServiceSoak.fingerprint

    def cfgFor(dir: File) = RestructureConfig(
      inputDir = new File(dir, "in").toString,
      outputDir = new File(dir, "out").toString,
      stateFile = new File(dir, "state/offsets.json").toString,
      format = "json", // self-describing parts: schema-altering flips merge
      compression = None,
      minimumFileAgeMs = 0L,
      retryBackoffMs = 1L,
      dedupDefault = DedupConfig(enable = true))

    // the one-shot comparator over pristine inputs — identical for every
    // case, computed once
    val (oneDf, oneFp) = {
      val dir = Files.createTempDirectory("graft-fuzz-oneshot").toFile
      write(new File(dir, "in/fuzz/partition=0/fuzz+0+0000000000.avro"), baseBytes)
      write(new File(dir, "in/fuzz/partition=0/fuzz+0+0000001000.avro"), healthyBytes)
      val job = new Restructure(spark, cfgFor(dir))
      job.run()
      val df = job.readOutput("fuzz").cache()
      (df, fingerprint(df))
    }

    check("pass-loop", 25, Prop.forAll(genMutation(baseBytes.length)) { mut =>
      val dir = Files.createTempDirectory("graft-fuzz-pass").toFile
      val damaged = write(
        new File(dir, "in/fuzz/partition=0/fuzz+0+0000000000.avro"), mut(baseBytes))
      val healthy = write(
        new File(dir, "in/fuzz/partition=0/fuzz+0+0000001000.avro"), healthyBytes)
      val cfg = cfgFor(dir)
      val job = new Restructure(spark, cfg)
      job.run() // the pass loop must survive arbitrary damage
      val quarantined = quarantineOf(damaged).isDefined
      val processedRows = !quarantined && damaged.exists() &&
        job.loadState().contains(
          graft.state.TopicPartition("fuzz", 0), 0L, java.time.Instant.EPOCH)

      // cleaner: never deletes unverified — the quarantined file is not
      // even listable, a zero-contribution file has no ledgered range so
      // it is no candidate, and the newest end-less file is P9-protected
      val cleaner = new Cleaner(spark, cfg, ageMs = 0L)
      val (deleted, _) = cleaner.run(now = System.currentTimeMillis + 60000)
      val deletedNames = deleted.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      val cleanerLegal =
        healthy.exists() && // P9: the partition's newest survives
          (deletedNames - "fuzz+0+0000000000.avro").isEmpty &&
          (deletedNames.isEmpty || processedRows) // only a VERIFIED file deletes

      // repaired re-upload: pristine bytes. The fresh write's mtime (now)
      // is strictly newer than any ledgered range's recorded mtime — the
      // first pass's Spark jobs put seconds between them — and must NOT
      // sit in the future, or the plan's age filter would exclude it
      val restored = write(damaged, baseBytes)
      assert(restored.setLastModified(System.currentTimeMillis()))
      job.run()
      new Cleaner(spark, cfg, ageMs = 0L).run(now = System.currentTimeMillis + 60000)
      val soakDf = job.readOutput("fuzz")
      val strict = quarantined || mut.isInstanceOf[Truncate]
      val converged =
        if (strict) fingerprint(soakDf) == oneFp
        else {
          // decodable flip: content legitimately altered, so equality is
          // not owed — but nothing may be LOST: every one-shot row must
          // still be present (projected onto the one-shot columns AND
          // types; a column the soak output lost entirely reads as null
          // and fails the except)
          val projected = soakDf.select(oneDf.schema.fields.map { f =>
            // backticks: output columns carry literal dots (`value.time`)
            (if (soakDf.columns.contains(f.name)) col(s"`${f.name}`").cast(f.dataType)
             else lit(null).cast(f.dataType)).as(f.name)
          }.toSeq: _*)
          oneDf.except(projected).isEmpty
        }
      cleanerLegal :| s"cleaner deleted $deletedNames (processed=$processedRows)" &&
        converged :| s"restore did not converge (strict=$strict, quarantined=$quarantined)"
    })
  }
}
