package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.restructure.{DedupConfig, Restructure, RestructureConfig, Service}

import java.io.File
import java.nio.file.Files

/** End-to-end service-mode soak (SURVEY §2.8 W2/W4/W5 + S10 as ONE
  * integration seam): a polling [[graft.restructure.Service]] runs
  * repeated restructure passes while the input tree changes under it —
  * new files arrive between ticks, one file arrives LATE (offsets below
  * a partition's already-processed range), and one already-processed
  * file is REWRITTEN in place with a newer mtime and an appended record
  * (the reference's resent-file shape, accounting/OffsetRangeSet.kt
  * mtime semantics). The soak then proves the service converged to
  * exactly the state a ONE-SHOT run over the final tree produces:
  *
  *  - output content: the deduplicated output of the soak equals the
  *    one-shot run's, fingerprinted order-independently (count + xor +
  *    decimal sum of whole-row hashes) — exactly-once across ticks,
  *    late arrival, and mtime reprocessing;
  *  - row count: 4 * perFile + 1 distinct records (the +1 is the
  *    appended rewrite record) — nothing lost, nothing manufactured;
  *  - offsets state: a post-soak plan() lists NOTHING (every range
  *    ledgered), and the soak's interval count equals the one-shot
  *    run's (ranges merged identically — the state file is bounded by
  *    range structure, not by pass count);
  *  - the service loop itself: >= 6 completed ticks, no captured error.
  *
  * Shared by the [[main]] (a bigger corpus for the BENCHSCALE row) and
  * ServiceSoakSpec (small corpus, same assertions — every `require`
  * here IS the spec body).
  */
object ServiceSoak {

  final case class Report(
      ticks: Long,
      soakRows: Long,
      planAfter: Int,
      stateRanges: Int,
      oneShotStateRanges: Int,
      wallSec: Double)

  private val schemaJson =
    """{"type":"record","name":"Envelope","fields":[
      | {"name":"key","type":{"type":"record","name":"ObservationKey","fields":[
      |   {"name":"projectId","type":["null","string"],"default":null},
      |   {"name":"userId","type":"string"},
      |   {"name":"sourceId","type":"string"}]}},
      | {"name":"value","type":{"type":"record","name":"Sensor","fields":[
      |   {"name":"time","type":"double"},
      |   {"name":"timeReceived","type":"double"},
      |   {"name":"light","type":"float"}]}}
      |]}""".stripMargin

  private val T0 = 1580219940.0 // 2020-01-28T13:59 UTC

  /** Order-independent content fingerprint over every column (sorted by
    * name so both runs hash identical layouts): count, bit_xor and
    * decimal sum of whole-row hashes — the sum keeps the fingerprint
    * multiplicity-sensitive where xor cancels even counts. */
  private def fingerprint(df: DataFrame): (Long, Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.map(c => col(s"`$c`"))
    val h = xxhash64(cols: _*)
    val r = df.agg(
      count(lit(1)),
      coalesce(bit_xor(h), lit(0L)),
      coalesce(sum(h.cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getLong(1), r.getDecimal(2))
  }

  def run(spark: SparkSession, dir: File, perFile: Int, tickMs: Long = 200L): Report = {
    // upper bound 37600: partition 1's wave-A offsets run 48800..48800+
    // perFile-1, and past 86400 the `offset % 86400` time derivation
    // wraps onto the late file's offsets 0..perFile-1 (86400 % 3 == 0,
    // so userId aliases too) — 86400 - 48800 = 37600 keeps every
    // (partition, offset) -> record mapping collision-free
    require(perFile >= 2 && perFile <= 37600,
      "perFile in [2, 37600] (keeps per-partition time values collision-free)")
    val schema = new Schema.Parser().parse(schemaJson)
    val staging = new File(dir, "stage")
    staging.mkdirs()

    // record content is a pure function of (partition, offset), so a
    // rewritten file reproduces its original records byte-identically
    // and rows never collide across partitions (the +0.25s fraction)
    def record(partition: Int, offset: Long): GenericRecord = {
      val k = new GenericData.Record(schema.getField("key").schema())
      k.put("projectId", "proj0")
      k.put("userId", s"user${offset % 3}")
      k.put("sourceId", s"src$partition")
      val v = new GenericData.Record(schema.getField("value").schema())
      val t = T0 + (offset % 86400) + partition * 0.25
      v.put("time", t); v.put("timeReceived", t + 1.0)
      v.put("light", (offset % 1000).toFloat)
      val r = new GenericData.Record(schema)
      r.put("key", k); r.put("value", v)
      r
    }

    /** Write a complete file into staging, then MOVE it into the topic
      * tree — the polling service must never list a half-written file
      * (minimumFileAgeMs is 0 here; production would also age-gate). */
    def writeFile(partition: Int, startOffset: Long, n: Int): File = {
      val name = f"soak_topic+$partition+$startOffset%010d.avro"
      val tmp = new File(staging, name)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, tmp)
      (0 until n).foreach(i => w.append(record(partition, startOffset + i)))
      w.close()
      val dest = new File(dir, s"in/soak_topic/partition=$partition/$name")
      dest.getParentFile.mkdirs()
      // rename OVER the destination (POSIX rename(2) replaces atomically):
      // a delete-then-rename pair would open a window with the path absent
      // while service ticks list and read the tree concurrently — wave C's
      // rewrite would intermittently fail a pass on a vanished file
      java.nio.file.Files.move(tmp.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest
    }

    val cfg = RestructureConfig(
      inputDir = s"$dir/in",
      outputDir = s"$dir/out",
      stateFile = s"$dir/state/offsets.json",
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = true))
    val job = new Restructure(spark, cfg)
    val svc = new Service(restructure = () => job.run(), restructureIntervalMs = tickMs)
    def awaitTicks(k: Long): Unit = {
      val target = svc.restructurePasses.get() + k
      val deadline = System.currentTimeMillis() + 600000L
      while (svc.restructurePasses.get() < target) {
        require(svc.lastError.isEmpty, s"service pass failed: ${svc.lastError.get}")
        require(System.currentTimeMillis() < deadline,
          s"soak stalled waiting for service tick $target")
        Thread.sleep(25L)
      }
    }

    val t0 = System.nanoTime()
    // wave A: both partitions; partition 1 starts HIGH so its low
    // offsets can arrive late in wave B
    val waveA0 = writeFile(0, 0L, perFile)
    writeFile(1, 48800L, perFile)
    svc.start()
    try {
      // two full ticks guarantee at least one complete pass that STARTED
      // after the wave was on disk (the tick in flight at write time may
      // have listed the tree before it)
      awaitTicks(2)
      // wave B: growth on partition 0 + the LATE file on partition 1
      // (offsets below the partition's processed range — W4: no
      // watermark, seen-range pruning admits it whenever it arrives).
      // Partition 0 resumes at perFile + 1: offset perFile is reserved
      // for wave C's appended rewrite record, which must be globally new
      writeFile(0, perFile + 1L, perFile)
      writeFile(1, 0L, perFile)
      awaitTicks(2)
      // wave C: rewrite wave A's partition-0 file in place with ONE
      // appended record and a strictly newer mtime — W5: the recorded
      // ranges carry the processing-time mtime, so the newer file is
      // reprocessed; its re-emitted rows are byte-identical and the
      // output merge discipline (J4) absorbs them
      val origMtime = waveA0.lastModified()
      writeFile(0, 0L, perFile + 1)
      val rewritten = new File(dir, s"in/soak_topic/partition=0/${waveA0.getName}")
      require(rewritten.setLastModified(math.max(System.currentTimeMillis(), origMtime + 2000L)),
        "mtime rewrite failed")
      awaitTicks(2)
    } finally svc.stop()
    val ticks = svc.restructurePasses.get()
    require(svc.lastError.isEmpty, s"service pass failed: ${svc.lastError}")
    require(ticks >= 6, s"expected >= 6 completed ticks, got $ticks")

    // one-shot comparator: a fresh job over the SAME final input tree,
    // fresh output + state
    val oneCfg = cfg.copy(outputDir = s"$dir/out-oneshot",
      stateFile = s"$dir/state-oneshot/offsets.json")
    val oneJob = new Restructure(spark, oneCfg)
    oneJob.run()

    val soakOut = job.readOutput("soak_topic")
    val oneOut = oneJob.readOutput("soak_topic")
    val soakFp = fingerprint(soakOut)
    val oneFp = fingerprint(oneOut)
    require(soakFp == oneFp,
      s"soak output != one-shot output over the same files: $soakFp vs $oneFp")
    val expectRows = 4L * perFile + 1L
    require(soakFp._1 == expectRows,
      s"expected $expectRows distinct rows, got ${soakFp._1}")

    // offsets-state convergence: nothing left to plan, and the interval
    // structure equals the one-shot run's (merged, bounded)
    val state = job.loadState()
    val planAfter = job.plan("soak_topic", state).size
    require(planAfter == 0, s"post-soak plan still lists $planAfter files")
    val soakRanges = state.entries.size
    val oneRanges = oneJob.loadState().entries.size
    require(soakRanges == oneRanges,
      s"soak state has $soakRanges ranges, one-shot $oneRanges")

    Report(ticks, soakFp._1, planAfter, soakRanges, oneRanges,
      (System.nanoTime() - t0) / 1e9)
  }

  /** Usage: runMain graft.ServiceSoak [perFile] [tickMs] — the spec twin
    * runs the same body at a small perFile. */
  def main(args: Array[String]): Unit = {
    val perFile = if (args.nonEmpty) args(0).toInt else 20000
    val tickMs = if (args.length > 1) args(1).toLong else 500L
    val spark = Sessions.build("graft-service-soak")
    val dir = Files.createTempDirectory("graft-service-soak").toFile
    val r = run(spark, dir, perFile, tickMs)
    println(
      s"""{"metric":"service_soak","ticks":${r.ticks},"rows":${r.soakRows},""" +
        s""""planAfter":${r.planAfter},"stateRanges":${r.stateRanges},""" +
        s""""oneShotStateRanges":${r.oneShotStateRanges},"sec":${r.wallSec}}""")
    spark.stop()
  }
}
