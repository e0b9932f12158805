package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.restructure.{Cleaner, DedupConfig, Restructure, RestructureConfig, Service}

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** The two-job scheduler at BENCH scale (round-18 directive): ServiceSoak
  * proves the interleaved restructure+cleaner composition converges at
  * 120 k rows; EtlBench proves each job's throughput separately at 100 M.
  * This main runs BOTH jobs under ONE from-startup scheduler over >= 10 M
  * records fed in waves — the scale where task queues actually fill — and
  * reports records/second for each job alongside the soak's own equality
  * checks (output fingerprint == a one-shot run over the full mirrored
  * tree, plan residue 0, state interval structure equal).
  *
  * Corpus: EtlBench's generator shape (record content a pure function of
  * the global record index; the idx/86400 micro-offset keeps every record
  * globally unique past the day wrap), written through ServiceSoak's
  * arrival discipline (stage -> mirror to `in-full` -> atomic move into
  * the live tree). File names carry no end offset, so each partition's
  * newest file is P9-protected and the expected delete set is exact:
  * every file EXCEPT the last wave's per-partition newest.
  *
  * Mid-soak, one output bin directory is deleted while both jobs are live
  * (the cleaner age-gated off, as in ServiceSoak.runFromStartup — a
  * production cleaner inside its age window — so no verification read is
  * in flight and the head files cannot have been deleted yet). Once the
  * gate opens, cleaner ticks interleave with the still-arriving final
  * waves: verified files delete, the planted miss readmits every
  * processed file of the affected project (perFile >> 86400 spreads each
  * file over all 24 hour bins, so the readmission mass is ~1/3 of the
  * processed corpus — a real reprocessing storm, not a token range),
  * restructure ticks re-emit them, and later cleaner ticks re-verify and
  * re-delete.
  *
  * Throughput accounting: each job's closure accumulates its own busy
  * nanoseconds; restructure rec/s divides TOTAL input records fed
  * (initial + reprocessed, measured from the job's written-record
  * counters) by restructure busy time, and cleaner rec/s divides VERIFIED
  * records (each candidate either deletes or readmits, and files are
  * uniform at perFile records, so verified = (deleted + readmitted) *
  * perFile summed over ticks) by cleaner busy time.
  *
  * Usage: runMain graft.SoakBench [nRecords] [nFiles] [nPartitions]
  * [nUsers] [waves] (defaults 10M, 40, 4, 20, 5).
  */
object SoakBench {

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

  def main(args: Array[String]): Unit = {
    val nRecords = if (args.length > 0) args(0).toInt else 10000000
    val nFiles = if (args.length > 1) args(1).toInt else 40
    val nPartitions = if (args.length > 2) args(2).toInt else 4
    val nUsers = if (args.length > 3) args(3).toInt else 20
    val waves = if (args.length > 4) args(4).toInt else 5
    require(nFiles % waves == 0 && (nFiles / waves) % nPartitions == 0,
      "nFiles must split into waves of whole per-partition file sets")
    require(waves >= 3, "need >= 3 waves: the plant lands before the final two")
    // the exact-readmission set below assumes every file's idx range
    // wraps the full day (all 24 hour bins, all users): below this, which
    // proj0 files hold planted-bin records depends on where each file's
    // range lands modulo 86400 and the expected set is no longer
    // wave-count arithmetic (measured at 1M/40: only 3 of 8 readmit)
    require(nRecords / nFiles >= 86460,
      "perFile must span a full day of offsets (>= 86460) — scale nRecords up")
    val perFile = nRecords / nFiles
    val schema = new Schema.Parser().parse(schemaJson)
    val dir = Files.createTempDirectory("graft-soak-bench").toFile
    val staging = new File(dir, "stage"); staging.mkdirs()
    val t0d = 1580219940.0 // 2020-01-28T13:59 UTC

    /** EtlBench's record content (globally unique at every idx), staged,
      * mirrored into the one-shot comparator tree, atomically moved live. */
    def writeFile(f: Int): File = {
      val partition = f % nPartitions
      val startOffset = (f / nPartitions).toLong * perFile
      val name = f"sensor_topic+$partition+$startOffset%010d.avro"
      val tmp = new File(staging, name)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, tmp)
      (0 until perFile).foreach { i =>
        val idx = f.toLong * perFile + i
        val k = new GenericData.Record(schema.getField("key").schema())
        k.put("projectId", s"proj${idx / perFile % 3}")
        k.put("userId", s"user${idx % nUsers}")
        k.put("sourceId", s"src${idx / perFile % 5}")
        val v = new GenericData.Record(schema.getField("value").schema())
        val t = t0d + (idx % 86400) + (idx / 86400) * 1e-6
        v.put("time", t); v.put("timeReceived", t + 1.0)
        v.put("light", (idx % perFile).toFloat)
        val r = new GenericData.Record(schema)
        r.put("key", k); r.put("value", v)
        w.append(r)
      }
      w.close()
      val full = new File(dir, s"in-full/sensor_topic/partition=$partition/$name")
      full.getParentFile.mkdirs()
      Files.copy(tmp.toPath, full.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val dest = new File(dir, s"in/sensor_topic/partition=$partition/$name")
      dest.getParentFile.mkdirs()
      Files.move(tmp.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest
    }

    val spark = Sessions.build("graft-soak-bench")
    val cfg = RestructureConfig(
      inputDir = s"$dir/in",
      outputDir = s"$dir/out",
      stateFile = s"$dir/state/offsets.json",
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = true))
    val job = new Restructure(spark, cfg)

    val restructureBusyNs = new AtomicLong(0)
    val cleanerBusyNs = new AtomicLong(0)
    val verifiedFiles = new AtomicLong(0)
    val deletedPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val readmittedPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val recordsWritten = new AtomicLong(0)
    val cleaner = new Cleaner(spark, cfg, ageMs = -3600000L)
    val gate = new AtomicBoolean(false)
    val svc = new Service(
      restructure = () => {
        val t0 = System.nanoTime()
        val r = job.run()
        restructureBusyNs.addAndGet(System.nanoTime() - t0)
        recordsWritten.addAndGet(r.records)
      },
      cleaner = Some(() => {
        val now = if (gate.get()) System.currentTimeMillis() else 0L
        val t0 = System.nanoTime()
        val (d, r) = cleaner.run(now)
        cleanerBusyNs.addAndGet(System.nanoTime() - t0)
        verifiedFiles.addAndGet(d.size + r.size)
        d.foreach(deletedPaths.add); r.foreach(readmittedPaths.add)
      }),
      restructureIntervalMs = 1000L,
      cleanerIntervalMs = 2000L)

    def awaitPasses(counter: AtomicLong, k: Long): Unit =
      ServiceSoak.awaitPasses(svc, counter, k, deadlineMs = 1800000L)

    val wall0 = System.nanoTime()
    val perWave = nFiles / waves
    val gateWave = waves - 2 // plant + open the gate with final waves arriving
    val allFiles = scala.collection.mutable.ArrayBuffer.empty[File]
    svc.start()
    try {
      (0 until waves).foreach { wv =>
        if (wv == gateWave) {
          // both jobs are live, the cleaner is ticking against the closed
          // gate (zero candidates -> no verification read in flight), and
          // the final waves have not arrived: plant the miss MID-WAVE
          awaitPasses(svc.cleanerPasses, 1)
          def firstDir(f: File, prefix: String): File = {
            val ds = Option(f.listFiles()).getOrElse(Array.empty[File])
              .filter(d => d.isDirectory && d.getName.startsWith(prefix))
            require(ds.nonEmpty, s"no '$prefix*' under $f"); ds.minBy(_.getName)
          }
          val out = new File(dir, "out/sensor_topic")
          ServiceSoak.rmRf(firstDir(firstDir(firstDir(out, "_project="), "_user="), "_bin="))
          gate.set(true)
        }
        allFiles ++= (wv * perWave until (wv + 1) * perWave).map(writeFile)
        awaitPasses(svc.restructurePasses, 2)
      }
      // convergence: everything but each partition's newest file deletes
      // (for the readmitted project that transitively proves readmit ->
      // reprocess -> re-verify -> re-delete)
      val newest = allFiles.groupBy(f => f.getName.split('+')(1)).values
        .map(_.maxBy(_.getName)).toSet
      val deletables = allFiles.filterNot(newest)
      val deadline = System.currentTimeMillis() + 1800000L
      while (deletables.exists(_.exists())) {
        require(svc.lastError.isEmpty, s"service pass failed: ${svc.lastError.get}")
        require(System.currentTimeMillis() < deadline,
          s"soak stalled; ${deletables.count(_.exists())} deletables remain")
        Thread.sleep(250L)
      }
      awaitPasses(svc.restructurePasses, 2)
      // exact delete set + P9 survival
      require(deletedPaths.size == deletables.size,
        s"deleted ${deletedPaths.size} != expected ${deletables.size}")
      require(newest.forall(_.exists()), "a P9-protected newest file was deleted")
      // readmission set is EXACT: the planted bin is proj0's earliest
      // user0 hour, every pre-plant proj0 file (file index % 3 == 0 —
      // projectId cycles with the global file number) has records there
      // (perFile >> 86400 spans all bins/users), those records are seen
      // so nothing rewrites them before readmission, and post-plant
      // files write their rows into the recreated bin and verify clean
      def names(s: java.util.Set[String]): Set[String] =
        { import scala.jdk.CollectionConverters._
          s.asScala.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet }
      val expectReadmit = (0 until gateWave * perWave).filter(_ % 3 == 0)
        .map(f => f"sensor_topic+${f % nPartitions}+${(f / nPartitions).toLong * perFile}%010d.avro")
        .toSet
      require(names(readmittedPaths) == expectReadmit,
        s"readmitted ${names(readmittedPaths)} != expected $expectReadmit")
    } finally svc.stop()
    require(svc.lastError.isEmpty, s"service pass failed: ${svc.lastError}")

    // one-shot comparator over the full mirrored tree
    val oneCfg = cfg.copy(inputDir = s"$dir/in-full",
      outputDir = s"$dir/out-oneshot", stateFile = s"$dir/state-oneshot/offsets.json")
    val oneJob = new Restructure(spark, oneCfg)
    oneJob.run()
    val soakFp = ServiceSoak.fingerprint(job.readOutput("sensor_topic"))
    val oneFp = ServiceSoak.fingerprint(oneJob.readOutput("sensor_topic"))
    require(soakFp == oneFp, s"soak output != one-shot: $soakFp vs $oneFp")
    val expectRows = perFile.toLong * nFiles
    require(soakFp._1 == expectRows, s"expected $expectRows rows, got ${soakFp._1}")
    val state = job.loadState()
    val planAfter = job.plan("sensor_topic", state).size
    require(planAfter == 0, s"post-soak plan lists $planAfter files")
    val soakRanges = state.entries.size
    val oneRanges = oneJob.loadState().entries.size
    require(soakRanges == oneRanges, s"state $soakRanges ranges vs one-shot $oneRanges")

    val wallSec = (System.nanoTime() - wall0) / 1e9
    val rSec = restructureBusyNs.get() / 1e9
    val cSec = cleanerBusyNs.get() / 1e9
    val verifiedRecords = verifiedFiles.get() * perFile
    println(
      s"""{"metric":"soak_bench_input_rec_per_sec","value":${(recordsWritten.get() / rSec).toLong},""" +
        s""""inputRecords":$expectRows,"recordsWritten":${recordsWritten.get()},""" +
        s""""ticks":${svc.restructurePasses.get()},"cleanerTicks":${svc.cleanerPasses.get()},""" +
        s""""restructureBusySec":${math.round(rSec * 100) / 100.0},""" +
        s""""cleanerBusySec":${math.round(cSec * 100) / 100.0},""" +
        s""""verifiedRecords":$verifiedRecords,""" +
        s""""cleanerRecPerSec":${(verifiedRecords / cSec).toLong},""" +
        s""""deleted":${deletedPaths.size},"readmitted":${readmittedPaths.size},""" +
        s""""rows":${soakFp._1},"planAfter":$planAfter,"stateRanges":$soakRanges,""" +
        s""""oneShotStateRanges":$oneRanges,"wallSec":${math.round(wallSec * 100) / 100.0}}""")
    spark.stop()
  }
}
