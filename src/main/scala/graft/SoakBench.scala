package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.restructure.{Cleaner, DedupConfig, Restructure, RestructureConfig, Service}

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** The two-job scheduler at BENCH scale (round-18 directive), now with a
  * MULTI-INSTANCE mode (round-19): ServiceSoak proves the interleaved
  * restructure+cleaner composition converges at 120 k rows; EtlBench
  * proves each job's throughput separately at 100 M. This main runs the
  * full deployment under ONE or MORE from-startup schedulers over >= 10 M
  * records fed in waves — the scale where task queues actually fill — and
  * reports records/second for each job alongside the soak's own equality
  * checks (per-topic output fingerprint == a one-shot run over the full
  * mirrored tree, plan residue 0, state interval structure equal).
  *
  * `instances` > 1 is the reference's real deployment shape
  * (worker/RadarKafkaRestructure.kt:100): N complete Restructure+Cleaner
  * loops on separate scheduler threads, sharding topics via the shared
  * lock dir and merge-committing one state file under the `__state` lock.
  * `nTopics` > 1 gives the instances disjoint work to shard — with one
  * topic the per-topic lock correctly serializes them, so the 1- vs
  * 2-instance busy-throughput comparison needs at least two topics.
  * Instance 0 additionally CRASHES mid write->commit window once (the
  * `beforeCommit` seam throws on its first commit) and retries next tick
  * — the convergence checks then prove the fleet absorbs a member's crash
  * at bench scale, not just at spec scale (TwoInstanceSoakSpec drives the
  * stay-down + peer-heal variant).
  *
  * Corpus: EtlBench's generator shape (record content a pure function of
  * the global record index; the idx/86400 micro-offset keeps every record
  * globally unique past the day wrap), cloned per topic, written through
  * ServiceSoak's arrival discipline (stage -> mirror to `in-full` ->
  * atomic move into the live tree). File names carry no end offset, so
  * each (topic, partition)'s newest file is P9-protected and the expected
  * delete set is exact: every file EXCEPT the last wave's per-partition
  * newest.
  *
  * Mid-soak, one output bin directory of TOPIC 0 is deleted while all
  * jobs are live (the cleaners age-gated off, as in
  * ServiceSoak.runFromStartup — a production cleaner inside its age
  * window — so no verification read is in flight and the head files
  * cannot have been deleted yet). Once the gate opens, cleaner ticks
  * interleave with the still-arriving final waves: verified files delete,
  * the planted miss readmits every processed file of the affected
  * project (perFile >> 86400 spreads each file over all 24 hour bins, so
  * the readmission mass is ~1/3 of topic 0's processed corpus — a real
  * reprocessing storm, not a token range), restructure ticks re-emit
  * them, and later cleaner ticks re-verify and re-delete.
  *
  * Inter-wave barriers poll plan()-emptiness of the SHARED state, not
  * tick counters: with locks, a completed pass no longer implies progress
  * (it may have skipped a topic another instance held).
  *
  * Throughput accounting: each instance's closures accumulate their own
  * busy nanoseconds; restructure rec/s divides TOTAL records written
  * (initial + reprocessed + any crash-replayed batch, measured from the
  * jobs' written-record counters) by total restructure busy time, and
  * cleaner rec/s divides VERIFIED records (each candidate either deletes
  * or readmits, and files are uniform at perFile records, so verified =
  * (deleted + readmitted) * perFile summed over ticks) by total cleaner
  * busy time. Per-instance busy seconds are reported so lock contention
  * shows up as idle instances, not hidden averaging.
  *
  * Usage: runMain graft.SoakBench [nRecords] [nFiles] [nPartitions]
  * [nUsers] [waves] [instances] [nTopics]
  * (defaults 10M, 40, 4, 20, 5, 1, 1; nRecords/nFiles are PER TOPIC).
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
    val instances = if (args.length > 5) args(5).toInt else 1
    val nTopics = if (args.length > 6) args(6).toInt else 1
    require(nFiles % waves == 0 && (nFiles / waves) % nPartitions == 0,
      "nFiles must split into waves of whole per-partition file sets")
    require(waves >= 3, "need >= 3 waves: the plant lands before the final two")
    require(instances >= 1 && nTopics >= 1)
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
    val topics = (0 until nTopics).map(t => s"sensor_topic$t")

    /** EtlBench's record content (globally unique at every idx within a
      * topic; topics are clones), staged, mirrored into the one-shot
      * comparator tree, atomically moved live. */
    def writeFile(topic: String, f: Int): File = {
      val partition = f % nPartitions
      val startOffset = (f / nPartitions).toLong * perFile
      val name = f"$topic+$partition+$startOffset%010d.avro"
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
      val full = new File(dir, s"in-full/$topic/partition=$partition/$name")
      full.getParentFile.mkdirs()
      Files.copy(tmp.toPath, full.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val dest = new File(dir, s"in/$topic/partition=$partition/$name")
      dest.getParentFile.mkdirs()
      Files.move(tmp.toPath, dest.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dest
    }

    /** One wave across all topics, generated on a small pool — generation
      * is wall-clock between waves, not engine busy time, so overlapping
      * the avro writers keeps the schedulers fed at multi-topic scale. */
    def writeWave(fileIdxs: Range): Seq[File] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        import scala.jdk.CollectionConverters._
        val tasks = for (t <- topics; f <- fileIdxs)
          yield new java.util.concurrent.Callable[File] { def call(): File = writeFile(t, f) }
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    }

    val spark = Sessions.build("graft-soak-bench")
    val cfg = RestructureConfig(
      inputDir = s"$dir/in",
      outputDir = s"$dir/out",
      stateFile = s"$dir/state/offsets.json",
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = true),
      lockDir = if (instances > 1) Some(s"$dir/locks") else None)

    val deleteEvents = new AtomicLong(0)
    val readmitEvents = new AtomicLong(0)
    val deletedPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val readmittedPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val gate = new AtomicBoolean(false)
    val crashed = new AtomicBoolean(instances == 1) // no injected crash solo

    final class Instance(id: Int) {
      val job = new Restructure(spark, cfg)
      if (id == 0 && instances > 1) {
        // one mid-window crash at bench scale: first commit attempt dies
        // AFTER its write; the schedule retries next tick and the fleet
        // (this instance or a peer) reprocesses the unledgered batch
        job.beforeCommit = _ =>
          if (crashed.compareAndSet(false, true))
            throw new RuntimeException(ServiceSoak.InjectedCrash)
      }
      private val cleaner = new Cleaner(spark, cfg, ageMs = -3600000L)
      val restructureBusyNs = new AtomicLong(0)
      val cleanerBusyNs = new AtomicLong(0)
      val verifiedFiles = new AtomicLong(0)
      val recordsWritten = new AtomicLong(0)
      val svc = new Service(
        restructure = () => {
          val t0 = System.nanoTime()
          // busy time must include a crashed tick's write (finally), and
          // its records count once reprocessed — honest double cost
          try recordsWritten.addAndGet(job.run().records)
          finally restructureBusyNs.addAndGet(System.nanoTime() - t0)
        },
        cleaner = Some(() => {
          val now = if (gate.get()) System.currentTimeMillis() else 0L
          val t0 = System.nanoTime()
          val (d, r) =
            try cleaner.run(now)
            finally cleanerBusyNs.addAndGet(System.nanoTime() - t0)
          verifiedFiles.addAndGet(d.size + r.size)
          deleteEvents.addAndGet(d.size); readmitEvents.addAndGet(r.size)
          d.foreach(deletedPaths.add); r.foreach(readmittedPaths.add)
        }),
        // coprime-ish periods per instance: relative tick phase sweeps
        restructureIntervalMs = 1000L + id * 300L,
        cleanerIntervalMs = 2000L + id * 700L)

      /** The injected crash is benign on instance 0 until its next
        * successful pass clears it; anything else is a real failure. */
      def healthyOrInjected(): Unit = svc.lastError.foreach { e =>
        require(id == 0 && e.getMessage == ServiceSoak.InjectedCrash,
          s"service pass failed (instance $id): $e")
      }
    }
    val fleet = (0 until instances).map(new Instance(_))
    val planJob = fleet.head.job // read-only plan/loadState polls

    def awaitHealthy(deadline: Long, what: String)(done: => Boolean): Unit =
      while (!done) {
        fleet.foreach(_.healthyOrInjected())
        require(System.currentTimeMillis() < deadline, s"soak stalled: $what")
        Thread.sleep(100L)
      }
    def awaitNoPlan(): Unit = {
      val deadline = System.currentTimeMillis() + 1800000L
      val state = () => planJob.loadState()
      awaitHealthy(deadline, "waiting for the shared plan to drain") {
        val s = state()
        topics.forall(t => planJob.plan(t, s).isEmpty)
      }
    }
    def awaitCleanerPasses(k: Long): Unit = fleet.foreach { inst =>
      val target = inst.svc.cleanerPasses.get() + k
      awaitHealthy(System.currentTimeMillis() + 1800000L,
        s"waiting for cleaner pass $target") {
        inst.svc.cleanerPasses.get() >= target
      }
    }

    val wall0 = System.nanoTime()
    val perWave = nFiles / waves
    val gateWave = waves - 2 // plant + open the gate with final waves arriving
    val allFiles = scala.collection.mutable.ArrayBuffer.empty[File]
    fleet.foreach(_.svc.start())
    try {
      (0 until waves).foreach { wv =>
        if (wv == gateWave) {
          // all jobs are live, the cleaners are ticking against the closed
          // gate (zero candidates -> no verification read in flight), and
          // the final waves have not arrived: plant the miss MID-WAVE
          awaitCleanerPasses(1)
          def firstDir(f: File, prefix: String): File = {
            val ds = Option(f.listFiles()).getOrElse(Array.empty[File])
              .filter(d => d.isDirectory && d.getName.startsWith(prefix))
            require(ds.nonEmpty, s"no '$prefix*' under $f"); ds.minBy(_.getName)
          }
          val out = new File(dir, s"out/${topics.head}")
          ServiceSoak.rmRf(firstDir(firstDir(firstDir(out, "_project="), "_user="), "_bin="))
          gate.set(true)
        }
        allFiles ++= writeWave(wv * perWave until (wv + 1) * perWave)
        awaitNoPlan()
      }
      require(crashed.get(), "the injected mid-window crash never fired")
      // convergence: everything but each (topic, partition)'s newest file
      // deletes (for the readmitted project that transitively proves
      // readmit -> reprocess -> re-verify -> re-delete)
      val newest = allFiles
        .groupBy(f => (f.getParentFile.getParentFile.getName, f.getName.split('+')(1)))
        .values.map(_.maxBy(_.getName)).toSet
      val deletables = allFiles.filterNot(newest)
      val deadline = System.currentTimeMillis() + 1800000L
      awaitHealthy(deadline,
        s"cleaner convergence; ${deletables.count(_.exists())} deletables remain") {
        !deletables.exists(_.exists())
      }
      awaitNoPlan()
      // exact delete set + P9 survival + single-reporting
      require(deletedPaths.size == deletables.size,
        s"deleted ${deletedPaths.size} != expected ${deletables.size}")
      require(newest.forall(_.exists()), "a P9-protected newest file was deleted")
      require(deleteEvents.get() == deletedPaths.size.toLong,
        s"double-delete: ${deleteEvents.get()} events over ${deletedPaths.size} paths")
      require(readmitEvents.get() == readmittedPaths.size.toLong,
        s"double-readmit: ${readmitEvents.get()} events over ${readmittedPaths.size} paths")
      // readmission set is EXACT: the planted bin is topic 0's proj0
      // earliest user0 hour, every pre-plant proj0 file of TOPIC 0 (file
      // index % 3 == 0 — projectId cycles with the per-topic file number)
      // has records there (perFile >> 86400 spans all bins/users), those
      // records are seen so nothing rewrites them before readmission, and
      // post-plant files write their rows into the recreated bin and
      // verify clean
      def names(s: java.util.Set[String]): Set[String] =
        { import scala.jdk.CollectionConverters._
          s.asScala.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet }
      val expectReadmit = (0 until gateWave * perWave).filter(_ % 3 == 0)
        .map(f => f"${topics.head}+${f % nPartitions}+${(f / nPartitions).toLong * perFile}%010d.avro")
        .toSet
      require(names(readmittedPaths) == expectReadmit,
        s"readmitted ${names(readmittedPaths)} != expected $expectReadmit")
    } finally fleet.foreach(_.svc.stop())
    fleet.foreach(_.healthyOrInjected())

    // one-shot comparator over the full mirrored tree, per topic
    val oneCfg = cfg.copy(inputDir = s"$dir/in-full",
      outputDir = s"$dir/out-oneshot", stateFile = s"$dir/state-oneshot/offsets.json",
      lockDir = None)
    val oneJob = new Restructure(spark, oneCfg)
    oneJob.run()
    val expectRows = perFile.toLong * nFiles
    var totalRows = 0L
    topics.foreach { t =>
      val soakFp = ServiceSoak.fingerprint(planJob.readOutput(t))
      val oneFp = ServiceSoak.fingerprint(oneJob.readOutput(t))
      require(soakFp == oneFp, s"$t: soak output != one-shot: $soakFp vs $oneFp")
      require(soakFp._1 == expectRows, s"$t: expected $expectRows rows, got ${soakFp._1}")
      totalRows += soakFp._1
    }
    val state = planJob.loadState()
    val planAfter = topics.map(t => planJob.plan(t, state).size).sum
    require(planAfter == 0, s"post-soak plan lists $planAfter files")
    val soakRanges = state.entries.size
    val oneRanges = oneJob.loadState().entries.size
    require(soakRanges == oneRanges, s"state $soakRanges ranges vs one-shot $oneRanges")

    val wallSec = (System.nanoTime() - wall0) / 1e9
    val rSec = fleet.map(_.restructureBusyNs.get()).sum / 1e9
    val cSec = fleet.map(_.cleanerBusyNs.get()).sum / 1e9
    val recordsWritten = fleet.map(_.recordsWritten.get()).sum
    val verifiedRecords = fleet.map(_.verifiedFiles.get()).sum * perFile
    def s2(d: Double): Double = math.round(d * 100) / 100.0
    val perInstance = fleet.map { i =>
      s"""{"restructureBusySec":${s2(i.restructureBusyNs.get() / 1e9)},""" +
        s""""cleanerBusySec":${s2(i.cleanerBusyNs.get() / 1e9)},""" +
        s""""recordsWritten":${i.recordsWritten.get()},""" +
        s""""ticks":${i.svc.restructurePasses.get()},"cleanerTicks":${i.svc.cleanerPasses.get()}}"""
    }.mkString("[", ",", "]")
    println(
      s"""{"metric":"soak_bench_input_rec_per_sec","value":${(recordsWritten / rSec).toLong},""" +
        s""""instances":$instances,"topics":$nTopics,""" +
        s""""inputRecords":${expectRows * nTopics},"recordsWritten":$recordsWritten,""" +
        s""""ticks":${fleet.map(_.svc.restructurePasses.get()).sum},""" +
        s""""cleanerTicks":${fleet.map(_.svc.cleanerPasses.get()).sum},""" +
        s""""restructureBusySec":${s2(rSec)},"cleanerBusySec":${s2(cSec)},""" +
        s""""verifiedRecords":$verifiedRecords,""" +
        s""""cleanerRecPerSec":${(verifiedRecords / cSec).toLong},""" +
        s""""deleted":${deletedPaths.size},"readmitted":${readmittedPaths.size},""" +
        s""""rows":$totalRows,"planAfter":$planAfter,"stateRanges":$soakRanges,""" +
        s""""oneShotStateRanges":$oneRanges,"perInstance":$perInstance,""" +
        s""""wallSec":${s2(wallSec)}}""")
    spark.stop()
  }
}
