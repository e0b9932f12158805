package graft.restructure

import graft.{ServiceSoak, SparkSpec}

import java.io.File
import java.nio.file.Files
import java.util.concurrent.CountDownLatch

/** W3 adversarial: crash INSIDE the write→commit window and prove the
  * rerun heals (reference posture: worker/FileCache.kt:127-158
  * store-then-ledger; SURVEY §2.8 W3 crash⇒reprocess⇒dedup).
  *
  * The exactly-once-ish claim rests on write-then-commit ordering
  * ([[Restructure.run]]) plus read-time dedup ([[Restructure.readOutput]]).
  * These tests drive the one lifecycle transition no other spec reaches:
  * a failure AFTER a topic's output write succeeded and BEFORE its state
  * commit, injected through the `beforeCommit` seam. Three windows:
  *
  *  1. crash on the FIRST topic of a pass — nothing ever committed, part
  *     files orphaned; the rerun reprocesses everything and the output
  *     merge absorbs the duplicate parts;
  *  2. crash on the SECOND topic — the first topic's commit must survive
  *     (per-topic commit granularity), only the crashed topic reprocesses;
  *  3. a service TICK killed mid-window (`stop` past the drain deadline →
  *     `shutdownNow` interrupt, the Service doc's "interruption is safe
  *     but dirty" claim) — the latch pins the tick between write and
  *     commit so the interrupt lands deterministically inside the window
  *     (interrupting mid-Spark-job would be timing-dependent and tests
  *     the JVM, not the contract), the spurious error is recorded, and a
  *     restarted service converges.
  *
  * Every case requires the healed output fingerprint + row count + state
  * intervals to equal a ONE-SHOT run over the same tree, and that the
  * crash really left evidence (orphan part files present, state missing
  * the batch) — a vacuous pass where the crash didn't land is impossible.
  */
class CrashRecoverySpec extends SparkSpec {
  import RestructureFixture.{record, writeAvro, t1, t2}

  /** Two-topic avro tree: topics sort (crash_a, crash_b), two files each. */
  private def setupTwoTopics(): (File, RestructureConfig) = {
    val dir = Files.createTempDirectory("graft-crash").toFile
    Seq("crash_a", "crash_b").foreach { topic =>
      val tdir = new File(dir, s"in/$topic/partition=1")
      writeAvro(
        new File(tdir, s"$topic+1+0000000018+0000000020.avro"),
        Seq(record(t1, "CONNECTED"), record(t1, "CONNECTED"), record(t2, "DISCONNECTED")))
      writeAvro(
        new File(tdir, s"$topic+1+0000000021.avro"),
        Seq(record(t2, "CONNECTED")))
    }
    val cfg = RestructureConfig(
      inputDir = new File(dir, "in").toString,
      outputDir = new File(dir, "out").toString,
      stateFile = new File(dir, "state/offsets.json").toString,
      compression = None,
      minimumFileAgeMs = 0L,
      dedupDefault = DedupConfig(enable = true))
    (dir, cfg)
  }

  private def partFiles(cfg: RestructureConfig, topic: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    val root = new File(cfg.outputDir, topic)
    if (!root.exists()) Seq.empty
    else walk(root).filter(_.getName.startsWith("part-"))
  }

  /** Healed run == one-shot run over the same input tree: output
    * fingerprint (order-independent whole-row hash), row count, and state
    * interval structure. `expectRows` = distinct records per topic (4
    * written, 1 duplicate). */
  private def assertConverged(dir: File, cfg: RestructureConfig, job: Restructure): Unit = {
    val oneCfg = cfg.copy(
      outputDir = new File(dir, "out-oneshot").toString,
      stateFile = new File(dir, "state-oneshot/offsets.json").toString)
    val oneJob = new Restructure(spark, oneCfg)
    oneJob.run()
    Seq("crash_a", "crash_b").filter(t => new File(cfg.inputDir, t).exists()).foreach { t =>
      val healedFp = ServiceSoak.fingerprint(job.readOutput(t))
      val oneFp = ServiceSoak.fingerprint(oneJob.readOutput(t))
      assert(healedFp == oneFp, s"$t: healed output != one-shot: $healedFp vs $oneFp")
      assert(healedFp._1 == 3L, s"$t: expected 3 distinct rows, got ${healedFp._1}")
      assert(job.plan(t, job.loadState()).isEmpty, s"$t: healed plan still lists files")
    }
    assert(job.loadState().entries.size == oneJob.loadState().entries.size,
      "healed state interval structure != one-shot")
  }

  test("commit crash on the first topic: nothing committed, rerun reprocesses all") {
    val (dir, cfg) = setupTwoTopics()
    val job = new Restructure(spark, cfg)
    job.beforeCommit = t => throw new RuntimeException(s"injected crash after write of $t")
    val boom = intercept[RuntimeException](job.run())
    assert(boom.getMessage.contains("crash_a")) // sorted topic order: first topic dies
    // the crash left evidence: crash_a's parts are on disk, no state at all
    assert(partFiles(cfg, "crash_a").nonEmpty, "write should have landed before the crash")
    assert(partFiles(cfg, "crash_b").isEmpty, "second topic must not have been reached")
    assert(!new File(cfg.stateFile).exists(), "state must be unchanged by the crashed pass")
    val orphanParts = partFiles(cfg, "crash_a").size

    job.beforeCommit = _ => ()
    val healed = job.run()
    assert(healed.records == 6, "rerun must reprocess BOTH topics from scratch")
    // duplicate parts from the crashed write coexist with the rerun's —
    // J4's read-time dedup is what absorbs them, so prove they're there
    assert(partFiles(cfg, "crash_a").size > orphanParts,
      "rerun should append fresh parts next to the orphaned ones")
    assert(job.readOutput("crash_a", dedup = false).count() >
      job.readOutput("crash_a").count(),
      "orphaned duplicate rows should exist pre-dedup")
    assertConverged(dir, cfg, job)
  }

  test("commit crash on the second topic: first topic's commit survives") {
    val (dir, cfg) = setupTwoTopics()
    val job = new Restructure(spark, cfg)
    job.beforeCommit =
      t => if (t == "crash_b") throw new RuntimeException("injected crash after write")
    intercept[RuntimeException](job.run())
    // per-topic commit granularity: crash_a is ledgered, crash_b is not
    val afterCrash = job.loadState()
    assert(afterCrash.entries.map(_._1.topic).toSet == Set("crash_a"),
      "first topic's committed ranges must survive the later crash; second absent")
    assert(job.plan("crash_a", afterCrash).isEmpty)
    assert(job.plan("crash_b", afterCrash).nonEmpty, "crashed topic must replan")
    assert(partFiles(cfg, "crash_b").nonEmpty, "crash_b's write landed before the crash")

    job.beforeCommit = _ => ()
    val healed = job.run()
    assert(healed.records == 3, "only the crashed topic reprocesses")
    assertConverged(dir, cfg, job)
  }

  test("commit crash under a lock manager releases the topic lock") {
    // multi-instance deployments wrap each topic in a remote lock; a
    // crashed pass whose JVM survives must release via withLock's finally
    // (a dead JVM is the lock TTL's job, LocksSpec) — otherwise the
    // rerun below would block on its own stale lock until the TTL breaks
    val (dir, cfg0) = setupTwoTopics()
    ServiceSoak.rmRf(new File(cfg0.inputDir, "crash_b"))
    val cfg = cfg0.copy(lockDir = Some(new File(dir, "locks").toString))
    val job = new Restructure(spark, cfg)
    job.beforeCommit = _ => throw new RuntimeException("injected crash after write")
    intercept[RuntimeException](job.run())
    assert(partFiles(cfg, "crash_a").nonEmpty, "write landed before the crash")
    assert(!new File(cfg.stateFile).exists(), "crashed pass must not commit")
    val lockDir = new File(dir, "locks")
    val stale = Option(lockDir.listFiles()).getOrElse(Array.empty[File])
    assert(stale.isEmpty, s"crashed pass left locks: ${stale.mkString(", ")}")

    job.beforeCommit = _ => ()
    val healed = job.run() // reacquires immediately — no TTL wait
    assert(healed.records == 3)
    assertConverged(dir, cfg, job)
  }

  test("cleaner state-save crash: readmission re-derives, heal converges") {
    // the cleaner's own crash window, mirror-image of the restructure
    // seam: disk effects (deletes) land BEFORE the per-topic state save,
    // so a crash between them loses only the readmission's range removal
    // — deletion never touches state (ranges stay ledgered by design,
    // reference cleaner/SourceDataCleaner.kt:103-106), and candidacy is
    // re-derived from disk + state each pass, so the rerun must re-emit
    // the identical readmission and converge
    val (dir, cfg) = setupTwoTopics()
    val job = new Restructure(spark, cfg)
    job.run()
    val before = ServiceSoak.fingerprint(job.readOutput("crash_a"))
    val statePath = new File(cfg.stateFile).toPath
    val stateBytes = java.nio.file.Files.readAllBytes(statePath)

    // tamper: kill crash_a's 13:00 bin — f1 (offsets 18-20) must readmit;
    // each topic's end-less newest file (offset 21) is P9-excluded, so
    // the only deletable candidates are the two offset-18-20 files
    val bin = new File(cfg.outputDir,
      "crash_a/_project=STAGING_PROJECT/_user=user1/_bin=20200128_1300")
    assert(bin.exists())
    ServiceSoak.rmRf(bin)
    def names(ps: Seq[String]): Seq[String] =
      ps.map(p => p.substring(p.lastIndexOf('/') + 1))

    val cleaner = new Cleaner(spark, cfg, ageMs = 0L)
    val future = System.currentTimeMillis + 60000
    val (deleted1, readmit1) = cleaner.run(now = future)
    assert(names(readmit1) == Seq("crash_a+1+0000000018+0000000020.avro"))
    assert(names(deleted1) == Seq("crash_b+1+0000000018+0000000020.avro"))

    // CRASH: the pass's state save is lost. The deleted file's range was
    // never removed (deletion keeps the ledger), so the restored state
    // differs from the saved one ONLY by the lost readmission. The raw
    // byte restore invalidates Hadoop LocalFileSystem's checksum sidecar
    // — drop it (the real crash leaves the ORIGINAL file + crc intact;
    // this restore just simulates that pair)
    java.nio.file.Files.write(statePath, stateBytes)
    java.nio.file.Files.deleteIfExists(
      statePath.resolveSibling("." + statePath.getFileName + ".crc"))

    // rerun: the readmission re-derives identically; the deleted file is
    // gone from the listing so nothing else changes
    val (deleted2, readmit2) = cleaner.run(now = future)
    assert(deleted2.isEmpty)
    assert(readmit2 == readmit1)

    // reprocess the readmitted file: its re-emitted rows (including the
    // surviving 14:00-bin duplicate) are absorbed by read-time dedup
    job.run()
    assert(ServiceSoak.fingerprint(job.readOutput("crash_a")) == before,
      "healed output must equal the pre-tamper content")
    // a later pass verifies the healed output and deletes the file too
    val (deleted3, readmit3) = cleaner.run(now = future)
    assert(readmit3.isEmpty)
    assert(names(deleted3) == Seq("crash_a+1+0000000018+0000000020.avro"))
    assert(job.plan("crash_a", job.loadState()).isEmpty)
  }

  test("service tick killed between write and commit: restart converges") {
    val (dir, cfg) = setupTwoTopics()
    // single-topic variant keeps the kill window unambiguous
    ServiceSoak.rmRf(new File(cfg.inputDir, "crash_b"))
    val job = new Restructure(spark, cfg)
    val inWindow = new CountDownLatch(1)
    val hold = new CountDownLatch(1)
    job.beforeCommit = { _ =>
      inWindow.countDown()
      hold.await() // parked until stop()'s shutdownNow interrupt arrives
    }
    val svc = new Service(restructure = () => job.run(), restructureIntervalMs = 100L)
    svc.start()
    assert(inWindow.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "tick never reached the write→commit window")
    svc.stop(drainMs = 1L) // drain expires immediately → shutdownNow → interrupt
    assert(svc.lastError.exists(_.isInstanceOf[InterruptedException]),
      "the killed tick should record its spurious InterruptedException")
    assert(partFiles(cfg, "crash_a").nonEmpty, "killed tick's write landed")
    assert(!new File(cfg.stateFile).exists(), "killed tick must not have committed")

    job.beforeCommit = _ => ()
    val svc2 = new Service(restructure = () => job.run(), restructureIntervalMs = 100L)
    svc2.start()
    try {
      val deadline = System.currentTimeMillis() + 60000L
      while (job.plan("crash_a", job.loadState()).nonEmpty) {
        assert(svc2.lastError.isEmpty, s"restarted service failed: ${svc2.lastError}")
        assert(System.currentTimeMillis() < deadline, "restarted service never converged")
        Thread.sleep(25L)
      }
    } finally svc2.stop()
    assert(svc2.restructurePasses.get() >= 1)
    assertConverged(dir, cfg, job)
  }
}
