package graft.restructure

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Service mode (SURVEY §2.8 W2): fixed-rate polling of restructure and
  * cleaner passes, mirroring the reference's scheduler
  * (Application.kt:100-119; worker/Job.kt:36-41 — initial delay is a
  * quarter interval, restructure default 300 s, cleaner 1260 s).
  */
final class Service(
    restructure: () => Unit,
    cleaner: Option[() => Unit] = None,
    restructureIntervalMs: Long = 300000L,
    cleanerIntervalMs: Long = 1260000L) {

  private var executor: ScheduledExecutorService = _
  val restructurePasses = new AtomicLong(0)
  val cleanerPasses = new AtomicLong(0)
  // per-job, cleared by that job's next SUCCESS: a transient failure
  // (file mid-move, store hiccup) must not poison the service's health
  // signal forever once ticks recover, and a restructure success must
  // not mask a still-failing cleaner (or vice versa)
  @volatile private var restructureError: Option[Throwable] = None
  @volatile private var cleanerError: Option[Throwable] = None

  /** Most recent failure of a job whose LATEST pass did not succeed. */
  def lastError: Option[Throwable] = restructureError.orElse(cleanerError)

  def start(): Unit = synchronized {
    require(executor == null, "service already started")
    executor = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-service"); t.setDaemon(true); t
    }
    // single-threaded executor: the read-modify of the error slot never
    // races its own job's other ticks
    def guard(f: () => Unit, counter: AtomicLong,
        set: Option[Throwable] => Unit): Runnable = () =>
      try { f(); counter.incrementAndGet(); set(None) }
      catch {
        // a killed tick (stop past the drain deadline) records its
        // spurious interrupt; restore the flag so anything the pool
        // thread blocks on AFTER this point still sees the pending
        // cancellation instead of stalling the drain deadline
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); set(Some(e))
        case e if scala.util.control.NonFatal(e) => set(Some(e)) // next tick retries
        case e: Throwable =>
          // fatal (OutOfMemoryError, LinkageError): record for lastError,
          // then rethrow — the fixed-rate schedule cancels on a thrown
          // task, so a broken JVM does not keep ticking against itself
          set(Some(e)); throw e
      }
    executor.scheduleAtFixedRate(
      guard(restructure, restructurePasses, restructureError = _),
      restructureIntervalMs / 4, restructureIntervalMs, TimeUnit.MILLISECONDS)
    cleaner.foreach { c =>
      executor.scheduleAtFixedRate(
        guard(c, cleanerPasses, cleanerError = _),
        cleanerIntervalMs / 4, cleanerIntervalMs, TimeUnit.MILLISECONDS)
    }
  }

  /** Drain, don't interrupt: a pass in flight finishes before the
    * executor dies (write-then-commit makes interruption SAFE — the
    * uncommitted batch just reprocesses — but dirty: killed passes leave
    * uncommitted part files for the output merge to absorb and record a
    * spurious InterruptedException in `lastError`). Periodic tasks are
    * not re-executed after shutdown(), so the drain waits for at most
    * one pass; only a pass exceeding `drainMs` is forcibly
    * interrupted. */
  def stop(drainMs: Long = 60000L): Unit = synchronized {
    if (executor != null) {
      executor.shutdown()
      if (!executor.awaitTermination(drainMs, TimeUnit.MILLISECONDS)) {
        executor.shutdownNow()
        executor.awaitTermination(10, TimeUnit.SECONDS)
      }
      executor = null
    }
  }
}
