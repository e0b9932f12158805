package graft.restructure

import org.scalatest.funsuite.AnyFunSuite

class ServiceSpec extends AnyFunSuite {
  test("service schedules restructure and cleaner passes, survives errors") {
    val svc = new Service(
      restructure = () => (),
      cleaner = Some(() => throw new RuntimeException("boom")),
      restructureIntervalMs = 40L,
      cleanerIntervalMs = 40L)
    svc.start()
    Thread.sleep(400)
    svc.stop()
    assert(svc.restructurePasses.get() >= 2) // ticked repeatedly
    assert(svc.cleanerPasses.get() == 0)     // every cleaner tick failed...
    assert(svc.lastError.exists(_.getMessage == "boom")) // ...and was captured
    intercept[IllegalArgumentException] { // double start rejected
      svc.start(); svc.start()
    }
    svc.stop()
  }

  test("a job's next SUCCESS clears its captured error (transient failures self-heal)") {
    // first tick throws, every later tick succeeds — a transient failure
    // (file mid-move, store hiccup) must not poison lastError forever
    val calls = new java.util.concurrent.atomic.AtomicLong(0)
    val svc = new Service(
      restructure = () =>
        if (calls.incrementAndGet() == 1) throw new RuntimeException("transient"),
      restructureIntervalMs = 40L)
    svc.start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (svc.restructurePasses.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(svc.restructurePasses.get() >= 2, "service never recovered")
      assert(svc.lastError.isEmpty, s"recovered pass left lastError: ${svc.lastError}")
    } finally svc.stop()
  }

  test("a FATAL error cancels the schedule instead of ticking a broken JVM") {
    // NonFatal failures retry next tick (above); a VirtualMachineError
    // must be recorded for lastError and then escape the guard — a thrown
    // task cancels its fixed-rate schedule, so the service stops driving
    // work through a heap-exhausted JVM
    val calls = new java.util.concurrent.atomic.AtomicLong(0)
    val svc = new Service(
      restructure = () => { calls.incrementAndGet(); throw new OutOfMemoryError("test") },
      restructureIntervalMs = 40L)
    svc.start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (svc.lastError.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(svc.lastError.exists(_.isInstanceOf[OutOfMemoryError]))
      val after = calls.get()
      Thread.sleep(300) // several would-be intervals
      assert(calls.get() == after, "fatal error must cancel the schedule, not retry")
    } finally svc.stop()
  }
}
