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
}
