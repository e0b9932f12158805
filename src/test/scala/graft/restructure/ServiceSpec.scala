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
}
