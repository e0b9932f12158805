package graft.restructure

import graft.{ServiceSoak, SparkSpec}

import java.nio.file.Files

/** Multi-instance W3 (round-19 directive): the reference's deployment
  * model is N concurrent app instances sharding topics via remote locks
  * (worker/RadarKafkaRestructure.kt:100; RedisRemoteLockManagerTest) —
  * [[graft.ServiceSoak.runTwoInstance]] runs TWO complete
  * Restructure+Cleaner loops against one shared tree and lock dir, with
  * instance A crashed mid write->commit window (the `beforeCommit` seam)
  * while instance B verifiably ticks around the held lock, B healing the
  * orphaned batch, A restarting, and both instances driving the late
  * file / in-place rewrite / planted-miss readmission waves to the same
  * one-shot equality set as the single-instance soaks — plus
  * no-double-delete and no-double-readmit (event counts equal distinct
  * paths). Every invariant is a `require` inside runTwoInstance, shared
  * with the SoakBench bench-scale main; this spec drives it at a small
  * corpus. */
class TwoInstanceSoakSpec extends SparkSpec {

  test("two concurrent instances: crash mid-window, peer heals, converges to one-shot") {
    val dir = Files.createTempDirectory("graft-two-instance-soak").toFile
    val report = ServiceSoak.runTwoInstance(spark, dir, perFile = 120, tickMs = 100L)
    assert(report.ticks >= 8)
    assert(report.cleanerTicks >= 2)
    assert(report.soakRows == 6L * 120 + 1)
    assert(report.deletedFiles == 4)
    assert(report.readmittedFiles == 2)
    assert(report.planAfter == 0)
    assert(report.stateRanges == report.oneShotStateRanges)
  }
}
