package graft.restructure

import graft.{ServiceSoak, SparkSpec}

import java.nio.file.Files

/** The service-mode integration seam, end to end: [[graft.ServiceSoak]]
  * runs >= 6 polling ticks while new files arrive between ticks, one
  * file arrives late (below a partition's processed range), and one
  * processed file is rewritten in place with a newer mtime and an
  * appended record — then proves the soak's output, offsets state, and
  * plan residue all equal a one-shot run over the same final tree.
  * Every invariant is a `require` inside ServiceSoak.run, shared with
  * the BENCHSCALE main; this spec drives it at a small corpus. */
class ServiceSoakSpec extends SparkSpec {

  test("service soak converges to the one-shot run (late file + mtime rewrite)") {
    val dir = Files.createTempDirectory("graft-soak-spec").toFile
    val report = ServiceSoak.run(spark, dir, perFile = 120, tickMs = 100L)
    assert(report.ticks >= 6)
    assert(report.soakRows == 4L * 120 + 1)
    assert(report.planAfter == 0)
    assert(report.stateRanges == report.oneShotStateRanges)
  }
}
