package graft.restructure

import graft.{ServiceSoak, SparkSpec}

import java.nio.file.Files

/** The service-mode integration seam, end to end: [[graft.ServiceSoak]]
  * runs >= 8 polling ticks while new files arrive between ticks, one
  * file arrives late (below a partition's processed range), and one
  * processed file is rewritten in place with a newer mtime and an
  * appended record — then interleaves CLEANER ticks with restructure
  * ticks (the reference's two-job scheduler): verified files are
  * deleted mid-soak, a planted output miss readmits exactly the two
  * affected files, later restructure ticks reprocess them, and the
  * re-verified files are deleted too. The soak proves output, offsets
  * state, and plan residue all equal a one-shot run over the full
  * mirrored tree. Every invariant is a `require` inside
  * ServiceSoak.run, shared with the BENCHSCALE main; this spec drives
  * it at a small corpus. */
class ServiceSoakSpec extends SparkSpec {

  private def assertReport(report: ServiceSoak.Report): Unit = {
    assert(report.ticks >= 8)
    assert(report.cleanerTicks >= 2)
    assert(report.soakRows == 6L * 120 + 1)
    assert(report.deletedFiles == 4)
    assert(report.readmittedFiles == 2)
    assert(report.planAfter == 0)
    assert(report.stateRanges == report.oneShotStateRanges)
  }

  test("service soak converges to the one-shot run (late file + rewrite + cleaner)") {
    val dir = Files.createTempDirectory("graft-soak-spec").toFile
    assertReport(ServiceSoak.run(spark, dir, perFile = 120, tickMs = 100L))
  }

  test("from-startup scheduling: both jobs from tick 0, miss planted mid-wave") {
    // the reference's literal deployment order (Application.kt:100-119):
    // cleaner ticks interleave from the FIRST restructure tick (age-gated
    // until the plant, like a production cleaner inside its age window),
    // the planted miss lands while both jobs are live, and the soak must
    // converge to the SAME equality set as the phased run
    val dir = Files.createTempDirectory("graft-soak-startup-spec").toFile
    assertReport(ServiceSoak.runFromStartup(spark, dir, perFile = 120, tickMs = 100L))
  }
}
