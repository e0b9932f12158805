package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** BenchMed's prior-record parser feeds the ambient adjudication, so it
  * must read the MAIN table only: the footer's flagged rows share the
  * `| name | num | num | ... |` shape, and last-wins parsing would
  * replace a flagged query's recorded min with the footer's stale
  * prior-PRIOR value — freezing a borderline query's baseline so it
  * stays flagged in every later round (the bug this spec pins). */
class BenchMedPriorSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val p = Files.createTempFile("benchmed-prior", ".md")
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("prior() reads the main table, not the adjudication footer") {
    val path = write(
      """# BENCHMED — warm steady-state times
        |
        |Recorded at commit `abc1234`.
        |
        || query | min (s) | median (s) | reps (s) |
        ||---|---|---|---|
        || slow_query | 2.50 | 2.60 | 2.55, 2.50 |
        || flagged_query | 0.30 | 0.35 | 0.40, 0.30 |
        |
        |## Ambient adjudication vs prior record (`zzz9999`)
        |
        |Ambient level = median per-query min ratio over 2 shared
        |queries: **0.92x** ...
        |
        || query | prior min (s) | min (s) | ratio | adjusted |
        ||---|---|---|---|---|
        || flagged_query | 0.25 | 0.30 | 1.20x | 1.31x |
        |""".stripMargin)
    val Some((head, mins)) = BenchMed.prior(path)
    assert(head == "abc1234")
    assert(mins == Map("slow_query" -> 2.50, "flagged_query" -> 0.30),
      "the footer's stale prior-prior value must not shadow the recorded min")
  }

  test("prior() is None for missing or row-less files") {
    assert(BenchMed.prior("/tmp/definitely-not-there-benchmed.md").isEmpty)
    assert(BenchMed.prior(write("# empty\n\nno table here\n")).isEmpty)
  }

  test("row numbers format dot-decimal under a comma-decimal default locale") {
    // round-19 advisory: f"$d%.2f" honors the default locale; under e.g.
    // de_DE it emits '1,23', which prior()'s `[0-9.]+` row regex silently
    // fails to parse — the next run's ambient footer would vanish instead
    // of erroring. fmt2 is what every parser-read number goes through.
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchMed.fmt2(1.234) == "1.23")
      assert(BenchMed.fmt2(0.5) == "0.50")
    } finally java.util.Locale.setDefault(saved)
  }
}
