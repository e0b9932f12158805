package graft.restructure

import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  test("full config round trip with per-topic dedup overrides") {
    val cfg = ConfigLoader.fromString(
      """input=/in
        |output=/out
        |state=/state/offsets.json
        |format=json
        |compression=gzip
        |excludeTopics=skip_me, also_skip
        |maxFilesPerTopic=42
        |minimumFileAgeMs=1000
        |dedup.enable=true
        |dedup.distinctFields=key.sourceId,value.time
        |topics.special.dedup.enable=false
        |topics.other.dedup.ignoreFields=value.timeReceived
        |""".stripMargin)
    assert(cfg.inputDir == "/in" && cfg.outputDir == "/out")
    assert(cfg.format == "json")
    assert(cfg.compression.contains("gzip"))
    assert(cfg.excludeTopics == Set("skip_me", "also_skip"))
    assert(cfg.maxFilesPerTopic.contains(42))
    assert(cfg.minimumFileAgeMs == 1000L)
    assert(cfg.dedupDefault ==
      DedupConfig(enable = true, distinctFields = Seq("key.sourceId", "value.time")))
    // per-topic: explicit override wins, unset keys inherit the default
    assert(!cfg.dedup("special").enable)
    assert(cfg.dedup("other").enable)
    assert(cfg.dedup("other").ignoreFields == Seq("value.timeReceived"))
    assert(cfg.dedup("other").distinctFields == Seq("key.sourceId", "value.time"))
  }

  test("defaults and validation") {
    val cfg = ConfigLoader.fromString("input=/i\noutput=/o\nstate=/s\n")
    assert(cfg.format == "csv")
    assert(cfg.compression.isEmpty)
    assert(cfg.minimumFileAgeMs == 60000L)
    assert(cfg.dedup.isEmpty && !cfg.dedupDefault.enable)

    intercept[IllegalArgumentException] {
      ConfigLoader.fromString("output=/o\nstate=/s\n") // missing input
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromString("input=/i\noutput=/o\nstate=/s\nformat=xml\n")
    }
    val none = ConfigLoader.fromString("input=/i\noutput=/o\nstate=/s\ncompression=none\n")
    assert(none.compression.isEmpty)
  }
}
