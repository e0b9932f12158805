package graft.restructure

import org.scalatest.funsuite.AnyFunSuite

/** YAML config surface pinned against the reference's restructure.yml key
  * matrix (config/RestructureConfig.kt:58-84 + the repo-root sample). */
class YamlConfigSpec extends AnyFunSuite {

  private val yaml =
    """service:
      |  enable: true
      |  interval: 45
      |source:
      |  type: s3
      |  s3:
      |    endpoint: http://storage.example:9000
      |    bucket: in-bucket
      |    accessToken: file-access
      |    secretKey: file-secret
      |    endOffsetFromTags: true
      |target:
      |  type: local
      |redis:
      |  uri: redis://cache.example:6379
      |  lockPrefix: radar-output/lock/
      |compression:
      |  type: gzip
      |format:
      |  type: csv
      |  deduplication:
      |    enable: true
      |    distinctFields: [key.sourceId, value.time]
      |worker:
      |  enable: true
      |  cacheSize: 120
      |  numThreads: 3
      |  maxFilesPerTopic: 40
      |  minimumFileAge: 90
      |cleaner:
      |  enable: true
      |  interval: 600
      |  age: 5
      |timer:
      |  enable: true
      |paths:
      |  inputs:
      |    - /topics
      |  output: /data/out
      |topics:
      |  topic_a:
      |    deduplication:
      |      enable: true
      |      ignoreFields: [value.timeReceived]
      |  topic_b:
      |    exclude: true
      |  topic_c:
      |    deduplication:
      |      enable: false
      |""".stripMargin

  test("full reference-shaped yaml parses into AppConfig") {
    val c = YamlConfig.fromString(yaml)
    val r = c.restructure
    assert(r.inputDir == "s3a://in-bucket/topics")
    assert(r.outputDir == "/data/out")
    assert(r.stateFile == "/data/out/_state/offsets.json")
    assert(r.format == "csv" && r.compression.contains("gzip"))
    assert(r.excludeTopics == Set("topic_b"))
    assert(r.maxFilesPerTopic.contains(40))
    assert(r.minimumFileAgeMs == 90000L)
    assert(r.dedupDefault == DedupConfig(true, Seq("key.sourceId", "value.time"), Nil))
    // per-topic override inherits the format default for unset fields
    assert(r.dedup("topic_a") ==
      DedupConfig(true, Seq("key.sourceId", "value.time"), Seq("value.timeReceived")))
    assert(!r.dedup("topic_c").enable)
    assert(r.lockDir.contains("/data/out/_locks/radar-output/lock"))
    assert(r.enableTimers)
    assert(c.service == ServiceSettings(enable = true, intervalMs = 45000L))
    assert(c.cleaner == CleanerSettings(enable = true, intervalMs = 600000L, ageDays = 5))
    assert(c.worker == WorkerSettings(enable = true, numThreads = 3, cacheSize = 120))
    assert(c.hadoopConf == Map(
      "fs.s3a.endpoint" -> "http://storage.example:9000",
      "fs.s3a.access.key" -> "file-access",
      "fs.s3a.secret.key" -> "file-secret"))
    assert(c.endOffsetFromMetadata)
    assert(c.redisUri.contains("redis://cache.example:6379"))
  }

  test("an unknown format fails at load time, not inside the first write") {
    // parity with ConfigLoader's whitelist: a typo'd format must not
    // survive planning and reading only to error-loop a service
    // deployment at its first write
    val bad = yaml.replace("format:\n  type: csv", "format:\n  type: avro")
    val e = intercept[IllegalArgumentException](YamlConfig.fromString(bad))
    assert(e.getMessage.contains("unknown format"))
  }

  test("environment overrides win over file values for the reference's keys") {
    val env = Map(
      "SOURCE_S3_ACCESS_TOKEN" -> "env-access",
      "SOURCE_S3_SECRET_KEY" -> "env-secret",
      "SOURCE_S3_BUCKET" -> "env-bucket",
      "REDIS_URI" -> "redis://other:6379")
    val c = YamlConfig.fromString(yaml, env)
    assert(c.restructure.inputDir == "s3a://env-bucket/topics")
    assert(c.hadoopConf("fs.s3a.access.key") == "env-access")
    assert(c.hadoopConf("fs.s3a.secret.key") == "env-secret")
    assert(c.redisUri.contains("redis://other:6379"))
  }

  test("multiple input paths all map to roots (none silently dropped)") {
    val multi =
      """source:
        |  type: s3
        |  s3:
        |    bucket: b
        |paths:
        |  inputs: [/topics1, /topics2, /topics3]
        |  output: /out
        |""".stripMargin
    val r = YamlConfig.fromString(multi).restructure
    assert(r.inputDir == "s3a://b/topics1")
    assert(r.extraInputDirs == Seq("s3a://b/topics2", "s3a://b/topics3"))
  }

  test("azure target maps to abfss uri and account-scoped conf keys") {
    val az =
      """source:
        |  type: local
        |target:
        |  type: azure
        |  azure:
        |    endpoint: https://myaccount.blob.core.windows.net
        |    container: out-container
        |    accountKey: k123
        |paths:
        |  inputs: [/in]
        |  output: /out
        |""".stripMargin
    val c = YamlConfig.fromString(az)
    assert(c.restructure.outputDir ==
      "abfss://out-container@myaccount.dfs.core.windows.net/out")
    assert(c.hadoopConf ==
      Map("fs.azure.account.key.myaccount.dfs.core.windows.net" -> "k123"))
  }

  test("hdfs source and minimal defaults") {
    val h =
      """source:
        |  type: hdfs
        |  hdfs:
        |    nameNodes: [nn1, nn2]
        |paths:
        |  inputs: [/topics]
        |  output: /out
        |""".stripMargin
    val c = YamlConfig.fromString(h)
    assert(c.restructure.inputDir == "hdfs://nn1/topics")
    // reference defaults: service off, CLEANER OFF (a config without a
    // cleaner section must never delete), worker on, 300 s poll interval
    assert(!c.service.enable && !c.cleaner.enable && c.worker.enable)
    assert(c.service.intervalMs == 300000L)
    assert(c.restructure.minimumFileAgeMs == 60000L)
  }

  test("maxRecordsPerFile accepts the full long range (parity with ConfigLoader)") {
    val y =
      """worker:
        |  maxRecordsPerFile: 3000000000
        |paths:
        |  inputs: [/in]
        |  output: /out
        |""".stripMargin
    assert(YamlConfig.fromString(y).restructure.maxRecordsPerFile
      .contains(3000000000L)) // > Int.MaxValue — toIntOption would drop it
  }

  test("empty document yields defaults with local paths") {
    val c = YamlConfig.fromString("")
    assert(c.restructure.inputDir == "/")
    assert(c.restructure.outputDir == "/output")
    assert(!c.endOffsetFromMetadata)
  }
}
