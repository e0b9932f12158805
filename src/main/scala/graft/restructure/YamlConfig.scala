package graft.restructure

import org.yaml.snakeyaml.Yaml

import scala.jdk.CollectionConverters._

/** Polling-service settings (reference ServiceConfig: interval default 300 s,
  * RestructureConfig.kt:121-125). */
final case class ServiceSettings(enable: Boolean = false, intervalMs: Long = 300000L)

/** Cleaner settings (reference CleanerConfig: DISABLED by default, interval
  * 1260 s, age 7 days — RestructureConfig.kt:134-141; a yaml without a
  * cleaner section must not delete anything). */
final case class CleanerSettings(
    enable: Boolean = false,
    intervalMs: Long = 1260000L,
    ageDays: Int = 7)

/** Worker limits (reference WorkerConfig). numThreads/cacheSize are accepted
  * for config-file compatibility; in the Spark engine parallelism comes from
  * executor cores and caching from the writer, so they only inform
  * `spark.sql.shuffle.partitions`-style tuning by the caller. */
final case class WorkerSettings(
    enable: Boolean = true,
    numThreads: Int = 1,
    cacheSize: Int = 300)

/** The full application configuration a reference `restructure.yml` loads
  * into: the dataflow subset ([[RestructureConfig]]), scheduling, the
  * Hadoop configuration derived from the source/target resource sections
  * (credentials land in `fs.s3a.*` / `fs.azure.*` keys instead of a custom
  * client), and the offset/lock coordination settings. */
final case class AppConfig(
    restructure: RestructureConfig,
    service: ServiceSettings = ServiceSettings(),
    cleaner: CleanerSettings = CleanerSettings(),
    worker: WorkerSettings = WorkerSettings(),
    hadoopConf: Map[String, String] = Map.empty,
    endOffsetFromMetadata: Boolean = false,
    redisUri: Option[String] = None)

/** YAML configuration loader for the reference's `restructure.yml` surface
  * (config/RestructureConfig.kt:58-84, full key matrix in the repo-root
  * restructure.yml sample): service / source / target / redis / compression
  * / format / worker / cleaner / paths / topics sections, with the
  * reference's environment-variable override semantics
  * (`SOURCE_S3_ACCESS_TOKEN`, `TARGET_AZURE_ACCOUNT_KEY`, `REDIS_URI`, ...:
  * env wins over file for exactly the keys the reference's `withEnv`
  * rewrites).
  *
  * Storage resources become Hadoop filesystem URIs + conf keys: an `s3`
  * source with bucket B and input path P reads `s3a://B/P` with
  * `fs.s3a.endpoint`/`access.key`/`secret.key` set; `azure` maps to the
  * `abfss://container@account/...` scheme; `hdfs` to `hdfs://namenode/...`;
  * `local` to plain paths. The engine itself stays storage-agnostic.
  */
object YamlConfig {

  def load(path: String, env: Map[String, String] = sys.env): AppConfig = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try fromString(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8), env)
    finally in.close()
  }

  def fromString(text: String, env: Map[String, String] = Map.empty): AppConfig = {
    val root = Node(Option(new Yaml().load[Any](text)).getOrElse(new java.util.HashMap[String, Any]()))

    // ---- resources -------------------------------------------------------
    def resource(section: Node, envPrefix: String): (String => String, Map[String, String], Boolean) = {
      val tpe = section.str("type").getOrElse("local")
      def over(key: String, yaml: Option[String]): Option[String] =
        env.get(envPrefix + key).orElse(yaml) // reference withEnv: env wins
      tpe match {
        case "s3" =>
          val s3 = section.child("s3")
          val bucket = over("S3_BUCKET", s3.str("bucket"))
            .getOrElse(throw new IllegalArgumentException("s3 resource needs a bucket"))
          val conf = Seq(
            over("S3_ENDPOINT", s3.str("endpoint")).map("fs.s3a.endpoint" -> _),
            over("S3_ACCESS_TOKEN", s3.str("accessToken")).map("fs.s3a.access.key" -> _),
            over("S3_SECRET_KEY", s3.str("secretKey")).map("fs.s3a.secret.key" -> _)).flatten.toMap
          val endOffsets = s3.bool("endOffsetFromTags").getOrElse(false)
          ((p: String) => s"s3a://$bucket/${p.stripPrefix("/")}", conf, endOffsets)
        case "azure" =>
          val az = section.child("azure")
          val container = az.str("container")
            .getOrElse(throw new IllegalArgumentException("azure resource needs a container"))
          val account = over("AZURE_ACCOUNT_NAME", az.str("accountName"))
            .orElse(az.str("endpoint").map(e =>
              e.replaceFirst("^https?://", "").takeWhile(_ != '.')))
            .getOrElse(throw new IllegalArgumentException("azure resource needs an account"))
          val host = s"$account.dfs.core.windows.net"
          val sas = over("AZURE_SAS_TOKEN", az.str("sasToken"))
          val conf = (Seq(
            over("AZURE_ACCOUNT_KEY", az.str("accountKey"))
              .map(s"fs.azure.account.key.$host" -> _),
            // ABFS reads the FIXED-token key (fs.azure.sas.fixed.token.
            // <account host>); fs.azure.sas.token.* is only a provider-
            // class namespace and would be silently ignored
            sas.map(s"fs.azure.sas.fixed.token.$host" -> _)) ++
            // ...and only consults it at all under auth type SAS — the
            // SharedKey default would ignore the token and demand a key
            Seq(sas.map(_ => s"fs.azure.account.auth.type.$host" -> "SAS"))).flatten.toMap
          val endOffsets = az.bool("endOffsetFromMetadata").getOrElse(false)
          ((p: String) => s"abfss://$container@$host/${p.stripPrefix("/")}", conf, endOffsets)
        case "hdfs" =>
          val nn = section.child("hdfs").strList("nameNodes").headOption
            .getOrElse(throw new IllegalArgumentException("hdfs resource needs nameNodes"))
          ((p: String) => s"hdfs://$nn/${p.stripPrefix("/")}", Map.empty[String, String], false)
        case "local" =>
          ((p: String) => p, Map.empty[String, String], false)
        case other =>
          throw new IllegalArgumentException(s"unknown resource type: $other")
      }
    }
    val (srcUri, srcConf, endOffsetsMeta) = resource(root.child("source"), "SOURCE_")
    val (tgtUri, tgtConf, _) = resource(root.child("target"), "TARGET_")

    // ---- paths -----------------------------------------------------------
    val paths = root.child("paths")
    val inputs = paths.strList("inputs") match {
      case Nil => Seq("/"); case xs => xs // every listed input is scanned
    }
    val output = paths.str("output").getOrElse("/output")

    // ---- format / dedup --------------------------------------------------
    val format = root.child("format")
    def dedupOf(n: Node, fallback: DedupConfig): DedupConfig = DedupConfig(
      enable = n.bool("enable").getOrElse(fallback.enable),
      distinctFields = n.strList("distinctFields") match {
        case Nil => fallback.distinctFields; case xs => xs
      },
      ignoreFields = n.strList("ignoreFields") match {
        case Nil => fallback.ignoreFields; case xs => xs
      })
    val dedupDefault = dedupOf(format.child("deduplication"), DedupConfig())
    val formatType = format.str("type").getOrElse("csv").toLowerCase
    // fail at load time like ConfigLoader does — a typo'd format otherwise
    // survives planning and reading and dies inside the first write,
    // error-looping a service deployment
    if (formatType != "csv" && formatType != "json" && formatType != "parquet")
      throw new IllegalArgumentException(s"unknown format: $formatType")

    // ---- topics ----------------------------------------------------------
    val topics = root.child("topics")
    val excluded = topics.keys.filter(t => topics.child(t).bool("exclude").getOrElse(false))
    val perTopic = topics.keys.collect {
      case t if topics.child(t).has("deduplication") =>
        t -> dedupOf(topics.child(t).child("deduplication"), dedupDefault)
    }.toMap

    // ---- worker / service / cleaner / redis ------------------------------
    val worker = root.child("worker")
    val service = root.child("service")
    val cleaner = root.child("cleaner")
    val redis = root.child("redis")
    val redisUri = env.get("REDIS_URI").orElse(redis.str("uri"))

    val restructure = RestructureConfig(
      inputDir = srcUri(inputs.head),
      extraInputDirs = inputs.tail.map(srcUri),
      outputDir = tgtUri(output),
      stateFile = tgtUri(s"${output.stripSuffix("/")}/_state/offsets.json"),
      format = formatType,
      compression = root.child("compression").str("type").filterNot(_ == "none"),
      excludeTopics = excluded.toSet,
      maxFilesPerTopic = worker.int("maxFilesPerTopic"),
      minimumFileAgeMs = worker.int("minimumFileAge").map(_ * 1000L).getOrElse(60000L),
      dedup = perTopic,
      dedupDefault = dedupDefault,
      lockDir = redis.str("lockPrefix")
        .map(p => tgtUri(s"${output.stripSuffix("/")}/_locks/${p.stripSuffix("/")}")),
      endOffsetFromMetadata = endOffsetsMeta,
      // reference --timer flag as a config section
      enableTimers = root.child("timer").bool("enable").getOrElse(false),
      // long, not int: ConfigLoader parses the same knob with _.toLong, and
      // the two entry points must accept the identical value range
      maxRecordsPerFile = worker.long("maxRecordsPerFile"))

    AppConfig(
      restructure = restructure,
      service = ServiceSettings(
        enable = service.bool("enable").getOrElse(false),
        intervalMs = service.int("interval").map(_ * 1000L).getOrElse(300000L)),
      cleaner = CleanerSettings(
        enable = cleaner.bool("enable").getOrElse(false),
        intervalMs = cleaner.int("interval").map(_ * 1000L).getOrElse(1260000L),
        ageDays = cleaner.int("age").getOrElse(7)),
      worker = WorkerSettings(
        enable = worker.bool("enable").getOrElse(true),
        numThreads = worker.int("numThreads").getOrElse(1),
        cacheSize = worker.int("cacheSize").getOrElse(300)),
      hadoopConf = srcConf ++ tgtConf,
      endOffsetFromMetadata = endOffsetsMeta,
      redisUri = redisUri)
  }

  /** Minimal traversal wrapper over snakeyaml's untyped nested maps. */
  private final case class Node(value: Any) {
    private def map: Map[String, Any] = value match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => String.valueOf(k) -> v }.toMap
      case _ => Map.empty
    }
    def child(key: String): Node = Node(map.getOrElse(key, null))
    def has(key: String): Boolean = map.contains(key)
    def keys: Seq[String] = map.keys.toSeq.sorted
    def str(key: String): Option[String] =
      map.get(key).filter(_ != null).map(String.valueOf).map(_.trim).filter(_.nonEmpty)
    def bool(key: String): Option[Boolean] = str(key).map(_.toBoolean)
    def int(key: String): Option[Int] = str(key).flatMap(_.toIntOption)
    def long(key: String): Option[Long] = str(key).flatMap(_.toLongOption)
    def strList(key: String): Seq[String] = map.get(key) match {
      case Some(l: java.util.List[_]) => l.asScala.map(String.valueOf).toSeq
      case Some(s: String) if s.nonEmpty => Seq(s)
      case _ => Nil
    }
  }
}
