package graft.restructure

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.File
import java.net.URI
import java.nio.file.Files

/** Live object-store round-trip — the leg the sandbox cannot exercise
  * (no network), kept on the books as an env-gated integration spec
  * mirroring the reference's MinIO test
  * (src/integrationTest/java/org/radarbase/output/RestructureS3IntegrationTest.kt:40-98).
  *
  * Set `SPARK_GRAFT_S3_URI` to an s3a:// (or abfss:// / hdfs://) base the
  * test may write under, plus for S3/MinIO:
  *   SPARK_GRAFT_S3_ENDPOINT    e.g. http://localhost:9000
  *   SPARK_GRAFT_S3_ACCESS_KEY / SPARK_GRAFT_S3_SECRET_KEY
  * and the suite uploads the avro sink fixture, runs the full restructure
  * pipeline with input, output, state, and locks ALL on the remote store,
  * and checks layout + incremental no-op re-run. Unset (this sandbox), the
  * test cancels rather than passing vacuously, so CI output shows the leg
  * as pending-on-environment, not green.
  */
class LiveStorageSpec extends SparkSpec {
  import RestructureFixture.{record, t1, t2, writeAvro}

  test("restructure round-trips against a live object store (SPARK_GRAFT_S3_URI)") {
    val baseUri = sys.env.get("SPARK_GRAFT_S3_URI")
    assume(baseUri.nonEmpty,
      "SPARK_GRAFT_S3_URI not set — no live object store reachable from this environment")
    val base = baseUri.get.stripSuffix("/")

    // the same fs.s3a.* wiring YamlConfig derives from the reference's
    // source/target connector blocks (YamlConfig.scala srcConf/tgtConf)
    val hc = spark.sparkContext.hadoopConfiguration
    sys.env.get("SPARK_GRAFT_S3_ENDPOINT").foreach { ep =>
      hc.set("fs.s3a.endpoint", ep)
      hc.set("fs.s3a.path.style.access", "true")
      hc.set("fs.s3a.connection.ssl.enabled", ep.startsWith("https").toString)
    }
    sys.env.get("SPARK_GRAFT_S3_ACCESS_KEY").foreach(hc.set("fs.s3a.access.key", _))
    sys.env.get("SPARK_GRAFT_S3_SECRET_KEY").foreach(hc.set("fs.s3a.secret.key", _))

    val fs = FileSystem.get(new URI(base), hc)
    val root = new Path(s"$base/graft-live-${System.currentTimeMillis()}")
    try {
      // upload the avro sink fixture (same shape as RestructureSpec)
      val local = Files.createTempDirectory("graft-live").toFile
      val f1 = new File(local,
        "application_server_status+1+0000000018+0000000020.avro")
      writeAvro(f1, Seq(record(t1, "CONNECTED"), record(t1, "CONNECTED"),
        record(t2, "DISCONNECTED")))
      val f2 = new File(local, "application_server_status+1+0000000021.avro")
      writeAvro(f2, Seq(record(t2, "CONNECTED")))
      val inDir = new Path(root, "in/application_server_status/partition=1")
      fs.mkdirs(inDir)
      fs.copyFromLocalFile(new Path(f1.toString), new Path(inDir, f1.getName))
      fs.copyFromLocalFile(new Path(f2.toString), new Path(inDir, f2.getName))

      val cfg = RestructureConfig(
        inputDir = new Path(root, "in").toString,
        outputDir = new Path(root, "out").toString,
        stateFile = new Path(root, "state/offsets.json").toString,
        compression = None,
        minimumFileAgeMs = 0L,
        dedupDefault = DedupConfig(enable = true),
        lockDir = Some(new Path(root, "locks").toString))
      val job = new Restructure(spark, cfg)

      val r1 = job.run()
      assert(r1.files == 2, s"both sink files must process, got ${r1.files}")
      assert(r1.records == 3, s"4 records, 1 dup -> 3 written, got ${r1.records}")

      val out = new Path(root, "out/application_server_status")
      def binDir(bin: String) =
        new Path(out, s"_project=STAGING_PROJECT/_user=user1/_bin=$bin")
      assert(fs.exists(binDir("20200128_1300")), "13:00 bin missing on remote")
      assert(fs.exists(binDir("20200128_1400")), "14:00 bin missing on remote")
      assert(fs.exists(new Path(out, "schema-application_server_status.json")),
        "schema sidecar missing on remote")
      assert(fs.exists(new Path(root, "state/offsets.json")),
        "offset state missing on remote")

      // incremental: the committed state makes a re-run a no-op
      val r2 = new Restructure(spark, cfg).run()
      assert(r2.files == 0 && r2.records == 0,
        s"re-run must skip committed offsets, got ${r2.files}/${r2.records}")
    } finally {
      fs.delete(root, true)
    }
  }
}
