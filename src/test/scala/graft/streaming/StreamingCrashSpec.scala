package graft.streaming

import graft.SparkSpec
import graft.restructure.{Restructure, RestructureFixture}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.streaming.StreamingQueryException

import java.io.File

/** The streaming twin's crash story (round-19 directive):
  * [[Streaming.restructureStream]]'s contract is AT-LEAST-ONCE appends
  * absorbed by read-time dedup — the batch job's own W3 semantics
  * (CrashRecoverySpec). Both sides of the batch-commit window get the
  * same adversarial treatment here:
  *
  *  - kill AFTER the sink write, before the checkpoint commit (the
  *    `afterWrite` seam throws): part files are on disk, `commits/<id>`
  *    is absent — on-disk crash evidence — and the restarted query
  *    REPLAYS the batch, appending the same records again; the raw
  *    output carries the duplicates, the deduplicated output equals the
  *    batch twin's fingerprint.
  *  - kill MID-EPOCH (a `batchSeam`-planted expression fails every write
  *    task): the epoch dies inside the sink job, nothing is
  *    checkpoint-committed, and the restarted query replays to the same
  *    batch-twin fingerprint.
  *
  * The batch twin is a fresh [[Restructure]].run() over the same inputs
  * into its own tree; fingerprints via ServiceSoak's order-independent
  * whole-row hash. */
class StreamingCrashSpec extends SparkSpec {

  private val topic = "application_server_status"

  private def commitExists(cp: String, batchId: Long): Boolean =
    new File(s"$cp/commits/$batchId").exists()

  private def chainContains(t: Throwable, s: String): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .exists(e => Option(e.getMessage).exists(_.contains(s)))

  private def batchTwinFp(dir: File, cfg: graft.restructure.RestructureConfig) = {
    val twinCfg = cfg.copy(outputDir = new File(dir, "out-twin").toString,
      stateFile = new File(dir, "state-twin/offsets.json").toString)
    val twin = new Restructure(spark, twinCfg)
    twin.run()
    graft.ServiceSoak.fingerprint(twin.readOutput(topic))
  }

  test("kill after sink write, before checkpoint commit: restart replays, dedup absorbs") {
    val (dir, cfg) = RestructureFixture.setup()
    val cp = new File(dir, "cp").toString
    val boom = new RuntimeException("injected streaming crash (post-write)")
    val q = Streaming.restructureStream(spark, cfg, topic, cp,
      afterWrite = _ => throw boom)
    val err = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(chainContains(err, "injected streaming crash"), s"unexpected failure: $err")

    // on-disk crash evidence: the write landed, the checkpoint did not
    val job = new Restructure(spark, cfg)
    val rawAfterCrash = job.readOutput(topic, dedup = false).count()
    assert(rawAfterCrash == 3, s"sink write should be on disk, raw=$rawAfterCrash")
    assert(!commitExists(cp, 0L), "batch 0 must NOT be checkpoint-committed")

    // restart from the checkpoint: the batch replays and APPENDS again
    Streaming.restructureStream(spark, cfg, topic, cp).awaitTermination()
    assert(commitExists(cp, 0L))
    val raw = job.readOutput(topic, dedup = false)
    assert(raw.count() == 6, "replayed appends must be physically present")
    assert(job.readOutput(topic).count() == 3, "read-time dedup absorbs the replay")
    assert(graft.ServiceSoak.fingerprint(job.readOutput(topic)) == batchTwinFp(dir, cfg),
      "restarted stream output != batch twin")
  }

  test("kill mid-epoch (write tasks die): restart replays to the batch twin") {
    val (dir, cfg) = RestructureFixture.setup()
    val cp = new File(dir, "cp").toString
    val killTask = udf { (i: Long) =>
      if (i >= 0) throw new RuntimeException("injected streaming crash (mid-epoch)")
      false
    }
    val q = Streaming.restructureStream(spark, cfg, topic, cp,
      batchSeam = df => df.filter(killTask(col("_row_index"))))
    val err = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(chainContains(err, "injected streaming crash"), s"unexpected failure: $err")
    assert(!commitExists(cp, 0L), "a killed epoch must NOT be checkpoint-committed")

    Streaming.restructureStream(spark, cfg, topic, cp).awaitTermination()
    assert(commitExists(cp, 0L))
    val job = new Restructure(spark, cfg)
    assert(job.readOutput(topic).count() == 3)
    assert(graft.ServiceSoak.fingerprint(job.readOutput(topic)) == batchTwinFp(dir, cfg),
      "restarted stream output != batch twin")
  }
}
