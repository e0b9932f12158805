package graft

import java.io.File

import graft.restructure.{Restructure, RestructureFixture}

/** The W2/W3/W4 triangle in one test: the --stream mode body
  * (Main.runStream) driven through two micro-batch passes with a LATE file
  * landing in an already-written hour bin between them, asserted equal —
  * record for record — to the batch path run over the same fixture. The
  * stream's checkpoint (W3 exactly-once at file granularity) must admit the
  * late file exactly once (W4 unbounded lateness via append-merge), and a
  * third pass must be a no-op, just like the batch path's offset state.
  */
class MainStreamParitySpec extends SparkSpec {

  private val Topic = "application_server_status"

  /** All output records for the topic, columns sorted by name, one sorted
    * string per row — the strongest comparable surface between the two
    * paths. */
  private def outputRows(cfg: graft.restructure.RestructureConfig): Seq[String] = {
    val df = new Restructure(spark, cfg).readOutput(Topic, dedup = false)
    val cols = df.columns.sorted
    df.select(cols.map(c => org.apache.spark.sql.functions.col(s"`$c`")): _*)
      .collect()
      .map(_.mkString("|"))
      .sorted
      .toSeq
  }

  test("Main --stream over two micro-batches + late file == batch path") {
    val (dirS, cfgS) = RestructureFixture.setup()
    val (dirB, cfgB) = RestructureFixture.setup()

    // pass 1 on both paths
    assert(Main.runStream(spark, cfgS) == 1)
    new Restructure(spark, cfgB).run()

    // a LATE file lands: offset 22, but its record belongs to the 13:00 bin
    // that pass 1 already wrote (W4 — no lateness bound)
    for (d <- Seq(dirS, dirB)) RestructureFixture.writeAvro(
      new File(d, s"in/$Topic/partition=1/$Topic+1+0000000022.avro"),
      Seq(RestructureFixture.record(RestructureFixture.t1, "LATE")))

    // pass 2 picks up ONLY the late file on both paths
    assert(Main.runStream(spark, cfgS) == 1)
    new Restructure(spark, cfgB).run()

    val streamed = outputRows(cfgS)
    val batch = outputRows(cfgB)
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // the late record is present exactly once on each path
    assert(streamed.count(_.contains("LATE")) == 1)

    // schema sidecar parity (S9 emitted on both paths)
    assert(new File(cfgS.outputDir, s"$Topic/schema-$Topic.json").exists())
    assert(new File(cfgB.outputDir, s"$Topic/schema-$Topic.json").exists())

    // pass 3: nothing new -> both paths are no-ops (W3 exactly-once)
    assert(Main.runStream(spark, cfgS) == 1) // query runs, admits no files
    assert(new Restructure(spark, cfgB).run().files == 0)
    assert(outputRows(cfgS) == streamed)
    assert(outputRows(cfgB) == batch)
  }
}
