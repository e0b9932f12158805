package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline: each stage drops what it should and the
  * whole chain is deterministic. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // long shared text so a one-word change stays above the near-dup
  // threshold (one changed trailing token touches only 3 of ~38 shingles)
  private val base = ('a' to 'z').map(c => s"word$c").mkString(" ") +
    " the quick brown fox jumps over the lazy dog again and again"

  private def docs = Seq(
    (1L, s"<p>$base today</p> https://x.example/1"),
    (2L, s"<b>$base today</b> https://x.example/2"), // exact dup of 1 after cleanup
    (3L, "entirely different tail content follows here now for this document"),
    (4L, "too short"),                       // fails minTokens
    (5L, "spam spam spam spam spam spam ok"), // fails repetition gate
    (6L, s"<p>$base today also</p> https://x.example/6")) // NEAR dup of 1: one appended word
    .toDF("doc_id", "text")

  test("curate: cleanup, quality gate, exact+near dedup, stable split") {
    val out = CorpusPipeline.curate(
      docs, "doc_id", "text",
      CorpusPipeline.Config(minTokens = 5L, maxTopTokenBp = 5000L, nearDupMinBp = 8000L))
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // 4 (short) and 5 (repetitive) gated; 2 cleans to EXACTLY doc 1's text
    // (exact dedup); 6 appends one word to 1's text — a shingle superset,
    // so every LSH band almost surely survives and the pair is found and
    // 6 dropped (near dedup); 3 survives
    assert(ids == Seq(1L, 3L))
    // and near-dedup specifically was the stage that removed 6: exact
    // dedup alone would have kept it
    val exactOnly = CorpusPipeline.exactDedup(
      CorpusPipeline.annotate(docs, "text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(exactOnly.contains(6L))
    // cleanup really happened
    val t1 = out(0).getAs[String]("clean_text")
    assert(!t1.contains("<p>") && !t1.contains("https://") && !t1.contains("  "))
    // split is the deterministic hash bucket (stable across runs)
    val again = CorpusPipeline.curate(
      docs, "doc_id", "text",
      CorpusPipeline.Config(minTokens = 5L, maxTopTokenBp = 5000L, nearDupMinBp = 8000L))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("split")).toSeq == again.map(_.getAs[String]("split")).toSeq)
  }

  test("keepBestInCluster keeps one survivor per cluster, chosen by score") {
    val cfg = CorpusPipeline.Config(
      minTokens = 5L, maxTopTokenBp = 5000L, nearDupMinBp = 8000L)
    val best = CorpusPipeline.curate(docs, "doc_id", "text",
      cfg.copy(keepBestInCluster = true))
      .select("doc_id").as[Long].collect().toSet
    val minId = CorpusPipeline.curate(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    // same number of survivors either way: one per duplicate cluster
    assert(best.size == minId.size)
    // the non-clustered doc survives in both modes
    assert(best.contains(3L) && minId.contains(3L))
    // the 1~6 near-cluster keeps exactly one member in both modes
    assert(best.intersect(Set(1L, 6L)).size == 1)
  }

  test("keepBestInCluster picks the higher-quality member on real data") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cfg = CorpusPipeline.Config(nearDupMinBp = 5000L)
    val best = CorpusPipeline.curate(real, "doc_id", "text",
      cfg.copy(keepBestInCluster = true)).select("doc_id").as[Long].collect().toSet
    val minId = CorpusPipeline.curate(real, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(best.size == minId.size)
    // where the modes disagree, the keep-best survivor must score >= the
    // min-id survivor it replaced (scores via the independently
    // oracle-checked quality_ensemble over the raw text of the SAME docs)
    val scores = graft.Queries.qualityEnsemble(spark, "/root/testdata/sf0.001")
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    val replaced = minId -- best
    val replacing = best -- minId
    assert(replaced.size == replacing.size)
    if (replaced.nonEmpty) {
      // aggregate check: total quality cannot go down under keep-best
      assert(replacing.toSeq.map(scores).sum >= replaced.toSeq.map(scores).sum)
    }
  }

  test("reliable-checkpoint mode (cluster-safe) matches localCheckpoint output") {
    val cfg = CorpusPipeline.Config(
      minTokens = 5L, maxTopTokenBp = 5000L, nearDupMinBp = 8000L,
      keepBestInCluster = true) // the branch that truncates lineage
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    try {
      val local = CorpusPipeline.curate(docs, "doc_id", "text", cfg)
        .orderBy("doc_id").collect().toSeq
      val reliable = CorpusPipeline.curate(docs, "doc_id", "text",
          cfg.copy(checkpointDir = Some(ckDir)))
        .orderBy("doc_id").collect().toSeq
      assert(local == reliable)
      // the reliable mode really wrote checkpoint data where it was told
      import scala.jdk.CollectionConverters._
      assert(java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .iterator().asScala.count(java.nio.file.Files.isRegularFile(_)) > 0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("purgeCheckpoints bounds checkpoint accumulation across curate batches") {
    val cfg = CorpusPipeline.Config(
      minTokens = 5L, maxTopTokenBp = 5000L, nearDupMinBp = 8000L,
      keepBestInCluster = true,
      checkpointDir = Some(
        java.nio.file.Files.createTempDirectory("graft-ck-janitor").toString))
    def rddDirs(): Seq[java.nio.file.Path] = {
      // the EFFECTIVE location: setCheckpointDir appends a UUID subdir,
      // and an earlier test (or suite) may already own the session's dir
      val eff = spark.sparkContext.getCheckpointDir.get
        .stripPrefix("file:")
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(eff))) Nil
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(eff))
          .iterator().asScala.toSeq
      }
    }
    def batch(): Unit =
      assert(CorpusPipeline.curate(docs, "doc_id", "text", cfg).count() == 2)
    batch()
    val afterOne = rddDirs().size
    assert(afterOne > 0, "reliable mode must have checkpointed the sliver")
    batch()
    assert(rddDirs().size > afterOne, "each batch adds rdd-N dirs without a janitor")
    // batches materialized -> the janitor may reclaim everything
    CorpusPipeline.purgeCheckpoints(spark)
    assert(rddDirs().isEmpty, "purge must empty the checkpoint location")
    // and the next batch still works, recreating the directory
    batch()
    assert(rddDirs().nonEmpty)
    CorpusPipeline.purgeCheckpoints(spark)
  }

  test("exact dedup keeps the smallest id of identical cleaned text") {
    val d = Seq((10L, "same words here"), (7L, "same words here"), (8L, "other words here"))
      .toDF("doc_id", "text")
    val out = CorpusPipeline.exactDedup(
      CorpusPipeline.annotate(d, "text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(7L, 8L))
  }

  test("span-dedup stage excises repeated spans and re-gates minTokens") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    val d = Seq(
      (1L, s"$span india juliett kilo lima mike november"), // owns the span
      (2L, s"oscar papa quebec romeo sierra tango $span"),  // span repeats -> excised
      (3L, s"$span victor"))                                // emptied below minTokens
      .toDF("doc_id", "text")
    val out = CorpusPipeline.curate(d, "doc_id", "text",
        CorpusPipeline.Config(spanDedupGrams = Some(4)))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // doc 2 keeps only its own prefix; doc 3 shrinks to 1 token and drops
    assert(out == Seq(
      (1L, s"$span india juliett kilo lima mike november", 14L),
      (2L, "oscar papa quebec romeo sierra tango", 6L)))
    // without the stage, all three survive intact
    val plain = CorpusPipeline.curate(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(plain == Seq(1L, 2L, 3L))
  }
  test("urlCol pre-stage collapses URL spellings before content work; bad URLs survive") {
    val long1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa entirely unique"
    val long2 = "one two three four five six seven eight nine ten eleven twelve distinct"
    val d = Seq(
      // same page, two raw spellings -> url dedup keeps doc 1 (min id)
      (1L, long1, "https://a.com/p/1?utm_source=f"),
      (2L, long2, "HTTPS://WWW.A.com:443/p/1/"),
      // un-parseable URLs: BOTH must survive url dedup (no URL evidence)
      (3L, long1 + " with a different tail entirely for this one", "not a url"),
      (4L, long2 + " and a different tail here too for this one", "also bad"),
      (5L, "completely other content lives here and it is long enough to pass", ""))
      .toDF("doc_id", "text", "url")
    val out = CorpusPipeline.curate(d, "doc_id", "text",
      CorpusPipeline.Config(urlCol = Some("url")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 2 dropped by the URL stage alone (its CONTENT is unique — content
    // dedup could never have removed it); 3, 4, 5 all survive
    assert(out == Seq(1L, 3L, 4L, 5L))
    // without the url stage, doc 2 survives: the drop really was URL-keyed
    val plain = CorpusPipeline.curate(d, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(plain == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
