package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted URL frontier: refresh semantics (seen keys drop, unseen
  * keep-min, bad URLs survive), the parquet round-trip refreshing
  * identically to the inline index, and generation merging. */
class UrlFrontierSpec extends SparkSpec {
  import spark.implicits._

  // generation 1 (already crawled): page 1 under two spellings + a bad URL
  private lazy val gen1 = Seq(
    (1L, "https://a.com/p/1?utm_source=f"),
    (2L, "HTTPS://WWW.A.com:443/p/1/"),
    (3L, "not a url"))
    .toDF("doc_id", "url")

  // new batch: page 1 again (two more spellings), page 2 twice, bad URLs
  private lazy val batch = Seq(
    (10L, "https://a.com/p/1#frag"),
    (11L, "https://www.a.com/p/1"),
    (12L, "https://a.com/p/2"),
    (13L, "https://a.com/p/2?utm_medium=m"),
    (14L, "still not a url"),
    (15L, "also bad"))
    .toDF("doc_id", "url")

  test("refresh: seen keys drop, unseen collapse keep-min, bad URLs all survive") {
    val idx = UrlFrontier.buildIndex(gen1, "doc_id", "url")
    // the index itself: one key for page 1 (claimed by doc 1), none for the bad URL
    val rows = idx.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("https://a.com/p/1", 1L)))
    val out = UrlFrontier.refresh(batch, idx, "doc_id", "url")
      .select("doc_id").as[Long].collect().toSet
    // both page-1 refetches drop; page 2 admitted once (min id); bad URLs survive
    assert(out == Set(12L, 14L, 15L))
  }

  test("parquet round-trip: load(save(index)) refreshes identically to inline") {
    val dir = Files.createTempDirectory("graft-url-frontier").toString
    val idx = UrlFrontier.buildIndex(gen1, "doc_id", "url")
    UrlFrontier.saveIndex(idx, s"$dir/frontier")
    val loaded = UrlFrontier.loadIndex(spark, s"$dir/frontier")
    def rows(i: org.apache.spark.sql.DataFrame) =
      UrlFrontier.refresh(batch, i, "doc_id", "url")
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(rows(loaded) == rows(idx))
    // and the loaded plan is parquet-only: no URL parsing on the reference side
    val scan = loaded.queryExecution.executedPlan.toString
    assert(scan.contains("FileScan parquet") && !scan.contains("parse_url"))
  }

  test("mergedIndex: old claimant wins; refreshing an admitted batch drops everything") {
    val idx = UrlFrontier.buildIndex(gen1, "doc_id", "url")
    val admitted = UrlFrontier.refresh(batch, idx, "doc_id", "url")
    val gen2 = UrlFrontier.mergedIndex(idx, admitted, "doc_id", "url")
    val rows = gen2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // page 1 still claimed by generation-1's doc 1; page 2 by the admitted doc 12
    assert(rows == Map("https://a.com/p/1" -> 1L, "https://a.com/p/2" -> 12L))
    // idempotence: the same batch against the merged frontier admits only
    // the null-key docs (no URL evidence is never duplicate evidence)
    val again = UrlFrontier.refresh(batch, gen2, "doc_id", "url")
      .select("doc_id").as[Long].collect().toSet
    assert(again == Set(14L, 15L))
    // old claimant survives even if the batch re-offers the key under a
    // smaller id: merging must never rewrite history
    val usurper = Seq((0L, "https://a.com/p/1")).toDF("doc_id", "url")
    val gen3 = UrlFrontier.mergedIndex(gen2, usurper, "doc_id", "url")
    assert(gen3.filter(col("__uk") === "https://a.com/p/1")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
