package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Urls

/** Persisted URL-frontier index: cross-RUN crawl dedup by canonical URL
  * key — the URL-level sibling of [[Incremental.Index]] (content-level)
  * and the batch companion of
  * [[graft.streaming.Streaming.urlDedupStream]], which only dedups
  * within its watermark horizon. The frontier is the set of canonical
  * keys ([[Urls.dedupKey]]) a crawl has already fetched; a refresh
  * anti-joins each new batch against it so an already-fetched page is
  * never re-admitted, and the reference corpus is NEVER re-read — the
  * index is a parquet projection built once per generation.
  *
  * Scale shape: the index is one row per distinct canonical key (a
  * keep-min hash aggregate, window-free, map-side combined); a refresh
  * is one anti-join on the key hash plus the same in-batch collapse the
  * inline [[graft.pipelines.CorpusPipeline.urlDedup]] runs. Nothing
  * touches page content; docs whose URL fails to parse carry a null key
  * through the anti-join (null never matches, so they all survive) and
  * collapse as singletons under the shared [[Urls.fallbackKey]]
  * sentinel.
  */
object UrlFrontier {

  /** One row per canonical key in `docs`: (__uk, idCol of the claiming
    * doc — keep-min). Un-parseable URLs contribute no key. */
  def buildIndex(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(Urls.dedupKey(col(urlCol)).as("__uk"), col(idCol))
      .filter(col("__uk").isNotNull)
      .groupBy(col("__uk")).agg(min(col(idCol)).as(idCol))

  /** Persist a frontier as one parquet table. A production deployment
    * could bucket by __uk so every refresh's anti-join is shuffle-free
    * on the frontier side. */
  def saveIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Reload a persisted frontier — a pure parquet scan, no URL parsing,
    * no reference corpus. */
  def loadIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Rows of `newDocs` whose canonical key is absent from the frontier,
    * with within-batch duplicates collapsed keep-min (so the output is
    * itself frontier-consistent and can be unioned into the next
    * generation). Null-key docs (un-parseable URLs) all survive — no URL
    * evidence is not duplicate evidence, the same contract as the inline
    * URL dedup.
    *
    * Join strategy is left to AQE on purpose: at test scale the frontier
    * broadcasts; at crawl scale (10^10 keys, too big for any build side)
    * the anti-join degrades to a parallel sort-merge on the key HASH —
    * uniformly distributed, so no reducer ever holds a stratum, unlike
    * the data-keyed windows the skew sweep removed. Forcing shuffle-hash
    * here would instead pin a frontier-sized build map per task. */
  def refresh(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String,
      urlCol: String): DataFrame = {
    val keyed = newDocs.withColumn("__uk", Urls.dedupKey(col(urlCol)))
    val fresh = keyed.join(index.select(col("__uk")), Seq("__uk"), "left_anti")
    val keep = fresh
      .select(col(idCol),
        coalesce(col("__uk"), Urls.fallbackKey(col(idCol))).as("__k"))
      .groupBy(col("__k")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    fresh.join(keep, Seq(idCol)).drop("__uk")
  }

  /** The next frontier generation: the old index plus the keys of an
    * admitted batch. The OLD claimant wins on any key present in both
    * (the anti-join guard — a frontier records who fetched a page FIRST,
    * and re-admitting must never rewrite history), so merging is safe
    * for arbitrary batches, not just [[refresh]] survivors. */
  def mergedIndex(
      index: DataFrame,
      admitted: DataFrame,
      idCol: String,
      urlCol: String): DataFrame =
    index.union(
      buildIndex(admitted, idCol, urlCol)
        .join(index.select(col("__uk")), Seq("__uk"), "left_anti")
        .select(col("__uk"), col(idCol)))
}
