package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partitioning-invariance audit: the catalog's docs repeatedly claim
  * "deterministic on any partitioning" — this spec tests the claim
  * directly instead of leaving it to the (fixed-layout) oracle gate.
  *
  * The sf0.001 tables are rewritten with a hash-scrambled row order and
  * a different file count, and every partition-SENSITIVE entry — dedup
  * keep-first/last, top-k and rank windows, hash sampling/splits,
  * sketches, LSH/ANN chains, span/chunk excision — must produce the
  * byte-identical row multiset it produces on the driver's layout. A
  * query that breaks here would pass the correctness gate on the
  * driver's machine and still return different answers on a
  * 1000-executor cluster, which is exactly the failure mode worth a
  * permanent regression net.
  */
class CatalogDeterminismSpec extends SparkSpec {

  private val origDir = "/root/testdata/sf0.001"

  /** Entries whose result depends on tie-breaking, ranking, sampling, or
    * accumulation order if anything is left to partition luck. */
  private val sensitive: Seq[String] = Seq(
    "dedup_keeplast", "dedup_keepfirst", "dedup_exact", "dedup_keeplast_salted",
    "dedup_ignorefields", "limit_per_group", "q3_top_orders", "q10_returned_top",
    "running_revenue", "median_order_cents", "nation_quartiles", "user_ewma",
    "sessionize", "intervals_islands", "minhash_neardup", "simhash64_neardup",
    "jaccard_ppjoin", "containment_ppjoin", "winnow_capped", "chunk_dedup",
    "cdc_chunks", "span_dedup", "span_dedup_hashed", "span_dedup_capped",
    "semantic_dedup", "incremental_dedup", "decontaminate", "neardup_components",
    "cluster_best", "ivf_topk", "pq_topk", "ivfpq_topk", "bq_topk", "knn_clusters",
    "bm25_topk", "hll_distinct", "heavy_hitters", "kmv_bottomk",
    "sample_quantiles", "quantile_error", "url_dedup", "url_frontier_refresh", "stable_split", "quota_split",
    "shuffle_shards", "domain_mix", "token_budget_mix", "temperature_mix",
    "dsir_resample", "epoch_upsample", "token_pack", "bpe_train_merges",
    "bpe_encode", "token_pack_bpe", "token_budget_mix_bpe", "repetition_signals",
    "unigram_lm_train", "unigram_encode",
    "tfidf_top_terms", "corpus_curate", "quality_train", "quality_train_infer")

  private lazy val scrambledDir: String = {
    val dir = Files.createTempDirectory("graft-determinism").toString
    Tables.names.foreach { t =>
      val df = Tables.load(spark, origDir, t)
      val scrambled = df
        .repartition(7, xxhash64(col(df.columns.head) +: df.columns.tail.map(col): _*))
        .sortWithinPartitions(xxhash64(lit(t), col(df.columns.head)))
      scrambled.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def canon(name: String, dir: String): Seq[String] =
    Queries.all(name)(spark, dir)
      .collect()
      .map(_.toString)
      .sorted
      .toSeq

  sensitive.foreach { name =>
    test(s"$name is invariant under input repartitioning and row order") {
      assert(canon(name, scrambledDir) == canon(name, origDir))
    }
  }
}
