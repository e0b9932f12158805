package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Warm steady-state benchmark: run each catalog query `reps` times in ONE
  * warm session and record the minimum and median, writing a committed
  * markdown table (BENCHMED.md).
  *
  * Rationale: the driver's single-pass Bench runs every query once in a
  * cold JVM, which is ±4x noisy for sub-second queries (codegen + JIT
  * dominate the first run) and has produced false "regressions" two rounds
  * running. The warm minimum is the number that actually tracks plan
  * changes; this table is refreshed each round so bench deltas can be read
  * against a committed steady-state baseline instead of re-litigated.
  *
  * Usage: runMain graft.BenchMed [out.md] [sfDir] [reps] [query...]
  * (defaults: BENCHMED.md, /root/testdata/sf0.1, 4 reps, the slowest /
  * previously-disputed queries).
  */
object BenchMed {

  /** The sweep list: every query whose single-pass time has exceeded ~0.7 s
    * in a recent round, plus every query a past round flagged as a possible
    * regression (time_bin_hourly, q5_region_join, tfidf_top_terms,
    * simhash_neardup, timestamp_sets, token_budget_mix). */
  val Default: Seq[String] = Seq(
    "corpus_curate", "jaccard_ppjoin", "ngram_jaccard_pairs",
    "containment_pairs", "ann_recall", "ivf_topk", "semantic_dedup",
    "tfidf_top_terms", "minhash_neardup", "neardup_by_source",
    "simhash_neardup", "simhash64_neardup", "timestamp_sets",
    "token_budget_mix", "time_bin_hourly", "q1_rollup", "q5_region_join",
    "q10_returned_top", "q17_small_qty", "q21_waiting_suppliers",
    "lsh_recall", "temperature_mix", "bigram_surprisal",
    "pq_topk", "pq_recall", "bq_topk", "bq_recall",
    "cluster_best", "bm25_topk", "cdc_chunks",
    "winnow_pairs", "winnow_capped", "dsir_weights", "winnow_robust",
    "corpus_curate_best", "ivfpq_topk", "ivfpq_recall", "blocklist_filter",
    "heavy_hitters", "hard_negatives", "dsir_resample", "pq_distortion",
    "doc_pagerank", "hll_distinct", "triangle_count", "bpe_merge_pairs",
    "label_spread", "user_ewma", "bpe_train_merges", "kn_bigram_bits",
    "knn_graph", "knn_graph_scaled", "knn_clusters", "ngram_novelty",
    "split_leakage", "kmv_bottomk", "vocab_growth",
    "neardup_cluster_sizes", "ivf_balance", "subset_docs",
    "span_dedup", "contamination_spans", "kcore_docs", "quality_logit",
    "quality_train", "quality_train_infer",
    "embedding_outliers", "quota_split", "ppl_buckets",
    "nfc_normalize", "domain_gate", "image_phash",
    "asof_forward", "asof_nearest", "interval_overlap", "corpus_curate_span",
    "pack_manifest", "dedup_report", "span_excise_ref",
    "sample_quantiles", "quantile_error", "audio_features", "url_canonicalize", "url_dedup", "url_domain_stats",
    "url_psl_domains", "bpe_encode", "token_pack_bpe", "token_budget_mix_bpe", "url_frontier_refresh", "repetition_signals", "pii_scrub")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCHMED.md")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val names = if (args.length > 3) args.drop(3).toSeq else Default
    require(reps >= 1, "reps must be >= 1")
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")

    val spark = Sessions.build("graft-bench-med")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes EVERY column (same rationale as BenchOne)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (name, times)
    }

    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def f(d: Double): String = f"$d%.2f"

    val sb = new StringBuilder
    val title = new java.io.File(out).getName.stripSuffix(".md")
    val explicit = if (args.length > 3) " " + names.mkString(" ") else ""
    sb ++= s"# $title — warm steady-state times\n\n"
    sb ++= s"`runMain graft.BenchMed $out $sfDir $reps$explicit` — $reps reps per query\n"
    sb ++= s"in one warm session on `$sfDir` (local[${Sessions.cpus}]). `min` is the\n"
    sb ++= "steady-state number to compare across rounds; the driver's single-pass\n"
    sb ++= "BENCH includes cold-JVM codegen/JIT and is ±4x noisy below ~1 s.\n\n"
    sb ++= "| query | min (s) | median (s) | reps (s) |\n|---|---|---|---|\n"
    rows.sortBy(-_._2.min).foreach { case (name, ts) =>
      sb ++= s"| $name | ${f(ts.min)} | ${f(median(ts))} | ${ts.map(f).mkString(", ")} |\n"
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${rows.size} queries)")
    spark.stop()
  }
}
