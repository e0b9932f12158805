package graft

/** Plan-shape regression net: PLANS.md records the headline physical
  * plans for review-time diffing, but a lost pushdown or a broadcast
  * turned shuffle should fail CI, not wait for a human to read a diff.
  * Each assertion here pins ONE load-bearing marker the scale story
  * depends on; the matching rationale lives in PLANS.md / SCALE.md.
  *
  * Markers are asserted on the pre-execution physical plan (the same
  * thing PLANS.md prints) — loose substring checks on node names, not
  * full plan text, so cosmetic Spark-version churn does not break them.
  */
class PlanMarkersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The engine's session config (Sessions.build), not the bare test
    * session: the markers pin PRODUCTION plans, and one of them
    * (exchange reuse under ShardedPrefix) only holds with the engine's
    * documented `excludedRules` — InferFiltersFromConstraints inserts
    * derived filters into one join branch, making the two exchange
    * subtrees unequal and silently killing the reuse. */
  private lazy val engineSpark = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromConstraints," +
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    s
  }

  private def plan(name: String): String =
    Queries.all(name)(engineSpark, dir).queryExecution.executedPlan.toString

  test("q6_forecast: selective predicates reach the parquet scan") {
    val p = plan("q6_forecast")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "the shipdate/discount/quantity predicates must be pushed to the scan")
  }

  test("q5_region_join: tiny dimensions join as broadcasts, never sort-merge") {
    val p = plan("q5_region_join")
    assert(p.contains("BroadcastHashJoin"), "nation/region must broadcast")
  }

  test("q1_pricing_summary: partial+final aggregate pair around one exchange") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side combine must shrink the exchange to O(groups)")
  }

  test("q3_top_orders: global top-k runs as TakeOrderedAndProject, not a full sort") {
    assert(plan("q3_top_orders").contains("TakeOrderedAndProject"))
  }

  test("url_canonicalize: a pure projection — no hash exchange anywhere") {
    val p = plan("url_canonicalize")
    assert(!p.contains("hashpartitioning"),
      "canonicalization must stay inside the scan's codegen span " +
        "(the only exchange is the final presentation orderBy)")
  }

  test("url_dedup: one map-side-combined aggregation on the canonical key") {
    val p = plan("url_dedup")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the 4 spellings per page must collapse in the partial aggregate")
    assert(!p.contains("Window"), "no window: keep-min is an aggregate")
  }

  test("sample_quantiles: rank pushdown caps the sharded bottom-k sorts") {
    assert(plan("sample_quantiles").contains("WindowGroupLimit"),
      "row_number <= k must prune during the sort, not after it")
  }

  test("decontaminate: the eval-suite side builds a broadcast") {
    assert(plan("decontaminate").contains("BroadcastHashJoin") ||
      plan("decontaminate").contains("BroadcastNestedLoopJoin") ||
      plan("decontaminate").contains("BroadcastExchange"),
      "the benchmark n-gram set must ship as a broadcast build side")
  }

  // ---- the round-9 window-skew sweep, pinned as CI invariants ----

  /** Every window in the plan must be sharded: a windowspecdefinition
    * partitioned only by a data-sized key ships a whole stratum to one
    * reducer at corpus scale. ShardedPrefix's windows all carry the
    * __shard column in their partition spec. */
  private def assertShardedWindows(name: String): Unit = {
    val lines = plan(name).split("\n").filter(_.contains("windowspecdefinition"))
    assert(lines.nonEmpty, s"$name is expected to use (sharded) windows")
    lines.foreach(l => assert(l.contains("__shard"),
      s"$name has a window not partitioned by __shard: $l"))
  }

  test("token_budget_mix: every window is range-sharded, never whole-source") {
    assertShardedWindows("token_budget_mix")
  }

  test("dsir_resample: doc-level windows sharded; only the weight histogram is global") {
    val lines = plan("dsir_resample").split("\n").filter(_.contains("windowspecdefinition"))
    assert(lines.exists(_.contains("__shard")),
      "the crossing-bucket admission must ride ShardedPrefix")
    lines.filterNot(_.contains("__shard")).foreach(l => assert(l.contains("wgt"),
      s"only the distinct-weight histogram window (metadata-sized input) " +
        s"may be unsharded, found: $l"))
  }

  test("token_budget_mix: the prefix-sum offsets REUSE the data exchange at runtime") {
    val df = Queries.all("token_budget_mix")(engineSpark, dir)
    df.collect() // AQE materializes exchange reuse only during execution
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "the (group, shard) totals side must reuse the main exchange — a " +
        "re-run subtree would charge the scored input pipeline twice")
  }

  test("chunk_dedup: keep-first is a map-side-combinable aggregate, not a window") {
    assert(!plan("chunk_dedup").contains("Window"),
      "a keep-first window over the chunk-hash key would single-thread " +
        "every mega-duplicate chunk group")
  }

  test("label_spread: the majority vote is a min_by aggregate, not a rank window") {
    assert(!plan("label_spread").contains("Window"),
      "a rank window per node would single-thread high-degree nodes")
  }

  test("span_dedup: the keep-first join-back is shuffle-hash, never sort-merge") {
    val p = plan("span_dedup")
    assert(p.contains("ShuffledHashJoin"), "join-back must be shuffle-hash")
    assert(!p.contains("SortMergeJoin"),
      "sort-merge would sort the full gram-occurrence table")
  }
}
