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

  private def plan(name: String): String =
    Queries.all(name)(spark, dir).queryExecution.executedPlan.toString

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
}
