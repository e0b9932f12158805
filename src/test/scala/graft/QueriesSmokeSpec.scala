package graft

/** Every catalog query runs end-to-end on the sf0.001 testdata and returns a
  * well-formed result; every query has an oracle twin.
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Queries deliberately WITHOUT an oracle twin. Empty since sketch_events
    * gained its bounded-error twin (exact aggregates + in-tolerance flags);
    * keep it that way — hash-checked exact twins are the default. */
  private val rowsOnly = Set.empty[String]

  test("every query has a DuckDB oracle (minus the declared rows-only set)") {
    assert(Queries.all.keySet -- rowsOnly == Oracles.all.keySet)
    assert(rowsOnly.subsetOf(Queries.all.keySet))
  }

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
