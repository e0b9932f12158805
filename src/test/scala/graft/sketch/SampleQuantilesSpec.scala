package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bottom-k sample quantiles: exactness on small groups, partitioning
  * invariance, the mergeability law the sketch's distributed story rests
  * on, and order-statistic correctness of the quantile positions.
  */
class SampleQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Long, Long)]) =
    rows.toDF("g", "id", "v")

  test("group at or below k: quantiles are the exact floor-rank order statistics") {
    // 5 values -> positions p10:1 p25:2 p50:3 p75:4 p90:4 of sorted (10,20,30,40,50)
    val rows = Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 50L),
      ("a", 4L, 20L), ("a", 5L, 40L))
    val out = SampleQuantiles.perGroup(df(rows), Seq("g"), "v", "id", k = 64)
      .collect().head
    assert(out.getAs[Long]("n_rows") == 5L && out.getAs[Long]("n_sample") == 5L)
    assert(out.getAs[Long]("p10") == 10L)
    assert(out.getAs[Long]("p25") == 20L)
    assert(out.getAs[Long]("p50") == 30L)
    assert(out.getAs[Long]("p75") == 40L)
    assert(out.getAs[Long]("p90") == 40L)
  }

  test("deterministic under repartitioning and row order") {
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i, (i * 7919L) % 1000L))
    val a = SampleQuantiles.perGroup(df(rows), Seq("g"), "v", "id")
      .orderBy("g").collect().toSeq
    val b = SampleQuantiles.perGroup(
        df(scala.util.Random.shuffle(rows)).repartition(7), Seq("g"), "v", "id")
      .orderBy("g").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("sample is the true bottom-k by mixed hash (contained in any split's union)") {
    val rows = (1L to 300L).map(i => ("g", i, i))
    val whole = SampleQuantiles.bottomK(df(rows), Seq("g"), "id", k = 16)
      .select("id").as[Long].collect().toSet
    // mergeability: bottom-k of the union == bottom-k of (bottom-k(A) U bottom-k(B))
    val (l, r) = rows.partition(_._2 % 2 == 0)
    val partial = SampleQuantiles.bottomK(df(l), Seq("g"), "id", k = 16)
      .unionByName(SampleQuantiles.bottomK(df(r), Seq("g"), "id", k = 16))
      .drop("h")
    val merged = SampleQuantiles.bottomK(partial, Seq("g"), "id", k = 16)
      .select("id").as[Long].collect().toSet
    assert(merged == whole)
  }

  test("quantiles of a big group are the order statistics of its bottom-k sample") {
    val prop = Prop.forAll(Gen.choose(80, 400), Gen.choose(1L, 1000L)) {
      (n: Int, mult: Long) =>
        val rows = (1L to n.toLong).map(i => ("g", i, (i * mult) % 997L))
        val out = SampleQuantiles.perGroup(df(rows), Seq("g"), "v", "id", k = 64)
          .collect().head
        // replicate: bottom-64 by mix(id), then floor-rank order statistics
        val sampleIds = SampleQuantiles.bottomK(df(rows), Seq("g"), "id", k = 64)
          .select("id").as[Long].collect().toSet
        val vals = rows.filter(r => sampleIds(r._2)).map(r => (r._3, r._2)).sorted.map(_._1)
        def pos(q: Int) = (64 - 1) * q / 100 // 0-based floor rank
        out.getAs[Long]("n_rows") == n.toLong &&
          out.getAs[Long]("n_sample") == 64L &&
          out.getAs[Long]("p10") == vals(pos(10)) &&
          out.getAs[Long]("p50") == vals(pos(50)) &&
          out.getAs[Long]("p90") == vals(pos(90))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
