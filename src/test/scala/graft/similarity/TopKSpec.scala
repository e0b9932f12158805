package graft.similarity

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** Every physical shape of [[Similarity.topKPerQuery]] must be
  * RESULT-IDENTICAL to the single per-query rank window they replace —
  * same rows, same ranks, same payload values — for any scored frame,
  * any k, any shard count, under heavy score ties (the tie-break on
  * neighbor id is what makes the plans agree row for row). A bare
  * (query, id, long-score) frame takes the `graft_topk` bounded
  * aggregate; a frame carrying a payload column takes
  * `graft_topk_payload` (round 13 — payload frames no longer regress
  * to a corpus-mass sort); the sharded two-phase window survives only
  * behind the explicit `forceWindow` opt-in, property-covered here so
  * the A/B rehearsal baseline stays trustworthy. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private val genScored: Gen[List[(Long, Long, Long)]] = for {
    nq <- Gen.choose(1, 4)
    nc <- Gen.choose(0, 40)
    rows <- Gen.listOfN(nc, for {
      q <- Gen.choose(0L, nq.toLong - 1)
      n <- Gen.choose(0L, 30L)
      s <- Gen.choose(0L, 5L) // few distinct scores -> ties are the norm
    } yield (q, n, s))
  } yield rows.distinct // (query, neighbor) pairs are unique in real scans

  private def naiveTopK(rows: List[(Long, Long, Long)], k: Int) = {
    val scored = rows.toDF("query_id", "neighbor_id", "score")
    scored.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id").asc))
          .cast(LongType))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("aggregate path equals the single window for any frame and k") {
    val prop = Prop.forAll(genScored, Gen.choose(1, 5)) { (rows, k) =>
      val scored = rows.toDF("query_id", "neighbor_id", "score")
      val got = Similarity.topKPerQuery(scored, "score", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == naiveTopK(rows, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("payload path (graft_topk_payload) equals the single window for any frame and k") {
    val prop = Prop.forAll(genScored, Gen.choose(1, 5)) { (rows, k) =>
      val scored = rows.toDF("query_id", "neighbor_id", "score")
        .withColumn("payload", col("neighbor_id") * 3)
      val plan = Similarity.topKPerQuery(scored, "score", k)
      val out = plan.collect()
      val got = out
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
        .toSet
      // ranked rows AND payload integrity: each kept pair must carry ITS
      // payload value through the heap/serde, not a neighbor's
      got == naiveTopK(rows, k) &&
        out.forall(r => r.getLong(3) == r.getLong(1) * 3) &&
        // an empty frame optimizes to an empty relation, so only assert
        // the physical shape when rows survive to plan: the payload
        // aggregate, never a rank window
        (rows.isEmpty || {
          val p = plan.queryExecution.executedPlan.toString
          p.contains("graft_topk_payload") && !p.contains("Window")
        })
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("forced window path equals the single window for any frame, k, shards") {
    val prop = Prop.forAll(genScored, Gen.choose(1, 5), Gen.oneOf(1, 2, 7, 32)) {
      (rows, k, shards) =>
        val scored = rows.toDF("query_id", "neighbor_id", "score")
          .withColumn("payload", col("neighbor_id") * 3)
        val plan = Similarity.topKPerQuery(scored, "score", k, shards = shards,
          forceWindow = true)
        val got = plan
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
          .toSet
        // an empty frame optimizes to an empty relation (no Window node),
        // so only assert the physical shape when rows survive to plan
        got == naiveTopK(rows, k) &&
          (rows.isEmpty ||
            plan.queryExecution.executedPlan.toString.contains("Window"))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
