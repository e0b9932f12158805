package graft.similarity

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** The sharded two-phase top-k must be RESULT-IDENTICAL to the single
  * per-query window it replaces — same rows, same ranks — for any scored
  * frame, any k, any shard count, under heavy score ties (the tie-break
  * on neighbor id is what makes the two plans agree row for row). The
  * point of the two-phase shape is purely physical: no task ever sorts a
  * corpus-scale candidate set for one query. */
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

  test("two-phase equals the single window for any frame, k, and shards") {
    val prop = Prop.forAll(genScored, Gen.choose(1, 5), Gen.oneOf(1, 2, 7, 32)) {
      (rows, k, shards) =>
        val scored = rows.toDF("query_id", "neighbor_id", "score")
        val naive = scored.withColumn("rank",
            row_number().over(Window.partitionBy(col("query_id"))
              .orderBy(col("score").desc, col("neighbor_id").asc))
              .cast(LongType))
          .filter(col("rank") <= k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val sharded = Similarity
          .topKPerQuery(scored, "score", k, shards = shards)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        sharded == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
