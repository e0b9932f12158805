package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer HLL: rank edge cases, the elementwise-max merge property (what
  * the distributed partial-aggregate relies on), partitioning
  * independence, and measured accuracy on fixed value sets driven through
  * the real mix -> registers -> estimate pipeline. */
class HLLSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Hashing.P

  private def hashed(values: Seq[Long]): DataFrame =
    values.toDF("v").select(lit("g").as("g"), HLL.mix(col("v")).as("h"))

  private def est(df: DataFrame): (Long, Long) = {
    val r = HLL.estimate(HLL.registers(df, Seq("g"), "h"), Seq("g")).collect()
    assert(r.length === 1)
    (r(0).getAs[Long]("hll_est"), r(0).getAs[Long]("v_zero"))
  }

  test("rho is the 25-bit leading-zero rank at the edges") {
    val got = Seq(0L, 63L, 64L, 127L, 128L, 1L << 30, P - 1)
      .toDF("h").select(col("h"), HLL.rho(col("h")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 26L && got(63L) === 26L) // payload w = 0
    assert(got(64L) === 25L && got(127L) === 25L) // w = 1
    assert(got(128L) === 24L) // w = 2
    assert(got(1L << 30) === 1L) // w = 2^24: no leading zeros
    assert(got(P - 1) === 1L) // max hash stays in range
  }

  test("mix stays in [0, P) and is collision-free on a sequential range") {
    val hs = hashed(1L to 4096L).select("h").collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < P))
    assert(hs.distinct.length === hs.length)
  }

  test("registers of a union == elementwise max of the parts' registers") {
    def regs(vs: Seq[Long]): Map[Long, Long] =
      HLL.registers(hashed(vs), Seq("g"), "h")
        .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("m")).toMap
    val ra = regs(1L to 500L)
    val rb = regs(300L to 900L)
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
    assert(regs((1L to 500L) ++ (300L to 900L)) === merged)
  }

  test("estimate is independent of input partitioning and duplication") {
    val vs = (1L to 2000L)
    val once = est(hashed(vs))
    assert(est(hashed(vs ++ vs.reverse)) === once) // duplicates never move a register
    assert(est(hashed(vs).repartition(13)) === once)
  }

  test("estimate lands within 25% of the true count at n = 5000 (sigma ~13%)") {
    val (e, vZero) = est(hashed(1L to 5000L))
    assert(vZero === 0L)
    assert(math.abs(e - 5000L) <= 1250L, s"estimate $e too far from 5000")
  }

  test("a singleton group keeps 63 empty registers") {
    val (e, vZero) = est(hashed(Seq(42L)))
    assert(vZero === 63L)
    assert(e > 0L && e < 64L) // raw estimate sits in linear-counting range
  }
}
