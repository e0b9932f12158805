package graft.sketch

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties of the integer HLL over arbitrary value sets:
  * registers form an idempotent commutative max-monoid (merge of any
  * split = registers of the union), duplicates never move a register,
  * and every register stays within the 25-bit rank range. These are
  * exactly the properties the distributed partial-aggregate and the
  * streaming delta max-merge rely on. */
class HLLPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genValues: Gen[List[Long]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 1L << 40)))

  private def regs(vs: Seq[Long]): Map[Long, Long] =
    HLL.registers(
      vs.toDF("v").select(lit("g").as("g"), HLL.mix(col("v")).as("h")),
      Seq("g"), "h")
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("m")).toMap

  test("registers merge as a max-monoid and ranks stay in range") {
    val prop = Prop.forAll(genValues, genValues) { (a, b) =>
      val ra = regs(a)
      val rb = regs(b)
      val merged = (ra.keySet ++ rb.keySet).map(k =>
        k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
      regs(a ++ b) == merged &&
        regs(a ++ a) == ra && // idempotent under duplication
        ra.values.forall(m => m >= 1L && m <= HLL.MaxRho) &&
        ra.keys.forall(b0 => b0 >= 0L && b0 < HLL.Buckets)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
