package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the dedup operators (SURVEY §5): keep-last
  * must agree with the obvious sequential reference on arbitrary inputs,
  * and whole-row distinct must be idempotent. Spark jobs per case, so the
  * case count is modest — the point is arbitrary shapes (dup-free, all-dup,
  * singleton groups), not volume. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(Int, Int)]] =
    Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 2))))

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("keepLast matches the sequential keep-last-per-key reference") {
    check("keepLast", Prop.forAll(genRows) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "ord")
      val got = Dedup.keepLast(df, Seq("k"), "ord")
        .orderBy("ord").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val lastPerKey = rows.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.map(_._2).max).toMap
      val expected = rows.zipWithIndex
        .filter { case ((k, _), i) => lastPerKey(k) == i }
        .map(_._1)
      got == expected
    })
  }

  test("keepFirstDistinct is idempotent and preserves first-occurrence order") {
    check("keepFirst", Prop.forAll(genRows) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "v", "ord")
      val once = Dedup.keepFirstDistinct(df, "ord")
        .orderBy("ord").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      val expected = rows.distinct // scala distinct keeps first occurrence
      once == expected
    })
  }
}
