package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the count-min-sketch catalog entry, over
  * arbitrary corpora: the estimate never undercounts any token (CMS
  * soundness), the `sound` column is therefore always true, and every
  * token at or above the heaviness threshold is flagged (no false
  * negatives — overestimation can only add hitters). */
class HeavyHittersPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCorpus: Gen[List[List[String]]] = for {
    nd <- Gen.choose(1, 5)
    docs <- Gen.listOfN(nd, Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "be", "ga", "dddd", "epsilon", "zz", "et"))))
  } yield docs

  test("CMS estimates never undercount and heavy flags are complete") {
    val prop = Prop.forAll(genCorpus) { docs =>
      val dir = Files.createTempDirectory("graft-cms-prop").toString
      docs.zipWithIndex.map { case (tks, i) => (i.toLong, tks.mkString(" ")) }
        .toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")
      val rows = Queries.heavyHitters(spark, dir).collect()
      val exact = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val total = docs.map(_.size).sum.toLong
      rows.forall { r =>
        val tok = r.getAs[String]("token")
        val ex = r.getAs[Long]("exact_cnt")
        val est = r.getAs[Long]("est_cnt")
        ex == exact(tok) &&
          est >= ex && // CMS soundness
          r.getAs[Boolean]("sound") &&
          // completeness: a truly-heavy token is always flagged
          (ex * 10000 < total * 300 || r.getAs[Boolean]("heavy"))
      } && rows.length == exact.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
