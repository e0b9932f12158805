package graft.text

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: dedupChunks equals the obvious sequential reference
  * (walk docs in id order, keep each chunk string's first occurrence) for
  * arbitrary corpora and chunk widths. */
class ChunkDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCorpus: Gen[(List[List[String]], Int)] = for {
    nd <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nd,
      Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c"))))
    w <- Gen.choose(1, 4)
  } yield (docs, w)

  test("dedupChunks == sequential keep-first reference") {
    val prop = Prop.forAll(genCorpus) { case (docs, w) =>
      val df = docs.zipWithIndex.map { case (tks, i) => (i.toLong, tks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = ChunkDedup.dedupChunks(df, "doc_id", "text", w)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.zipWithIndex.map { case (tks, i) =>
        val chunks = tks.grouped(w).map(_.mkString(" ")).toList
        val kept = chunks.filter(c => seen.add(c))
        i.toLong -> ((chunks.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
