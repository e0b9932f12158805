package graft.text

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for position-level span dedup on random corpora
  * over a 3-letter alphabet (small enough that repeated grams are the
  * norm, not the exception): the distributed plan must reproduce a
  * straight-line sequential reference exactly — partitioning, join
  * order, and the gram window may not leak into the result — and the
  * hashed-gram production path must agree with the exact-text path. */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 6)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Sequential reference: canonical gram occurrence = first by (doc id,
    * pos); every other occurrence covers its k positions; covered
    * positions are removed. */
  private def reference(
      docs: Seq[(Long, String)],
      k: Int,
      maxOcc: Long = Long.MaxValue): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val occ = for {
      (id, tk) <- toks
      p <- 0 to tk.length - k
    } yield (tk.slice(p, p + k).mkString(" "), id, p)
    val byGram = occ.groupBy(_._1)
    val canon = byGram.view.mapValues(_.minBy(o => (o._2, o._3))).toMap
    val covered = occ.filter(o => byGram(o._1).size > maxOcc || canon(o._1) != o)
      .flatMap(o => (o._3 until o._3 + k).map(i => (o._2, i))).toSet
    toks.map { case (id, tk) =>
      val kept = tk.zipWithIndex.filterNot { case (_, i) => covered((id, i)) }
      id -> (tk.length.toLong, (tk.length - kept.length).toLong,
        kept.map(_._1).mkString(" "))
    }.toMap
  }

  private def run(
      docs: Seq[(Long, String)],
      k: Int,
      hashed: Boolean,
      maxOcc: Long = Long.MaxValue) =
    SpanDedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        gramTokens = k, hashGrams = hashed, maxGramDf = maxOcc)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap

  test("distributed span dedup matches the sequential reference") {
    val prop = Prop.forAll(genCorpus, Gen.choose(2, 3)) { (docs, k) =>
      run(docs, k, hashed = false) == reference(docs, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("hashed-gram path agrees with the exact-text path") {
    val prop = Prop.forAll(genCorpus, Gen.choose(2, 3)) { (docs, k) =>
      run(docs, k, hashed = true) == run(docs, k, hashed = false)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("boilerplate cap matches the sequential reference (all occurrences excised above the cap)") {
    val prop = Prop.forAll(genCorpus, Gen.choose(2, 3), Gen.choose(1L, 3L)) {
      (docs, k, cap) =>
        run(docs, k, hashed = false, maxOcc = cap) == reference(docs, k, cap)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
