package graft.dedup

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.text.Hashing.{ShingleM, ShingleS1, ShingleS2, WordBase}

/** ScalaCheck properties for winnowing on random corpora over a small
  * vocabulary (repeated shingles are the norm): the distributed plan must
  * reproduce a straight-line sequential reference exactly — both the
  * fingerprint selection (window minima, leftmost tie) and the df-capped
  * pair join. This is the general form of WinnowSpec's constructed cases:
  * for ANY corpus, the capped pair set IS the pair set computed over
  * under-cap fingerprints alone.
  */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 5)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 14)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield toks.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** The engine's 3-word shingle hashes, sequentially. */
  private def shingles(text: String): Vector[Long] = {
    val codes = text.split(" ", -1).toVector
      .map(w => w.length.toLong * WordBase + w.head.toLong)
    if (codes.length < 3) Vector.empty
    else codes.sliding(3)
      .map(c => (c(0) * ShingleS1 + c(1) * ShingleS2 + c(2)) % ShingleM)
      .toVector
  }

  /** Sequential [[Winnow.fingerprints]]: per window of w shingles (clamped
    * at the array end like Spark's `slice`), the minimum hash at its
    * LEFTMOST in-window position; (pos, fp) de-duplicated. */
  private def refFingerprints(text: String, w: Int): Set[(Long, Long)] = {
    val sh = shingles(text)
    if (sh.isEmpty) Set.empty
    else (0 to math.max(sh.length - w, 0)).map { j =>
      val wd = sh.slice(j, j + w)
      val m = wd.min
      ((j + wd.indexOf(m) + 1).toLong, m)
    }.toSet
  }

  /** Sequential [[Winnow.pairs]] with the df cap. */
  private def refPairs(
      docs: Seq[(Long, String)],
      w: Int,
      minShared: Long,
      maxDf: Long): Map[(Long, Long), Long] = {
    val docFps = docs.flatMap { case (id, t) =>
      refFingerprints(t, w).map(_._2).map(fp => (id, fp))
    }.distinct
    val df = docFps.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val kept = docFps.filter { case (_, fp) => df(fp) <= maxDf }
    kept.groupBy(_._2).values.toSeq.flatMap { occ =>
      val ids = occ.map(_._1).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minShared).toMap
  }

  test("distributed fingerprints match the sequential reference") {
    val prop = Prop.forAll(genCorpus, Gen.choose(2, 4)) { (docs, w) =>
      val got = Winnow.fingerprints(docs.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = docs.map { case (id, t) => id -> refFingerprints(t, w) }
        .filter(_._2.nonEmpty).toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("capped pair join matches the sequential reference for any cap") {
    val prop = Prop.forAll(genCorpus, Gen.choose(2, 4), Gen.choose(1L, 2L),
      Gen.choose(1L, 4L)) { (docs, w, minShared, cap) =>
      val got = Winnow.pairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          w, minShared, cap)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      got == refPairs(docs, w, minShared, cap)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
