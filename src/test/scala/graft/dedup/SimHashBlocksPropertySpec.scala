package graft.dedup

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property behind both simhash near-dup paths (16-bit and the
  * production 64-bit): for ANY fingerprint width and Hamming budget, two
  * fingerprints within the budget agree exactly on at least one of the
  * maxBits+1 blockBounds blocks (pigeonhole), so the per-block equi-join
  * union is a COMPLETE candidate set. Pure JVM — no Spark session. */
class SimHashBlocksPropertySpec extends AnyFunSuite {

  private val genCase: Gen[(Long, Int, Int, List[Int])] = for {
    bits <- Gen.choose(4, 64)
    maxBits <- Gen.choose(0, math.min(6, bits - 1))
    base <- Gen.long
    nFlips <- Gen.choose(0, maxBits)
    flips <- Gen.listOfN(nFlips, Gen.choose(0, bits - 1))
  } yield (base, bits, maxBits, flips)

  private def block(sig: Long, lo: Int, hi: Int): Long = {
    val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1
    (sig >>> lo) & mask
  }

  test("blockBounds is pigeonhole-complete for any (bits, maxBits)") {
    val prop = Prop.forAll(genCase) { case (base0, bits, maxBits, flips) =>
      // confine the fingerprint to the declared width
      val widthMask = if (bits == 64) -1L else (1L << bits) - 1
      val a = base0 & widthMask
      val b = flips.foldLeft(a)((s, i) => s ^ (1L << i))
      // distinct flip positions may collapse — Hamming is still <= maxBits
      assert(java.lang.Long.bitCount(a ^ b) <= maxBits)
      val bounds = SimHash.blockBounds(bits, maxBits)
      bounds.size == maxBits + 1 &&
        bounds.exists { case (lo, hi) => block(a, lo, hi) == block(b, lo, hi) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("exactly-once emission: each close pair has a unique FIRST equal block") {
    // the block join emits a pair only at its first matching block index; a
    // pair within the budget must have exactly one such index
    val prop = Prop.forAll(genCase) { case (base0, bits, maxBits, flips) =>
      val widthMask = if (bits == 64) -1L else (1L << bits) - 1
      val a = base0 & widthMask
      val b = flips.foldLeft(a)((s, i) => s ^ (1L << i))
      val bounds = SimHash.blockBounds(bits, maxBits)
      val firstMatches = bounds.zipWithIndex.filter { case ((lo, hi), i) =>
        block(a, lo, hi) == block(b, lo, hi) &&
          bounds.take(i).forall { case (l2, h2) => block(a, l2, h2) != block(b, l2, h2) }
      }
      firstMatches.size == 1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
