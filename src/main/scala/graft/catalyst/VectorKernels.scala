package graft.catalyst

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

import graft.text.Hashing

/** Single-pass vector kernels backing the native similarity expressions.
  *
  * Same contract as [[TextHashKernels]]: EXACTLY the integer math of the
  * `org.apache.spark.sql.functions` compositions in graft.similarity
  * (quantize = round(x*QuantScale) with Spark's BigDecimal HALF_UP
  * semantics; dot = sum of elementwise products; SRP bucket = sign bits
  * against Hashing.SrpMatrix), one tight JVM loop per row instead of
  * interpreted higher-order lambdas.
  *
  * Assumes a fixed-dimension corpus with no null elements (what any sane
  * embedding store guarantees). On malformed inputs the paths diverge by
  * design: the HOF forms (zip_with null-pads ragged arrays, null elements
  * poison the aggregate) yield NULL, while the kernels treat arrays as
  * primitive and truncate a ragged pair to the shorter length — validate
  * dimensions upstream if the corpus cannot be trusted.
  */
object VectorKernels {

  /** round(x * QuantScale) per element — BigDecimal HALF_UP to match
    * Spark's `round` on doubles bit-for-bit, then truncating cast. */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = java.math.BigDecimal
        .valueOf(v.getDouble(i) * Hashing.QuantScale)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue()
        .toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Exact integer dot product of two quantized vectors. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Elementwise difference of two quantized vectors — the residual step
    * of the IVF-PQ composition (vector minus its list centroid). */
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = a.getLong(i) - b.getLong(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** PQ nearest-codeword codes for every subspace in one pass.
    *
    * `books` is the flattened codebook [sub][code][dim] (m * ksub * subDim
    * longs, a literal — KBs); the vector's subspace `mi` is its contiguous
    * slice [mi*subDim, (mi+1)*subDim). Nearest = argmin ||x - c||^2 =
    * argmax(2<x,c> - <c,c>) over exact integers, ties to the LOWER code
    * (strict-greater update), matching the SQL oracle's
    * ORDER BY score DESC, code ASC. */
  def pqEncode(v: ArrayData, books: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dim = v.numElements()
    val subDim = dim / m
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val vBase = mi * subDim
      var best = -1L
      var bestScore = Long.MinValue
      var c = 0
      while (c < ksub) {
        val cBase = (mi * ksub + c) * subDim
        var dotAcc = 0L
        var normAcc = 0L
        var d = 0
        while (d < subDim) {
          val w = books.getLong(cBase + d)
          dotAcc += v.getLong(vBase + d) * w
          normAcc += w * w
          d += 1
        }
        val s = 2 * dotAcc - normAcc
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      out(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-query ADC lookup table: flat [sub][code] array of exact integer
    * dots of the query's subvectors against every codeword. */
  def pqLut(q: ArrayData, books: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dim = q.numElements()
    val subDim = dim / m
    val out = new Array[Long](m * ksub)
    var mi = 0
    while (mi < m) {
      val qBase = mi * subDim
      var c = 0
      while (c < ksub) {
        val cBase = (mi * ksub + c) * subDim
        var acc = 0L
        var d = 0
        while (d < subDim) {
          acc += q.getLong(qBase + d) * books.getLong(cBase + d)
          d += 1
        }
        out(mi * ksub + c) = acc
        c += 1
      }
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC score: sum over subspaces of lut[sub][codes[sub]] — the
    * approximate query-vector dot, m lookups per corpus row. */
  def pqAdc(codes: ArrayData, lut: ArrayData, ksub: Int): Long = {
    val m = codes.numElements()
    var acc = 0L
    var mi = 0
    while (mi < m) {
      acc += lut.getLong(mi * ksub + codes.getLong(mi).toInt)
      mi += 1
    }
    acc
  }

  /** Argmax-dot centroid id over a flat [nlist * dim] centroid array —
    * the IVF assignment step as ONE kernel call instead of nlist chained
    * literal-dot expressions (which blow codegen past its method limits
    * at nlist = 64). Ties break toward the lower id (strict >). */
  def argmaxDot(v: ArrayData, cents: ArrayData, nlist: Int): Long = {
    val dim = v.numElements()
    var best = -1L
    var bestScore = Long.MinValue
    var l = 0
    while (l < nlist) {
      val base = l * dim
      var acc = 0L
      var d = 0
      while (d < dim) {
        acc += v.getLong(d) * cents.getLong(base + d)
        d += 1
      }
      if (acc > bestScore) { bestScore = acc; best = l }
      l += 1
    }
    best
  }

  /** The nprobe list ids nearest to the query by (dot desc, id desc) —
    * the probe-selection step of IVF.search as one kernel call (same
    * order as reverse(array_sort) over (score, id) structs, which the
    * oracle replays as ORDER BY s DESC, l DESC). */
  def probeIds(q: ArrayData, cents: ArrayData, nlist: Int, nprobe: Int): ArrayData = {
    val dim = q.numElements()
    val scores = new Array[Long](nlist)
    var l = 0
    while (l < nlist) {
      val base = l * dim
      var acc = 0L
      var d = 0
      while (d < dim) {
        acc += q.getLong(d) * cents.getLong(base + d)
        d += 1
      }
      scores(l) = acc
      l += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Long](k)
    val taken = new Array[Boolean](nlist)
    var i = 0
    while (i < k) {
      var best = -1
      var j = 0
      while (j < nlist) {
        if (!taken(j) && (best < 0 || scores(j) > scores(best) ||
            (scores(j) == scores(best) && j > best))) best = j
        j += 1
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val planes: Array[Array[Long]] =
    Hashing.SrpMatrix.map(_.map(_.toLong).toArray).toArray

  /** SRP bucket id: bit p set iff dot(q, hyperplane_p) > 0. */
  def srpBucket(q: ArrayData): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(q.numElements(), plane.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += q.getLong(i) * plane(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Sign-bit binary code of a quantized vector: bit `d % wordBits` of
    * word `d / wordBits` is set iff element d > 0. `wordBits` stays <=
    * 32 so every packed word is a small POSITIVE long — the oracle's
    * `1::BIGINT << b` never overflows and the codes compare portably.
    * The range is enforced, not assumed: 0 would divide by zero, negative
    * would allocate negatively, and >= 64 would silently produce negative
    * packed words and break the oracle-parity invariant. */
  def bqEncode(v: ArrayData, wordBits: Int): ArrayData = {
    require(wordBits >= 1 && wordBits <= 32,
      s"graft_bq_encode: wordBits must be in [1, 32], got $wordBits")
    val n = v.numElements()
    val out = new Array[Long]((n + wordBits - 1) / wordBits)
    var i = 0
    while (i < n) {
      if (v.getLong(i) > 0) out(i / wordBits) |= 1L << (i % wordBits)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Hamming distance between two packed binary codes: popcount of the
    * per-word XOR, summed. Unlike the trusted-corpus dot/sub kernels this
    * REQUIRES equal lengths — codes of different widths are never
    * comparable, and min-truncation would silently underreport distance
    * in a user-callable SQL function. */
  def hamming(a: ArrayData, b: ArrayData): Long = {
    require(a.numElements() == b.numElements(),
      s"graft_hamming: code lengths differ (${a.numElements()} vs ${b.numElements()})")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }
}
