package graft.catalyst

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Hashing._

/** Single-pass text-hash kernels backing the engine's native Catalyst
  * expressions (graft.catalyst.TextHashExpressions).
  *
  * These compute EXACTLY the same integer math as the
  * `org.apache.spark.sql.functions` compositions in graft.text/graft.dedup
  * (word code = length*WordBase + first char; 3-gram shingle hash; k
  * minhashes; 16-bit simhash votes; rolling fingerprint) — the DuckDB
  * oracles pin both paths. The difference is purely physical: Spark's
  * higher-order array functions are interpreted per element, while these
  * kernels are one tight JVM loop per row, called directly from generated
  * code.
  */
object TextHashKernels {

  /** Whitespace word codes, replicating split(text, ' ', -1) semantics
    * (empty tokens kept, code 0 for an empty token).
    *
    * Length and first-char are measured in Unicode CODE POINTS, matching
    * Spark's `length()` (UTF8String.numChars) and `ascii()` (first code
    * point in Spark 4) and DuckDB's `length()`/`ascii()` — a surrogate
    * pair counts as one char and codes as its astral code point, so the
    * kernel, the functions-API path, and the SQL oracle agree beyond the
    * BMP. (Splitting on ' ' via charAt is safe: no surrogate unit equals
    * the space character.) */
  def wordCodes(s: String): Array[Long] = {
    // manual split on ' ' keeping empties == String.split(" ", -1)
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    var start = 0
    var t = 0
    i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        val len = s.codePointCount(start, i)
        val first = if (len == 0) 0 else s.codePointAt(start)
        out(t) = len.toLong * WordBase + first
        t += 1
        start = i + 1
      }
      i += 1
    }
    out
  }

  def shingleHashes(codes: Array[Long]): Array[Long] = {
    if (codes.length < 3) return Array.emptyLongArray
    val out = new Array[Long](codes.length - 2)
    var i = 0
    while (i < out.length) {
      out(i) = (codes(i) * ShingleS1 + codes(i + 1) * ShingleS2 + codes(i + 2)) % ShingleM
      i += 1
    }
    out
  }

  /** k-minhash signature; P-1 sentinel entries for docs with < 3 tokens. */
  def minhashSig(text: UTF8String, k: Int): ArrayData = {
    val sh = shingleHashes(wordCodes(text.toString))
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = A(j); val b = B(j)
      var m = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val v = ((sh(i) % P) * a + b) % P
        if (v < m) m = v
        i += 1
      }
      sig(j) = if (sh.isEmpty) P - 1 else m
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Raw 3-gram shingle hashes as an array column value. */
  def shingles(text: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(shingleHashes(wordCodes(text.toString)))

  /** 16-bit simhash: bit i set iff the +-1 vote sum over tokens is > 0. */
  def simhash16(text: UTF8String): Long = {
    val codes = wordCodes(text.toString)
    val ones = new Array[Int](SimHashBits)
    var i = 0
    while (i < codes.length) {
      val h = (codes(i) * TokenHashA) % P
      var b = 0
      while (b < SimHashBits) {
        ones(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < SimHashBits) {
      if (2 * ones(b) > codes.length) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64-bit simhash: two independent 32-bit halves (TokenHashA low,
    * TokenHashB high). Long multiplication wraps identically to the Spark
    * expression path — parity is with the HOF form, not an SQL oracle. */
  def simhash64(text: UTF8String): Long = {
    val codes = wordCodes(text.toString)
    val ones = new Array[Int](64)
    var i = 0
    while (i < codes.length) {
      val h1 = (codes(i) * TokenHashA) % P
      val h2 = (codes(i) * TokenHashB) % P
      var b = 0
      while (b < 32) {
        ones(b) += ((h1 >> b) & 1L).toInt
        ones(32 + b) += ((h2 >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > codes.length) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Rolling-hash fingerprint: fold h <- (h*FpB + code) mod FpM. */
  def fingerprint(text: UTF8String): Long = {
    val codes = wordCodes(text.toString)
    var h = 0L
    var i = 0
    while (i < codes.length) {
      h = (h * FpB + codes(i)) % FpM
      i += 1
    }
    h
  }

  /** Plain winnowing fingerprints (r19 native kernel): for each length-`w`
    * window over the 3-gram shingle stream (ONE clamped window when the
    * stream is shorter than `w`), select (pos = 1-based absolute index of
    * the FIRST minimal shingle in the window, fp = that minimal value),
    * deduplicated in first-occurrence order.
    *
    * Exactly the output of the former higher-order-function formulation
    * (transform+slice+array_min+array_position+array_distinct), which was
    * interpreted per window element — this is one O(n) pass with a
    * monotonic deque (ties keep the EARLIEST index, matching
    * array_position's first-match rule). Dedup note: the windows that
    * select one position form a contiguous run (once a strictly smaller —
    * or equal-and-earlier is impossible rightward — shingle enters, the
    * old position never wins again), so skipping repeats of the LAST
    * emitted position equals array_distinct's global dedup;
    * WinnowKernelPropertySpec pins kernel == HOF on random inputs.
    * Returns array<struct<pos:bigint, fp:bigint>>; empty array for docs
    * with no shingles (the explode then yields no rows, same as the old
    * size>0 filter). */
  def winnow(text: UTF8String, w: Int): ArrayData = {
    require(w > 0, s"window must be positive, got $w")
    val sh = shingleHashes(wordCodes(text.toString))
    val n = sh.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    if (n <= w) {
      var m = Long.MaxValue; var mi = 0; var i = 0
      while (i < n) { if (sh(i) < m) { m = sh(i); mi = i }; i += 1 }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](org.apache.spark.sql.catalyst.InternalRow(mi + 1L, m)))
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val dq = new Array[Int](n)
    var head = 0; var tail = 0
    var lastPos = -1L
    var i = 0
    while (i < n) {
      // pop strictly-greater values so the front stays the earliest index
      // among the window's minima (array_position's first-match rule)
      while (tail > head && sh(dq(tail - 1)) > sh(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (i >= w - 1) {
        while (dq(head) < i - w + 1) head += 1
        val pos = dq(head) + 1L
        if (pos != lastPos) {
          out += org.apache.spark.sql.catalyst.InternalRow(pos, sh(dq(head)))
          lastPos = pos
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Unicode NFC normalization (java.text.Normalizer), the canonical-
    * composition pass web-crawled text needs before any byte- or
    * char-keyed dedup (decomposed "é" and precomposed "é"
    * must hash identically). The isNormalized fast path returns the
    * input UTF8String untouched for already-NFC text — the overwhelming
    * case — so ASCII corpora pay one scan and zero allocation. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Byte offsets of the n+1 token boundaries of a single-space split:
    * starts(t) = first byte of token t, starts(n) = numBytes + 1 (a
    * virtual boundary one past a virtual trailing space, so every
    * token's end is uniformly starts(t+1) - 1). A space (0x20) never
    * occurs inside a multi-byte UTF-8 sequence, so the byte scan is an
    * exact replica of split(text, ' ', -1)'s token boundaries (empty
    * tokens kept). */
  private def tokenStarts(text: UTF8String): Array[Int] = {
    val nb = text.numBytes
    var spaces = 0
    var i = 0
    while (i < nb) { if (text.getByte(i) == 0x20) spaces += 1; i += 1 }
    val starts = new Array[Int](spaces + 2)
    var t = 1
    i = 0
    while (i < nb) {
      if (text.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(t) = nb + 1
    starts
  }

  /** Space-joined k-token sliding grams of the single-space split of
    * `text`: exactly `transform(sequence(0, n - k), p ->
    * array_join(slice(split(text, ' '), p + 1, k), ' '))`, empty array
    * when the split has fewer than k tokens.
    *
    * The interpreted HOF pipeline above evaluates a lambda expression
    * tree per window and allocates a slice copy per gram; this kernel
    * uses the identity that, with single-space separators, gram p IS the
    * byte substring of `text` from the start of token p to the end of
    * token p+k-1 — one boundary scan, then n-k+1 substrings WRAPPING one
    * shared byte array (UTF8String.fromBytes(bytes, offset, len) does
    * not copy). TokenGramsPropertySpec pins kernel == HOF. */
  def tokenGrams(text: UTF8String, k: Int): ArrayData = {
    require(k > 0, s"gram width must be positive, got $k")
    val starts = tokenStarts(text)
    val n = starts.length - 1
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val out = new Array[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      val from = starts(p)
      out(p) = UTF8String.fromBytes(bytes, from, starts(p + k) - 1 - from)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Space-joined fixed-width token chunks of the single-space split of
    * `text`: exactly `transform(sequence(0, (n - 1) div w), i ->
    * array_join(slice(split(text, ' '), i * w + 1, w), ' '))` — the last
    * chunk may be shorter; a split always has >= 1 token (empty text is
    * one empty token), so there is always >= 1 chunk. Same shared-byte
    * substring identity as [[tokenGrams]]. */
  def tokenChunks(text: UTF8String, w: Int): ArrayData = {
    require(w > 0, s"chunk width must be positive, got $w")
    val starts = tokenStarts(text)
    val n = starts.length - 1
    val bytes = text.getBytes
    val out = new Array[Any]((n - 1) / w + 1)
    var c = 0
    while (c < out.length) {
      val from = starts(c * w)
      val endTok = math.min((c + 1) * w, n)
      out(c) = UTF8String.fromBytes(bytes, from, starts(endTok) - 1 - from)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
