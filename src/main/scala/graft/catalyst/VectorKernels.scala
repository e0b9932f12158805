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
}
