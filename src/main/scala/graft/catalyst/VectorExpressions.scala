package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the similarity hot path (quantize /
  * integer dot / SRP bucket): the brute-force top-k scores |corpus| x
  * |queries| dot products and the LSH join scores every candidate pair, so
  * these must stay inside whole-stage codegen rather than Spark's
  * interpreted higher-order array functions. Registered by
  * [[GraftExtensions]]. */

/** graft_quantize(array<double>) -> array<bigint>. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.quantize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VectorKernels.quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec = copy(newChild)
  override def prettyName: String = "graft_quantize"
}

/** graft_qdot(array<bigint>, array<bigint>) -> bigint. */
case class QuantDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantDot =
    copy(left = l, right = r)
  override def prettyName: String = "graft_qdot"
}

/** graft_qsub(array<bigint>, array<bigint>) -> array<bigint> elementwise
  * difference (the IVF-PQ residual step). */
case class QuantSub(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.VectorKernels.sub($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantSub =
    copy(left = l, right = r)
  override def prettyName: String = "graft_qsub"
}

/** graft_pq_encode(array<bigint> vec, array<bigint> flatBooks, int m,
  * int ksub) -> array<bigint> of m nearest-codeword codes. */
case class PqEncode(vec: Expression, books: Expression, m: Expression, ksub: Expression)
    extends QuaternaryExpression {
  override def first: Expression = vec
  override def second: Expression = books
  override def third: Expression = m
  override def fourth: Expression = ksub
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, b: Any, mm: Any, kk: Any): Any =
    VectorKernels.pqEncode(v.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      mm.asInstanceOf[Int], kk.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, mm, kk) =>
      s"graft.catalyst.VectorKernels.pqEncode($v, $b, $mm, $kk)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): PqEncode =
    copy(vec = a, books = b, m = c, ksub = d)
  override def prettyName: String = "graft_pq_encode"
}

/** graft_pq_lut(array<bigint> query, array<bigint> flatBooks, int m,
  * int ksub) -> flat array<bigint> [m][ksub] of codeword dots. */
case class PqLut(vec: Expression, books: Expression, m: Expression, ksub: Expression)
    extends QuaternaryExpression {
  override def first: Expression = vec
  override def second: Expression = books
  override def third: Expression = m
  override def fourth: Expression = ksub
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, b: Any, mm: Any, kk: Any): Any =
    VectorKernels.pqLut(v.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      mm.asInstanceOf[Int], kk.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, mm, kk) =>
      s"graft.catalyst.VectorKernels.pqLut($v, $b, $mm, $kk)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): PqLut =
    copy(vec = a, books = b, m = c, ksub = d)
  override def prettyName: String = "graft_pq_lut"
}

/** graft_pq_adc(array<bigint> codes, array<bigint> lut, int ksub) ->
  * bigint approximate dot (m table lookups). */
case class PqAdc(codes: Expression, lut: Expression, ksub: Expression)
    extends TernaryExpression {
  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = ksub
  override def dataType: DataType = LongType
  override protected def nullSafeEval(c: Any, l: Any, kk: Any): Any =
    VectorKernels.pqAdc(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData],
      kk.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l, kk) =>
      s"graft.catalyst.VectorKernels.pqAdc($c, $l, $kk)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): PqAdc =
    copy(codes = a, lut = b, ksub = c)
  override def prettyName: String = "graft_pq_adc"
}

/** graft_srp(array<bigint>) -> bigint bucket id in [0, 2^SrpPlanes). */
case class SrpBucket(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.srpBucket(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VectorKernels.srpBucket($c)")
  override protected def withNewChildInternal(newChild: Expression): SrpBucket = copy(newChild)
  override def prettyName: String = "graft_srp"
}

/** graft_bq_encode(array<bigint> quantVec, int wordBits) -> array<bigint>
  * sign-bit binary code, wordBits sign bits packed per word. */
case class BqEncode(vec: Expression, wordBits: Expression) extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = wordBits
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, w: Any): Any =
    VectorKernels.bqEncode(v.asInstanceOf[ArrayData], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, w) => s"graft.catalyst.VectorKernels.bqEncode($v, $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BqEncode =
    copy(vec = l, wordBits = r)
  override def prettyName: String = "graft_bq_encode"
}

/** graft_hamming(array<bigint>, array<bigint>) -> bigint popcount of the
  * per-word XOR of two packed binary codes. */
case class BqHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.VectorKernels.hamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BqHamming =
    copy(left = l, right = r)
  override def prettyName: String = "graft_hamming"
}

/** graft_argmax_dot(array<bigint> vec, array<bigint> flatCents, int nlist)
  * -> bigint list id of the max-dot centroid (ties to the lower id). */
case class ArgmaxDot(vec: Expression, cents: Expression, nlist: Expression)
    extends TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = nlist
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any, c: Any, n: Any): Any =
    VectorKernels.argmaxDot(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, n) =>
      s"graft.catalyst.VectorKernels.argmaxDot($v, $c, $n)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): ArgmaxDot =
    copy(vec = a, cents = b, nlist = c)
  override def prettyName: String = "graft_argmax_dot"
}

/** graft_probe_ids(array<bigint> query, array<bigint> flatCents, int nlist,
  * int nprobe) -> array<bigint> of the nprobe nearest list ids, ordered by
  * (dot desc, id desc). */
case class ProbeIds(vec: Expression, cents: Expression, nlist: Expression,
    nprobe: Expression) extends QuaternaryExpression {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = nlist
  override def fourth: Expression = nprobe
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any, c: Any, n: Any, p: Any): Any =
    VectorKernels.probeIds(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, n, p) =>
      s"graft.catalyst.VectorKernels.probeIds($v, $c, $n, $p)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): ProbeIds =
    copy(vec = a, cents = b, nlist = c, nprobe = d)
  override def prettyName: String = "graft_probe_ids"
}
