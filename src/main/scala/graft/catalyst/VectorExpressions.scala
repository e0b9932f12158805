package graft.catalyst

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
