package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate their
  * lambdas interpreted, outside whole-stage codegen — a 64-dim dot product
  * per candidate pair dominated the ANN/near-dup benchmarks. This
  * expression generates a tight scalar loop inside codegen instead
  * (same left-to-right accumulation order, so results are bit-identical to
  * the fold and to the DuckDB oracle's sequential sum).
  *
  * Null/short-array semantics: iterates min(len) elements; null elements
  * contribute 0 (embeddings are dense — the lenient path keeps a 100 TB
  * scan from dying on one bad row).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Shared by interpreted and generated paths. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
