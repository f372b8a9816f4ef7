package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `decodeurl` custom
  * function: `reflect("java.net.URLDecoder","decode",v[,"UTF-8"])` →
  * `decodeurl(v)` (reference: tools/script_converter_tool.py rule 8).
  *
  * The Hive original calls through JVM reflection per row; this is a
  * codegen'd expression — a static call inside whole-stage codegen, so the
  * scan→project pipeline never leaves generated code. Malformed
  * percent-escapes decode leniently (the raw text is kept) rather than
  * failing a 100 TB job on one bad row.
  */
case class UrlDecodeExpr(child: Expression) extends UnaryExpression {
  // Callers cast the child to string (see the wrappers below) rather than
  // declaring inputTypes: AbstractDataType is private[sql] in Spark 4.
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlDecodeExpr.decode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlDecodeExpr.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlDecodeExpr =
    copy(child = newChild)
  override def prettyName: String = "decodeurl"
}

object UrlDecodeExpr {
  /** Static decode target for both interpreted and generated paths. */
  def decode(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    try UTF8String.fromString(
      java.net.URLDecoder.decode(str, java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: IllegalArgumentException => s }
  }
}

object UrlDecode {
  def decodeurl(col: Column): Column =
    GraftBridge.column(UrlDecodeExpr(GraftBridge.expression(col.cast("string"))))

  /** Register `decodeurl` for SQL use on a session. (GraftSession
    * sessions already get it via GraftExtensions — this is for attaching
    * to a foreign session.) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decodeurl",
      exprs => {
        // Same arity contract as the GraftExtensions registration: a
        // bare exprs.head would die with an unnamed NoSuchElementException
        // on decodeurl() and silently IGNORE extra arguments.
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"decodeurl expects 1 argument: decodeurl(s); got ${exprs.length}")
        UrlDecodeExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, StringType))
      },
      "built-in")
}
