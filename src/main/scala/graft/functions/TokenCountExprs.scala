package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass token counters over raw document text.
  *
  * Why native: the token-count quality signals run on EVERY document of
  * the corpus, and both declarative spellings do per-row work far beyond
  * the semantics — `size(split(text, " "))` materializes a full token
  * array just to read its length, and `regexp_count(text,
  * "[a-z]+|[0-9]+|[^a-z0-9 ]")` drives the java.util.regex engine over
  * every character with a 3-way alternation. Each counter here is a
  * single branch-per-byte walk of the UTF8String's bytes, stays inside
  * whole-stage codegen, and allocates nothing.
  */
object TokenCountExprs {

  /** Count equal to `size(split(text, " "))`: single-space split fields,
    * i.e. 1 + the number of 0x20 bytes. Exact for all of UTF-8 — no
    * multi-byte code point's encoding contains 0x20 (continuation bytes
    * are ≥ 0x80), and split(" ") keeps empty fields, so consecutive
    * spaces count exactly as the split does. */
  def wsFieldCount(bytes: Array[Byte]): Int = {
    var c = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  /** Count equal to `regexp_count(text, "[a-z]+|[0-9]+|[^a-z0-9 ]")`:
    * maximal lowercase runs and digit runs count once each; every other
    * non-space CODE POINT (uppercase, punctuation, newline, tab,
    * multi-byte) counts once; ASCII space resets the run. Multi-byte
    * code points are counted at their lead byte (UTF-8 continuation
    * bytes have the 10xxxxxx prefix), matching the regex engine's
    * one-match-per-code-point behavior for the `[^a-z0-9 ]` arm. */
  def lexTokenCount(bytes: Array[Byte]): Int = {
    var c = 0
    var state = 0 // 0 = none/space/other, 1 = in [a-z] run, 2 = in [0-9] run
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        if (state != 1) { c += 1; state = 1 }
      } else if (b >= '0' && b <= '9') {
        if (state != 2) { c += 1; state = 2 }
      } else if (b == 0x20) {
        state = 0
      } else {
        // single-code-point token; continuation bytes don't re-count
        if ((b & 0xC0) != 0x80) c += 1
        state = 0
      }
      i += 1
    }
    c
  }

  def wsFieldCountCol(text: Column): Column =
    GraftBridge.column(WsFieldCountExpr(GraftBridge.expression(text)))

  def lexTokenCountCol(text: Column): Column =
    GraftBridge.column(LexTokenCountExpr(GraftBridge.expression(text)))
}

case class WsFieldCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_field_count"
  override def nullSafeEval(s: Any): Any =
    TokenCountExprs.wsFieldCount(s.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCountExprs.wsFieldCount($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): WsFieldCountExpr =
    copy(child = newChild)
}

case class LexTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lex_token_count"
  override def nullSafeEval(s: Any): Any =
    TokenCountExprs.lexTokenCount(s.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenCountExprs.lexTokenCount($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): LexTokenCountExpr =
    copy(child = newChild)
}
