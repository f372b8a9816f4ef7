package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document repetition census over an `array<string>` of
  * whitespace tokens — the three integer ingredients of the Gopher
  * repetition rules (Rae et al. 2021, "Scaling Language Models", A1.1)
  * the declarative layer can't compute without a corpus-scale explode:
  *
  *   `[top_cnt, top_chars, dup_chars]` for word n-grams of a fixed `n`:
  *   - `top_cnt`   — occurrences of the doc's most frequent n-gram
  *     (ties broken to the lexicographically SMALLEST gram string, the
  *     `ORDER BY c DESC, g ASC` contract the oracle mirrors);
  *   - `top_chars` — character length of that gram (single-space joins,
  *     so `sum(len(tok)) + n − 1`);
  *   - `dup_chars` — total characters of tokens covered by ANY n-gram
  *     occurring ≥ 2 times in the doc, each token counted once whatever
  *     the overlap (the "fraction of characters inside duplicate
  *     n-grams" numerator).
  *
  * All three are EXACT longs; the query layer turns them into fractions
  * with one IEEE division by the doc's char count, so the cross-engine
  * hash discipline holds. Why native rather than explode→groupBy: the
  * semantics are strictly per-document, so materializing every n-gram
  * occurrence into a corpus-scale shuffle (rows × tokens of them) to
  * aggregate right back to one row per doc would put a shuffle where a
  * scan projection suffices. Two O(tokens) local passes per row (count
  * map, then coverage marking) ride whole-stage codegen like the other
  * native text expressions.
  *
  * Reference scope: the reference repo has no repetition filter; this is
  * part of the mandated LLM-pipeline extension (same family as
  * `TextAnalysis.dupNgramFrac`, SURVEY.md §2 row 55).
  */
case class RepSignalsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_signals"

  override def nullSafeEval(arr: Any): Any =
    RepSignalsExpr.signals(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepSignalsExpr.signals($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepSignalsExpr =
    copy(child = newChild)
}

object RepSignalsExpr {
  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted and generated paths. Null tokens are treated
    * as empty strings by `concatWs` (Spark's join semantics); gram char
    * lengths use `numChars` so the unit matches `length(text)`. */
  def signals(arr: ArrayData, n: Int): ArrayData = {
    val nt = arr.numElements()
    if (nt < n) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val m = nt - n + 1
    // Pass 1: gram counts keyed by the joined gram string.
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    val grams = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val g = UTF8String.concatWs(Sep, parts: _*)
      grams(i) = g
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    // Top gram: max count, ties to the smallest gram string.
    var topCnt = 0
    var topGram: UTF8String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topCnt || (c == topCnt && e.getKey.compareTo(topGram) < 0)) {
        topCnt = c
        topGram = e.getKey
      }
    }
    // Pass 2: mark tokens covered by duplicated grams.
    val covered = new Array[Boolean](nt)
    i = 0
    while (i < m) {
      if (counts.get(grams(i)) >= 2) {
        var j = i
        val end = i + n
        while (j < end) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var dupChars = 0L
    i = 0
    while (i < nt) {
      if (covered(i) && !arr.isNullAt(i)) dupChars += arr.getUTF8String(i).numChars()
      i += 1
    }
    new GenericArrayData(Array[Any](
      topCnt.toLong, if (topGram == null) 0L else topGram.numChars().toLong, dupChars))
  }

  /** `[top_cnt, top_chars, dup_chars]` for word n-grams of `tokens`. */
  def repSignals(tokens: Column, n: Int): Column =
    GraftBridge.column(RepSignalsExpr(GraftBridge.expression(tokens), n))
}
