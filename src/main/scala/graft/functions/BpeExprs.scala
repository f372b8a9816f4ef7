package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained BPE merge table as ONE expression reference object (the
  * [[CellModel]] pattern): the rule arrays live outside the generated
  * code, so expression-tree size is O(1) in the rule count.
  *
  * Why this exists: applying `numMerges` rules by folding
  * `Bpe.mergeAdjacent` builds a `numMerges`-deep nest of higher-order
  * `aggregate` lambdas — measured OOM in the OPTIMIZER (not the data)
  * past ~20 rules, because several Catalyst rules walk conditional
  * lambda nests super-linearly. One native loop applies the whole rule
  * table per token in O(len · rules) with nothing nested. */
final case class BpeRules(ls: Array[String], rs: Array[String])
    extends Serializable {
  require(ls.length == rs.length, "rule arrays must align")
}

object BpeRules {
  def apply(rules: Seq[(String, String)]): BpeRules =
    BpeRules(rules.map(_._1).toArray, rules.map(_._2).toArray)
}

/** Symbol count of one token after applying the merge table in training
  * order — result-identical to `size(Bpe.segment(token, rules))`:
  * character-split init matching Spark's `split(token, "")`, which is
  * CODE-POINT based (UTF8String.split keeps a surrogate pair as ONE
  * element — a charAt walk would split astral characters into two
  * symbols and break the n_bpe_tokens ≤ n_chars invariant; parity with
  * the declarative form is spec-pinned on an astral fixture). Empty
  * token → one empty symbol. Each rule applies greedily left-to-right
  * non-overlapping (the just-merged symbol `l+r` can never equal `l`,
  * so it cannot chain within its own pass — same as the fold). */
case class BpeSegmentCountExpr(child: Expression, rules: BpeRules)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_segment_count"

  override def nullSafeEval(s: Any): Any =
    BpeSegmentCountExpr.count(s.asInstanceOf[UTF8String], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRules", rules, classOf[BpeRules].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeSegmentCountExpr.count($c, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentCountExpr =
    copy(child = newChild)
}

object BpeSegmentCountExpr {

  /** Shared by interpreted and generated paths. */
  def count(token: UTF8String, rules: BpeRules): Int = {
    val s = token.toString
    if (s.isEmpty) return 1 // "".split("") == [""]
    // Code-point split (split(token, "") semantics — surrogate pairs
    // stay whole).
    val nCp = s.codePointCount(0, s.length)
    var syms = new Array[String](nCp)
    var i = 0
    var ci = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(ci) = s.substring(i, i + w)
      ci += 1
      i += w
    }
    var n = syms.length
    var ri = 0
    while (ri < rules.ls.length && n > 1) {
      val l = rules.ls(ri)
      val r = rules.rs(ri)
      val out = new Array[String](n)
      var o = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == l && syms(j + 1) == r) {
          out(o) = l + r
          o += 1
          j += 2
        } else {
          out(o) = syms(j)
          o += 1
          j += 1
        }
      }
      syms = out
      n = o
      ri += 1
    }
    n
  }

  def segmentCount(token: Column, rules: Seq[(String, String)]): Column =
    GraftBridge.column(
      BpeSegmentCountExpr(GraftBridge.expression(token), BpeRules(rules)))
}
