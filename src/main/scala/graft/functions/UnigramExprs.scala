package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained unigram-LM piece vocabulary as ONE expression reference
  * object (the [[BpeRules]] / CellModel pattern): the piece table lives
  * outside the generated code, so expression-tree size is O(1) in the
  * vocabulary size.
  *
  * Scores are MICRO-QUANTIZED log-probabilities (ln(p)·1e6 rounded to
  * long): the Viterbi DP below sums them as exact integers, so the
  * best-path decision is deterministic across partitions, JVMs, and
  * re-runs — no float accumulation order anywhere in the decoder (the
  * engine's frozen-decimal discipline applied to a tokenizer).
  * `unkMicro` prices characters absent from the vocabulary (a large
  * negative constant, worse than any real piece, so known pieces are
  * always preferred but unknown text still segments). */
final case class UnigramModel(pieces: Array[String], scoresMicro: Array[Long],
                              unkMicro: Long, maxPieceLen: Int)
    extends Serializable {
  require(pieces.length == scoresMicro.length, "piece arrays must align")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  // java.lang.Long values so a missing key reads as null — a
  // HashMap[String, scala.Long] would unbox null to 0L and silently
  // price unknown pieces as ln(p)=0 (probability 1), the worst score
  // inversion possible.
  @transient lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scoresMicro(i)); i += 1 }
    m
  }
}

object UnigramModel {
  def apply(scored: Seq[(String, Long)], unkMicro: Long = -100000000L): UnigramModel = {
    val maxLen =
      if (scored.isEmpty) 1
      else scored.map(p => p._1.codePointCount(0, p._1.length)).max.max(1)
    UnigramModel(scored.map(_._1).toArray, scored.map(_._2).toArray,
      unkMicro, maxLen)
  }
}

/** Viterbi 1-BEST segmentation of one token under a [[UnigramModel]] —
  * the array of pieces whose micro-score sum is maximal. DP over
  * CODE-POINT boundaries (split(token, "") parity — surrogate pairs
  * stay whole). Deterministic tie-break, stated plainly: when two paths
  * reach a boundary with equal total score, the one whose LAST piece is
  * longer wins (equivalently: candidate start positions are scanned
  * left-to-right and a strictly-greater total is required to replace) —
  * so greedy-longest wins among equals, the sentencepiece convention.
  * Empty token → single empty piece (split parity). */
case class UnigramSegmentExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override def nullSafeEval(s: Any): Any =
    UnigramSegmentExpr.segment(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegmentExpr.segment($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}

object UnigramSegmentExpr {

  def segment(token: UTF8String, model: UnigramModel): GenericArrayData =
    new GenericArrayData(
      segmentPieces(token.toString, model).map(UTF8String.fromString))

  /** Shared DP core (interpreted, generated, and count paths). */
  def segmentPieces(s: String, model: UnigramModel): Array[String] = {
    if (s.isEmpty) return Array("")
    // code-point boundary offsets: bounds(0)=0 .. bounds(n)=s.length
    val n = s.codePointCount(0, s.length)
    val bounds = new Array[Int](n + 1)
    var i = 0
    var ci = 0
    while (i < s.length) {
      bounds(ci) = i; ci += 1; i += Character.charCount(s.codePointAt(i))
    }
    bounds(n) = s.length
    val NEG = Long.MinValue / 4
    val best = Array.fill(n + 1)(NEG)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var e = 1
    while (e <= n) {
      // scan starts left-to-right; strict > required to replace, so the
      // LONGEST piece among equal totals wins (see scaladoc)
      var b = math.max(0, e - model.maxPieceLen)
      while (b < e) {
        if (best(b) > NEG) {
          val piece = s.substring(bounds(b), bounds(e))
          val sc = model.table.get(piece) match {
            case null => if (e - b == 1) model.unkMicro else NEG
            case v => v.longValue()
          }
          if (sc > NEG) {
            val tot = best(b) + sc
            if (tot > best(e)) { best(e) = tot; back(e) = b }
          }
        }
        b += 1
      }
      e += 1
    }
    // walk back
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = back(p) }
    val out = new Array[String](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = s.substring(bounds(back(p)), bounds(p)); k -= 1; p = back(p)
    }
    out
  }

  /** Piece count of the 1-best segmentation — the encode-stats hot path
    * (no piece array materialized). */
  def segmentCount(s: UTF8String, model: UnigramModel): Int =
    segmentPieces(s.toString, model).length

  def segment(c: Column, model: UnigramModel): Column =
    GraftBridge.column(UnigramSegmentExpr(GraftBridge.expression(c), model))

  def segmentCountCol(c: Column, model: UnigramModel): Column =
    GraftBridge.column(UnigramSegmentCountExpr(GraftBridge.expression(c), model))
}

/** Forward–backward EXPECTED piece counts of one token under a
  * [[UnigramModel]] — soft-EM's E-step (Kudo 2018's actual estimator)
  * as a native expression, the production twin of the Viterbi decoder
  * above: same code-point lattice, posterior mass instead of argmax.
  * Returns array<struct<piece string, emicro long>> — one entry per
  * DISTINCT piece of the word, `emicro` = round(Σ posteriors · 1e6).
  *
  * Determinism discipline, stated plainly: the forward/backward doubles
  * run in a FIXED sequential order inside one word (bit-reproducible —
  * StrictMath.exp of frozen micro scores, left-to-right sums), and the
  * quantization to micro-longs happens per (word, piece) BEFORE any
  * cross-word aggregation — so the trainer's count table is an exact
  * integer sum, associative and commutative, identical across
  * partitionings/JVMs/re-runs exactly like the hard path's 1-best
  * counts. Bound: Σ emicro·wordFreq stays < 2⁶³ while the corpus holds
  * under ~10¹² word occurrences of length ≤ maxPieceLen·…; at scales
  * beyond that, shard the fit per stratum (the DoReMi shape) or drop
  * the quantum to 1e3.
  *
  * Unknown single code points price at the UNK floor so every word
  * stays coverable; a word with zero lattice mass (cannot happen while
  * singles always price) would return an empty array, never NaNs. */
case class UnigramExpectExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("emicro", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_expect"

  override def nullSafeEval(s: Any): Any =
    UnigramExpectExpr.expectCounts(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramExpectExpr.expectCounts($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramExpectExpr =
    copy(child = newChild)
}

object UnigramExpectExpr {
  import org.apache.spark.sql.catalyst.InternalRow

  def expectCounts(token: UTF8String, model: UnigramModel): GenericArrayData = {
    val s = token.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = s.codePointCount(0, s.length)
    val bounds = new Array[Int](n + 1)
    var i = 0; var ci = 0
    while (i < s.length) {
      bounds(ci) = i; ci += 1; i += Character.charCount(s.codePointAt(i))
    }
    bounds(n) = s.length
    val maxL = model.maxPieceLen
    def price(b: Int, e: Int): Double = {
      val piece = s.substring(bounds(b), bounds(e))
      model.table.get(piece) match {
        case null =>
          if (e - b == 1) StrictMath.exp(model.unkMicro / 1e6) else 0.0
        case v => StrictMath.exp(v.longValue() / 1e6)
      }
    }
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var e = 1
    while (e <= n) {
      var b = math.max(0, e - maxL); var acc = 0.0
      while (b < e) { acc += alpha(b) * price(b, e); b += 1 }
      alpha(e) = acc; e += 1
    }
    if (alpha(n) <= 0.0) return new GenericArrayData(Array.empty[Any])
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var b2 = n - 1
    while (b2 >= 0) {
      var ee = b2 + 1; var acc = 0.0
      val lim = math.min(n, b2 + maxL)
      while (ee <= lim) { acc += price(b2, ee) * beta(ee); ee += 1 }
      beta(b2) = acc; b2 -= 1
    }
    val z = alpha(n)
    // Accumulate per-piece posterior mass in a per-word LinkedHashMap:
    // insertion order is the deterministic left-to-right scan order, so
    // the output array (and everything downstream) is reproducible.
    val acc = new java.util.LinkedHashMap[String, Double]()
    var bb = 0
    while (bb < n) {
      var ee = bb + 1
      val lim = math.min(n, bb + maxL)
      while (ee <= lim) {
        val p = price(bb, ee)
        if (p > 0.0) {
          val post = alpha(bb) * p * beta(ee) / z
          if (post > 0.0) {
            val piece = s.substring(bounds(bb), bounds(ee))
            val prev = acc.get(piece)
            acc.put(piece, (if (prev == null) 0.0 else prev.doubleValue()) + post)
          }
        }
        ee += 1
      }
      bb += 1
    }
    val out = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val en = it.next()
      val micro = math.round(en.getValue.doubleValue() * 1e6)
      out(k) = InternalRow(UTF8String.fromString(en.getKey), micro)
      k += 1
    }
    new GenericArrayData(out)
  }

  def expect(c: Column, model: UnigramModel): Column =
    GraftBridge.column(UnigramExpectExpr(GraftBridge.expression(c), model))
}

/** `size(segment(...))` without materializing the piece array. */
case class UnigramSegmentCountExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "unigram_segment_count"

  override def nullSafeEval(s: Any): Any =
    UnigramSegmentExpr.segmentCount(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model, classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegmentExpr.segmentCount($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentCountExpr =
    copy(child = newChild)
}
