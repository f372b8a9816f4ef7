package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-shingle generation over an `array<string>` of
  * tokens: all n-grams `concat_ws(" ", tokens[i..i+n))` in first-occurrence
  * order, deduplicated — bit-identical to the declarative
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, n))))` (null tokens are skipped by concat_ws exactly as
  * Spark's `UTF8String.concatWs` does; fewer than n tokens yields an
  * empty array like the `when(size >= n)` guard it replaces).
  *
  * Why native: the higher-order transform evaluates an interpreted lambda
  * per shingle AND — because Catalyst pushes `size(shingles) > 0`-style
  * filters through projections by substitution — the whole interpreted
  * tree was being evaluated twice per row in the MinHash path. One
  * codegen'd call removes both the lambda dispatch and (with the
  * filter restructuring in Dedup) the double evaluation.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType,
    containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(arr: Any): Any =
    ShinglesExpr.shingles(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesExpr.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Sep = UTF8String.fromString(" ")

  /** Shared by interpreted and generated paths. */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val nt = arr.numElements()
    if (nt < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet keeps first-occurrence order — array_distinct's order.
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= nt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  def wordShingles(tokens: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(tokens), n))
}

/** Native one-pass MinHash signature over an `array<string>` of shingles.
  *
  * Bit-identical to the declarative
  * `array_min(transform(shs, s => xxhash64(lit(i), s)))` per component —
  * seed chain `hashInt(i, 42)` then `hashUnsafeBytes(s, seed)`, null
  * elements leave the running hash at the seed, exactly Spark's XxHash64
  * semantics — but computed in ONE codegen'd loop over the shingles
  * instead of `numHashes` interpreted higher-order passes (each of which
  * re-evaluates an interpreted lambda per element). This was the dominant
  * cost of MinHash-LSH candidate generation after the shuffle work was
  * fixed: the per-row signature is pure CPU, so it belongs inside
  * whole-stage codegen like [[DotProductExpr]].
  *
  * Empty input arrays yield an EMPTY signature array (not a constant
  * sentinel signature, which would band every shingle-less doc into one
  * live bucket): `element_at` over it is null, so such docs band into a
  * per-band constant bucket whose pairs estimate to 0 and never reach
  * the output — see Dedup.minhashLshPairs.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(arr: Any): Any =
    MinHashSigExpr.sig(arr.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr.sig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  private final val Seed = 42L // Spark's XxHash64 default seed

  /** Shared by interpreted and generated paths. */
  def sig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      // xxhash64(lit(i), s): chain = hashInt(i, 42) -> hash(s, chain)
      val seed = XXH64.hashInt(i, Seed)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val h =
          if (arr.isNullAt(j)) seed // null child leaves the chain unchanged
          else {
            val s = arr.getUTF8String(j)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
          }
        if (h < m) m = h
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(shingles), numHashes))
}

/** Native 64-bit SimHash over an `array<string>` of tokens: one codegen'd
  * pass hashing each token once and updating 64 bit-counters, replacing
  * the explode + groupBy(id) + 64-sum formulation — which re-SHUFFLED the
  * whole corpus just to regroup rows that were already doc-local.
  * Bit-identical to it: token hash is `xxhash64(token)` (seed 42, null
  * tokens hash to the seed like Spark's XxHash64), bit i of the result is
  * set iff strictly more tokens have bit i set than clear.
  *
  * Empty token arrays pack to 0L — callers filter `size(toks) > 0` first
  * to match the explode formulation, which dropped token-less docs.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(arr: Any): Any =
    SimHash64Expr.simhash(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  private final val Seed = 42L

  /** Shared by interpreted and generated paths. */
  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) Seed
        else {
          val s: UTF8String = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        }
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var packed = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) packed |= (1L << i)
      i += 1
    }
    packed
  }

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(tokens)))
}
