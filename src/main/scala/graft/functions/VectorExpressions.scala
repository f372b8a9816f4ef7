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

/** Native random-hyperplane LSH bucket signature over an `array<double>`
  * vector: bit j (0 ≤ j < count) is the sign of Σ_i v[i] * h(from+j, i),
  * with the pseudo-random component h(p, i) =
  * pmod(xxhash64(p, i), 1000)/1000 - 0.5 — bit-identical to the
  * declarative `aggregate(zip_with(v, sequence(...), ...))` fold it
  * replaces (same left-to-right accumulation, same strict `proj > 0`
  * sign), which evaluated an interpreted lambda per dimension per plane:
  * at 8 bands × 4 planes × 64 dims that was 2048 interpreted evals per
  * row, the dominant cost of both LSH ANN and LSH-blocked near-dup
  * bucketing. A null ELEMENT nulls the fold's projection, which the
  * `proj > 0` sign reads as false — so any null-bearing vector lands in
  * bucket 0 for every band; the native path reproduces exactly that. */
case class LshBucketExpr(child: Expression, from: Int, count: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(count > 0 && count < 31, "count must be in [1, 30]")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(v: Any): Any =
    LshBucketExpr.bucket(v.asInstanceOf[ArrayData], from, count)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucketExpr.bucket($c, $from, $count)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  private final val Seed = 42L

  /** h(p, i) — deterministic pseudo-random hyperplane component in
    * [-0.5, 0.5): pmod(xxhash64(p, i), 1000)/1000 - 0.5 with p and i
    * hashed as INTS (the declarative form's lit(p) and sequence elements
    * are both IntegerType). */
  private def planeComponent(p: Int, i: Int): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(
      i, org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(p, Seed))
    val m = ((h % 1000L) + 1000L) % 1000L
    m.toDouble / 1000.0 - 0.5
  }

  /** Memoized hyperplane rows: h(p, 0..dim-1) is a pure function of the
    * plane index, and the corpus scan calls [[bucket]] once per row per
    * band — recomputing two xxhash64 rounds per (plane, dim) per ROW put
    * ~2×planes×dim hash evaluations on the hot scan (at sf10 that is
    * ~10⁹ hash calls for the ANN corpus side alone). Each executor
    * computes a plane's component row once and reuses it; the map is
    * tiny (planes × dim doubles) and values are deterministic — a race
    * only costs a duplicate computation, never a wrong value. The merge
    * keeps the LONGEST row (a plain put could let a short row replace a
    * longer cached one under a mixed-dim race, re-triggering
    * recomputation on later long-dim calls). Rows longer than the
    * cached dim extend the cache; shorter rows read a prefix. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private def planeRow(p: Int, dim: Int): Array[Double] = {
    val cached = planeCache.get(p)
    if (cached != null && cached.length >= dim) cached
    else {
      val row = Array.tabulate(math.max(dim, 64))(planeComponent(p, _))
      planeCache.merge(p, row,
        (a, b) => if (a.length >= b.length) a else b)
      row
    }
  }

  /** Shared by interpreted and generated paths. */
  def bucket(v: ArrayData, from: Int, count: Int): Int = {
    val n = v.numElements()
    // A null element nulls every plane's fold → bucket 0 (see class doc).
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0
      i += 1
    }
    var bits = 0
    var j = 0
    while (j < count) {
      val h = planeRow(from + j, n)
      var proj = 0.0
      i = 0
      while (i < n) {
        proj += v.getDouble(i) * h(i)
        i += 1
      }
      if (proj > 0) bits |= (1 << j)
      j += 1
    }
    bits
  }

  /** Cast to array<double> like the SQL registration: the expression
    * reads 8-byte doubles out of ArrayData, so an UNCAST float[] column
    * (the embeddings table!) would misread under codegen. The cast is a
    * no-op (eliminated) when the input is already array<double>. */
  def lshBucket(v: Column, from: Int, count: Int): Column =
    GraftBridge.column(LshBucketExpr(
      GraftBridge.expression(v.cast("array<double>")), from, count))
}

/** Centroid model for [[CellAssignExpr]]/[[CellTopExpr]]: the fitted cell
  * directions plus their precomputed self-norms. Lives in the expression as
  * one REFERENCE OBJECT (ctx.addReferenceObj), so generated code is O(1) in
  * the cell count — the previous `greatest`-of-structs assignment emitted
  * one dot-product call + struct + comparison per cell into the generated
  * source, which forced a hard clamp (~256 cells) on [[graft.operators
  * .Similarity.cellsFor]] well below what the k ∝ corpus contract wants at
  * sf ≥ 100. The per-row cost is the same k×d multiply-adds either way;
  * only the code size changed. */
final case class CellModel(cents: Array[Array[Double]], norms: Array[Double])
    extends Serializable {
  require(cents.length == norms.length,
    s"cents/norms length mismatch: ${cents.length} vs ${norms.length}")
  require(cents.nonEmpty, "CellModel needs at least one centroid")
  def k: Int = cents.length
}

object CellModel {
  /** From (vector, self-norm) rows, the [[graft.operators.Similarity]]
    * centroid representation. */
  def apply(rows: Seq[(Seq[Double], Double)]): CellModel =
    CellModel(rows.map(_._1.toArray).toArray, rows.map(_._2).toArray)
}

/** Nearest-centroid cell id: argmax over cells of
  * `dot(v, c_i) / sqrt(n * cn_i)` with ties to the SMALLEST index —
  * bit-identical to the declarative
  * `-greatest(struct(sim, -i)…).getField("negid")` form it replaces
  * (same left-to-right dot accumulation, same Spark double ordering where
  * -0.0 == 0.0 and NaN is greatest). `norm` is the row's precomputed
  * self-norm (pass lit(1.0) for unit vectors — x/sqrt(1.0) is exact). */
case class CellAssignExpr(left: Expression, right: Expression, model: CellModel)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "cell_assign"

  override def nullSafeEval(v: Any, n: Any): Any =
    CellAssignExpr.best(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellModel", model, classOf[CellModel].getName)
    defineCodeGen(ctx, ev, (v, n) => s"graft.functions.CellAssignExpr.best($v, $n, $m)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CellAssignExpr =
    copy(left = newLeft, right = newRight)
}

object CellAssignExpr {
  /** Spark SQL's double ordering (SQLOrderingUtil): -0.0 == 0.0, NaN
    * greatest — the ordering `greatest` applies to the sim field. */
  private[functions] def cmp(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** Same contract as [[DotProductExpr.dot]] against a dense centroid:
    * min-length iteration, null vector elements contribute 0. */
  private def dotDense(v: ArrayData, c: Array[Double]): Double = {
    val n = math.min(v.numElements(), c.length)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) sum += v.getDouble(i) * c(i)
      i += 1
    }
    sum
  }

  private[functions] def sim(v: ArrayData, n: Double, m: CellModel, i: Int): Double =
    dotDense(v, m.cents(i)) / math.sqrt(n * m.norms(i))

  /** Shared by interpreted and generated paths. */
  def best(v: ArrayData, n: Double, m: CellModel): Int = {
    var bestIdx = 0
    var bestSim = sim(v, n, m, 0)
    var i = 1
    while (i < m.k) {
      val s = sim(v, n, m, i)
      if (cmp(s, bestSim) > 0) { bestSim = s; bestIdx = i }
      i += 1
    }
    bestIdx
  }

  /** Top-`nProbe` cell ids ordered (sim desc, index asc) — the order the
    * declarative `slice(reverse(array_sort(array(struct(sim, -i)…))), 1,
    * nProbe)` form produces. */
  def top(v: ArrayData, n: Double, m: CellModel, nProbe: Int): ArrayData = {
    val sims = Array.tabulate(m.k)(i => sim(v, n, m, i))
    val idx = Array.range(0, m.k)
    // Full index sort (k is model-scale; this runs per PROBE row only).
    val sorted = idx.sortWith { (a, b) =>
      val c = cmp(sims(a), sims(b))
      if (c != 0) c > 0 else a < b
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sorted.take(math.min(nProbe, m.k)))
  }

  def cellAssign(v: Column, norm: Column, model: CellModel): Column =
    GraftBridge.column(CellAssignExpr(
      GraftBridge.expression(v.cast("array<double>")),
      GraftBridge.expression(norm.cast("double")), model))
}

/** Top-`nProbe` nearest cells for the probe side of an IVF search — an
  * `array<int>` of cell ids ordered (sim desc, index asc). Same model
  * reference-object design as [[CellAssignExpr]]. */
case class CellTopExpr(left: Expression, right: Expression, model: CellModel,
                       nProbe: Int) extends BinaryExpression {
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "cell_top"

  override def nullSafeEval(v: Any, n: Any): Any =
    CellAssignExpr.top(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], model, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellModel", model, classOf[CellModel].getName)
    defineCodeGen(ctx, ev,
      (v, n) => s"graft.functions.CellAssignExpr.top($v, $n, $m, $nProbe)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CellTopExpr =
    copy(left = newLeft, right = newRight)
}

object CellTopExpr {
  def cellTop(v: Column, norm: Column, model: CellModel, nProbe: Int): Column =
    GraftBridge.column(CellTopExpr(
      GraftBridge.expression(v.cast("array<double>")),
      GraftBridge.expression(norm.cast("double")), model, nProbe))
}

/** Best cell plus the two leading centroid cosines in ONE pass over the
  * model — `array<double>` [bestIdx, simBest, simSecond] (second = the
  * max over the OTHER cells; ties follow [[CellAssignExpr.best]]'s
  * smallest-index convention, so bestIdx always matches a cell_assign
  * of the same model). The simplified-silhouette primitive: a/b derive
  * from these two cosines without a k-way explode (per-row cost O(k·d)
  * local arithmetic, zero fan-out — the CellAssignExpr economics).
  * Requires a model with k ≥ 2 (a second-best needs a second cell). */
case class CellTop2SimExpr(left: Expression, right: Expression, model: CellModel)
    extends BinaryExpression {
  require(model.k >= 2, s"CellTop2SimExpr needs k >= 2 cells, got ${model.k}")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "cell_top2_sim"

  override def nullSafeEval(v: Any, n: Any): Any =
    CellTop2SimExpr.top2(v.asInstanceOf[ArrayData], n.asInstanceOf[Double], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellModel", model, classOf[CellModel].getName)
    defineCodeGen(ctx, ev,
      (v, n) => s"graft.functions.CellTop2SimExpr.top2($v, $n, $m)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CellTop2SimExpr =
    copy(left = newLeft, right = newRight)
}

object CellTop2SimExpr {
  /** Shared by interpreted and generated paths; ordering and tie
    * conventions identical to [[CellAssignExpr.best]] (Spark double
    * ordering, first index wins a tie), second-best = the max over the
    * remaining cells under the same ordering. */
  def top2(v: ArrayData, n: Double, m: CellModel): ArrayData = {
    var bestIdx = 0
    var bestSim = CellAssignExpr.sim(v, n, m, 0)
    var secondSim = Double.NegativeInfinity
    var i = 1
    while (i < m.k) {
      val s = CellAssignExpr.sim(v, n, m, i)
      if (CellAssignExpr.cmp(s, bestSim) > 0) {
        // strictly better: the old best becomes the runner-up
        secondSim = bestSim; bestSim = s; bestIdx = i
      } else if (CellAssignExpr.cmp(s, secondSim) > 0) {
        // ties with best land HERE (first index keeps best), so an
        // exact-duplicate centroid yields second == best, as it should
        secondSim = s
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(bestIdx.toDouble, bestSim, secondSim))
  }

  def cellTop2Sim(v: Column, norm: Column, model: CellModel): Column =
    GraftBridge.column(CellTop2SimExpr(
      GraftBridge.expression(v.cast("array<double>")),
      GraftBridge.expression(norm.cast("double")), model))
}

/** Product-quantization codebook for [[PqEncodeExpr]]/[[PqLutExpr]]/
  * [[PqAdcPackedExpr]]: `m` subspaces × `ksub` codewords × `dsub`
  * components, flat-packed (codeword (j, ci) starts at ((j·ksub)+ci)·dsub)
  * plus precomputed self-norms. One REFERENCE OBJECT per plan (the
  * [[CellModel]] design): the previous declarative encoder inlined every
  * codeword as a typedLit into m·ksub generated `slice`+dot calls — a
  * ~1 MB task binary and 256 short-array allocations per corpus ROW. */
final case class PqCodebook(m: Int, ksub: Int, dsub: Int,
                            flat: Array[Double], norms: Array[Double])
    extends Serializable {
  require(m > 0 && ksub > 1 && dsub > 0, s"bad PQ shape ($m, $ksub, $dsub)")
  require(flat.length == m * ksub * dsub, "flat length != m*ksub*dsub")
  require(norms.length == m * ksub, "norms length != m*ksub")
  /** Bits per packed code id. The packed-long layout bounds m·bits to one
    * 64-bit word — at the default (16, 16) exactly 64. */
  val bits: Int = math.max(1,
    32 - Integer.numberOfLeadingZeros(ksub - 1))
  require(m * bits <= 64, s"m=$m codes of $bits bits exceed one long")
  val mask: Long = (1L << bits) - 1L
}

object PqCodebook {
  /** From per-subspace codeword matrices (codebooks(j)(ci) = components). */
  def apply(codebooks: Array[Array[Array[Double]]]): PqCodebook = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    val flat = codebooks.flatten.flatten
    val norms = codebooks.flatten.map(cw => cw.map(x => x * x).sum)
    PqCodebook(m, ksub, dsub, flat, norms)
  }
}

/** PQ-encode a vector to one packed 64-bit code word: per subspace j, the
  * L2-nearest codeword id (argmin ‖sub_j − cw‖² = argmax dot − ‖cw‖²/2,
  * ties to the SMALLEST id — the greatest-of-(score, −ci)-structs order
  * of the declarative form this replaces), packed at bit offset j·bits.
  * Null vector ELEMENTS contribute 0 to the dot ([[DotProductExpr]]'s
  * lenient rule); a short vector reads missing components as 0. */
case class PqEncodeExpr(child: Expression, book: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    PqEncodeExpr.encode(v.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBook", book, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, v => s"graft.functions.PqEncodeExpr.encode($v, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Shared by interpreted and generated paths. */
  def encode(v: ArrayData, book: PqCodebook): Long = {
    val n = v.numElements()
    var packed = 0L
    var j = 0
    while (j < book.m) {
      val base = j * book.dsub
      var bestCi = 0
      var bestScore = Double.NegativeInfinity
      var ci = 0
      while (ci < book.ksub) {
        val off = (j * book.ksub + ci) * book.dsub
        var dot = 0.0
        var t = 0
        while (t < book.dsub) {
          val vi = base + t
          if (vi < n && !v.isNullAt(vi)) dot += v.getDouble(vi) * book.flat(off + t)
          t += 1
        }
        val score = dot - book.norms(j * book.ksub + ci) / 2
        // Spark double ordering on the struct max: strictly-greater wins,
        // equal keeps the earlier (smaller) id. NaN is MAX in that order,
        // so a NaN score must also win over a non-NaN best.
        if (score > bestScore || (score.isNaN && !bestScore.isNaN)) {
          bestScore = score; bestCi = ci
        }
        ci += 1
      }
      packed |= bestCi.toLong << (j * book.bits)
      j += 1
    }
    packed
  }

  def pqEncode(v: Column, book: PqCodebook): Column =
    GraftBridge.column(PqEncodeExpr(
      GraftBridge.expression(v.cast("array<double>")), book))
}

/** The probe-side ADC lookup table lut[j·ksub+ci] = dot(q_j, codeword) as
  * one native loop over the codebook reference object — replaces m·ksub
  * generated slice+dot calls per probe row. */
case class PqLutExpr(child: Expression, book: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(v: Any): Any =
    PqLutExpr.lut(v.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBook", book, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, v => s"graft.functions.PqLutExpr.lut($v, $b)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

object PqLutExpr {
  /** Shared by interpreted and generated paths; null elements / short
    * vectors contribute 0 like [[PqEncodeExpr.encode]]. */
  def lut(v: ArrayData, book: PqCodebook): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](book.m * book.ksub)
    var j = 0
    while (j < book.m) {
      val base = j * book.dsub
      var ci = 0
      while (ci < book.ksub) {
        val idx = j * book.ksub + ci
        val off = idx * book.dsub
        var dot = 0.0
        var t = 0
        while (t < book.dsub) {
          val vi = base + t
          if (vi < n && !v.isNullAt(vi)) dot += v.getDouble(vi) * book.flat(off + t)
          t += 1
        }
        out(idx) = dot
        ci += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def pqLut(v: Column, book: PqCodebook): Column =
    GraftBridge.column(PqLutExpr(
      GraftBridge.expression(v.cast("array<double>")), book))
}

/** ADC score of one PACKED code word against a probe LUT:
  * Σ_j lut[j·ksub + ((codes >> j·bits) & mask)] — the classic array-form
  * ADC sum, but with the candidate's m codeword ids carried in ONE long
  * instead of an array<int> (28-byte encoded rows; no per-row array reads
  * on the 10⁸-pair ADC join; an array-form expression was never kept).
  * Null LUT elements / OOB indices null the sum. */
case class PqAdcPackedExpr(left: Expression, right: Expression,
                           m: Int, ksub: Int, bits: Int)
    extends BinaryExpression {
  require(m > 0 && ksub > 1 && bits > 0 && m * bits <= 64, "bad packed shape")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_packed"
  // null is reachable from non-nullable children (the OOB guard above),
  // so ev.isNull must be a variable, not the literal `false`.
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcPackedExpr.adc(codes.asInstanceOf[Long], lut.asInstanceOf[ArrayData],
      m, ksub, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("adcBoxed")
    nullSafeCodeGen(ctx, ev, (codes, lut) => s"""
      java.lang.Double $boxed = graft.functions.PqAdcPackedExpr.adc($codes, $lut, $m, $ksub, $bits);
      if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcPackedExpr =
    copy(left = newLeft, right = newRight)
}

object PqAdcPackedExpr {
  /** Shared by interpreted and generated paths. */
  def adc(codes: Long, lut: ArrayData, m: Int, ksub: Int, bits: Int): java.lang.Double = {
    val lutLen = lut.numElements()
    val mask = (1L << bits) - 1L
    var sum = 0.0
    var j = 0
    while (j < m) {
      val ci = ((codes >>> (j * bits)) & mask).toInt
      val idx = j * ksub + ci
      if (idx >= lutLen || lut.isNullAt(idx)) return null
      sum += lut.getDouble(idx)
      j += 1
    }
    sum
  }

  def pqAdcPacked(codes: Column, lut: Column, book: PqCodebook): Column =
    GraftBridge.column(PqAdcPackedExpr(
      GraftBridge.expression(codes.cast("long")),
      GraftBridge.expression(lut.cast("array<double>")),
      book.m, book.ksub, book.bits))
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

  /** Cast to array<double> like the SQL registration (see
    * [[LshBucketExpr.lshBucket]] — float[] input would misread). */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProductExpr(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
}
