package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PqAdcPackedExpr, PqCodebook, PqEncodeExpr, PqLutExpr}
import graft.operators.Similarity

/** Direct specs for the native PQ expression trio. Every other native
  * expression (ShinglesExpr, MinHashSigExpr, TokenCountExprs,
  * DotProductExpr) carries a bit-parity spec against a declarative or
  * test-side twin; until this file the trio was covered only transitively
  * through SimilaritySpec's recall floor — which cannot distinguish a
  * wrong tie rule or a shifted bit layout from ordinary quantization
  * loss. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // m=2 subspaces × ksub=4 codewords × dsub=2 components → bits=2, and the
  // packed word is ci0 | ci1<<2 — small enough to hand-verify every lane.
  private val book = PqCodebook(Array(
    Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0), Array(0.0, -1.0)),
    Array(Array(1.0, 1.0), Array(2.0, 2.0), Array(3.0, 3.0), Array(4.0, 4.0))))

  private def litArr(xs: Seq[java.lang.Double]): Literal =
    Literal.create(xs, ArrayType(DoubleType))

  test("pqEncode packed bit layout: argmax(dot - norm/2) per subspace at offset j*bits") {
    assert(book.bits == 2 && book.mask == 3L)
    // subspace 0 of [0.9, 0.1]: scores 0.4, -0.4, -1.4, -0.6 → ci=0.
    // subspace 1 of [2.1, 2.1]: scores 3.2, 4.4, 3.6, 0.8 → ci=1.
    val v = Seq[java.lang.Double](0.9, 0.1, 2.1, 2.1)
    val interpreted = PqEncodeExpr(litArr(v), book).eval(null)
    assert(interpreted == (0L | (1L << 2)))
    // flipped preferences land in the other lanes: sub0 → ci=2 (dot with
    // [-1,0] wins), sub1 → ci=3.
    val v2 = Seq[java.lang.Double](-5.0, 0.0, 4.1, 4.1)
    assert(PqEncodeExpr(litArr(v2), book).eval(null) ==
      (2L | (3L << 2)))
  }

  test("pqEncode tie and NaN rules: equal scores keep the smaller id, NaN wins and sticks") {
    // Duplicate codewords: identical scores must keep the EARLIER id (the
    // greatest-of-(score, -ci)-structs order of the declarative form the
    // expression replaced).
    val tied = PqCodebook(Array(
      Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))))
    assert(PqEncodeExpr(litArr(Seq(1.0, 0.0).map(Double.box)), tied).eval(null) == 0L)
    // A NaN-scored codeword must WIN over any non-NaN best (Spark double
    // ordering: NaN is MAX) and must not be displaced by a later finite
    // score.
    val nanBook = PqCodebook(Array(
      Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(Double.NaN, 0.0), Array(9.0, 9.0))))
    assert(PqEncodeExpr(litArr(Seq(1.0, 1.0).map(Double.box)), nanBook).eval(null) == 2L)
  }

  test("pqEncode lenient element rules: null elements and short vectors read as 0") {
    // null second component: dots see [0.9, 0] → sub0 still picks ci=0.
    val withNull = Seq[java.lang.Double](0.9, null, 2.1, 2.1)
    assert(PqEncodeExpr(litArr(withNull), book).eval(null) == (0L | (1L << 2)))
    // short vector: subspace 1 reads [0, 0]; every dot is 0 so scores are
    // -norm/2 and the smallest norm wins — cw0 of subspace 1 ([1,1], norm 2)
    // beats cw1..3 (norms 8, 18, 32).
    val short = Seq[java.lang.Double](0.9, 0.1)
    assert(PqEncodeExpr(litArr(short), book).eval(null) == 0L)
  }

  test("pqLut equals the naive per-codeword dot table, row-major j*ksub+ci") {
    val q = Array(0.3, -0.7, 1.5, 0.25)
    val got = PqLutExpr(litArr(q.toSeq.map(Double.box)), book).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    assert(got.length == book.m * book.ksub)
    for (j <- 0 until book.m; ci <- 0 until book.ksub) {
      val off = (j * book.ksub + ci) * book.dsub
      val naive = (0 until book.dsub)
        .map(t => q(j * book.dsub + t) * book.flat(off + t)).sum
      assert(math.abs(got(j * book.ksub + ci) - naive) < 1e-15,
        s"lut($j, $ci)")
    }
  }

  test("pqAdcPacked equals the unpacked element_at sum; OOB and null lut entries null the score") {
    // Random-ish codes/luts in a DataFrame so the generated code runs.
    val rows = Seq(
      (1L, (0L | (1L << 2)), (1 to 8).map(_.toDouble)),
      (2L, (3L | (3L << 2)), (1 to 8).map(i => i * 0.5)),
      (3L, (2L | (0L << 2)), (1 to 8).map(i => -i.toDouble)))
    val df = rows.toDF("id", "codes", "lut")
    // Declarative twin: Σ_j element_at(lut, j*ksub + ((codes >> j*bits) & mask) + 1)
    val twin = (0 until book.m).map { j =>
      element_at($"lut",
        (shiftright($"codes", j * book.bits).bitwiseAND(book.mask) +
          lit(j * book.ksub) + lit(1)).cast("int"))
    }.reduce(_ + _)
    val cmp = df.select(
      PqAdcPackedExpr.pqAdcPacked($"codes", $"lut", book).as("native"),
      twin.as("twin")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // OOB: a 4-entry lut cannot serve subspace 1 (indices 4..7) → null.
    val oob = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0))).toDF("codes", "lut")
      .select(PqAdcPackedExpr.pqAdcPacked($"codes", $"lut", book).as("s")).head()
    assert(oob.isNullAt(0))
    // Null lut entry at the indexed position → null, under codegen too.
    val withNull = Seq((0L, Seq[java.lang.Double](null, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)))
      .toDF("codes", "lut")
      .select(PqAdcPackedExpr.pqAdcPacked($"codes", $"lut", book).as("s")).head()
    assert(withNull.isNullAt(0))
  }

  test("interpreted eval == codegen output for all three PQ expressions") {
    // The DotProductExpr precedent: the Literal .eval path above exercises
    // nullSafeEval; a DataFrame select runs whole-stage-generated code.
    // Both must agree bit-for-bit on the same inputs.
    val vecs = Seq(
      (1L, Seq(0.9, 0.1, 2.1, 2.1)),
      (2L, Seq(-5.0, 0.0, 4.1, 4.1)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0)),
      (4L, Seq(1.25, -3.5, 0.125, 7.75)))
    val df = vecs.toDF("id", "v")
    val gen = df.select($"id",
        PqEncodeExpr.pqEncode($"v", book).as("codes"),
        PqLutExpr.pqLut($"v", book).as("lut"))
      .withColumn("adc", PqAdcPackedExpr.pqAdcPacked($"codes", $"lut", book))
      .orderBy($"id").collect()
    vecs.zip(gen).foreach { case ((_, v), row) =>
      val lit = litArr(v.map(Double.box))
      val eCodes = PqEncodeExpr(lit, book).eval(null).asInstanceOf[Long]
      val eLut = PqLutExpr(lit, book).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
      assert(row.getLong(1) == eCodes)
      assert(row.getSeq[Double](2) == eLut.toSeq)
      val eAdc = PqAdcPackedExpr.adc(eCodes,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(eLut),
        book.m, book.ksub, book.bits)
      assert(row.getDouble(3) == eAdc.doubleValue())
    }
  }

  test("ivfPqTopK rejects (m, ksub) shapes that exceed the packed 64-bit layout, naming the params") {
    val v = Seq((1L, Array.fill(32)(1.0f)), (2L, Array.fill(32)(0.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(v, v, k = 1, m = 16, ksub = 256)
    }
    assert(e.getMessage.contains("m=16") && e.getMessage.contains("ksub=256"))
  }
}
