package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.script.HiveToSnowflakeConverter

/** Property-based invariants for the driver-side/deterministic pieces
  * (pure functions — no Spark session needed, so these run fast and wide).
  * Generators are driven with fixed seeds (no scalatest-scalacheck bridge
  * in the offline cache), so runs are reproducible. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    (0 until 100).foreach { i =>
      for {
        a <- g1.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- g2.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
        c <- g3.apply(Gen.Parameters.default, Seed(i.toLong + 2000))
      } f(a, b, c)
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("BoundedMinK equals sort-take-K under arbitrary splits and merges") {
    import graft.functions.{BoundedMinLongs, BoundedMinStrings}
    val xsGen = Gen.listOf(Gen.chooseNum(-50L, 50L)) // narrow range → duplicates
    val kGen = Gen.chooseNum(1, 12)
    val cutGen = Gen.chooseNum(0, 100)
    forAll(xsGen, kGen, cutGen) { (xs, k, cutPct) =>
      val cut = xs.length * cutPct / 100
      val (a, b) = xs.splitAt(cut)
      def run(distinct: Boolean): List[Long] = {
        val agg = new BoundedMinLongs(k, distinct)
        val bufA = a.foldLeft(agg.zero)((buf, v) => agg.reduce(buf, v))
        val bufB = b.foldLeft(agg.zero)((buf, v) => agg.reduce(buf, v))
        agg.finish(agg.merge(bufA, bufB)).toList
      }
      assert(run(distinct = false) == xs.sorted.take(k))
      assert(run(distinct = true) == xs.distinct.sorted.take(k))
      val sAgg = new BoundedMinStrings(k, false)
      val strs = xs.map(_.toString)
      val got = strs.foldLeft(sAgg.zero)((buf, v) => sAgg.reduce(buf, v)).toList
      assert(got == strs.sorted.take(k))
      // nulls are skipped, never inserted
      assert(sAgg.reduce(sAgg.zero, null).isEmpty)
      // Doubles: same split+merge shape as the longs, plus NaN (sorts
      // last, like Spark/DuckDB), -0.0 canonicalization, and distinct.
      val ds = xs.map(_.toDouble / 4.0) ++
        (if (xs.nonEmpty) Seq(Double.NaN, -0.0d, 0.0d) else Nil)
      def runD(distinct: Boolean): List[Double] = {
        val agg = new graft.functions.BoundedMinDoubles(k, distinct)
        val (da, db) = ds.splitAt(cut)
        val bufA = da.foldLeft(agg.zero)((buf, v) => agg.reduce(buf, v))
        val bufB = db.foldLeft(agg.zero)((buf, v) => agg.reduce(buf, v))
        agg.finish(agg.merge(bufA, bufB)).toList
      }
      val canon = ds.map(v => if (v == 0.0d) 0.0d else v)
      def sortD(vs: List[Double]) = vs.sortWith { (a, b) =>
        java.lang.Double.compare(a, b) < 0 } // NaN last, like Spark
      assert(runD(distinct = false).map(java.lang.Double.doubleToLongBits) ==
        sortD(canon.toList).take(k).map(java.lang.Double.doubleToLongBits))
      assert(runD(distinct = true).map(java.lang.Double.doubleToLongBits) ==
        sortD(canon.distinct.toList).take(k).map(java.lang.Double.doubleToLongBits))
    }
  }

  test("converter is idempotent on already-converted function renames") {
    forAll(word) { w =>
      val once = HiveToSnowflakeConverter.convert(s"SELECT LOWER($w), position('a', $w)")
      assert(HiveToSnowflakeConverter.convert(once) == once)
    }
  }

  test("converter never touches comment lines") {
    forAll(text) { t =>
      val comment = s"-- $t \"quoted\" IF( hash( udm_customer"
      val out = HiveToSnowflakeConverter.convert(s"$comment\nSELECT 1")
      assert(out.startsWith(comment))
    }
  }

  test("decode stub is pure and histogram-normalized for any payload") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      val (c1, f1) = Multimodal.decodeStub(arr)
      val (c2, f2) = Multimodal.decodeStub(arr)
      assert(c1 == c2 && f1.toSeq == f2.toSeq)
      if (arr.nonEmpty) assert(math.abs(f1.sum - 1.0f) < 1e-4)
    }
  }

  test("CollectMaxOne buffer merge is commutative and associative") {
    val agg = {
      import org.apache.spark.sql.Encoders
      implicit val bufEnc = Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong, Encoders.STRING)
      new graft.functions.CollectMaxOne[String]()(Ordering[String], bufEnc, Encoders.STRING)
    }
    val buf = for {
      seen <- Gen.oneOf(true, false)
      r <- Gen.choose(-100L, 100L)
      v <- word
    } yield if (seen) (true, r, v) else agg.zero
    forAll(buf, buf, buf) { (a, b, c) =>
      assert(agg.merge(a, b) == agg.merge(b, a))
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
    }
  }

  test("script expander leaves scripts without patterns untouched") {
    val catalog = graft.script.SchemaCatalog.inMemory(
      "t" -> Seq(graft.script.ColumnMeta("A", 2, primaryKey = false)))
    val exp = new graft.script.ScriptExpander(catalog)
    forAll(text) { t =>
      if (!t.contains("${")) assert(exp.expand(t) == t)
    }
  }
}
