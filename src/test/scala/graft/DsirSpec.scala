package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Vocab

/** DSIR (Xie et al. 2023) — the bigram feature lane and the end-to-end
  * importance-resampling selection (SURVEY.md §2 rows q_dsir_weights_bigram
  * and q_dsir_select). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exp lattice: every importance constant is ≥1e-4 from a rounding boundary") {
    // dsirSelect evaluates exp() only on the 193 lattice points q/8,
    // q ∈ [-96, 96]; cross-engine hash parity holds iff no scaled
    // constant sits close enough to a half-integer for a 1-ulp libm
    // disagreement to flip round(). Pin both the absolute margin and a
    // 1000-ulp relative one (libm implementations agree within ~1 ulp).
    (-96 to 96).foreach { q =>
      val v = math.exp(q / 8.0) * 1e6
      val dist = math.abs(v - math.floor(v) - 0.5)
      assert(dist >= 1e-4, s"lattice point q=$q: |frac-0.5|=$dist < 1e-4")
      assert(dist >= 1000 * math.ulp(v),
        s"lattice point q=$q: margin $dist under 1000 ulps (${math.ulp(v)})")
    }
  }

  test("bigram lane separates ordered from scrambled target text where unigrams tie") {
    // Target docs (ids % 7 == 0) are ORDERED sentences; the raw pool
    // holds one ordered copy and one scrambled permutation of the SAME
    // token multiset, plus off-vocabulary background mass. Unigram
    // buckets see identical bags -> identical logweight; bigram buckets
    // price adjacency -> the ordered doc must win.
    val docs = Seq(
      (0L, "aa bb cc dd ee"), (7L, "aa bb cc dd ee"),   // target, ordered
      (1L, "aa bb cc dd ee"),                           // raw, ordered
      (2L, "ee cc aa dd bb"),                           // raw, scrambled
      (3L, "mm nn oo pp qq"), (4L, "qq pp oo nn mm")    // background pool
    ).toDF("doc_id", "text")
    def lw(ngrams: Int): Map[Long, Double] =
      Vocab.dsirWeights(docs, "doc_id", "text",
          isTarget = $"doc_id" % 7 === 0, numBuckets = 1024, ngrams = ngrams)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("logweight")).toMap
    val uni = lw(1)
    assert(uni(1L) == uni(2L), "unigram DSIR must tie the permutations")
    val bi = lw(2)
    assert(bi(1L) > bi(2L),
      s"bigram DSIR must separate ordered (${bi(1L)}) from scrambled (${bi(2L)})")
    // and the feature count doubles minus one: 5 tokens -> 9 features
    val n = Vocab.dsirWeights(docs, "doc_id", "text",
        isTarget = $"doc_id" % 7 === 0, numBuckets = 1024, ngrams = 2)
      .filter($"doc_id" === 1L).head().getAs[Long]("n_tokens")
    assert(n == 9L)
  }

  test("dsirSelect: Σ n_copies = k, importance matches the lattice formula, heavy doc guaranteed in") {
    val docs = Seq(
      (0L, "zq zq wx wx zq"), (7L, "zq wx zq wx"),      // target
      (1L, "zq wx zq"),                                 // raw, target-like
      (2L, "mm nn mm nn mm"), (3L, "nn mm nn"),         // raw, pool-typical
      (5L, "zq zq wx wx zq wx zq")                      // raw, very target-like
    ).toDF("doc_id", "text")
    val k = 10L
    val sel = Vocab.dsirSelect(docs, "doc_id", "text",
      isTarget = $"doc_id" % 7 === 0, k = k, numBuckets = 64)
    val rows = sel.collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum == k,
      "systematic draw must hit the slot budget exactly")
    // importance recomputed in the JVM from the reported logweight must
    // match the column (the lattice formula is the whole contract)
    rows.foreach { r =>
      val q = math.min(math.max(math.round(r.getAs[Double]("logweight") * 8)
        .toDouble, -96.0), 96.0)
      assert(r.getAs[Long]("importance") ==
        math.round(math.exp(q / 8.0) * 1e6))
    }
    // every doc holding more than W/k of the importance mass is
    // guaranteed selected (the PPS inclusion contract); compute the
    // mass from the weights side
    val w = Vocab.dsirWeights(docs, "doc_id", "text",
        isTarget = $"doc_id" % 7 === 0, numBuckets = 64)
      .collect().map { r =>
        val q = math.min(math.max(math.round(r.getAs[Double]("logweight") * 8)
          .toDouble, -96.0), 96.0)
        r.getLong(0) -> math.round(math.exp(q / 8.0) * 1e6)
      }.toMap
    val total = w.values.sum
    val selected = rows.map(_.getLong(0)).toSet
    w.collect { case (id, imp) if imp > total / k => id }.foreach(id =>
      assert(selected.contains(id), s"heavy doc $id must be drawn"))
    // target-likeness orders importance: the very-target-like raw doc
    // out-weighs the pool-typical ones
    assert(w(5L) > w(2L) && w(5L) > w(3L))
  }
}
