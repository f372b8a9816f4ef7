package graft

import org.apache.spark.sql.functions._

import graft.functions.{UnigramModel, UnigramSegmentExpr}
import graft.operators.{Bpe, Unigram}

/** LAB: hard-EM (the shipped trainer's 1-best Viterbi counts) vs FULL
  * soft-EM (forward–backward expected counts — Kudo 2018's actual
  * E-step) for the unigram-LM tokenizer, on the same corpus with the
  * IDENTICAL seed vocabulary, round schedule, and pruning rule. The
  * shipped fixed point is spec-pinned as the engine's contract; this
  * lab MEASURES what the hard-EM simplification costs instead of just
  * documenting it: vocabulary agreement, corpus compression
  * (chars/piece), and held-in log-likelihood under each model.
  *
  * Scale note, stated plainly: the soft E-step here runs DRIVER-SIDE
  * over the collected (token, n) word-frequency table — a BOUNDED
  * LAB-ONLY collect (distinct normalized words; megabytes at lab
  * scales), with UNQUANTIZED double expectations (the paper's exact
  * estimator, the lab's ground truth). The PRODUCTION soft-EM this lab
  * priced now ships as `Unigram.fit(softEm = true)`: the
  * forward–backward pushed into a native expression
  * ([[graft.functions.UnigramExpectExpr]]) — same lattice, expected
  * counts instead of argmax — with per-(word, piece) micro-quantized
  * longs so the distributed count sum is exact and
  * partition-order-free. Hard-EM stays the query surface's contract
  * (it maximizes exactly the Viterbi likelihood the encoder uses, and
  * measured better LL/word here); the lab stays as the unquantized
  * reference pricing that decision.
  *
  * Output: one JSON line (and a file, default UNIGRAM_LAB.json) with
  * both models' stats. Usage:
  *   tools/run_main.sh graft.UnigramLab <sfDir> [outPath]
  */
object UnigramLab {

  /** Forward–backward expected piece counts over one word's lattice.
    * Probabilities are exp(micro/1e6) — the frozen scores' continuous
    * twin; unknown single code points price at the UNK floor so every
    * word stays coverable (alpha(n) > 0). */
  private def accumulate(acc: scala.collection.mutable.HashMap[String, Double],
                         w: String, n: Long, model: UnigramModel): Unit = {
    if (w.isEmpty) return
    val cp = w.codePointCount(0, w.length)
    val bounds = new Array[Int](cp + 1)
    var i = 0; var ci = 0
    while (i < w.length) {
      bounds(ci) = i; ci += 1; i += Character.charCount(w.codePointAt(i))
    }
    bounds(cp) = w.length
    def price(b: Int, e: Int): Double = {
      val piece = w.substring(bounds(b), bounds(e))
      model.table.get(piece) match {
        case null =>
          if (e - b == 1) StrictMath.exp(model.unkMicro / 1e6) else 0.0
        case v => StrictMath.exp(v.longValue() / 1e6)
      }
    }
    val maxL = model.maxPieceLen
    val alpha = new Array[Double](cp + 1)
    alpha(0) = 1.0
    var e = 1
    while (e <= cp) {
      var b = math.max(0, e - maxL)
      var s = 0.0
      while (b < e) { s += alpha(b) * price(b, e); b += 1 }
      alpha(e) = s
      e += 1
    }
    if (alpha(cp) <= 0.0) return
    val beta = new Array[Double](cp + 1)
    beta(cp) = 1.0
    var b2 = cp - 1
    while (b2 >= 0) {
      var ee = b2 + 1
      var s = 0.0
      val lim = math.min(cp, b2 + maxL)
      while (ee <= lim) { s += price(b2, ee) * beta(ee); ee += 1 }
      beta(b2) = s
      b2 -= 1
    }
    val z = alpha(cp)
    var bb = 0
    while (bb < cp) {
      var ee = bb + 1
      val lim = math.min(cp, bb + maxL)
      while (ee <= lim) {
        val p = price(bb, ee)
        if (p > 0.0) {
          val post = alpha(bb) * p * beta(ee) / z
          if (post > 0.0) {
            val piece = w.substring(bounds(bb), bounds(ee))
            acc.update(piece, acc.getOrElse(piece, 0.0) + n.toDouble * post)
          }
        }
        ee += 1
      }
      bb += 1
    }
  }

  /** The soft-EM twin of [[Unigram.fit]]: identical seed, round
    * schedule, prune targets, and freeze — only the E-step differs
    * (expected counts over the full lattice instead of 1-best). */
  private def softFit(words: Array[(String, Long)],
                      wordsDf: org.apache.spark.sql.DataFrame,
                      vocabSize: Int, rounds: Int, maxPieceLen: Int,
                      seedSize: Int, minCount: Long,
                      unkMicro: Long): UnigramModel = {
    val (singles, multiTop) =
      Unigram.seedVocab(wordsDf, maxPieceLen, seedSize, minCount)
    def freeze(counts: Seq[(String, Double)]): UnigramModel = {
      val total = math.max(counts.map(_._2).sum, 1e-12)
      UnigramModel(counts.map { case (p, c) =>
        val micro =
          if (c <= 0.0) unkMicro
          else math.round(StrictMath.log(c / total) * 1e6)
        (p, micro)
      }, unkMicro)
    }
    var model = freeze(
      (singles ++ multiTop).distinct.map { case (p, c) => (p, c.toDouble) })
    val singleSet = singles.map(_._1).toSet
    var r = 1
    while (r <= rounds) {
      val acc = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, n) => accumulate(acc, w, n, model) }
      val multis = model.pieces.iterator.filter(p => !Unigram.isSingle(p))
        .map(p => (p, acc.getOrElse(p, 0.0)))
        .filter { case (_, c) => c >= minCount.toDouble }
        .toSeq.sortBy { case (p, c) => (-c, p) }
      val targetMulti =
        if (r == rounds) math.max(0, vocabSize - singleSet.size)
        else math.max(math.max(0, vocabSize - singleSet.size),
          multis.length * 3 / 4)
      val keptMulti = multis.take(targetMulti)
      val keptSingles = singleSet.toSeq.sorted
        .map(p => (p, acc.getOrElse(p, 0.0)))
      model = freeze(keptSingles ++ keptMulti)
      r += 1
    }
    model
  }

  /** Corpus stats under a model, off the collected word table: total
    * words, chars, 1-best pieces, and the total Viterbi log-likelihood
    * (micro-score sum of the 1-best path — the quantity hard-EM
    * maximizes; reported for both so the comparison is symmetric). */
  private def stats(words: Array[(String, Long)],
                    model: UnigramModel): (Long, Long, Long, Double) = {
    var nW = 0L; var nC = 0L; var nP = 0L; var ll = 0.0
    words.foreach { case (w, n) =>
      val pieces = UnigramSegmentExpr.segmentPieces(w, model)
      val score = pieces.iterator.map(p => model.table.get(p) match {
        case null => model.unkMicro
        case v => v.longValue()
      }).sum
      nW += n
      nC += n * w.codePointCount(0, w.length).toLong
      nP += n * pieces.length.toLong
      ll += n.toDouble * (score / 1e6)
    }
    (nW, nC, nP, ll)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "UNIGRAM_LAB.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val (vocabSize, rounds, maxPieceLen, seedSize) = (200, 2, 5, 2000)
    val wordsDf = Bpe.wordFreq(d, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val words = wordsDf.orderBy(col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val t0 = System.nanoTime()
    val hard = Unigram.fit(d, "text", vocabSize, rounds, maxPieceLen, seedSize)
    val hardSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val soft = softFit(words, wordsDf, vocabSize, rounds, maxPieceLen,
      seedSize, minCount = 2L, unkMicro = -100000000L)
    val softSec = (System.nanoTime() - t1) / 1e9
    wordsDf.unpersist()

    val hSet = hard.pieces.toSet
    val sSet = soft.pieces.toSet
    val overlap = (hSet & sSet).size.toDouble / (hSet | sSet).size.toDouble
    val (nW, nC, hP, hLL) = stats(words, hard)
    val (_, _, sP, sLL) = stats(words, soft)
    def f(x: Double) = "%.6f".format(x)
    val json =
      s"""{"metric":"unigram_hard_vs_soft_em","sf":"${JsonUtil.esc(sfDir)}",""" +
      s""""vocab_size":$vocabSize,"rounds":$rounds,""" +
      s""""vocab_jaccard":${f(overlap)},""" +
      s""""shared_pieces":${(hSet & sSet).size},""" +
      s""""hard_only":${(hSet -- sSet).size},"soft_only":${(sSet -- hSet).size},""" +
      s""""n_words":$nW,"n_chars":$nC,""" +
      s""""hard":{"pieces":$hP,"chars_per_piece":${f(nC.toDouble / hP)},""" +
      s""""viterbi_ll_per_word":${f(hLL / nW)},"fit_sec":${f(hardSec)}},""" +
      s""""soft":{"pieces":$sP,"chars_per_piece":${f(nC.toDouble / sP)},""" +
      s""""viterbi_ll_per_word":${f(sLL / nW)},"fit_sec":${f(softSec)}}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
