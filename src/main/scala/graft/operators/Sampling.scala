package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and train/valid/test splitting for training-data
  * pipelines.
  *
  * Assignment is a pure per-row projection over a salted content hash —
  * no shuffle, no RNG state, no `rand()` (whose per-task seeding makes
  * reruns and engine ports disagree). The same (salt, id) lands in the
  * same split on every run, on every engine with an md5 function, and
  * after any repartitioning — the property training pipelines need so a
  * re-run of a 100 TB split job is a no-op diff, and eval rows can be
  * PROVEN disjoint from train rows years later from the id alone.
  *
  * The rank is the first 8 hex chars of `md5(salt ':' id)` compared as a
  * STRING against quantized thresholds (frac · 2^32 rendered as 8 hex
  * digits): lowercase-hex string order equals numeric order, so the
  * split is exactly reproducible in any SQL engine without hex→int
  * casts (which are not portable). Quantization error is ≤ 2^-32 per
  * boundary.
  */
object Sampling {

  /** 8-hex-char uniform rank in [0, 2^32) for (salt, id) — the portable
    * random variate every operator here derives from. Use integral or
    * string ids: the hash keys on the STRING RENDERING, and float/
    * timestamp renderings differ across engines (Spark "1.0E10" vs SQL
    * "10000000000"), which would silently break cross-engine parity. */
  def hashRankHex(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8)

  /** `frac` as the 8-hex-digit threshold hashRankHex is compared to. */
  private[graft] def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction out of [0,1]: $frac")
    // 2^32 exactly. frac=1.0 must be a STRING upper bound for every hex
    // rank: 'g' > 'f' ≥ any rank char, so "g0000000" keeps everything.
    // (A numeric-looking "100000000" would NOT: '1' < 'a' in string
    // order, so ranks starting a-f would wrongly drop.)
    val q = math.round(frac * 4294967296.0)
    if (q >= 4294967296L) "g0000000" else f"$q%08x"
  }

  /** [[thresholdHex]] as a COLUMN over a fraction computed in-engine —
    * for data-dependent fractions (see [[mixtureRebalance]]) that a SQL
    * twin must reproduce without Scala in the loop. floor(x + 0.5) is
    * math.round's exact contract, spelled out because SQL round()
    * half-rounding conventions differ across engines while floor does
    * not; the ≥ 2^32 guard is the same string-endpoint rule ("g0000000")
    * thresholdHex applies — lpad would TRUNCATE a 9-digit hex back into
    * range and silently drop ~60% of rows. Fractions > 1 (e.g. by a
    * float ulp on the binding stratum, where w·B/t reassociates t/w·w)
    * land in the guard and keep everything, which is the intent. */
  private[graft] def thresholdHexCol(frac: Column): Column = {
    val q = floor(frac * lit(4294967296.0) + lit(0.5)).cast("long")
    when(q >= 4294967296L, lit("g0000000"))
      .otherwise(lpad(lower(hex(q)), 8, "0"))
  }

  /** Rebalance the corpus to target per-stratum token SHARES at the
    * largest achievable size: budget B = min over targets of
    * tokens_s / w_s, keep fraction frac_s = w_s · B / tokens_s (exactly
    * 1 for the binding stratum — the scarce stratum is kept whole and
    * everything else downsamples to match, the standard pre-training
    * mixture construction). Rows are kept via the same salted rank as
    * [[hashSample]]/[[stratifiedSample]], so rebalanced subsets nest
    * across reruns and compose with splits.
    *
    * Strata outside `targets` (including NULL) are DROPPED — they have
    * target share zero. A target stratum with no tokens makes the
    * mixture unachievable at any size: B = 0 and the result is empty
    * (strict by design — silently renormalizing over the remaining
    * strata would ship a corpus with the wrong mixture).
    *
    * Scale shape: one column-pruned scan aggregates per-stratum token
    * counts (map-side partials; ≤ |strata| rows out), the budget is an
    * unpartitioned window over those MODEL-SIZED rows, and the keep
    * filter is a broadcast join of the tiny per-stratum threshold table
    * back onto the corpus scan — the corpus itself never shuffles.
    * Everything (counts → budget → fraction → quantized hex threshold →
    * md5 rank compare) is computed IN-ENGINE from add/mul/div and
    * floor — IEEE correctly-rounded everywhere — so a SQL twin
    * reproduces the row set bit-for-bit. */
  def mixtureRebalance(df: DataFrame, idCol: String, strataCol: String,
                       tokensCol: Column, targets: Seq[(String, Double)],
                       salt: String = "graft"): DataFrame = {
    require(targets.nonEmpty, "at least one target stratum")
    require(targets.map(_._1).distinct.length == targets.length,
      s"duplicate target stratum in ${targets.map(_._1)}")
    targets.foreach { case (s, w) =>
      require(w > 0, s"target weight for '$s' must be > 0, got $w") }
    val wsum = targets.map(_._2).sum
    require(math.abs(wsum - 1.0) < 1e-9, s"target weights must sum to 1, got $wsum")
    Seq("__w", "__t", "__b", "__thr").foreach(c =>
      require(!df.columns.contains(c), s"column $c collides with a rebalance internal"))
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toDF(strataCol, "__w")
    // LEFT join from targets: a target stratum absent from the corpus
    // must still contribute tokens=0 to the budget min (see scaladoc).
    val counts = broadcast(tgt)
      .join(df.groupBy(col(strataCol))
          .agg(sum(tokensCol.cast("long")).as("__t")),
        Seq(strataCol), "left")
      .withColumn("__t", coalesce(col("__t"), lit(0L)))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val thresholds = counts
      .withColumn("__b", min(col("__t").cast("double") / col("__w")).over(wAll))
      // Zero-token stratum: keep fraction 0 by definition (and ANSI mode
      // would throw on the 0-divisor double division; B is already 0 so
      // the whole result is empty either way).
      .withColumn("__thr", thresholdHexCol(when(col("__t") === 0L, lit(0.0))
        .otherwise(col("__w") * col("__b") / col("__t").cast("double"))))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(thresholds), Seq(strataCol))
      .filter(hashRankHex(col(idCol), salt) < col("__thr"))
      .select(df.columns.map(col): _*)
  }

  /** Deterministic `frac` sample: keep rows whose rank falls below the
    * threshold. Composable: samples at f1 < f2 with the same salt are
    * NESTED (the f1 sample is a subset of the f2 sample), so growing a
    * training subset never resamples what's already processed. */
  def hashSample(df: DataFrame, idCol: String, frac: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(hashRankHex(col(idCol), salt) < lit(thresholdHex(frac)))

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * downsample the dominant language while keeping the tail whole — the
    * standard pre-training mixture rebalance). Strata not in `fracs`
    * (including NULL) use `defaultFrac`. Same rank as [[hashSample]], so
    * per-stratum nesting holds and the whole pass is a shuffle-free
    * filter over the scan. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fracs: Map[String, Double], defaultFrac: Double = 1.0,
                       salt: String = "graft"): DataFrame = {
    val thr = fracs.toSeq.sortBy(_._1)
      .foldRight(lit(thresholdHex(defaultFrac)): Column) {
        case ((stratum, f), acc) =>
          when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
      }
    df.filter(hashRankHex(col(idCol), salt) < thr)
  }

  /** The (name, upper-threshold-hex) ladder shared by [[splitColumn]] and
    * any SQL mirror of it (e.g. the verification oracle): ONE place
    * renders the cumulative bounds, so an engine port can't drift by a
    * floating-point ulp in the cumulative sum. Excludes the last split,
    * which is the CASE's ELSE arm. */
  private[graft] def thresholdLadder(splits: Seq[(String, Double)]): Seq[(String, String)] = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cum.init).map { case ((name, _), upper) =>
      name -> thresholdHex(upper)
    }
  }

  /** Split assignment column: fractions in declaration order, remainder
    * to the last split. `splits` like Seq("train" -> 0.8, "valid" -> 0.1,
    * "test" -> 0.1) (fractions must sum to ~1; the last split is the
    * unconditional remainder so rounding never leaves a row unassigned). */
  def splitColumn(id: Column, splits: Seq[(String, Double)],
                  salt: String = "graft"): Column = {
    val r = hashRankHex(id, salt)
    val cases = thresholdLadder(splits).foldLeft(Option.empty[Column]) {
      case (acc, (name, upperHex)) =>
        val cond = r < lit(upperHex)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    cases.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
  }

  /** The full train/valid/test assignment frame: id, rank_hex, split.
    * NULL ids are EXCLUDED, not assigned: their rank is null, so every
    * threshold compare is null and the CASE would fall through to the
    * LAST split — silently polluting the eval set with exactly the rows
    * whose identity is unknown. (hashSample/stratifiedSample already
    * drop them: a null rank never passes the filter.) */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Double)],
                         salt: String = "graft"): DataFrame =
    df.filter(col(idCol).isNotNull)
      .withColumn("rank_hex", hashRankHex(col(idCol), salt))
      .withColumn("split", splitColumn(col(idCol), splits, salt))
}
