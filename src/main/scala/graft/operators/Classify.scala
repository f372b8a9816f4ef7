package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed text classification — the quality/source-routing model a
  * training-data pipeline fits over its own corpus (fastText-style
  * source classifiers, CCNet's quality buckets). The deterministic
  * member of that family is multinomial Naive Bayes with Laplace
  * smoothing: the model IS a closed-form aggregate of corpus counts (no
  * iterative fit, no learning-rate nondeterminism), so both the fit and
  * the scoring are exactly reproducible cross-engine — the property the
  * DuckDB oracle verifies end-to-end.
  *
  * Reference scope note: the reference routes documents by source
  * heuristics only; the classifier is part of the mandated
  * training-data-pipeline extension surface.
  */
object Classify {

  /** Multinomial Naive Bayes self-classification CONFUSION MATRIX:
    * fit per-class token multinomials over (textCol, labelCol), score
    * every document against every class, and report (label, predicted,
    * n_docs) — the source-separability diagnostic (a diagonal-heavy
    * matrix says sources have distinct vocabularies; heavy off-diagonal
    * cells say two sources are stylistically interchangeable — the
    * mixture curator's cue to merge or re-weight them).
    *
    * Model: ln p(c) = ln(docs_c/N) and, per (token, class),
    * ln p(t|c) = ln((n_{t,c}+1)/(tok_c+V)) with V = corpus vocabulary
    * size (Laplace smoothing over the FULL vocabulary — unseen
    * (token, class) cells price at ln(1/(tok_c+V))). A document scores
    * score(d,c) = ln p(c) + Σ_t tf(d,t)·ln p(t|c); predicted = argmax,
    * ties to the lexicographically smallest class.
    *
    * Cross-engine float discipline (the oracle hash-compares the
    * matrix): every ln is rounded ONCE to 6 decimals and frozen as
    * DECIMAL(18,6) at MODEL scale (vocab × classes cells + one prior
    * per class); per-doc accumulation is EXACT decimal arithmetic
    * (order-free), so scores are bit-identical cross-engine and the
    * argmax + tie-break are exact decimal/string comparisons — the
    * matrix matches exactly, not approximately.
    *
    * Scale shape: one corpus pass to doc-level TF with map-side
    * combine; the model grid (vocab × classes — smoothing needs the
    * unseen cells) is a vocab-scale cross join against the CLASS
    * DIMENSION, never against the corpus; scoring joins TF to the grid
    * on token (fan-out × #classes — the grid broadcasts whenever
    * classes × vocab fits, else it hash-joins at TF scale); the argmax
    * is two bounded aggregates (max then min-class-at-max), window-free
    * like canonicalKeepList. Docs with no tokens have no TF rows and
    * are absent (no prior-only row: a tokenless doc carries no
    * evidence, and every class would tie). */
  def naiveBayesConfusion(df: DataFrame, idCol: String, textCol: String,
                          labelCol: String): DataFrame = {
    val dec = "decimal(18,6)"
    val docs = df.select(col(idCol).as("__doc"), col(labelCol).as("label"))
      .filter(col("label").isNotNull)
    val tf = df.select(col(idCol).as("__doc"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("__doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val labeledTf = tf.join(docs, Seq("__doc"))
    // Class stats: docs and token mass per class (model-scale rows).
    val classStats = labeledTf.groupBy(col("label"))
      .agg(count_distinct(col("__doc")).as("n_docs_c"),
        sum(col("tf")).as("tok_c"))
    val vocab = tf.select(col("token")).distinct()
    val vocabSize = vocab.count()
    val nDocs = labeledTf.select(col("__doc")).distinct().count()
    // Priors: frozen ln once per class.
    val priors = classStats.select(col("label"),
      round(log(col("n_docs_c").cast("double") / lit(nDocs.toDouble)), 6)
        .cast(dec).as("prior"))
    // Full (token, class) grid with observed counts, smoothed + frozen.
    val observed = labeledTf.groupBy(col("token"), col("label"))
      .agg(sum(col("tf")).as("n_tc"))
    val grid = vocab.crossJoin(broadcast(classStats))
      .join(observed, Seq("token", "label"), "left")
      .select(col("token"), col("label"),
        round(log((coalesce(col("n_tc"), lit(0L)) + lit(1L)).cast("double") /
          (col("tok_c") + lit(vocabSize)).cast("double")), 6)
          .cast(dec).as("w"))
    // Score: exact decimal sum of tf-weighted cell costs, plus prior.
    val scores = tf.join(grid, Seq("token"))
      .groupBy(col("__doc"), col("label"))
      .agg(sum(col("w") * col("tf")).as("__ev"))
      .join(priors, Seq("label"))
      .select(col("__doc"), col("label"), (col("__ev") + col("prior")).as("score"))
    // Window-free argmax with deterministic ties: max score per doc,
    // then the smallest class name attaining it (exact decimal equality).
    val best = scores.groupBy(col("__doc")).agg(max(col("score")).as("__best"))
    val predicted = scores.join(best, Seq("__doc"))
      .filter(col("score") === col("__best"))
      .groupBy(col("__doc"))
      .agg(min(col("label")).as("predicted"))
    predicted.join(docs, Seq("__doc"))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
