package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level token statistics: the vocabulary/frequency pass every
  * tokenizer-training and TF-IDF pipeline starts from.
  *
  * Scale shape: explode → hash-partitioned counts with map-side partial
  * aggregation (the per-partition combine collapses each partition's
  * token stream to its local (token, doc) counts before any shuffle, so
  * shuffle volume is O(distinct pairs per partition), not O(corpus
  * tokens)).
  * Top-K lands in TakeOrderedAndProject: each partition keeps K rows and
  * one task merges P·K — correct for tokenizer-sized K (tens of
  * thousands), never a corpus-sized funnel.
  */
object Vocab {

  /** (token, n_occurrences, n_docs) over the whitespace-normalized corpus.
    * Count both total occurrences (vocabulary weighting) and per-doc
    * presence (document frequency — the IDF denominator) in ONE pass:
    * dup-free token lists per doc would need a second explode. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      // two-level aggregate: (token, doc) partials first, then token —
      // count_distinct(doc) in one level would keep a per-token doc SET
      // in the aggregation buffer (unbounded for stop-words at corpus
      // scale); this way every buffer is a pair of counters.
      .groupBy(col("token"), col("__doc"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("token"))
      .agg(sum(col("__n")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))

  /** Top-K vocabulary by total occurrences (ties broken by token string so
    * the cut is deterministic across partitionings and engines). */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    tokenStats(df, idCol, textCol)
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /** Corpus mixture report: per `dims` group (source, lang, …) the doc
    * count, token count, and share of corpus tokens — the table a
    * mixture-rebalance decision reads. One scan + one aggregation
    * shuffle; the corpus total comes from an unpartitioned window over
    * the GROUP rows (mixture dims are low-cardinality by definition —
    * bounded model data, not a corpus funnel), and it sums LONGS, so the
    * total is exact regardless of frame order. */
  def mixtureReport(df: DataFrame, textCol: String, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one mixture dimension")
    require(!df.columns.contains("__tok"), "column __tok collides")
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    df.select(dims.map(col) :+
        TextAnalysis.wsTokenCount(col(textCol)).cast("long").as("__tok"): _*)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
      .withColumn("token_frac",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w).cast("double"))
  }
}
