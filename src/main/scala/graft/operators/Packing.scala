package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-length sequence packing: the GPT-style "concatenate every
  * document in a deterministic shuffled order, chop the token stream into
  * maxTokens blocks" pass that turns a filtered corpus into training
  * sequences. This operator computes each document's GLOBAL TOKEN OFFSET
  * in that virtual stream — from which the sequences a doc occupies
  * (`seq_first`..`seq_last`) are pure arithmetic; the loader later slices
  * straddling docs at block boundaries by pointer math, which is exactly
  * how production packers treat them (no padding, no fragmentation).
  *
  * The pack order is [[Sampling.hashRankHex]] (salted md5 rank, ties by
  * id): a reproducible global shuffle — re-running the job, re-running it
  * on another engine, or repartitioning the input cannot move a single
  * document, so sequence N is the same sequence forever (checkpoint
  * resume and data-order ablations depend on this).
  *
  * Scale shape — a distributed prefix sum, NOT a global window (a window
  * ordered without partitioning funnels the entire corpus through ONE
  * task, the canonical Spark scale bug):
  *  1. rank every doc, bucket by the rank's leading hex byte (256
  *     ordered buckets ≈ rank ranges);
  *  2. per-bucket running sum (window partitioned BY bucket — parallel);
  *  3. per-bucket totals → running bucket offsets (a 256-row window:
  *     bounded model data, like the IVF centroid collect);
  *  4. broadcast the offsets back; offset = bucket offset + local cumsum
  *     − own tokens.
  * Identical to the single-window formulation by associativity of + (the
  * spec proves bit-equality), but every corpus-sized step is partitioned.
  */
object Packing {

  private val Reserved = Seq("__rank", "__bkt", "__cum", "__tot", "__off",
    "rank_hex", "token_offset", "seq_first", "seq_last")

  /** Adds `rank_hex`, `token_offset`, `seq_first`, `seq_last` to `df`.
    * `nTokensCol` must be a non-negative numeric column (precomputed token
    * counts — any tokenizer); rows with a NULL count OR a NULL id are
    * excluded — an unknown length can't be placed without shifting every
    * successor, and a NULL id hashes to a NULL rank whose bucket would
    * silently drop the row from the equi-join while its tokens still
    * shifted every real bucket's offset (corpus-wide misalignment).
    * seq_first/seq_last divide via double floor — exact below 2^52 total
    * tokens, i.e. any corpus that fits in zettabytes. */
  def sequenceOffsets(df: DataFrame, idCol: String, nTokensCol: String,
                      maxTokens: Int, salt: String = "pack"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val clash = df.columns.filter(Reserved.contains)
    require(clash.isEmpty, s"column(s) ${clash.mkString(",")} collide with " +
      s"Packing temp/output columns (${Reserved.mkString(",")})")
    val n = col(nTokensCol).cast("long")
    val r = df.filter(n.isNotNull && col(idCol).isNotNull)
      .withColumn("__rank", Sampling.hashRankHex(col(idCol), salt))
      .withColumn("__bkt", substring(col("__rank"), 1, 2))
    val wLocal = Window.partitionBy(col("__bkt"))
      .orderBy(col("__rank"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBuckets = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = r.groupBy(col("__bkt")).agg(sum(n).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wBuckets), lit(0L)))
      .select(col("__bkt"), col("__off"))
    r.withColumn("__cum", sum(n).over(wLocal))
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn("token_offset", col("__off") + col("__cum") - n)
      .withColumn("seq_first",
        floor(col("token_offset").cast("double") / maxTokens).cast("long"))
      .withColumn("seq_last",
        floor((col("token_offset") + greatest(n, lit(1L)) - 1).cast("double") / maxTokens)
          .cast("long"))
      .withColumnRenamed("__rank", "rank_hex")
      .drop("__bkt", "__cum", "__off")
  }

  /** PACKING EFFICIENCY census over [[sequenceOffsets]] — the one-row
    * report a data loader reads before committing a block size: how
    * many fixed-length sequences the stream fills (offset packing has
    * no padding waste — the cost axis is BOUNDARY CONTAMINATION), and
    * what fraction of documents straddle a sequence boundary
    * (seq_last > seq_first — exactly the docs whose attention span is
    * cut, and the count cross-document attention masking pays for).
    * Longer blocks trade fewer sequences for more straddling; this
    * table is the curve's data point for one `maxTokens`.
    *
    * Exactness: counts and token sums are exact longs off the
    * deterministic offsets; n_seqs is integer floor-division;
    * crossing_frac is ONE IEEE division of exact longs — oracle-exact.
    * Scale shape: [[sequenceOffsets]]'s two-phase prefix sum, then one
    * global aggregate of doc-level rows collapsing map-side. */
  def packStats(df: DataFrame, idCol: String, nTokensCol: String,
                maxTokens: Int, salt: String = "pack"): DataFrame = {
    val off = sequenceOffsets(df, idCol, nTokensCol, maxTokens, salt)
    off.agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol).cast("long")).as("total_tokens"),
        sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
          .as("n_crossing"))
      .select(col("n_docs"), col("total_tokens"),
        when(coalesce(col("total_tokens"), lit(0L)) > 0,
          expr(s"CAST((total_tokens - 1) DIV $maxTokens AS BIGINT) + 1"))
          .otherwise(lit(0L)).as("n_seqs"),
        col("n_crossing"),
        (col("n_crossing").cast("double") / col("n_docs").cast("double"))
          .as("crossing_frac"))
  }
}
