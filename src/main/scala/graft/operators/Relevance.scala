package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25-style relevance scoring of a corpus against a query term set —
  * the standard retrieval ranking (and the data-curation scorer for
  * "documents similar to a seed set" mixture building).
  *
  * Scale shape: the corpus explodes tokens but FILTERS to the query terms
  * in the same projection, so only matching (doc, term) rows — a ~|terms|
  * fan-in, not the token stream — reach the one aggregation shuffle. The
  * per-term document frequencies and the two corpus scalars (N, avgdl)
  * are broadcast; nothing corpus-sized joins anything.
  *
  * Determinism discipline (the oracle hash-compares raw doubles):
  *  - idf is the RATIO form (N − df + 0.5)/(df + 0.5) — same ranking
  *    monotonicity as the log form, but add/mul/div are IEEE
  *    correctly-rounded in every engine while ln() implementations
  *    differ by ulps and would break cross-engine bit-parity. A caller
  *    wanting the classic log-idf can apply ln() on top (monotone, so
  *    the RANKING this operator exists for is unchanged).
  *  - the per-doc score sums its term contributions in FIXED `terms`
  *    order via one pivoted column per term (each pivot cell aggregates
  *    exactly one row), never via a float sum whose association order
  *    follows partitioning.
  */
object Relevance {

  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // Terms canonicalize through the SAME pipeline the document tokens
    // do (lowercase + whitespace collapse — TextAnalysis.normalized):
    // a caller's "Apple" must match the lowercased token stream, not
    // silently score zero everywhere. A term that canonicalizes to
    // multiple tokens (or none) can never match a single token — reject
    // loudly rather than return all-zero scores.
    val canon = terms.map(t =>
      t.toLowerCase(java.util.Locale.ROOT).trim.replaceAll(" +", " "))
    require(canon.forall(t => t.nonEmpty && !t.contains(' ')),
      s"each term must canonicalize to ONE non-empty token; got: " +
        terms.mkString("[", ", ", "]"))
    require(canon.distinct == canon,
      "terms must be distinct after canonicalization")
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
    // NULL-text docs (fetch failures — normal at scale) are excluded
    // from the corpus ENTIRELY: they can't match a term, and a null dl
    // would silently drop out of sum(dl) while count(*) kept them,
    // deflating avgdl and inflating n_docs — biasing every score.
    val docs = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val scalars = docs.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .filter(col("token").isin(canon.map(t => t: Any): _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val contrib =
      ((col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf
      .join(broadcast(dfTable), Seq("token"))
      .crossJoin(broadcast(scalars))
      .withColumn("contrib", contrib)
    val pivots = canon.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("contrib"))).as(s"__c_$i")
    }
    val score: Column = canon.indices
      .map(i => coalesce(col(s"__c_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(pivots.head, (pivots.tail :+ count(lit(1)).as("n_terms_matched")): _*)
      .select(col("doc_id"), score.as("score"), col("n_terms_matched"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher SIGIR'09) of
    * ranked retrieval lists: fused(d) = Σ_r 1/(k + rank_r(d)), the
    * standard way to combine heterogeneous rankers (BM25 + keyword +
    * ANN) whose raw scores are not on a common scale — only RANKS
    * enter, so no per-ranker calibration is needed. k (classically 60)
    * damps the head so one ranker's #1 can't drown broad agreement.
    *
    * Determinism discipline: the fused score is a FIXED expression tree
    * — per-ranker rank columns materialize via the join, and the
    * 1/(k+rank) terms add in `rankings` declaration order — so every
    * arithmetic step is an IEEE correctly-rounded op on bit-identical
    * operands, never a float aggregation whose association order
    * follows partitioning. A doc absent from a ranker contributes
    * exactly 0.0 (its rank column is SQL-null in the output).
    *
    * Scale shape: ranker outputs are top-N lists (model-scale — the
    * caller cuts them with orderBy+limit = TakeOrderedAndProject), so
    * the outer-join chain is N-row frames; with corpus-sized rankings
    * it degrades gracefully to hash joins on the doc key. Rows with a
    * NULL doc id or NULL rank are rejected loudly — a null rank would
    * silently contribute 0 while LOOKING ranked.
    *
    * @param rankings (name, frame) pairs; each frame has `docCol` and
    *                 `rankCol` (1-based). Output carries one
    *                 `rank_<name>` column per ranker.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], docCol: String,
              rankCol: String, kRrf: Int = 60,
              scoreAlias: String = "rrf_score"): DataFrame = {
    require(rankings.size >= 2, "need at least two rankings to fuse")
    require(kRrf >= 0, s"kRrf must be non-negative: $kRrf")
    val names = rankings.map(_._1)
    require(names.distinct == names, s"ranking names must be distinct: $names")
    val sides = rankings.map { case (name, r) =>
      require(r.columns.contains(docCol) && r.columns.contains(rankCol),
        s"ranking '$name' must have columns $docCol and $rankCol")
      // The null check rides the rank VALUE path (the one column the
      // fusion always reads), so projection pruning can't elide it.
      val rk = when(col(docCol).isNull || col(rankCol).isNull,
          raise_error(lit(s"ranking '$name' has a null $docCol or $rankCol row"))
            .cast("long"))
        .otherwise(col(rankCol).cast("long"))
      r.select(col(docCol), rk.as(s"rank_$name"))
    }
    val joined = sides.reduceLeft((a, b) => a.join(b, Seq(docCol), "full_outer"))
    val score = names
      .map(n => coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$n")), lit(0.0)))
      .reduceLeft(_ + _)
    joined.withColumn(scoreAlias, score)
  }

  /** Per-document top TF-IDF terms — deterministic keyword extraction
    * (the per-doc signature a topical-mixture or seed-expansion pass
    * reads; [[bm25]] answers "score docs against MY terms", this answers
    * "what are each doc's OWN distinguishing terms").
    *
    * idf is the smoothed RATIO form (N+1)/(df+1) — finite for
    * every-doc terms, same ranking monotonicity as the classic
    * ln-smoothed idf, and (the [[bm25]] discipline) built only from
    * IEEE correctly-rounded add/div/mul so the raw double scores
    * hash-match cross-engine. score = tf · idf with tf exact in double
    * (corpus docs are ≪ 2^53 tokens).
    *
    * Scale shape: one corpus pass to doc-level TF (map-side combine);
    * document frequencies aggregate the TF table (vocab-scale output);
    * N is one broadcast scalar; the TF↔df join shuffles TF rows by
    * token; the final top-N is a per-doc window over TF-cardinality
    * rows. Nothing corpus-sized is collected or broadcast. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    topN: Int = 3): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val tf = df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("token")).agg(count(lit(1)).as("df_docs"))
    val scalars = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(dfTable, Seq("token"))
      .crossJoin(broadcast(scalars))
      .withColumn("score", col("tf").cast("double") *
        ((col("n_docs").cast("double") + lit(1.0)) /
          (col("df_docs").cast("double") + lit(1.0))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank"), col("token").as("term"),
        col("tf"), col("df_docs"), col("score"))
  }
}
