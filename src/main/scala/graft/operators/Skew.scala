package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §5): salting splits a hot
  * key's rows across `salts` reducers by widening the join key, while the
  * other side replicates each row `salts` times so every salted partition
  * can still match. Use when AQE's skew-join split isn't available (e.g.
  * non-AQE deployments or aggregate-after-join pipelines); results are
  * identical to the plain join.
  */
object Skew {

  /** Key-skew diagnostic — the report you read BEFORE deciding a join
    * needs [[saltedJoin]] (or AQE skew splitting): the `topK` heaviest
    * keys with each key's row count, share of all rows, and skew factor
    * (count ÷ mean-rows-per-key; ≫ 1 means that key's reducer is the
    * straggler). One aggregation shuffle on the keys (map-side partials)
    * collapses the corpus to per-key counts; the global totals are a
    * 1-row aggregate broadcast back, and the top-K cut is the
    * distributed small-K TakeOrdered. skew_factor is CAST(count AS
    * DOUBLE) · n_keys / total in that exact operation order — two IEEE
    * correctly-rounded ops, so an engine twin reproduces the doubles
    * bit-for-bit. */
  def keySkewReport(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(topK > 0, "topK must be positive")
    // A key named like an output column would alias the count aggregate
    // (AMBIGUOUS_REFERENCE at the totals step) — refuse loudly, the same
    // guard countDrift applies.
    val clash = keys.toSet.intersect(Set("n", "total", "n_keys", "share", "skew_factor"))
    require(clash.isEmpty,
      s"key column(s) ${clash.mkString(",")} collide with keySkewReport " +
        "output columns (n, total, n_keys, share, skew_factor); rename them")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(keys.map(col) ++ Seq(
        col("n"),
        (col("n") / col("total")).as("share"),
        (col("n").cast("double") * col("n_keys") / col("total")).as("skew_factor")): _*)
      .orderBy(col("n").desc +: keys.map(col): _*)
      .limit(topK)
  }

  /** Inner-join `big` (skewed) with `small` on `key`, salted `salts` ways.
    * `saltSrc` must be a deterministic per-row column on the big side
    * (e.g. a unique id) — hash-derived so reruns/retries salt identically.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSrc: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn would silently REPLACE a caller's __salt and drop it below.
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin uses __salt internally; rename the input's __salt column")
    val salted = big.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
