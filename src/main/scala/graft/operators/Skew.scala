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
