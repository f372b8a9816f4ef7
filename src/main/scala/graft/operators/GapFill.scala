package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense time-series resample with forward fill — the gap-fill /
  * last-observation-carried-forward operator every monitoring and
  * feature-engineering pipeline needs (an event stream is sparse; a
  * model or a drift monitor wants one row per (key, bucket) with "the
  * last known reading" carried through quiet periods).
  *
  * Scale shape, in order:
  *  1. the event stream collapses to (key, bucket) aggregates in ONE
  *     shuffle with map-side combine — the only pass over raw rows; a
  *     hot key's millions of events become at most its bucket count;
  *  2. per-key [min, max] bucket spans aggregate those bounded rows;
  *  3. the dense grid is `explode(sequence(lo, hi))` per key — output
  *     is bounded by TIME RANGE / bucket width, never by event count,
  *     and a corrupted epoch (one 1970 row against a 2024 stream would
  *     silently materialize a 19k-day grid per key) fails loudly via
  *     the `maxBucketsPerKey` raise_error guard instead;
  *  4. observed aggregates left-join the grid on (key, bucket);
  *  5. forward fill is `last(ignoreNulls)` over an UnboundedPreceding
  *     frame — the O(1)-per-row incremental kind, cost per key = its
  *     grid length, a constant of the time range however hot the key.
  *
  * Bucket index = floor(epochMillis / bucketMillis) computed via
  * subtract-pmod (exact for any sign; a double-division floor is exact
  * here too but the discipline costs nothing). `bucket_ms` in the
  * output is the bucket's inclusive start epoch-millisecond.
  *
  * Semantics pins:
  *  - rows with NULL key or NULL timestamp are EXCLUDED (a null ts has
  *    no bucket; a null key would grid-join to nothing);
  *  - `sumAlias` is SQL-null on gap buckets AND on observed buckets
  *    whose summands were all null — `filledAlias` carries the last
  *    non-null SUM at-or-before the bucket in both cases (so a
  *    null-summand bucket is transparent to the fill, like a gap);
  *  - the first grid bucket of every key is observed by construction
  *    (lo = the key's min observed bucket), so `filledAlias` is only
  *    null while the PREFIX of observed buckets has all-null sums.
  */
object GapFill {

  private val Reserved = Seq("__b", "__lo", "__hi", "__n", "__sv")

  /** @param df          input rows
    * @param key         partition key column name
    * @param ts          timestamp column name (castable to timestamp)
    * @param sumExpr     summand (integral for engine-exact sums)
    * @param bucketMillis resample granularity
    * @param maxBucketsPerKey hard ceiling on a key's grid length —
    *                    exceeding it throws (corrupt-epoch guard)
    */
  def resample(df: DataFrame, key: String, ts: String, sumExpr: Column,
               bucketMillis: Long, maxBucketsPerKey: Long = 1L << 20,
               bucketAlias: String = "bucket_ms",
               cntAlias: String = "n_bucket",
               sumAlias: String = "sum_bucket",
               filledAlias: String = "filled_sum"): DataFrame = {
    require(bucketMillis > 0, s"bucket width must be positive: $bucketMillis")
    require(maxBucketsPerKey > 0, "maxBucketsPerKey must be positive")
    val out = Seq(bucketAlias, cntAlias, sumAlias, filledAlias)
    require(out.distinct == out, s"output aliases must be distinct: $out")
    (Reserved ++ out).foreach { r =>
      require(!df.columns.contains(r), s"column $r collides with resample internals")
    }
    val ms = unix_millis(col(ts).cast("timestamp"))
    val bucket = ((ms - pmod(ms, lit(bucketMillis))) / bucketMillis).cast("long")
    val observed = df.filter(col(key).isNotNull && col(ts).isNotNull)
      .withColumn("__b", bucket)
      .groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__n"), sum(sumExpr).as("__sv"))
    val spans = observed.groupBy(col(key))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .withColumn("__hi",
        when(col("__hi") - col("__lo") < maxBucketsPerKey, col("__hi"))
          .otherwise(raise_error(concat(
            lit(s"resample grid exceeds $maxBucketsPerKey buckets for key "),
            col(key).cast("string"),
            lit(" — corrupt timestamps, or raise maxBucketsPerKey")))))
    val grid = spans.select(col(key),
      explode(sequence(col("__lo"), col("__hi"))).as("__b"))
    val wFill = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(key, "__b"), "left")
      .withColumn(cntAlias, coalesce(col("__n"), lit(0L)))
      .withColumn(sumAlias, col("__sv"))
      .withColumn(filledAlias, last(col("__sv"), ignoreNulls = true).over(wFill))
      .withColumn(bucketAlias, col("__b") * bucketMillis)
      .drop("__b", "__n", "__sv")
  }
}
