package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key-safe rolling (trailing-range) window aggregates.
  *
  * The naive form — `sum(x) OVER (PARTITION BY key ORDER BY ms RANGE
  * BETWEEN span-1 PRECEDING AND CURRENT ROW)` — has TWO hot-key
  * pathologies at scale. The partition funnel (one task owns the whole
  * hot key) is the familiar one; the sharper one is that Spark's sliding
  * range frame has no aggregate retraction, so every time the frame's
  * lower bound moves it RE-AGGREGATES the buffered frame from scratch:
  * a key with n dense rows and f rows in a typical span costs O(n·f)
  * — measured 23× wall-clock degradation when one user absorbs 30% of
  * the sf0.1 event stream (SKEW_BENCH.json, rolling_window).
  *
  * [[rollingTrailing]] computes the identical result as a DIFFERENCE OF
  * CUMULATIVE aggregates: roll(t] = cum(t] − cum(t−span], where
  *   - cum is a distributed two-phase prefix sum over (key, time-bucket)
  *     partitions (local running sums + one summary row per (key,
  *     bucket) carried across buckets — the Packing.pack prefix-sum
  *     shape), so no task ever owns more than one key's one time slice
  *     and every frame is the O(1)-per-row UnboundedPreceding kind;
  *   - cum(t−span] is fetched with the SALTED as-of join
  *     ([[Joins.asOfJoinSalted]]) against the per-(key, ms) compacted
  *     cum series, which is hot-key-safe by the same bucketing.
  *
  * Range-frame peer semantics are preserved exactly: all rows sharing
  * (key, ms) carry the FULL cum through their millisecond (the range
  * frame includes every peer at the current timestamp, wherever the row
  * sits in tie order).
  *
  * Timestamps must be non-null (a null ts has no trailing range; filter
  * upstream). `bucketWidthMillis` tunes the salt granularity the same
  * way as [[Joins.asOfJoinSalted]]: aim for 10–1000 rows of a typical
  * key per bucket.
  */
object Windows {

  /** Trailing-span count + sum for every row of `df`.
    *
    * @param df       input rows
    * @param key      partition key column name
    * @param ts       timestamp column name (non-null)
    * @param tie      unique tie-break column name (deterministic cum
    *                 order within a millisecond; any unique id)
    * @param sumExpr  summand (should be integral for engine-exact sums)
    * @param spanMillis window span: frame is the half-open
    *                 (t − span, t] — the `RANGE BETWEEN span-1 PRECEDING
    *                 AND CURRENT ROW` frame on integral millis
    * @param bucketWidthMillis salt bucket width
    * @param cntAlias output column for the rolling count
    * @param sumAlias output column for the rolling sum
    */
  def rollingTrailing(df: DataFrame, key: String, ts: String, tie: String,
                      sumExpr: Column, spanMillis: Long,
                      bucketWidthMillis: Long,
                      cntAlias: String = "n_span",
                      sumAlias: String = "sum_span"): DataFrame = {
    require(spanMillis > 0, s"span must be positive: $spanMillis")
    require(bucketWidthMillis > 0, s"bucket width must be positive: $bucketWidthMillis")
    val reserved = Seq("__ms", "__b", "__cc", "__cs", "__ccf", "__csf",
      "__pms", "__tc", "__ts2", "__cum_cc", "__cum_cs", "__scc", "__scs",
      "__prior___pms", "__prior___scc", "__prior___scs")
    reserved.foreach { r =>
      require(!df.columns.contains(r), s"column $r collides with rollingTrailing internals")
    }
    val ms = unix_millis(col(ts))
    val rows = df.withColumn("__ms", ms)
      .withColumn("__b", floor(col("__ms") / bucketWidthMillis))

    // Phase 1: local running aggregates within (key, bucket) — the cheap
    // UnboundedPreceding frame (incremental, never re-aggregated), plus
    // the bucket totals on every row via the same-partitioning
    // unbounded frame (no extra exchange).
    val ord = Seq(col("__ms").asc, col(tie).asc)
    val wLoc = Window.partitionBy(col(key), col("__b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(key), col("__b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val local = rows
      .withColumn("__cc", count(lit(1)).over(wLoc))
      .withColumn("__cs", sum(sumExpr).over(wLoc))
      .withColumn("__tc", count(lit(1)).over(wTot))
      .withColumn("__ts2", sum(sumExpr).over(wTot))

    // Phase 2: one summary row per (key, bucket); the carry window runs
    // over summary rows only (a key's cost is its bucket count).
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = local.groupBy(col(key), col("__b"))
      .agg(first(col("__tc")).as("__tc"), first(col("__ts2")).as("__ts2"))
      .select(col(key), col("__b"),
        coalesce(sum(col("__tc")).over(wCarry), lit(0L)).as("__cum_cc"),
        coalesce(sum(col("__ts2")).over(wCarry), lit(0L)).as("__cum_cs"))

    // Global cums; then the FULL-millisecond cum on every row (range
    // peers at equal ts are all included — same (key, bucket)
    // partitioning, so this window adds a sort, not a shuffle).
    val wMs = Window.partitionBy(col(key), col("__b"), col("__ms"))
    val cum = local.join(carry, Seq(key, "__b"))
      .withColumn("__cc", col("__cc") + col("__cum_cc"))
      .withColumn("__cs", col("__cs") + col("__cum_cs"))
      .withColumn("__ccf", max(col("__cc")).over(wMs))
      .withColumn("__csf", max(col("__cs")).over(wMs))
      .drop("__tc", "__ts2", "__cum_cc", "__cum_cs")

    // cum(t−span]: newest compacted cum row at-or-before the probe
    // time, via the hot-key-safe as-of join. The compacted series has
    // one row per (key, ms) — model-scale relative to the row count —
    // carrying the full-millisecond cums.
    val series = cum.groupBy(col(key), col("__ms").as("__pms"))
      .agg(max(col("__cc")).as("__scc"), max(col("__cs")).as("__scs"))
    // __b is one of Joins' reserved internals — shed it before the as-of
    val probes = cum.drop("__b").withColumn("__pms", col("__ms") - spanMillis)
    val looked = Joins.asOfJoinSalted(probes, series, key, "__pms",
      payload = Seq("__scc", "__scs"),
      bucket = c => floor(c / bucketWidthMillis),
      tieBreak = None, prefix = "__prior_")

    looked
      .withColumn(cntAlias, col("__ccf") - coalesce(col("__prior___scc"), lit(0L)))
      .withColumn(sumAlias, col("__csf") - coalesce(col("__prior___scs"), lit(0L)))
      .drop("__ms", "__b", "__cc", "__cs", "__ccf", "__csf", "__pms",
        "__prior___pms", "__prior___scc", "__prior___scs")
  }
}
