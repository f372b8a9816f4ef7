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
  * upstream). Summands may be signed and may be null: the running cums
  * carry the last peer's SIGNED sum (an ordered last, not a max), and a
  * frame holding zero non-null summands yields a null sum exactly like
  * the native range frame. `bucketWidthMillis` tunes the salt granularity the same
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
    val reserved = Seq("__ms", "__b", "__cc", "__cs", "__cn", "__ccf",
      "__csf", "__cnf", "__pms", "__tc", "__ts2", "__tn", "__cum_cc",
      "__cum_cs", "__cum_cn", "__scc", "__scs", "__scn",
      "__prior___pms", "__prior___scc", "__prior___scs", "__prior___scn")
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
    // Sums are coalesced to 0 and a NON-NULL-summand count rides along:
    // sum-over-window is SQL-null when the frame holds no non-null
    // summand, so an all-null prefix would otherwise poison every later
    // cum in the bucket (null + carry = null). The output re-nulls sums
    // whose frame has zero non-null summands, matching the range frame.
    val local = rows
      .withColumn("__cc", count(lit(1)).over(wLoc))
      .withColumn("__cs", coalesce(sum(sumExpr).over(wLoc), lit(0L)))
      .withColumn("__cn", count(sumExpr).over(wLoc))
      .withColumn("__tc", count(lit(1)).over(wTot))
      .withColumn("__ts2", coalesce(sum(sumExpr).over(wTot), lit(0L)))
      .withColumn("__tn", count(sumExpr).over(wTot))

    // Phase 2: one summary row per (key, bucket); the carry window runs
    // over summary rows only (a key's cost is its bucket count).
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = local.groupBy(col(key), col("__b"))
      .agg(first(col("__tc")).as("__tc"), first(col("__ts2")).as("__ts2"),
        first(col("__tn")).as("__tn"))
      .select(col(key), col("__b"),
        coalesce(sum(col("__tc")).over(wCarry), lit(0L)).as("__cum_cc"),
        coalesce(sum(col("__ts2")).over(wCarry), lit(0L)).as("__cum_cs"),
        coalesce(sum(col("__tn")).over(wCarry), lit(0L)).as("__cum_cn"))

    // Global cums; then the FULL-millisecond cum on every row (range
    // peers at equal ts are all included — same (key, bucket)
    // partitioning, so this window adds a sort, not a shuffle). The
    // full-ms value is the LAST peer's cum in tie order — counts are
    // monotone within a millisecond so max() works for them, but a
    // signed summand's running sum is not, hence the ordered last().
    val wMs = Window.partitionBy(col(key), col("__b"), col("__ms"))
    val wMsOrd = Window.partitionBy(col(key), col("__b"), col("__ms"))
      .orderBy(col("__cc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = local.join(carry, Seq(key, "__b"))
      .withColumn("__cc", col("__cc") + col("__cum_cc"))
      .withColumn("__cs", col("__cs") + col("__cum_cs"))
      .withColumn("__cn", col("__cn") + col("__cum_cn"))
      .withColumn("__ccf", max(col("__cc")).over(wMs))
      .withColumn("__csf", last(col("__cs")).over(wMsOrd))
      .withColumn("__cnf", max(col("__cn")).over(wMs))
      .drop("__tc", "__ts2", "__tn", "__cum_cc", "__cum_cs", "__cum_cn")

    // cum(t−span]: newest compacted cum row at-or-before the probe
    // time, via the hot-key-safe as-of join. The compacted series has
    // one row per (key, ms) — model-scale relative to the row count —
    // carrying the full-millisecond cums (max_by picks the last peer's
    // signed sum; __cc is unique within (key, ms)).
    val series = cum.groupBy(col(key), col("__ms").as("__pms"))
      .agg(max(col("__cc")).as("__scc"),
        max_by(col("__cs"), col("__cc")).as("__scs"),
        max(col("__cn")).as("__scn"))
    // __b is one of Joins' reserved internals — shed it before the as-of
    val probes = cum.drop("__b").withColumn("__pms", col("__ms") - spanMillis)
    val looked = Joins.asOfJoinSalted(probes, series, key, "__pms",
      payload = Seq("__scc", "__scs", "__scn"),
      bucket = c => floor(c / bucketWidthMillis),
      tieBreak = None, prefix = "__prior_")

    looked
      .withColumn(cntAlias, col("__ccf") - coalesce(col("__prior___scc"), lit(0L)))
      // A frame with zero non-null summands sums to SQL-null, not 0.
      .withColumn(sumAlias,
        when(col("__cnf") - coalesce(col("__prior___scn"), lit(0L)) > 0L,
          col("__csf") - coalesce(col("__prior___scs"), lit(0L))))
      .drop("__ms", "__b", "__cc", "__cs", "__cn", "__ccf", "__csf",
        "__cnf", "__pms",
        "__prior___pms", "__prior___scc", "__prior___scs", "__prior___scn")
  }
}
