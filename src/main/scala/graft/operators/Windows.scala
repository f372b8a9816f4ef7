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
  * CUMULATIVE aggregates, roll(t] = cum(t] − cum(t−span], in ONE pass:
  *   - every input row contributes itself (weight 1) AND a zero-weight
  *     PROBE row at t−span to one unioned stream, so the probe's running
  *     cum IS cum(t−span] — no self-as-of-join, no recomputation of the
  *     cum pipeline per branch (a previous formulation that fetched
  *     cum(t−span] with [[Joins.asOfJoinSalted]] against a compacted cum
  *     series planned 16 shuffles / 8 scans because every branch of the
  *     self-join re-derived the prefix sums; this one plans 5 shuffles /
  *     4 scans — real + probe branches and the carry's re-read — none
  *     over more than 2n rows);
  *   - cum is a distributed two-phase prefix sum over (key, time-bucket)
  *     partitions (local running sums + one carry row per (key, bucket)
  *     — the Packing.pack prefix-sum shape), so no task ever owns more
  *     than one key's one time slice and every frame is the
  *     O(1)-per-row UnboundedPreceding kind;
  *   - probe and source row reunite in a 2-row-per-id window (the id is
  *     unique, so this shuffle is skew-free by construction).
  *
  * Range-frame peer semantics are preserved exactly: all rows sharing
  * (key, ms) carry the FULL cum through their millisecond (the range
  * frame includes every peer at the current timestamp, wherever the row
  * sits in tie order), and probes sort AFTER the real rows of their
  * millisecond so cum(t−span] includes every row at exactly t−span —
  * which the half-open frame (t−span, t] excludes.
  *
  * Timestamps must be non-null (a null ts has no trailing range; filter
  * upstream). Summands may be signed and may be null: zero-weight probes
  * and null summands are invisible to the running sums, and a frame
  * holding zero non-null summands yields a null sum exactly like the
  * native range frame. `bucketWidthMillis` tunes the salt granularity
  * the same way as [[Joins.asOfJoinSalted]]: aim for 10–1000 rows of a
  * typical key per bucket.
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
    val reserved = Seq("__ms", "__b", "__p", "__w", "__sv", "__cc", "__cs",
      "__cn", "__ccf", "__csf", "__cnf", "__cum_cc", "__cum_cs", "__cum_cn",
      "__pcc", "__pcs", "__pcn")
    reserved.foreach { r =>
      require(!df.columns.contains(r), s"column $r collides with rollingTrailing internals")
    }
    val ms = unix_millis(col(ts))
    // Real rows (weight 1, live summand) + zero-weight probes at t−span.
    // Probes carry only (key, tie); unionByName null-fills the rest.
    val real = df.withColumn("__ms", ms)
      .withColumn("__p", lit(0))
      .withColumn("__w", lit(1L))
      .withColumn("__sv", sumExpr)
    val probe = df.select(col(key), col(tie),
        (ms - spanMillis).as("__ms"),
        lit(1).as("__p"), lit(0L).as("__w"))
    val u = real.unionByName(probe, allowMissingColumns = true)
      .withColumn("__b", floor(col("__ms") / bucketWidthMillis))

    // Phase 1: local running aggregates within (key, bucket) — the cheap
    // UnboundedPreceding frame (incremental, never re-aggregated).
    // Probes order AFTER real rows of the same millisecond (__p asc):
    // their running cum then includes every row at exactly t−span.
    // Weighted count + null-skipping sum make probes transparent; the
    // non-null-summand count rides along so the output can re-null sums
    // whose frame holds no non-null summand (sum-over-window is SQL-null
    // there, and cum differences would otherwise read 0).
    val ord = Seq(col("__ms").asc, col("__p").asc, col(tie).asc)
    val wLoc = Window.partitionBy(col(key), col("__b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u
      .withColumn("__cc", coalesce(sum(col("__w")).over(wLoc), lit(0L)))
      .withColumn("__cs", coalesce(sum(col("__sv")).over(wLoc), lit(0L)))
      .withColumn("__cn", count(col("__sv")).over(wLoc))

    // Phase 2: one carry row per (key, bucket) — bucket totals partial-
    // aggregate map-side, and the cross-bucket prefix window runs over
    // carry rows only (a key's cost is its bucket count, not its rows).
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.groupBy(col(key), col("__b"))
      .agg(sum(col("__w")).as("__w"),
        coalesce(sum(col("__sv")), lit(0L)).as("__sv"),
        count(col("__sv")).as("__cn"))
      .select(col(key), col("__b"),
        coalesce(sum(col("__w")).over(wCarry), lit(0L)).as("__cum_cc"),
        coalesce(sum(col("__sv")).over(wCarry), lit(0L)).as("__cum_cs"),
        coalesce(sum(col("__cn")).over(wCarry), lit(0L)).as("__cum_cn"))

    // Global cums; then the FULL-millisecond cum on every row (range
    // peers at equal ts are all included — same (key, bucket)
    // partitioning, so this window adds a sort, not a shuffle). The
    // full-ms value is the LAST row's cum in (__p, tie) order — probes
    // are transparent (they add 0), so last-over-all equals the last
    // real peer's SIGNED cum; a max() would freeze the high-water mark
    // of a signed running sum.
    val wMsOrd = Window.partitionBy(col(key), col("__b"), col("__ms"))
      .orderBy(col("__p").asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = local.join(carry, Seq(key, "__b"))
      .withColumn("__cc", col("__cc") + col("__cum_cc"))
      .withColumn("__cs", col("__cs") + col("__cum_cs"))
      .withColumn("__cn", col("__cn") + col("__cum_cn"))
      .withColumn("__ccf", last(col("__cc")).over(wMsOrd))
      .withColumn("__csf", last(col("__cs")).over(wMsOrd))
      .withColumn("__cnf", last(col("__cn")).over(wMsOrd))
      .drop("__cum_cc", "__cum_cs", "__cum_cn")

    // Reunite each row with its probe: exactly two rows per (key, id),
    // so this window shuffle is skew-free however hot the key is. The
    // probe contributes its OWN running cum (cum at-or-before t−span),
    // the real row its full-millisecond cum. Partitioning includes the
    // KEY so tie values only need to be unique per key (per-key
    // sequence numbers are a legitimate tie column).
    val wTie = Window.partitionBy(col(key), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def fromProbe(c: String) = max(when(col("__p") === 1, col(c))).over(wTie)
    cum
      .withColumn("__pcc", fromProbe("__cc"))
      .withColumn("__pcs", fromProbe("__cs"))
      .withColumn("__pcn", fromProbe("__cn"))
      .filter(col("__p") === 0)
      .withColumn(cntAlias, col("__ccf") - coalesce(col("__pcc"), lit(0L)))
      // A frame with zero non-null summands sums to SQL-null, not 0.
      .withColumn(sumAlias,
        when(col("__cnf") - coalesce(col("__pcn"), lit(0L)) > 0L,
          col("__csf") - coalesce(col("__pcs"), lit(0L))))
      .drop("__ms", "__b", "__p", "__w", "__sv", "__cc", "__cs", "__cn",
        "__ccf", "__csf", "__cnf", "__pcc", "__pcs", "__pcn")
  }
}
