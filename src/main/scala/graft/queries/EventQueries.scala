package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Joins
import graft.sources.Tables

/** Queries #32-#33 of SURVEY.md §2: batch twins of the streaming operators
  * over `events` (event_id, ts, user_id, event_type, value, props), plus
  * the temporal/range join surface (#61-#62). The live Structured
  * Streaming versions are in graft.streaming.EventStream.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").withColumn("ts", col("ts").cast("timestamp"))

  /** Value bands for the range join: log-ish widths like a real pricing /
    * latency banding dimension; [0, 1000) covers the corpus domain. */
  private val bands = Seq(
    ("b0", 0.0, 1.0), ("b1", 1.0, 5.0), ("b2", 5.0, 10.0),
    ("b3", 10.0, 50.0), ("b4", 50.0, 100.0), ("b5", 100.0, 250.0),
    ("b6", 250.0, 500.0), ("b7", 500.0, 1000.0))

  private val bandsSql: String =
    "bands AS (SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi FROM (VALUES " +
      bands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ") +
      ") t(band, lo, hi))"

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour window aggregation: the batch twin of the streaming
    // watermark+window query. Money-style sums as exact milli-units.
    "q_event_window_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 1000).cast("long")).as("value_milli"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("n_events"), col("value_milli"), col("min_value"), col("max_value"))
        .orderBy(col("hour_start"), col("event_type"))),

    // Day-over-day volume drift per event type — the temporal twin of
    // q_count_compare and the monitor a discrepancy pipeline runs first
    // (a migration that silently drops a feed shows up as a count-ratio
    // cliff before any row-level diff). One aggregation shuffle collapses
    // the corpus to (type, day) rows — BOUNDED model data (types × days)
    // — and the lag window runs over those group rows, never the events.
    // The drift flag compares integers (n vs 2·prev) so it is
    // engine-exact; the ratio is one long/long division (IEEE-portable).
    "q_count_drift" -> ((s, dir) =>
      graft.operators.Monitoring.countDrift(events(s, dir),
          Seq("event_type"), to_date(col("ts")))
        .orderBy(col("event_type"), col("day"))),

    // Robust anomaly flags on the same daily counts — countDrift's
    // distributional upgrade: each day is compared to the group's
    // MEDIAN ± 3·MAD instead of just its predecessor (a persisting
    // spike flags every day it persists; volatility is per-group, not
    // one global factor). Median/MAD are the linear-interpolation
    // percentile both engines define identically over (type, day)
    // GROUP rows — bounded model data — so the raw doubles hash-match.
    "q_count_anomaly" -> ((s, dir) =>
      graft.operators.Monitoring.countAnomaly(events(s, dir),
          Seq("event_type"), to_date(col("ts")))
        .orderBy(col("event_type"), col("day"))),

    // Rolling 7-day per-user activity features: a RANGE-frame window on
    // epoch MILLIS (both engines truncate micros→millis identically;
    // range peers at equal timestamps are included by SQL semantics in
    // both). The summed value is integral millis so the rolling sum is
    // engine-exact. One shuffle on user_id; the frame scan is linear
    // per user (Spark's sliding range frame).
    "q_rolling_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_millis(col("ts")))
        // Trailing 7 days as the HALF-OPEN (t−7d, t]: range frames are
        // inclusive at both ends, so the lower bound is 7d−1ms — the
        // earlier [t−6d, t] spelling covered only 6 days of intraday
        // history under a "7-day" name (review-pass catch).
        .rangeBetween(-604799999L, 0)
      events(s, dir).select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_7d"),
        sum(round(col("value") * 1000).cast("long")).over(w).as("value_milli_7d"))
        .orderBy(col("event_id"))
    }),

    // HOT-KEY-SAFE rolling window — identical contract (same DuckDB
    // oracle as q_rolling_window), computed as a cumulative DIFFERENCE
    // over (user, day-bucket) two-phase prefix sums with cum(t−7d]
    // read off a zero-weight probe row merged into the same stream,
    // instead of a per-user sliding RANGE frame. Spark's sliding frame
    // re-aggregates its buffer every time the lower bound moves (no
    // retraction): a Zipf-headed user measured 18-26× wall-clock
    // degradation at sf0.1 (SKEW_BENCH.json); the cum-diff form is
    // frame-recompute-free and never gives one task more than one
    // key's one time slice.
    "q_rolling_salted" -> ((s, dir) =>
      graft.operators.Windows.rollingTrailing(
          events(s, dir).select(col("event_id"), col("user_id"), col("ts"),
            col("value")),
          key = "user_id", ts = "ts", tie = "event_id",
          sumExpr = round(col("value") * 1000).cast("long"),
          spanMillis = 604800000L, bucketWidthMillis = 86400000L,
          cntAlias = "n_7d", sumAlias = "value_milli_7d")
        .select(col("event_id"), col("user_id"), col("n_7d"),
          col("value_milli_7d"))
        .orderBy(col("event_id"))),

    // Dense daily resample of per-user purchase value with forward
    // fill (last-observation-carried-forward): the sparse purchase
    // stream (~0.4 events/user/day, so most grid cells are gaps)
    // becomes one row per (user, day) carrying the last known daily
    // spend. Raw events collapse to (user, day) aggregates in ONE
    // shuffle before any grid work; the grid is bounded by the time
    // RANGE (≤ 30 buckets/user here), never the event count, and the
    // fill frame is the O(1)-per-row UnboundedPreceding kind.
    "q_gap_fill" -> ((s, dir) =>
      graft.operators.GapFill.resample(
          events(s, dir).filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts"), col("value")),
          key = "user_id", ts = "ts",
          sumExpr = round(col("value") * 1000).cast("long"),
          bucketMillis = 86400000L)
        .select(col("user_id"), col("bucket_ms"), col("n_bucket"),
          col("sum_bucket"), col("filled_sum"))
        .orderBy(col("user_id"), col("bucket_ms"))),

    // EXACT per-group percentiles — the ground truth q_sketch_profile
    // approximates. Both engines define quantiles by the same linear
    // interpolation over the sorted group, so the doubles hash-match
    // bit-for-bit. Exact percentile buffers the group's values (memory
    // O(group)) — at 100 TB use the sketch; this is the verify-scale
    // twin and the small-dimension profiling query.
    "q_group_percentiles" -> ((s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_value"),
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.9)).as("p90"),
          max(col("value")).as("max_value"))
        .orderBy(col("event_type"))),

    // Winsorize: clamp value at the corpus's own P1/P99 cuts (robust
    // outlier clip before scaling) — exact-percentile cuts share
    // quantile_cont's interpolation (the q_group_percentiles parity),
    // the clamp is pure comparisons, so the rows hash-match the oracle.
    "q_winsorize" -> ((s, dir) =>
      graft.operators.Sampling.winsorize(events(s, dir), "event_id", "value")
        .orderBy(col("id"))),

    // Its 100 TB twin: approx_percentile cuts (KLL, bounded state).
    // Rows-only; clamp agreement vs the exact variant floored in
    // VerifyExtras.
    "q_winsorize_sketch" -> ((s, dir) =>
      graft.operators.Sampling.winsorizeSketch(events(s, dir), "event_id",
          "value")
        .orderBy(col("id"))),

    // Sketch-based profiling (HLL distinct + quantile sketches): approx
    // values are engine-specific → rows-only; error bounds pinned in
    // SketchesAndSinksSpec.
    "q_sketch_profile" -> ((s, dir) =>
      graft.operators.Sketches.profile(events(s, dir),
          Seq(col("event_type")), col("value"), col("user_id"))
        .orderBy(col("event_type"))),

    // Semi-structured props parsing (log-analytics staple): typed JSON
    // extraction via from_json, rolled up per event type.
    "q_json_extract" -> ((s, dir) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      events(s, dir)
        .withColumn("k", from_json(col("props"), schema).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // Gap-based sessionization (30-min inactivity): lag → new-session flag
    // → running sum as session id → per-session rollup. One shuffle on
    // user_id; both windows and the groupBy share that partitioning.
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = events(s, dir)
        .withColumn("prev_ms", unix_millis(lag(col("ts"), 1).over(w)))
        .withColumn("new_session",
          when(col("prev_ms").isNull ||
            unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(round(col("value") * 1000).cast("long")).as("value_milli"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // As-of join: each view picks the user's newest purchase at-or-before
    // its timestamp (the oracle is DuckDB's native ASOF LEFT JOIN).
    "q_asof_join" -> ((s, dir) => {
      val e = events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Joins.asOfJoin(views, purchases, "user_id", "ts",
          payload = Seq("event_id", "value"), tieBreak = Some("event_id"),
          prefix = "purchase_")
        .orderBy(col("event_id"))
    }),

    // SALTED as-of join — the hot-key-safe variant: identical semantics
    // (same DuckDB ASOF oracle as q_asof_join), window partitioned on
    // (user, 1-hour bucket) with cross-bucket carry stitching, so a
    // Zipf-headed user never funnels through one window task.
    "q_asof_salted" -> ((s, dir) => {
      val e = events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Joins.asOfJoinSalted(views, purchases, "user_id", "ts",
          payload = Seq("event_id", "value"),
          bucket = Joins.millisBucket(3600000L),
          tieBreak = Some("event_id"), prefix = "purchase_")
        .orderBy(col("event_id"))
    }),

    // NATIVE session_window sessionization — the built-in operator the
    // lag/cumsum form (q_sessionize) hand-rolls, usable in batch AND
    // streaming group-bys. Boundary semantics MATCH q_sessionize: an
    // event exactly gap after the previous one still MERGES (verified
    // empirically and pinned in SessionWindowSpec — a review pass caught
    // the opposite assumption here), so the oracle's new-session
    // condition is the same strict >.
    "q_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 1000).cast("long")).as("value_milli"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_horizon"), col("n_events"), col("value_milli"))
        .orderBy(col("user_id"), col("session_start"))),

    // Forward as-of: each view picks the user's EARLIEST purchase
    // at-or-after its timestamp (conversion attribution; oracle is
    // DuckDB ASOF with the inequality flipped).
    "q_asof_forward" -> ((s, dir) => {
      val e = events(s, dir)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Joins.asOfJoinForward(views, purchases, "user_id", "ts",
          payload = Seq("event_id", "value"), tieBreak = Some("event_id"),
          prefix = "next_")
        .orderBy(col("event_id"))
    }),

    // Ordered conversion funnel view→click→purchase: step i counts users
    // whose first qualifying event is STRICTLY AFTER their step-(i−1)
    // time (presence alone overcounts). Bounded one-row-per-step report.
    "q_event_funnel" -> ((s, dir) => {
      val e = events(s, dir)
      graft.operators.Cohorts.funnel(e, "user_id", "ts", Seq(
          "view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
        .orderBy(col("step"))
    }),

    // Weekly cohort retention matrix: cohort = week of first activity,
    // cells = distinct active users per (cohort, week offset), retention
    // = cell / cohort size (the offset-0 cell).
    "q_retention_cohort" -> ((s, dir) =>
      graft.operators.Cohorts.retention(events(s, dir), "user_id", "ts",
          bucketTrunc = date_trunc("week", _), bucketDays = 7)
        .orderBy(col("cohort_bucket"), col("bucket_offset"))),

    // SCD type-2 history build: per-user event_type runs collapsed to
    // [valid_from, valid_to) version intervals, open on the current one
    // — the dimension-history construction a migration validates.
    "q_scd2_build" -> ((s, dir) =>
      graft.operators.Cohorts.scd2(events(s, dir), "user_id", "ts",
          attrCol = "event_type", tieCol = "event_id")
        .orderBy(col("user_id"), col("version"))),

    // Range join on quantized cells, rolled up per band (the rollup's
    // count/id-checksum/value sum would expose any misassigned row).
    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val b = bands.toDF("band", "lo", "hi")
      Joins.rangeJoinBucketed(
          events(s, dir).select(col("event_id"), col("value")),
          "value", b, "lo", "hi", cellSize = 50.0)
        .groupBy(col("band"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_sum"),
          sum(round(col("value") * 1000).cast("long")).as("value_milli"))
        .orderBy(col("band"))
    }),

    // Per-day ROC AUC of "value predicts purchase" — the classifier-eval
    // staple (quality-score validation) as a HISTOGRAM rank-sum: one
    // map-side-combinable groupBy collapses the corpus to (day,
    // score_milli) cells, the tie-corrected Mann-Whitney numerator is a
    // prefix sum over that bounded score dimension, and the single
    // division is an exact integer floor to ppm. No corpus-scale window,
    // no float is ever summed.
    "q_auc" -> ((s, dir) =>
      graft.operators.Eval.aucByGroup(
          events(s, dir).withColumn("day", to_date(col("ts"))),
          "day", "value", col("event_type") === "purchase")
        .withColumnRenamed("grp", "day")
        .orderBy(col("day"))),

    // Calibration / reliability bins for the same score: min-max
    // normalized fixed-width deciles (scalar-aggregate broadcast for the
    // bounds — the winsorize pattern), per-bin positive rate and mean
    // score frozen to exact integer ppm/micro units.
    "q_calibration" -> ((s, dir) =>
      graft.operators.Eval.calibrationBins(events(s, dir), "value",
          col("event_type") === "purchase", nBins = 10)
        .orderBy(col("bin"))),

    // First-order Markov transition matrix of event types per user
    // journey: ONE user-key shuffle (the sessionize shape, per-key state
    // = one previous row), counts collapse to the (from, to) dimension,
    // probabilities are exact integer ppm of each from-state total.
    "q_markov_chain" -> ((s, dir) =>
      graft.operators.Eval.transitionMatrix(events(s, dir), "user_id",
          "ts", "event_id", "event_type")
        .orderBy(col("from_state"), col("to_state"))),

    // Per-group robust outliers via median/MAD modified z-score — the
    // outlier gate a few extreme values can't drag toward themselves
    // (winsorize clips at global cuts; this FLAGS per group). Exact
    // percentiles = the verify-scale twin; the sketch variant below is
    // the 100 TB path.
    "q_mad_outliers" -> ((s, dir) =>
      graft.operators.Sampling.robustOutliers(events(s, dir), "event_type",
          "event_id", "value")
        .orderBy(col("grp"), col("id"))),

    // Its 100 TB twin: approx_percentile med/MAD cuts (KLL, bounded
    // state). Rows-only; flag agreement vs the exact variant floored in
    // VerifyExtras (mad_outliers_sketch_agreement).
    "q_mad_outliers_sketch" -> ((s, dir) =>
      graft.operators.Sampling.robustOutliersSketch(events(s, dir),
          "event_type", "event_id", "value")
        .orderBy(col("grp"), col("id")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_event_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q_group_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  min(value) AS min_value,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  max(value) AS max_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_winsorize" ->
      """WITH v AS (SELECT event_id, value FROM events WHERE value IS NOT NULL),
        |cuts AS (SELECT quantile_cont(value, 0.01) AS lo,
        |                quantile_cont(value, 0.99) AS hi FROM v)
        |SELECT event_id AS id, value,
        |  least(greatest(value, lo), hi) AS value_w,
        |  CAST(CASE WHEN value < lo THEN -1 WHEN value > hi THEN 1
        |       ELSE 0 END AS INTEGER) AS clipped
        |FROM v CROSS JOIN cuts ORDER BY id""".stripMargin,

    "q_rolling_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS value_milli_7d
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY tms
        |             RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Same contract, different plan: the salted cum-diff form must hash-
    // match the range-frame oracle exactly.
    "q_rolling_salted" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS value_milli_7d
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY tms
        |             RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS b, count(*) AS n,
        |    CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |s AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(generate_series(lo, hi)) AS b FROM s),
        |f AS (
        |  SELECT g.user_id, g.b, coalesce(e.n, 0) AS n_bucket,
        |    e.v AS sum_bucket,
        |    last_value(e.v IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |  FROM g LEFT JOIN e ON g.user_id = e.user_id AND g.b = e.b)
        |SELECT user_id, CAST(b * 86400000 AS BIGINT) AS bucket_ms,
        |  CAST(n_bucket AS BIGINT) AS n_bucket, sum_bucket, filled_sum
        |FROM f ORDER BY user_id, bucket_ms""".stripMargin,

    "q_count_drift" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, day, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
        |  FROM daily)
        |SELECT event_type, day, n, prev_n,
        |  CASE WHEN prev_n IS NULL THEN NULL
        |    ELSE CAST(n AS DOUBLE) / CAST(prev_n AS DOUBLE) END AS ratio,
        |  CAST(CASE WHEN prev_n IS NOT NULL AND (n > prev_n * 2 OR n * 2 < prev_n)
        |    THEN 1 ELSE 0 END AS INTEGER) AS is_drift
        |FROM lagged ORDER BY event_type, day""".stripMargin,

    "q_count_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |meds AS (
        |  SELECT event_type, quantile_cont(n, 0.5) AS med
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT d.event_type, d.day, d.n, d.med,
        |    abs(CAST(d.n AS DOUBLE) - d.med) AS deviation
        |  FROM (SELECT daily.*, m.med FROM daily
        |        JOIN meds m USING (event_type)) d),
        |mads AS (
        |  SELECT event_type, quantile_cont(deviation, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, d.day, d.n, d.med, m.mad, d.deviation,
        |  CAST(CASE WHEN d.deviation > m.mad * 3.0 THEN 1 ELSE 0 END
        |    AS INTEGER) AS is_anomaly
        |FROM dev d JOIN mads m USING (event_type)
        |ORDER BY event_type, day""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    // session_window horizon = last ts + gap; new-session on strict >
    // (exact-gap events merge — see the Spark-side comment).
    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_horizon,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    // Purchases deduped per (user, ts) to the max event_id first: the
    // Spark window picks exactly that row among equal-time purchases,
    // while ASOF's own tie choice among duplicates is unspecified.
    "q_asof_join" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |p0 AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT * FROM p0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1)
        |SELECT v.event_id, v.user_id, v.ts, v.value,
        |  p.ts AS purchase_ts, p.event_id AS purchase_event_id,
        |  p.value AS purchase_value
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.ts >= p.ts
        |ORDER BY v.event_id""".stripMargin,

    // The salted variant must produce byte-identical results to the
    // plain as-of — one oracle text, two execution strategies.
    "q_asof_salted" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |p0 AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT * FROM p0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1)
        |SELECT v.event_id, v.user_id, v.ts, v.value,
        |  p.ts AS purchase_ts, p.event_id AS purchase_event_id,
        |  p.value AS purchase_value
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.ts >= p.ts
        |ORDER BY v.event_id""".stripMargin,

    // Same tie-dedup as q_asof_join: among equal-time purchases the max
    // event_id is the defined winner in both engines.
    "q_asof_forward" ->
      """WITH v AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |p0 AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT * FROM p0
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1)
        |SELECT v.event_id, v.user_id, v.ts, v.value,
        |  p.ts AS next_ts, p.event_id AS next_event_id,
        |  p.value AS next_value
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.ts <= p.ts
        |ORDER BY v.event_id""".stripMargin,

    "q_event_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |n AS (
        |  SELECT 1 AS step, 'view' AS step_name, count(*) AS n_entities FROM s1
        |  UNION ALL
        |  SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL
        |  SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(step AS INT) AS step, step_name,
        |  CAST(n_entities AS BIGINT) AS n_entities,
        |  CAST(n_entities AS DOUBLE) /
        |    CAST(max(CASE WHEN step = 1 THEN n_entities END) OVER () AS DOUBLE)
        |    AS pct_of_entry
        |FROM n ORDER BY step""".stripMargin,

    "q_retention_cohort" ->
      """WITH active AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS bucket,
        |    count(*) AS __n
        |  FROM events GROUP BY 1, 2),
        |cohort AS (
        |  SELECT user_id, min(bucket) AS cohort_bucket FROM active GROUP BY 1),
        |cells AS (
        |  SELECT c.cohort_bucket,
        |    CAST(datediff('day', c.cohort_bucket, a.bucket) / 7 AS INT)
        |      AS bucket_offset,
        |    count(*) AS n_entities
        |  FROM active a JOIN cohort c ON a.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT cohort_bucket, bucket_offset,
        |  CAST(n_entities AS BIGINT) AS n_entities,
        |  CAST(n_entities AS DOUBLE) /
        |    CAST(max(CASE WHEN bucket_offset = 0 THEN n_entities END)
        |      OVER (PARTITION BY cohort_bucket) AS DOUBLE) AS retention
        |FROM cells ORDER BY cohort_bucket, bucket_offset""".stripMargin,

    // Run values are equal within a version by construction, so the
    // oracle's min(attr) picks the same value Spark's first() does
    // (including an all-null run).
    "q_scd2_build" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN row_number() OVER w = 1 THEN 1
        |         WHEN lag(event_type) OVER w IS NOT DISTINCT FROM event_type
        |         THEN 0 ELSE 1 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ver
        |  FROM flagged),
        |versions AS (
        |  SELECT user_id, ver AS version, min(event_type) AS attr_value,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM runs GROUP BY 1, 2)
        |SELECT user_id, version, attr_value, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
        |    ORDER BY version) IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM versions ORDER BY user_id, version""".stripMargin,

    "q_range_join" ->
      s"""WITH $bandsSql,
         |j AS (
         |  SELECT b.band, b.lo, b.hi, e.event_id, e.value
         |  FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi)
         |SELECT band, lo, hi, count(*) AS n_events,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
         |FROM j GROUP BY 1, 2, 3 ORDER BY band""".stripMargin,

    // HUGEINT products + `//` floor-division mirror Spark's
    // DECIMAL(38,0) + floor() exactly (all quantities non-negative).
    "q_auc" ->
      """WITH r AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 1000) AS BIGINT) AS score_milli,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
        |  FROM events WHERE value IS NOT NULL),
        |hist AS (
        |  SELECT day, score_milli, CAST(sum(is_pos) AS BIGINT) AS pos,
        |    CAST(sum(1 - is_pos) AS BIGINT) AS neg
        |  FROM r GROUP BY 1, 2),
        |cum AS (
        |  SELECT day, pos, neg,
        |    COALESCE(sum(neg) OVER (PARTITION BY day ORDER BY score_milli
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_neg_below
        |  FROM hist),
        |agg AS (
        |  SELECT day, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    sum(CAST(pos AS HUGEINT) * (2 * cum_neg_below + neg)) AS auc_num
        |  FROM cum GROUP BY 1)
        |SELECT day, n_pos, n_neg,
        |  CAST(auc_num * 1000000 // (CAST(n_pos AS HUGEINT) * n_neg * 2)
        |    AS BIGINT) AS auc_ppm
        |FROM agg WHERE n_pos > 0 AND n_neg > 0 ORDER BY day""".stripMargin,

    "q_calibration" ->
      """WITH r AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS score_milli,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
        |  FROM events WHERE value IS NOT NULL),
        |mm AS (SELECT min(score_milli) AS lo, max(score_milli) AS hi FROM r),
        |b AS (
        |  SELECT CASE WHEN hi = lo THEN 0 ELSE
        |    least(CAST((CAST(score_milli AS HUGEINT) - lo) * 10 // (hi - lo)
        |      AS BIGINT), 9) END AS bin, is_pos, score_milli
        |  FROM r CROSS JOIN mm)
        |SELECT bin, count(*) AS n, CAST(sum(is_pos) AS BIGINT) AS n_pos,
        |  CAST(CAST(sum(is_pos) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
        |    AS pos_rate_ppm,
        |  CAST(CAST(sum(score_milli) AS HUGEINT) * 1000 // count(*) AS BIGINT)
        |    AS mean_score_micro
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_markov_chain" ->
      """WITH pairs AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_state,
        |    event_type AS to_state
        |  FROM events),
        |cnt AS (
        |  SELECT from_state, to_state, count(*) AS n
        |  FROM pairs WHERE from_state IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_state, CAST(sum(n) AS BIGINT) AS from_total
        |  FROM cnt GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n, t.from_total,
        |  CAST(CAST(c.n AS HUGEINT) * 1000000 // t.from_total AS BIGINT)
        |    AS prob_ppm
        |FROM cnt c JOIN tot t USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,

    "q_mad_outliers" ->
      """WITH v AS (
        |  SELECT event_type AS grp, event_id AS id,
        |    CAST(value AS DOUBLE) AS value
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |med AS (SELECT grp, quantile_cont(value, 0.5) AS med
        |        FROM v GROUP BY 1),
        |mad AS (
        |  SELECT v.grp, quantile_cont(abs(v.value - m.med), 0.5) AS mad
        |  FROM v JOIN med m USING (grp) GROUP BY 1),
        |j AS (
        |  SELECT v.grp, v.id, v.value, m.med, d.mad
        |  FROM v JOIN med m USING (grp) JOIN mad d USING (grp))
        |SELECT grp, id, value, med, mad,
        |  CASE WHEN mad = 0 THEN NULL
        |       ELSE 0.6745 * (value - med) / mad END AS robust_z,
        |  CASE WHEN mad = 0 THEN CAST(value <> med AS INT)
        |       ELSE CAST(abs(0.6745 * (value - med) / mad) > 3.5 AS INT)
        |       END AS is_outlier
        |FROM j ORDER BY grp, id""".stripMargin
  )
}
