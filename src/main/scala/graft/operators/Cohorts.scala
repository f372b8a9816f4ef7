package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-lifecycle analytics over event streams: ordered funnels, cohort
  * retention, and SCD type-2 history builds — the reporting layer a
  * warehouse-validation pipeline (the reference's domain) feeds.
  *
  * Scale shape shared by all three: everything is keyed by the entity
  * column, so each operator is one hash shuffle on the entity key and all
  * windows/aggregations/joins reuse that partitioning; per-step/bucket
  * outputs are bounded model-scale rows (steps × 1, cohorts × offsets,
  * runs per entity).
  */
object Cohorts {

  /** Ordered conversion funnel: step i counts entities whose FIRST
    * qualifying event occurs STRICTLY AFTER their step-(i−1) time — the
    * standard "did the user view, then click, then buy, in that order"
    * product query (not mere per-step presence, which overcounts).
    *
    * Each step is one filtered aggregation joined to the surviving
    * entities of the previous step on the entity key — survivors shrink
    * monotonically, and every join is an equi-join on the same key the
    * aggregations hash on. The report is one bounded row per step; the
    * conversion ratio is ONE long/long IEEE division (engine-portable).
    *
    * @param steps ordered (stepName, predicate) pairs; must be non-empty.
    */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
             steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = col(entityCol)
    // Per-entity first-qualifying time per step, threaded left to right.
    val firsts: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, ((_, pred), i)) =>
        val base = events.filter(pred)
        val timed =
          if (i == 0) base
          else base.join(acc.last.select(e, col(s"t${i - 1}")), Seq(entityCol))
            .filter(col(tsCol) > col(s"t${i - 1}"))
        acc :+ timed.groupBy(e).agg(min(col(tsCol)).as(s"t$i"))
      }
    val counts = firsts.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_entities"))
        .select(lit(i + 1).as("step"), lit(steps(i)._1).as("step_name"),
          col("n_entities"))
    }.reduce(_ unionByName _)
    // Entry count broadcast back as a 1-row frame (the mixtureReport
    // scalar pattern): steps are bounded, the window is over step rows.
    val w = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("pct_of_entry",
        col("n_entities").cast("double") /
          max(when(col("step") === 1, col("n_entities"))).over(w)
            .cast("double"))
      .select(col("step"), col("step_name"), col("n_entities"),
        col("pct_of_entry"))
  }

  /** Cohort retention matrix: entities are assigned to the bucket
    * (`bucketTrunc` of their FIRST event) and counted once per distinct
    * active bucket; `offset` = whole buckets since the cohort bucket.
    * Retention is each cell divided by its cohort's size (= the offset-0
    * cell — an entity is always active in its own first bucket).
    *
    * Two aggregations and one equi-join, all keyed by the entity column;
    * the final group is bounded (cohorts × offsets). The distinct
    * (entity, bucket) collapse happens FIRST, so the join and the final
    * count see one row per entity-bucket, never the raw event stream.
    *
    * @param bucketTrunc maps a timestamp column to its bucket start date
    *                    (e.g. `date_trunc("week", _)`) — must be monotone.
    * @param bucketDays  bucket width in days (offset = date diff / width).
    */
  def retention(events: DataFrame, entityCol: String, tsCol: String,
                bucketTrunc: Column => Column, bucketDays: Int): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val e = col(entityCol)
    val active = events
      .select(e, bucketTrunc(col(tsCol)).cast("date").as("bucket"))
      .groupBy(e, col("bucket")).agg(count(lit(1)).as("__n"))
    val cohort = active.groupBy(e).agg(min(col("bucket")).as("cohort_bucket"))
    val cells = active.join(cohort, Seq(entityCol))
      .withColumn("bucket_offset",
        (datediff(col("bucket"), col("cohort_bucket")) / bucketDays)
          .cast("int"))
      .groupBy(col("cohort_bucket"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_entities"))
    val w = Window.partitionBy(col("cohort_bucket"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    cells
      .withColumn("retention",
        col("n_entities").cast("double") /
          max(when(col("bucket_offset") === 0, col("n_entities"))).over(w)
            .cast("double"))
      .select(col("cohort_bucket"), col("bucket_offset"), col("n_entities"),
        col("retention"))
  }

  /** SCD type-2 history build: collapses an entity's event stream into
    * closed/open attribute intervals — consecutive events with the same
    * (null-safe) attribute value become ONE version row with
    * `[valid_from, valid_to)` bounds, `valid_to` open (null) on the
    * current version. The standard dimension-history construction a
    * Hive→Snowflake migration validates against.
    *
    * One shuffle on the entity key; the change-flag window, the running
    * version sum, the per-run aggregate, and the `lead` that closes each
    * interval all reuse it. Ordering ties break on `tieCol` so run
    * boundaries are deterministic under equal timestamps.
    */
  def scd2(events: DataFrame, entityCol: String, tsCol: String,
           attrCol: String, tieCol: String): DataFrame = {
    val e = col(entityCol)
    val w = Window.partitionBy(e).orderBy(col(tsCol), col(tieCol))
    val runs = events
      // <=> is null-safe: a null-attribute run is a run like any other.
      // The first row is flagged explicitly — lag(null) <=> null would
      // otherwise read a null-attribute opener as "unchanged" and start
      // the version sequence at 0.
      .withColumn("__chg",
        when(row_number().over(w) === 1, 1)
          .when(lag(col(attrCol), 1).over(w) <=> col(attrCol), 0)
          .otherwise(1))
      .withColumn("__ver",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val vw = Window.partitionBy(e).orderBy(col("version"))
    runs.groupBy(e, col("__ver").as("version"))
      .agg(first(col(attrCol)).as("attr_value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(vw))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0).cast("int"))
      .select(e, col("version").cast("long"), col("attr_value"),
        col("valid_from"), col("valid_to"), col("n_events"),
        col("is_current"))
  }
}
