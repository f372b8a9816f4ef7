package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB profiling sweeps: HyperLogLog++
  * distinct counts and quantile sketches. Exact twins (`countDistinct`,
  * sort-based percentile) cost a full shuffle of the value space; these
  * are single-pass, fixed-size-state, map-side-combinable — the only way
  * per-table metrics like the reference's dw_data_metrics row counts stay
  * cheap when a table stops fitting in one warehouse's working set.
  */
object Sketches {

  /** Per-group profile: exact count, HLL distinct, approximate quantiles.
    * rsd/accuracy knobs trade state size for error. */
  def profile(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
              distinctOf: Column, rsd: Double = 0.05,
              accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(distinctOf, rsd).as("approx_distinct"),
      percentile_approx(valueCol, lit(0.5), lit(accuracy)).as("p50"),
      percentile_approx(valueCol, lit(0.95), lit(accuracy)).as("p95"),
      min(valueCol).as("min_v"),
      max(valueCol).as("max_v"))
}
