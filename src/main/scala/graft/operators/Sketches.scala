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
    * rsd/accuracy knobs trade state size for error. Both quantiles come
    * from ONE percentile_approx over the percentage array — the physical
    * planner deduplicates the two identical aggregate expressions into a
    * single QuantileSummaries buffer, where separate per-quantile calls
    * each built and merged their own sketch (2× state and CPU on a
    * profiling sweep). */
  def profile(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
              distinctOf: Column, rsd: Double = 0.05,
              accuracy: Int = 10000): DataFrame = {
    val qs = percentile_approx(valueCol, array(lit(0.5), lit(0.95)), lit(accuracy))
    df.groupBy(groupCols: _*).agg(
      count(lit(1)).as("n"),
      approx_count_distinct(distinctOf, rsd).as("approx_distinct"),
      element_at(qs, 1).as("p50"),
      element_at(qs, 2).as("p95"),
      min(valueCol).as("min_v"),
      max(valueCol).as("max_v"))
  }
}
