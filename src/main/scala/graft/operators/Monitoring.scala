package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Volume-drift monitoring: the first alarm a warehouse-parity pipeline
  * watches (the reference triages per-table discrepancy metrics; a feed
  * that silently drops or doubles shows up as a period-over-period count
  * cliff long before any row-level diff is worth running).
  */
object Monitoring {

  /** Per-(dims, period) row counts with the previous period's count, the
    * count ratio, and a drift flag when volume more than `factor`-folds
    * up or down.
    *
    * Scale shape: one aggregation shuffle collapses the corpus to
    * (dims, period) group rows — bounded model data (dim cardinality ×
    * periods), so the lag window runs over group rows, never corpus
    * rows. The drift flag compares integers (`n` vs `factor·prev`) and
    * is engine-exact; `ratio` is a single long/long division — IEEE
    * correctly-rounded, portable — and NULL for each group's first
    * period (no prior to compare against, which is not the same claim
    * as "no drift").
    */
  def countDrift(df: DataFrame, dims: Seq[String], period: Column,
                 factor: Int = 2): DataFrame = {
    require(dims.nonEmpty, "at least one grouping dimension")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    Seq("day", "n", "prev_n", "ratio", "is_drift").foreach(c =>
      require(!dims.contains(c), s"dimension '$c' collides with an output column"))
    val daily = df
      .groupBy(dims.map(col) :+ period.as("day"): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col("day"))
    daily
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("ratio",
        when(col("prev_n").isNull, lit(null).cast("double"))
          .otherwise(col("n").cast("double") / col("prev_n").cast("double")))
      .withColumn("is_drift",
        (col("prev_n").isNotNull &&
          (col("n") > col("prev_n") * factor || col("n") * factor < col("prev_n")))
          .cast("int"))
  }
}
