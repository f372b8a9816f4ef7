package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the star schema described in TESTDATA.md.
  *
  * The reference fetches tables as CSV strings through a Snowflake cursor
  * (reference: tools/snowflake_tool.py:146-165); here every table is a
  * columnar parquet scan so Catalyst can push filters/projections into the
  * file source — at 100 TB the scan reads only the referenced columns.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw long (spark.sql.legacy.parquet.nanosAsLong, set by GraftSession);
    // truncate nanos→micros like DuckDB/Arrow do when downcasting.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
