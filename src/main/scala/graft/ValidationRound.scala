package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One validation round over a catalog of table pairs — the reference
  * agent's operating loop (validate every table pair, write one
  * dw_data_metrics-style row each, snowflake_tool.py:23-39) composed
  * from the engine's gates so the expensive step runs ONLY where the
  * cheap steps say it must:
  *
  *   1. [[TableDiff.schemaDrift]] — metadata only; a drifted schema
  *      fails the pair immediately (running a row diff across a schema
  *      change reports garbage counts).
  *   2. [[TableDiff.partitionChecksum]] — when the pair declares a
  *      partition column: one map-side summary pass per side. A fully
  *      clean checksum SKIPS the row diff — at 100 TB this is the round
  *      that costs two scans instead of a full-outer shuffle join.
  *   3. [[TableDiff.metricsMulti]] — the full metrics row, only for
  *      pairs that failed triage (or declared no partition column).
  *
  * The report is one bounded row per table (sample lists capped by
  * `sampleCap`), built driver-side — table COUNT is metadata-scale; the
  * per-pair work is Spark jobs.
  */
object ValidationRound {

  /** One table pair to validate. `partCol` opts into checksum triage
    * (the column must exist on both sides). */
  final case class TablePair(name: String, left: DataFrame, right: DataFrame,
                             pks: Seq[String], exclude: Seq[String] = Nil,
                             partCol: Option[String] = None)

  private val schema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("schema_ok", BooleanType, nullable = false),
    StructField("partitions_checked", LongType, nullable = false),
    StructField("partitions_drifted", LongType, nullable = false),
    StructField("total_record_count_hive", LongType, nullable = false),
    StructField("total_record_count_sf", LongType, nullable = false),
    StructField("hive_only_count", LongType, nullable = false),
    StructField("sf_only_count", LongType, nullable = false),
    StructField("data_discrepancy_count", LongType, nullable = false),
    StructField("hive_only_pk_values", StringType, nullable = false),
    StructField("sf_only_pk_values", StringType, nullable = false),
    StructField("data_discrepancy_pk_values", StringType, nullable = false)))

  /** Per-pair status: `schema_drift` (gate failed, no data read),
    * `clean` (checksum triage proved parity — row diff skipped; counts
    * come from the triage summaries), or `diffed` (full metrics row). */
  def report(spark: SparkSession, pairs: Seq[TablePair],
             sampleCap: Int = 100): DataFrame = {
    val rows = pairs.map { p =>
      // The gate honors the pair's exclusions: a one-sided audit column
      // the catalog already excludes (the reference's operating mode)
      // must not permanently fail the pair as schema_drift.
      val drifted = TableDiff.schemaDrift(
          p.left.drop(p.exclude: _*), p.right.drop(p.exclude: _*))
        .filter(col("status") =!= "ok").count()
      if (drifted > 0)
        Row(p.name, "schema_drift", false, 0L, 0L, 0L, 0L, 0L, 0L, 0L, "", "", "")
      else {
        val triage = p.partCol.map { pc =>
          // coalesce: an empty pair (not-yet-populated table) sums to
          // NULL over zero partitions and must report clean, not NPE.
          TableDiff.partitionChecksum(p.left, p.right, pc, p.pks, p.exclude)
            .agg(count(lit(1)),
              count(when(col("status") =!= "ok", 1)),
              coalesce(sum(col("hive_count")), lit(0L)),
              coalesce(sum(col("sf_count")), lit(0L))).head()
        }
        val (nParts, nDrifted) =
          triage.map(t => (t.getLong(0), t.getLong(1))).getOrElse((0L, 0L))
        if (triage.isDefined && nDrifted == 0L) {
          // Checksums prove parity: report the counts the triage already
          // paid for and SKIP the diff join entirely.
          val t = triage.get
          Row(p.name, "clean", true, nParts, 0L,
            t.getLong(2), t.getLong(3), 0L, 0L, 0L, "", "", "")
        } else {
          val m = TableDiff.metricsMulti(p.left, p.right, p.name, p.pks,
            p.exclude, sampleCap).head()
          Row(p.name, "diffed", true, nParts, nDrifted,
            m.getAs[Long]("total_record_count_hive"),
            m.getAs[Long]("total_record_count_sf"),
            m.getAs[Long]("hive_only_count"),
            m.getAs[Long]("sf_only_count"),
            m.getAs[Long]("data_discrepancy_count"),
            m.getAs[String]("hive_only_pk_values"),
            m.getAs[String]("sf_only_pk_values"),
            m.getAs[String]("data_discrepancy_pk_values"))
        }
      }
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
