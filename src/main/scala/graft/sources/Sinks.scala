package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet sink helpers encoding the layout decisions that matter at
  * 100 TB: directory partitioning for partition pruning on read, and
  * within-file sort for min/max page skipping on the sort key.
  */
object Sinks {

  /** Write hive-style partitioned parquet: readers filtering on
    * `partitionCols` prune whole directories before any I/O. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Write parquet sorted within partitions on `sortCols`: parquet
    * row-group statistics then let scans skip pages for range predicates
    * on those columns (poor man's clustering where bucketed metastore
    * tables aren't available). When `files` is set, the repartition is BY
    * RANGE on the sort key — round-robin repartition would hand every
    * file a full-range sample, making each file's min/max span the whole
    * domain and defeating the cross-file pruning this sink exists for;
    * range partitioning gives disjoint per-file key ranges at the same
    * shuffle cost. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  files: Int = 0): Unit = {
    require(sortCols.nonEmpty, "sortCols must be non-empty")
    import org.apache.spark.sql.functions.col
    val base =
      if (files > 0) df.repartitionByRange(files, sortCols.map(col): _*) else df
    base.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-native ORC sink, optionally hive-style partitioned — the
    * reference's Hive side stores ORC, so warehouse parity needs the
    * engine to WRITE the format Hive reads, with the same directory-
    * pruning layout rules as the parquet sinks (ORC row-group stats give
    * the equivalent min/max skipping). */
  def writeOrc(df: DataFrame, path: String,
               partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** Single-file headered CSV for REPORT-sized frames (metrics rows,
    * rollups — the shape the reference posts to Slack/Jira). The
    * coalesce(1) is deliberate and only safe because reports are bounded
    * by construction (capped samples/lists); never use this for data
    * tables. */
  def writeCsvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
