package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HiveFunctions.rowFingerprint

/** The discrepancy engine: Spark-native rebuild of the reference's
  * Snowflake-vs-Hive validation surface —
  *  - PK presence diff (reference: tools/compare_tool.py:34-42),
  *  - per-table `dw_data_metrics` rows (tools/snowflake_tool.py:23-39),
  *  - column-level mismatch matrix + roll-up (tools/data_matrix_tool.py,
  *    the COMPARE_MISMATCH_IGNORE_EXCLUDED_COL procedure at
  *    tools/snowflake_tool.py:41-52).
  *
  * Scale design: the whole diff is ONE full-outer shuffle join on the PK.
  * Row fingerprints (128-bit two-lane xxhash64, rowFingerprint — codegen'd
  * on raw column bytes, no string casts) are computed map-side before the
  * shuffle, so "is this row discrepant" is one 16-byte struct compare per
  * matched key — never a per-column compare across 100 TB.
  * The per-column matrix is only unpivoted for rows already known to
  * mismatch (a tiny subset), and PK sample arrays are capped at
  * `sampleCap`, so metrics rows stay O(1) regardless of input size
  * (the reference collects unbounded PK arrays; that pattern dies at scale).
  */
object TableDiff {

  /** Columns that participate in comparison: everything but the PK and the
    * excluded (audit) columns, in left-schema order. */
  def compareCols(df: DataFrame, pks: Seq[String], exclude: Seq[String]): Seq[String] = {
    val drop = (exclude ++ pks).map(_.toLowerCase).toSet
    df.columns.filterNot(c => drop.contains(c.toLowerCase)).toSeq
  }

  def compareCols(df: DataFrame, pk: String, exclude: Seq[String]): Seq[String] =
    compareCols(df, Seq(pk), exclude)

  /** Single sortable key representation: the raw column for simple PKs,
    * a ':'-joined string for composite PKs. (Safe only because [[diff]]
    * excludes NULL-PK rows first — concat_ws silently drops NULL
    * components, which would alias distinct partial keys.) */
  private def pkExpr(pks: Seq[String]): Column =
    if (pks.size == 1) col(pks.head)
    else concat_ws(":", pks.map(c => col(c).cast("string")): _*)

  /** Per-side prepared frame: (pk cols, fingerprint, compare columns).
    * Schema-aware fingerprint: map-bearing columns hash via their string
    * rendering (xxhash64 refuses MapType), everything else raw. */
  private def withHash(df: DataFrame, pks: Seq[String], cols: Seq[String], side: String): DataFrame =
    df.select(
      (pks.map(col) :+
        rowFingerprint(df, cols).as(s"${side}_hash")) ++:
        cols.map(c => col(c).as(s"${side}_$c")): _*)

  /** One full-outer join on the PK (single or composite) with presence +
    * fingerprint-mismatch flags. Output: `pk` (sortable key), the PK
    * columns, in_left, in_right, hash_mismatch, left_/right_ columns.
    *
    * Rows with ANY NULL key component are excluded on both sides: a NULL
    * key never matches in the join, so such a row would read as a
    * one-sided discrepancy it isn't (the warehouse PK contract is
    * non-null; the oracle's `pk IS NOT NULL` presence flags count these
    * rows nowhere, and this filter is the plan-level equivalent — it also
    * pushes to the scans). Table TOTALS in [[metricsMulti]] still count
    * every row. */
  def diff(left: DataFrame, right: DataFrame, pks: Seq[String],
           exclude: Seq[String]): DataFrame = {
    val cols = compareCols(left, pks, exclude)
    val pkNotNull = pks.map(col(_).isNotNull).reduce(_ && _)
    val l = withHash(left.filter(pkNotNull), pks, cols, "left")
    val r = withHash(right.filter(pkNotNull), pks, cols, "right")
    l.join(r, pks, "full_outer")
      .withColumn("pk", pkExpr(pks))
      .withColumn("in_left", col("left_hash").isNotNull)
      .withColumn("in_right", col("right_hash").isNotNull)
      .withColumn("hash_mismatch",
        col("in_left") && col("in_right") && col("left_hash") =!= col("right_hash"))
  }

  def diff(left: DataFrame, right: DataFrame, pk: String,
           exclude: Seq[String] = Nil): DataFrame =
    diff(left, right, Seq(pk), exclude)

  /** One `dw_data_metrics`-style row (reference: snowflake_tool.py:23-39):
    * total counts per side + sorted, capped samples of hive-only / sf-only /
    * data-discrepancy PK values (rendered as comma-joined strings so the row
    * is bounded and engine-portable). */
  def metrics(left: DataFrame, right: DataFrame, tableName: String, pk: String,
              exclude: Seq[String] = Nil, sampleCap: Int = 100): DataFrame =
    metricsMulti(left, right, tableName, Seq(pk), exclude, sampleCap)

  /** Composite-PK form of [[metrics]]. Total per-side counts come from
    * independent COUNT(*) scans like the reference's dw_data_metrics (a
    * duplicate PK on one side would otherwise fan the full-outer join out
    * and inflate the OTHER side's total). */
  def metricsMulti(left: DataFrame, right: DataFrame, tableName: String,
                   pks: Seq[String], exclude: Seq[String] = Nil,
                   sampleCap: Int = 100): DataFrame = {
    val d = diff(left, right, pks, exclude)
    // Sorted first-K sample via the bounded aggregate: the agg buffer
    // holds ≤ sampleCap keys even when millions of rows match the flag
    // (an unbounded collect_list sliced afterwards still materializes the
    // full list in one task first). Ordering follows the pk's native type
    // order, matching the oracle.
    val pkType = d.schema("pk").dataType
    def sample(flag: Column): Column =
      coalesce(
        concat_ws(",", graft.functions.BoundedMinK.minKAsStrings(
          when(flag, col("pk")), pkType, sampleCap)),
        lit(""))
    val totals = left.agg(count(lit(1)).as("total_record_count_hive"))
      .crossJoin(right.agg(count(lit(1)).as("total_record_count_sf")))
    val flags = d.agg(
      count(when(col("in_left") && !col("in_right"), 1)).as("hive_only_count"),
      count(when(col("in_right") && !col("in_left"), 1)).as("sf_only_count"),
      count(when(col("hash_mismatch"), 1)).as("data_discrepancy_count"),
      sample(col("in_left") && !col("in_right")).as("hive_only_pk_values"),
      sample(col("in_right") && !col("in_left")).as("sf_only_pk_values"),
      sample(col("hash_mismatch")).as("data_discrepancy_pk_values"))
    totals.crossJoin(flags).select(lit(tableName).as("table_name"), col("*"))
  }

  /** Column-level mismatch matrix for fingerprint-mismatched keys
    * (reference: data_matrix_tool.py:52-64): one row per (id, column) whose
    * values differ, as (id, column_name, hive, snowflake) strings.
    *
    * Unpivots via `stack` AFTER filtering to mismatched rows, so the
    * row-explosion factor (#columns) only applies to actual discrepancies.
    * `idCap` mirrors the reference's `list_ids[:3]` probe cap
    * (data_matrix_tool.py:43) — bounded work no matter how bad the drift.
    * The cap is SEMANTICS (bounded output), not an ordering: it is applied
    * as a deterministic per-hash-bucket row_number limit, which stays fully
    * parallel (a global orderBy+limit compiles to TakeOrderedAndProject and
    * merges every partition's top-idCap rows through ONE task — a serial
    * bottleneck when drift is large). The hash-bucketed cap is
    * APPROXIMATE: a row drops only when its hash bucket alone exceeds the
    * ceil(idCap/buckets) per-bucket share, so well under the cap nothing
    * drops (uniform-hash bucket loads concentrate near total/buckets),
    * and total output is bounded by idCap rounded up to bucket
    * granularity. An exact global cap would reintroduce the single-task
    * merge this design exists to avoid.
    */
  def mismatchMatrix(left: DataFrame, right: DataFrame, pk: String,
                     exclude: Seq[String] = Nil, idCap: Int = 1000000): DataFrame =
    mismatchMatrixMulti(left, right, Seq(pk), exclude, idCap)

  /** Max buckets for the deterministic cap. Actual buckets =
    * min(CapBuckets, idCap), per-bucket limit = ceil(idCap/buckets) —
    * ceil, not floor: floor quantization capped BELOW idCap (e.g.
    * idCap=1500 over 1024 buckets gave 1 row/bucket = 1024 total) and
    * dropped real rows while under the advertised cap. With ceil the
    * bound is idCap rounded up to bucket granularity (≤ idCap+buckets-1),
    * and the cap work runs min(idCap, 1024)-way parallel (probe-style
    * tiny caps serialize by construction — their output is tiny; large
    * caps never funnel through one task). */
  private val CapBuckets = 1024

  /** Composite-PK form of [[mismatchMatrix]]; `id` is the ':'-joined key. */
  def mismatchMatrixMulti(left: DataFrame, right: DataFrame, pks: Seq[String],
                          exclude: Seq[String] = Nil, idCap: Int = 1000000): DataFrame = {
    require(idCap > 0, "idCap must be positive")
    val cols = compareCols(left, pks, exclude)
    val d = diff(left, right, pks, exclude).filter(col("hash_mismatch"))
    // All non-PK columns excluded (e.g. a pure-key link table): no cells
    // by construction — return the empty matrix instead of generating an
    // unparseable `stack(0, )`.
    if (cols.isEmpty)
      return d.select(col("pk").as("id"), lit("").as("column_name"),
        lit("").as("hive"), lit("").as("snowflake")).limit(0)
    val buckets = math.max(1, math.min(CapBuckets, idCap))
    // Long math: ceil over Int overflows for probe-style idCap=MaxValue.
    val perBucket = ((idCap.toLong + buckets - 1) / buckets).toInt
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("pk"))
    val capped = d
      .withColumn("__bkt", pmod(xxhash64(col("pk").cast("string")), lit(buckets.toLong)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perBucket)
      .drop("__bkt", "__rn")
    // Names are spliced into stack() SQL: escape quote chars so an exotic
    // (or hostile) source column name can't break or alter the expression.
    val stackArgs = cols.map { c =>
      val lbl = c.replace("'", "''")
      val id = c.replace("`", "``")
      s"'$lbl', CAST(`left_$id` AS STRING), CAST(`right_$id` AS STRING)"
    }.mkString(", ")
    capped
      .select(col("pk").as("id"),
        expr(s"stack(${cols.size}, $stackArgs) AS (column_name, hive, snowflake)"))
      .filter(not(col("hive") <=> col("snowflake")))
      .select(col("id"), col("column_name"),
        coalesce(col("hive"), lit("NULL")).as("hive"),
        coalesce(col("snowflake"), lit("NULL")).as("snowflake"))
  }

  /** Per-ID mismatch probe — the reference's actual mismatch-proc call
    * shape (`getMismatchQuery(table, id_val)`, snowflake_tool.py:41-52,
    * invoked for ≤ 3 probe ids at data_matrix_tool.py:43). The id filter
    * is applied BEFORE the join, so it pushes down to both parquet scans:
    * probing a handful of keys reads a handful of row groups, not the
    * table — a full diff for a 3-id probe would be a 100 TB-scale mistake. */
  def mismatchProbe(left: DataFrame, right: DataFrame, pk: String,
                    ids: Seq[Any], exclude: Seq[String] = Nil): DataFrame = {
    require(ids.nonEmpty, "ids must be non-empty")
    // Seq[Any]: ids must match the pk's type (string pks take string ids)
    // — a numeric literal against a string pk would coerce the COLUMN and
    // defeat the scan pushdown this probe exists for.
    val keep = col(pk).isin(ids: _*)
    // The probe input is already bounded by the id filter, so the matrix
    // cap is vacuous here — and an exact small idCap would be wrong: the
    // hash-bucketed cap is approximate (per-bucket limits), so two probe
    // ids colliding into one bucket would silently drop one.
    mismatchMatrixMulti(left.filter(keep), right.filter(keep), Seq(pk),
      exclude, idCap = Int.MaxValue)
  }

  /** Catalog-driven [[metricsMulti]]: primary keys AND audit-column
    * exclusions come from schema metadata — the reference's operating mode
    * (its mismatch proc ignores warehouse-configured excluded columns,
    * snowflake_tool.py:41-52) rather than caller-supplied lists. */
  def metricsForTable(left: DataFrame, right: DataFrame, tableName: String,
                      catalog: graft.script.SchemaCatalog,
                      sampleCap: Int = 100): DataFrame =
    metricsMulti(left, right, tableName, catalog.primaryKeys(tableName),
      catalog.excludedColumns(tableName), sampleCap)

  /** Catalog-driven [[mismatchMatrixMulti]] (see [[metricsForTable]]). */
  def mismatchMatrixForTable(left: DataFrame, right: DataFrame, tableName: String,
                             catalog: graft.script.SchemaCatalog,
                             idCap: Int = 1000000): DataFrame =
    mismatchMatrixMulti(left, right, catalog.primaryKeys(tableName),
      catalog.excludedColumns(tableName), idCap)

  /** Roll the matrix up by column (reference: data_matrix_tool.py:69-86):
    * sorted distinct hive/snowflake values + contributing ids, comma-joined.
    * The id and value lists are capped at `listCap` via the bounded
    * distinct-first-K aggregate (buffer ≤ listCap — a column discrepant on
    * millions of rows never materializes them all); `n_cells` stays
    * exact. */
  def mismatchRollup(matrix: DataFrame, listCap: Int = 1000): DataFrame = {
    import graft.functions.BoundedMinK.{minKAsStrings, minKStrings}
    // ids keep the id column's native type order (matching the oracle's
    // list_sort); hive/snowflake cells are strings by construction.
    val ids = minKAsStrings(col("id"), matrix.schema("id").dataType,
      listCap, distinct = true)
    matrix.groupBy(col("column_name")).agg(
      concat_ws(",", minKStrings(col("hive"), listCap, distinct = true)).as("hive"),
      concat_ws(",", minKStrings(col("snowflake"), listCap, distinct = true)).as("snowflake"),
      concat_ws(",", ids).as("ids"),
      count(lit(1)).as("n_cells"))
  }
}
