package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HiveFunctions.{collectMaxOne, fingerprintInput, rowFingerprint}

/** The reference's sparse→DW incremental-merge pipeline, Spark-native
  * (reference: tools/script_converter_tool.py:133-213 "example 2" and
  * resources/scripts/nw_customer/nw_customer_PRE_300.hql):
  * window-rank dedup → per-column argmax → LEFT OUTER JOIN current DW →
  * COALESCE(sparse, dw) → keep only fingerprint-changed rows.
  *
  * All steps are declarative DataFrame ops: the dedup and argmax shuffle
  * once on the grouping key, the merge join shuffles on the PK, and Catalyst
  * collapses projections — at 100 TB the pipeline is two shuffles total
  * (one if the delta is pre-partitioned by PK).
  */
object MergePipeline {

  /** `row_number() OVER (PARTITION BY keys ORDER BY ord) = 1`
    * (reference: nw_customer_PRE_300.hql:21,43 — `rwn`/`Rank` pattern).
    * Callers must make `ord` a total order (unique tiebreak column) or the
    * surviving row is partition-order dependent. */
  def rankDedup(df: DataFrame, keys: Seq[Column], ord: Seq[Column]): DataFrame = {
    // withColumn would silently REPLACE a caller's __rn and drop it below.
    require(!df.columns.contains("__rn"),
      "rankDedup uses __rn internally; rename the input's __rn column")
    df.withColumn("__rn", row_number().over(Window.partitionBy(keys: _*).orderBy(ord: _*)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-column argmax roll-up: for each key, every value column resolves to
    * its value at max rank — the reference's repeated
    * `collect_max_one(col, RowModified)` block (converter rule 13), as ONE
    * hash aggregate with map-side partial aggregation instead of a
    * string-concat trick per column. */
  def argmaxMerge(df: DataFrame, key: Column, rank: Column,
                  valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val aggs = valueCols.map(c => collectMaxOne(col(c), rank).as(c))
    df.groupBy(key).agg(aggs.head, aggs.tail: _*)
  }

  /** Sparse-over-DW merge: for every PK in `sparse`, produce the merged row
    * (sparse value wins, DW fills gaps; `preferDw` columns keep the DW value
    * when present, like RowCreated in the reference), and keep ONLY rows
    * whose non-audit fingerprint changed vs the DW row — the
    * `WHERE md5(sparse cols) != md5(dw cols)` gate of the reference
    * (script_converter_tool.py:209-210).
    *
    * `sparse` may carry a subset of DW's columns; missing ones pass through
    * from DW. Rows new to DW always survive the change gate (their DW
    * fingerprint is the all-NULL sentinel hash).
    */
  def sparseDwMerge(sparse: DataFrame, dw: DataFrame, pk: String,
                    preferDw: Seq[String] = Nil,
                    excludeFromHash: Seq[String] = Nil): DataFrame = {
    val dwCols = dw.columns.filterNot(_.equalsIgnoreCase(pk)).toSeq
    val sparseCols = sparse.columns.map(_.toLowerCase).toSet
    val preferDwSet = preferDw.map(_.toLowerCase).toSet

    val s = sparse.select(
      (col(pk).as("__pk") +: sparse.columns.filterNot(_.equalsIgnoreCase(pk))
        .map(c => col(c).as(s"__s_$c")).toSeq): _*)
    val d = dw.select(
      (col(pk).as("__pk") +: dwCols.map(c => col(c).as(s"__d_$c"))) :+
        lit(true).as("__dw_exists"): _*)

    def merged(c: String): Column =
      if (!sparseCols.contains(c.toLowerCase)) col(s"__d_$c")
      else if (preferDwSet.contains(c.toLowerCase)) coalesce(col(s"__d_$c"), col(s"__s_$c"))
      else coalesce(col(s"__s_$c"), col(s"__d_$c"))

    val hashCols = dwCols.filterNot(c => excludeFromHash.exists(_.equalsIgnoreCase(c)))
    val joined = s.join(d, Seq("__pk"), "left_outer")
    joined
      // fingerprintInput: hash map-bearing columns via their string
      // rendering (xxhash64 refuses MapType; dw carries the column types)
      .withColumn("__new_hash", rowFingerprint(hashCols.map(c =>
        fingerprintInput(merged(c), dw.schema(c).dataType))))
      .withColumn("__dw_hash", rowFingerprint(hashCols.map(c =>
        fingerprintInput(col(s"__d_$c"), dw.schema(c).dataType))))
      // New-to-DW keys always survive (explicit marker: an all-NULL DW row
      // would otherwise hash equal to an all-NULL merged row and be lost).
      .filter(col("__dw_exists").isNull || col("__new_hash") =!= col("__dw_hash"))
      .select((col("__pk").as(pk) +: dwCols.map(c => merged(c).as(c))): _*)
  }
}
