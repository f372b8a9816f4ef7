package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal/range join operators Spark's optimizer has no native node for
  * — both re-expressed as shapes Catalyst DOES optimize well (one
  * hash-partitioned window pass; an equi-join on quantized cells) instead
  * of the O(left × right-per-key) sort-merge range scans or nested-loop
  * theta joins a naive translation produces.
  */
object Joins {

  private val Reserved =
    Seq("__k", "__ts", "__side", "__tie", "__l", "__r", "__c", "__fcell", "__rcell",
      "__b", "__cend", "__best", "__carry", "__c2")

  private def checkReserved(dfs: DataFrame*): Unit = {
    val clash = dfs.flatMap(_.columns).filter(Reserved.contains)
    require(clash.isEmpty, s"column(s) ${clash.mkString(",")} collide with " +
      s"Joins temp columns (${Reserved.mkString(",")})")
  }

  /** As-of join: every left row picks the NEWEST right row with the same
    * key and right time ≤ left time (ties on time are inclusive; among
    * equal right times the greatest `tieBreak` wins, so the result is
    * deterministic under any partitioning). Right rows with a NULL key or
    * NULL time match nothing — SQL join semantics, not null-grouping.
    *
    * Shape: union both sides tagged, ONE shuffle on the key, one window
    * pass carrying the latest right payload struct
    * (`last(_, ignoreNulls)` over rows-unbounded-preceding), filter back
    * to left rows. No join operator at all: the sort the window does is
    * the same sort a merge join would do, but each left row reads the
    * carried struct in O(1) instead of range-scanning its key's right
    * rows — a popular key costs O(n log n) in its partition, never
    * O(n·m). The payload rides as ONE struct so all carried fields come
    * from the SAME right row (per-column `last(ignoreNulls)` would mix
    * rows when a payload field is legitimately null).
    *
    * At 100 TB: both sides shuffle once on the key — the plan you would
    * bucket for; a single hot key serializes its own partition only
    * (salt by coarse time range and stitch across salt boundaries if one
    * key dominates the corpus).
    *
    * Output: every left column, then `prefix`+time and `prefix`+payload
    * columns (null when no right row precedes). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String], tieBreak: Option[String] = None,
               prefix: String = "asof_"): DataFrame =
    asOfCore(left, right, key, time, payload, tieBreak, prefix,
      forward = false)

  /** Forward as-of join: every left row picks the EARLIEST right row
    * with the same key and right time ≥ left time — the attribution
    * twin of [[asOfJoin]] ("which purchase follows this view"). Same
    * inclusive-tie contract (a right row AT the left time matches; among
    * equal right times the greatest `tieBreak` wins) and the same
    * one-shuffle window shape, just scanned from the future backward. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      time: String, payload: Seq[String],
                      tieBreak: Option[String] = None,
                      prefix: String = "next_"): DataFrame =
    asOfCore(left, right, key, time, payload, tieBreak, prefix,
      forward = true)

  /** Shared tagged-union frame of both as-of cores: left rows carry their
    * full row struct in `__l`, right rows their payload struct in `__r`;
    * null-key/null-time right rows are filtered (they match nothing). */
  private def asOfUnion(left: DataFrame, right: DataFrame, key: String,
                        time: String, payload: Seq[String],
                        tieBreak: Option[String], prefix: String): DataFrame = {
    checkReserved(left, right)
    require(!payload.contains(time), s"payload already carries $time")
    // a left column equal to a prefixed payload name would make the
    // output schema carry two columns with one name — refuse up front
    val outNames = (time +: payload).map(prefix + _)
    val dup = left.columns.filter(outNames.contains)
    require(dup.isEmpty,
      s"left column(s) ${dup.mkString(",")} collide with prefixed payload " +
        s"columns; pick a different prefix")
    val rPay = struct((time +: payload).map(col): _*)
    val lType = left.select(struct(left.columns.map(col): _*).as("s"))
      .schema("s").dataType
    val rType = right.select(rPay.as("s")).schema("s").dataType
    val tieType = tieBreak.map(right.schema(_).dataType).getOrElse(LongType)
    val lU = left.select(
      col(key).as("__k"), col(time).as("__ts"), lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rU = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(
        col(key).as("__k"), col(time).as("__ts"), lit(0).as("__side"),
        tieBreak.map(col(_).cast(tieType)).getOrElse(lit(null).cast(tieType)).as("__tie"),
        lit(null).cast(lType).as("__l"),
        rPay.as("__r"))
    lU.unionByName(rU)
  }

  private def asOfCore(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String], tieBreak: Option[String],
               prefix: String, forward: Boolean): DataFrame = {
    // Right rows sort BEFORE left rows at equal time (side 0 < 1) — the
    // inclusive-tie contract; equal-time LEFT rows all see the same
    // carried value (every eligible right row sorts before both), so
    // their relative order is irrelevant and the output is
    // deterministic. Forward scans time DESCENDING (earliest eligible
    // right is the last seen walking back from the future); tie order
    // stays ascending so the max-tieBreak row is the carried one in
    // both directions.
    // desc defaults to NULLS LAST, which would park a null-time left at
    // the partition END where it wrongly carries the earliest right —
    // nulls-first keeps null-time lefts match-less in both directions
    // (asc already defaults to nulls first). This relies on rU above
    // having FILTERED null-time right rows out: with them present, a
    // null-ts right would sort inside the null group ahead of null-ts
    // lefts (side 0 < 1) and hand them its payload.
    val tsOrd = if (forward) col("__ts").desc_nulls_first else col("__ts").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrd, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asOfUnion(left, right, key, time, payload, tieBreak, prefix)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        (time +: payload).map(c => col(s"__c.$c").as(prefix + c)): _*)
  }

  /** Hot-key-safe [[asOfJoin]]: identical semantics (spec-proven equal on
    * random AND single-hot-key data), but the window partitions on
    * (key, COARSE TIME BUCKET) instead of the key alone, then stitches
    * across bucket boundaries. The plain as-of is the right default — one
    * shuffle, one window — until one key dominates the corpus (Zipf-keyed
    * user events at 100 TB): its whole row set then funnels through a
    * single window task. Salting bounds every task at (key, bucket)
    * granularity, so the worst task is one hot key's one time-slice.
    *
    * Stitch: a left row early in its bucket may need a right row from an
    * EARLIER bucket. Each (key, bucket) reduces to ONE summary row — the
    * bucket's final carried right payload — and a window over those
    * summary rows (per key, ordered by bucket; O(#buckets) rows, model
    * scale) computes each bucket's carry-in = the newest right payload of
    * any strictly-earlier bucket. A left row's answer is its within-bucket
    * carried value, else the bucket's carry-in. The bucket mapping is
    * MONOTONE in time, so everything in an earlier bucket is strictly
    * older than the bucket start — the inclusive-tie contract lives
    * entirely within a bucket and is untouched.
    *
    * Cost vs unsalted: the per-bucket summary aggregate reuses the window
    * pass's (key, bucket) partitioning (map-side, no extra data shuffle);
    * the carry frame is summary-scale and joins back on the SAME
    * partitioning keys. ~2 small extra exchanges buy the removal of the
    * single-task hot-key ceiling.
    *
    * `bucket` maps the time column to a bucket id, monotone non-decreasing
    * (e.g. [[millisBucket]]; floor(ts/width)); it must map NULL to NULL.
    * Pick the width so a typical key has 10-1000 rows per bucket: too
    * fine costs carry-window rows, too coarse re-creates the funnel. */
  def asOfJoinSalted(left: DataFrame, right: DataFrame, key: String,
                     time: String, payload: Seq[String],
                     bucket: Column => Column,
                     tieBreak: Option[String] = None,
                     prefix: String = "asof_"): DataFrame =
    asOfSaltedCore(left, right, key, time, payload, bucket, tieBreak, prefix,
      forward = false)

  /** Hot-key-safe [[asOfJoinForward]] — same salting + stitch as
    * [[asOfJoinSalted]], scanned from the future backward. */
  def asOfJoinForwardSalted(left: DataFrame, right: DataFrame, key: String,
                            time: String, payload: Seq[String],
                            bucket: Column => Column,
                            tieBreak: Option[String] = None,
                            prefix: String = "next_"): DataFrame =
    asOfSaltedCore(left, right, key, time, payload, bucket, tieBreak, prefix,
      forward = true)

  /** Convenience bucket mapping for timestamp columns: epoch-millis
    * divided into `widthMillis` slices (floor semantics — monotone, NULL
    * in → NULL out). */
  def millisBucket(widthMillis: Long): Column => Column = { ts =>
    require(widthMillis > 0, s"bucket width must be positive: $widthMillis")
    floor(unix_millis(ts) / widthMillis)
  }

  private def asOfSaltedCore(left: DataFrame, right: DataFrame, key: String,
                             time: String, payload: Seq[String],
                             bucket: Column => Column,
                             tieBreak: Option[String], prefix: String,
                             forward: Boolean): DataFrame = {
    val all = asOfUnion(left, right, key, time, payload, tieBreak, prefix)
      .withColumn("__b", bucket(col("__ts")))
    // Same in-bucket ordering contract as the unsalted core (rights
    // before lefts at equal time; max tieBreak carried); bucket order
    // follows the scan direction. Null-time lefts have a NULL bucket:
    // no right ever lands there (rights filter null time) and the carry
    // join finds no NULL-bucket row, so they stay match-less.
    val tsOrd = if (forward) col("__ts").desc_nulls_first else col("__ts").asc
    val bOrd = if (forward) col("__b").desc else col("__b").asc
    val ord = Seq(tsOrd, col("__side").asc, col("__tie").asc_nulls_first)
    val part = Seq(col("__k"), col("__b"))
    val wIn = Window.partitionBy(part: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Bucket-FINAL carried value on every row (same partitioning/sort —
    // no extra shuffle): the one value the bucket contributes downstream.
    val wEnd = Window.partitionBy(part: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val step = all
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(wIn))
      .withColumn("__cend", last(col("__r"), ignoreNulls = true).over(wEnd))
    // One summary row per (key, bucket) — __cend is constant within the
    // group, and the groupBy reuses the window's partitioning. The carry
    // window then runs over SUMMARY rows only: a key's cost is its
    // bucket count, never its row count.
    val wCarry = Window.partitionBy(col("__k")).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = step
      .filter(col("__b").isNotNull)
      .groupBy(col("__k"), col("__b")).agg(first(col("__cend")).as("__best"))
      .withColumn("__carry", last(col("__best"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__b"), col("__carry"))
    step.join(carry, Seq("__k", "__b"), "left")
      .filter(col("__side") === 1)
      .withColumn("__c2", coalesce(col("__c"), col("__carry")))
      .select(col("__l.*") +:
        (time +: payload).map(c => col(s"__c2.$c").as(prefix + c)): _*)
  }

  /** Range (band) join: fact rows matched to every dimension range with
    * `lo ≤ value < hi`, as an EQUI-join on quantized cells — each range
    * replicates to the ⌈width/cellSize⌉ cells it covers, each fact
    * computes its one cell, and the exact bounds post-filter inside the
    * join condition. A theta join here is a nested loop (broadcast NLJ
    * at best) — fine for a 10-row band table, quadratic death for a
    * large one; the cell join is a plain shuffled/broadcast hash join
    * whose only overhead is the dimension replication factor, which
    * `cellSize` tunes (pick it near the typical range width: a few cells
    * per range, one probe per fact). Empty ranges (lo ≥ hi) match
    * nothing; facts with a NULL value match nothing (inner) or survive
    * with null range columns (left_outer). Overlapping ranges yield one
    * output row per covering range — relational semantics, not
    * first-match. */
  def rangeJoinBucketed(facts: DataFrame, valueCol: String,
                        ranges: DataFrame, loCol: String, hiCol: String,
                        cellSize: Double, joinType: String = "inner"): DataFrame = {
    checkReserved(facts, ranges)
    require(cellSize > 0, "cellSize must be positive")
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"unsupported joinType $joinType (as-of/range joins are left-oriented)")
    val f = facts.withColumn("__fcell",
      floor(col(valueCol) / cellSize).cast("long"))
    val r = ranges
      .filter(col(loCol) < col(hiCol))
      .withColumn("__rcell", explode(sequence(
        floor(col(loCol) / cellSize).cast("long"),
        // hi is EXCLUSIVE: a range ending exactly on a cell boundary does
        // not cover that cell — ceil(hi/cell)-1 is its last covered cell
        ceil(col(hiCol) / cellSize).cast("long") - 1)))
    f.join(r,
        f("__fcell") === r("__rcell") &&
          f(valueCol) >= r(loCol) && f(valueCol) < r(hiCol),
        joinType)
      .drop("__fcell", "__rcell")
  }
}
