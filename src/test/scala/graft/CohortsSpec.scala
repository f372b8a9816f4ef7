package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohorts

/** Hand-computed fixtures pin the ordering semantics the oracles also
  * encode: funnel steps must be STRICTLY after the previous step's first
  * time (presence alone must not count), retention cells divide by the
  * offset-0 cohort size, and SCD2 runs split on null-safe attribute
  * change with deterministic tie order. */
class CohortsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private def ev(rows: (Long, Int, Long, String)*): DataFrame =
    rows.map { case (id, m, u, t) => (id, ts(m), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")

  // --- funnel ---------------------------------------------------------

  private val steps = Seq(
    "a" -> (col("event_type") === "a"),
    "b" -> (col("event_type") === "b"),
    "c" -> (col("event_type") === "c"))

  test("funnel counts only strictly-ordered progressions") {
    // u1: a@1 b@2 c@3 — full conversion.
    // u2: b@1 a@2 b@3 — the b@1 BEFORE the first a must not count; b@3
    //     does; no c.
    // u3: a@1 c@2 — skips b entirely: c can never count.
    // u4: b@1 c@2 — never reaches step 1.
    val df = ev(
      (1, 1, 1, "a"), (2, 2, 1, "b"), (3, 3, 1, "c"),
      (4, 1, 2, "b"), (5, 2, 2, "a"), (6, 3, 2, "b"),
      (7, 1, 3, "a"), (8, 2, 3, "c"),
      (9, 1, 4, "b"), (10, 2, 4, "c"))
    val got = Cohorts.funnel(df, "user_id", "ts", steps)
      .orderBy("step")
      .select("step", "step_name", "n_entities", "pct_of_entry")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1, "a", 3L, 1.0), (2, "b", 2L, 2.0 / 3.0), (3, "c", 1L, 1.0 / 3.0)))
  }

  test("funnel: equal-timestamp step events do not chain (strict >)") {
    // b at the same instant as the first a: not after it.
    val df = ev((1, 1, 1, "a"), (2, 1, 1, "b"))
    val got = Cohorts.funnel(df, "user_id", "ts", steps.take(2))
      .orderBy("step").select("n_entities").as[Long].collect()
    assert(got.toSeq === Seq(1L, 0L))
  }

  // --- retention ------------------------------------------------------

  test("retention cells and rates vs hand-computed cohort matrix") {
    // Weekly buckets. u1 first in week0, active weeks 0,1,3; u2 first in
    // week0, active weeks 0,1; u3 first in week1, active week 1 only.
    val wk = 7 * 24 * 60
    val df = ev(
      (1, 0, 1, "a"), (2, wk + 1, 1, "a"), (3, 3 * wk + 2, 1, "a"),
      (4, 1, 2, "a"), (5, wk + 2, 2, "a"),
      (6, wk + 3, 3, "a"))
    val got = Cohorts.retention(df, "user_id", "ts",
        bucketTrunc = date_trunc("week", _), bucketDays = 7)
      .orderBy("cohort_bucket", "bucket_offset")
      .select("bucket_offset", "n_entities", "retention")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // cohort week0: offset0=2, offset1=2, offset3=1; cohort week1: offset0=1.
    assert(got.toSeq === Seq(
      (0, 2L, 1.0), (1, 2L, 1.0), (3, 1L, 0.5), (0, 1L, 1.0)))
  }

  test("retention counts an entity once per bucket, not per event") {
    val df = ev((1, 0, 1, "a"), (2, 1, 1, "a"), (3, 2, 1, "a"))
    val got = Cohorts.retention(df, "user_id", "ts",
        bucketTrunc = date_trunc("week", _), bucketDays = 7)
      .select("n_entities").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  // --- scd2 -----------------------------------------------------------

  test("scd2 collapses runs, closes intervals, flags the open one") {
    // u1: a a b a — three versions; u2: single event — one open version.
    val df = ev(
      (1, 1, 1, "a"), (2, 2, 1, "a"), (3, 3, 1, "b"), (4, 4, 1, "a"),
      (5, 1, 2, "x"))
    val got = Cohorts.scd2(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5), r.getInt(6)))
    assert(got.toSeq === Seq(
      (1L, 1L, "a", ts(1), Some(ts(3)), 2L, 0),
      (1L, 2L, "b", ts(3), Some(ts(4)), 1L, 0),
      (1L, 3L, "a", ts(4), None, 1L, 1),
      (2L, 1L, "x", ts(1), None, 1L, 1)))
  }

  test("scd2 null attributes form null-safe runs") {
    val rows = Seq(
      (1L, ts(1), 1L, null.asInstanceOf[String]),
      (2L, ts(2), 1L, null.asInstanceOf[String]),
      (3L, ts(3), 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Cohorts.scd2(rows, "user_id", "ts", "event_type", "event_id")
      .orderBy("version")
      .collect().map(r => (r.getLong(1), Option(r.getString(2)), r.getLong(5)))
    assert(got.toSeq === Seq((1L, None, 2L), (2L, Some("a"), 1L)))
  }

  test("scd2 equal-timestamp events order by the tie column") {
    // Same ts: event_id order decides the run sequence a→b.
    val df = ev((2, 1, 1, "b"), (1, 1, 1, "a"))
    val got = Cohorts.scd2(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("version").select("attr_value").as[String].collect()
    assert(got.toSeq === Seq("a", "b"))
  }
}
