package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: newest-at-or-before, inclusive tie, max-tieBreak, left nulls") {
    val left = Seq(
      (1L, 10L, ts("2020-01-01 00:05:00"), 1.5),  // equals a purchase ts → inclusive
      (2L, 10L, ts("2020-01-01 00:00:30"), 2.0),  // before every purchase → nulls
      (3L, 10L, ts("2020-01-01 00:10:00"), 3.0),  // after tie pair → max event_id wins
      (4L, 11L, ts("2020-01-01 01:00:00"), 4.0)   // key with no right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (100L, 10L, ts("2020-01-01 00:01:00"), 9.0),
      (101L, 10L, ts("2020-01-01 00:05:00"), 8.0),
      (103L, 10L, ts("2020-01-01 00:07:00"), 7.0),  // tie on ts:
      (102L, 10L, ts("2020-01-01 00:07:00"), 6.0)   //   103 > 102 → 103 wins
    ).toDF("event_id", "user_id", "ts", "value")
      .select($"user_id", $"ts", $"event_id", $"value")
    val out = Joins.asOfJoin(left, right, "user_id", "ts",
        payload = Seq("event_id", "value"), tieBreak = Some("event_id"),
        prefix = "p_")
      .orderBy($"event_id").collect()
    assert(out.map(_.getAs[Any]("p_event_id")).toSeq == Seq(101L, null, 103L, null))
    assert(out(0).getAs[Double]("p_value") == 8.0)
    assert(out(2).getAs[Double]("p_value") == 7.0) // same row as 103, not mixed
    assert(out(1).isNullAt(out(1).fieldIndex("p_ts")))
    // left columns pass through untouched
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("asOfJoinForward: earliest-at-or-after, inclusive tie, max-tieBreak, nulls") {
    val left = Seq(
      (1L, 10L, ts("2020-01-01 00:05:00"), 1.5),  // equals a purchase ts → inclusive
      (2L, 10L, ts("2020-01-01 00:20:00"), 2.0),  // after every purchase → nulls
      (3L, 10L, ts("2020-01-01 00:06:00"), 3.0),  // before tie pair → max event_id wins
      (4L, 11L, ts("2020-01-01 01:00:00"), 4.0)   // key with no right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (100L, 10L, ts("2020-01-01 00:01:00"), 9.0),
      (101L, 10L, ts("2020-01-01 00:05:00"), 8.0),
      (103L, 10L, ts("2020-01-01 00:07:00"), 7.0),  // tie on ts:
      (102L, 10L, ts("2020-01-01 00:07:00"), 6.0)   //   103 > 102 → 103 wins
    ).toDF("event_id", "user_id", "ts", "value")
      .select($"user_id", $"ts", $"event_id", $"value")
    val out = Joins.asOfJoinForward(left, right, "user_id", "ts",
        payload = Seq("event_id", "value"), tieBreak = Some("event_id"))
      .orderBy($"event_id").collect()
    assert(out.map(_.getAs[Any]("next_event_id")).toSeq == Seq(101L, null, 103L, null))
    assert(out(0).getAs[Double]("next_value") == 8.0)
    assert(out(2).getAs[Double]("next_value") == 7.0) // atomic payload, not mixed
    assert(out(1).isNullAt(out(1).fieldIndex("next_ts")))
  }

  test("asOfJoinForward equals an in-memory reference on random data") {
    val rnd = new scala.util.Random(99)
    val lrows = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(40).toLong))
    val rrows = (1 to 200).map(i =>
      (1000L + i, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(40).toLong))
    val l = lrows.toDF("event_id", "k", "t")
    val r = rrows.map { case (id, k, t) => (k, t, id) }.toDF("k", "t", "rid")
    val got = Joins.asOfJoinForward(l, r, "k", "t", payload = Seq("rid"),
        tieBreak = Some("rid"))
      .select($"event_id", $"next_rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    lrows.foreach { case (id, k, t) =>
      val eligible = rrows.filter(rr => rr._2 == k && rr._3 >= t)
      val want = if (eligible.isEmpty) None
        else {
          val minT = eligible.map(_._3).min
          Some(eligible.filter(_._3 == minT).map(_._1).max)
        }
      assert(got(id) == want, s"left=$id k=$k t=$t")
    }
  }

  test("asOfJoinForward: a null-time left matches nothing (desc nulls-first)") {
    val left = Seq(
      (1L, 10L, Some(ts("2020-01-01 00:05:00")), 1.0),
      (2L, 10L, None: Option[Timestamp], 2.0) // null ts: must carry NO match
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((100L, 10L, ts("2020-01-01 00:06:00"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
      .select($"user_id", $"ts", $"event_id", $"value")
    val out = Joins.asOfJoinForward(left, right, "user_id", "ts",
        payload = Seq("event_id", "value"), tieBreak = Some("event_id"))
      .orderBy($"event_id").collect()
    assert(out(0).getAs[Any]("next_event_id") == 100L)
    assert(out(1).getAs[Any]("next_event_id") == null)
  }

  test("asOfJoin: null right key/time match nothing; payload struct is atomic") {
    val left = Seq((1L, 10L, ts("2020-01-01 02:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (Some(10L), Some(ts("2020-01-01 01:00:00")), Some(5.0)),
      (Some(10L), Some(ts("2020-01-01 01:30:00")), None), // newest has null payload
      (None, Some(ts("2020-01-01 01:45:00")), Some(7.0)), // null key: ignored
      (Some(10L), None, Some(8.0))                        // null time: ignored
    ).toDF("k", "ts", "v")
    val out = Joins.asOfJoin(left, right, "k", "ts", payload = Seq("v"),
      prefix = "r_").collect()
    assert(out.length == 1)
    // the newest eligible row (01:30) wins WITH its null payload — a
    // per-column last(ignoreNulls) would wrongly resurrect 5.0 from 01:00
    assert(out(0).getAs[Timestamp]("r_ts") == ts("2020-01-01 01:30:00"))
    assert(out(0).isNullAt(out(0).fieldIndex("r_v")))
  }

  test("asOfJoin refuses reserved column names and prefixed-name collisions") {
    val df = Seq((1L, 2L)).toDF("__k", "x")
    intercept[IllegalArgumentException](
      Joins.asOfJoin(df, df, "__k", "x", payload = Nil))
    // left already carries the name the carried time column would get
    val l = Seq((1L, ts("2020-01-01 00:00:00"), ts("2020-01-01 00:00:00")))
      .toDF("k", "t", "p_t")
    val r = Seq((1L, ts("2020-01-01 00:00:00"))).toDF("k", "t")
    intercept[IllegalArgumentException](
      Joins.asOfJoin(l, r, "k", "t", payload = Nil, prefix = "p_"))
  }

  test("rangeJoinBucketed: bounds half-open, cell-boundary exact, overlap duplicates") {
    val facts = Seq((1L, 0.0), (2L, 49.9999), (3L, 50.0), (4L, 99.0),
      (5L, 100.0), (6L, 250.0)).toDF("id", "v")
    val ranges = Seq(
      ("a", 0.0, 50.0),     // exactly one cell at cellSize=50
      ("b", 50.0, 100.0),
      ("o", 40.0, 60.0),    // overlaps a and b
      ("empty", 10.0, 10.0) // lo == hi: matches nothing
    ).toDF("band", "lo", "hi")
    val out = Joins.rangeJoinBucketed(facts, "v", ranges, "lo", "hi", 50.0)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    assert(out == Set(
      1L -> "a", 2L -> "a", 2L -> "o", 3L -> "b", 3L -> "o", 4L -> "b"))
    // 5 (v=100) is excluded by b's exclusive hi even though it shares the
    // cell; 6 matches nothing. left_outer keeps both with null bands.
    val lo = Joins.rangeJoinBucketed(facts, "v", ranges, "lo", "hi", 50.0,
        joinType = "left_outer")
      .filter($"band".isNull).select($"id").as[Long].collect().toSet
    assert(lo == Set(5L, 6L))
  }

  test("asOfJoin equals an in-memory reference on random data with heavy ties") {
    val rnd = new scala.util.Random(7)
    val t0 = 1600000000000L
    // 5 keys × 40 distinct seconds → many exact-time ties, both within
    // and across sides
    val lefts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(t0 + rnd.nextInt(40) * 1000L), rnd.nextInt(100).toDouble))
    val rights = (1001 to 1150).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, new Timestamp(t0 + rnd.nextInt(40) * 1000L), rnd.nextInt(100).toDouble))
    val lDf = lefts.toDF("event_id", "k", "t", "v")
    val rDf = rights.toDF("event_id", "k", "t", "v")
      .select($"k", $"t", $"event_id", $"v")
    val got = Joins.asOfJoin(lDf, rDf, "k", "t",
        payload = Seq("event_id", "v"), tieBreak = Some("event_id"), prefix = "r_")
      .select($"event_id", $"r_event_id", $"r_v").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val want = lefts.map { case (id, k, t, _) =>
      val m = rights.filter(r => r._2 == k && !r._3.after(t))
        .sortBy(r => (r._3.getTime, r._1)).lastOption
      id -> (m.map(_._1), m.map(_._4))
    }.toMap
    assert(got == want)
  }

  test("asOfJoinSalted equals asOfJoin on random AND hot-key data, any width") {
    val rnd = new scala.util.Random(2025)
    // Zipf-ish: key 1 owns ~80% of both sides — the hot-key shape the
    // salted variant exists for — plus null keys/times on both sides
    // and heavy exact-timestamp ties (40-slot time domain).
    def key() = if (rnd.nextInt(10) < 8) 1L else (rnd.nextInt(5) + 2).toLong
    val lefts = (1 to 600).map(i =>
      (i.toLong, if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(key()),
        if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)))
    val rights = (1 to 400).map(i =>
      (1000L + i, if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(key()),
        if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong)))
    val l = lefts.toDF("event_id", "k", "t")
    val r = rights.map { case (id, k, t) => (k, t, id) }.toDF("k", "t", "rid")
    for (forward <- Seq(false, true)) {
      val plain = (if (forward)
          Joins.asOfJoinForward(l, r, "k", "t", Seq("rid"), Some("rid"), "m_")
        else Joins.asOfJoin(l, r, "k", "t", Seq("rid"), Some("rid"), "m_"))
        .select($"event_id", $"m_t", $"m_rid").collect()
        .map(x => (x.getLong(0), x.get(1), x.get(2))).toSet
      // width 1 (every instant its own bucket — maximal stitching),
      // width 7 (several buckets), width 1000 (one bucket ≡ unsalted).
      for (width <- Seq(1L, 7L, 1000L)) {
        val bucket = (ts: org.apache.spark.sql.Column) => floor(ts / width)
        val salted = (if (forward)
            Joins.asOfJoinForwardSalted(l, r, "k", "t", Seq("rid"), bucket, Some("rid"), "m_")
          else Joins.asOfJoinSalted(l, r, "k", "t", Seq("rid"), bucket, Some("rid"), "m_"))
          .select($"event_id", $"m_t", $"m_rid").collect()
          .map(x => (x.getLong(0), x.get(1), x.get(2))).toSet
        assert(salted == plain, s"forward=$forward width=$width")
      }
    }
  }

  test("asOfJoinSalted carries across empty buckets and keeps ties in-bucket") {
    // Key 10: right at t=5, lefts at t=5 (tie, same bucket), t=23 (two
    // empty buckets between — carry must skip them), t=4 (before any
    // right). Bucket width 10 → buckets 0,1,2.
    val l = Seq((1L, 10L, 5L), (2L, 10L, 23L), (3L, 10L, 4L)).toDF("event_id", "k", "t")
    val r = Seq((10L, 5L, 100L)).toDF("k", "t", "rid")
    val out = Joins.asOfJoinSalted(l, r, "k", "t", Seq("rid"),
        (ts: org.apache.spark.sql.Column) => floor(ts / 10), Some("rid"))
      .orderBy($"event_id")
      .collect().map(x => Option(x.getAs[Any]("asof_rid")))
    assert(out.toSeq == Seq(Some(100L), Some(100L), None))
    // millisBucket helper on a timestamp column is floor(epochMs/width).
    val lt = Seq((1L, 10L, ts("2020-01-01 00:05:00"))).toDF("event_id", "k", "t")
    val rt = Seq((10L, ts("2020-01-01 00:01:00"), 7L)).toDF("k", "t", "rid")
    val o2 = Joins.asOfJoinSalted(lt, rt, "k", "t", Seq("rid"),
        Joins.millisBucket(60000L), Some("rid"))
      .collect().map(_.getAs[Any]("asof_rid"))
    assert(o2.toSeq == Seq(7L))
  }

  test("rangeJoinBucketed matches a plain theta join on random data") {
    val facts = (1L to 500L).toDF("id")
      .withColumn("v", pmod(xxhash64($"id"), lit(10000L)).cast("double") / 10.0)
    val ranges = Seq(("r1", 0.0, 100.0), ("r2", 100.0, 103.5),
      ("r3", 103.5, 700.0), ("r4", 700.0, 1000.0)).toDF("band", "lo", "hi")
    val bucketed = Joins.rangeJoinBucketed(facts, "v", ranges, "lo", "hi", 25.0)
      .select($"id", $"band").as[(Long, String)].collect().toSet
    val theta = facts.join(ranges, facts("v") >= ranges("lo") && facts("v") < ranges("hi"))
      .select($"id", $"band").as[(Long, String)].collect().toSet
    assert(bucketed == theta && bucketed.nonEmpty)
  }
}
