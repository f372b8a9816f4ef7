package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Windows

/** rollingTrailing must equal the naive RANGE-frame form row-for-row —
  * on random data, on hot-key data, across bucket widths including the
  * degenerate single-bucket and bucket-per-millisecond extremes, and
  * with equal-timestamp peer groups (the range frame includes ALL peers
  * at the current timestamp; tie order must not leak into results). */
class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Span = 3600000L // 1 hour

  private def naive(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"user").orderBy(unix_millis($"ts"))
      .rangeBetween(-(Span - 1), 0)
    df.select($"id", $"user",
      count(lit(1)).over(w).as("n"),
      sum($"v").over(w).as("s"))
  }

  private def fast(df: DataFrame, width: Long): DataFrame =
    Windows.rollingTrailing(df, "user", "ts", "id", $"v", Span, width,
        cntAlias = "n", sumAlias = "s")
      .select($"id", $"user", $"n", $"s")

  private def mkEvents(hot: Boolean): DataFrame = {
    val base = 1700000000000L
    Seq.tabulate(600) { i =>
      val user = if (hot && i % 10 < 8) 0L else (i % 17).toLong + 1L
      // coarse minute grid → plenty of equal-ts peers within a user
      val ts = new java.sql.Timestamp(base + (i % 180).toLong * 60000L)
      (i.toLong, ts, user, (i % 7).toLong * 3L)
    }.toDF("id", "ts", "user", "v")
  }

  private def check(df: DataFrame, width: Long): Unit = {
    val a = naive(df).orderBy("id").collect().toSeq
    val b = fast(df, width).orderBy("id").collect().toSeq
    assert(a === b, s"bucket width $width diverged from the range frame")
  }

  test("cum-diff rolling == naive range frame, random keys, several widths") {
    val df = mkEvents(hot = false)
    // 10-minute, span-sized, one-giant-bucket, and per-ms buckets
    Seq(600000L, Span, 1000L * 86400L * 365L, 1L).foreach(check(df, _))
  }

  test("cum-diff rolling == naive range frame under a Zipf hot key") {
    val df = mkEvents(hot = true)
    Seq(600000L, Span, 1L).foreach(check(df, _))
  }

  test("signed summands: peer-group cums carry the last SIGNED sum, not the max") {
    // Within one millisecond the running sum rises then falls (+5, -3):
    // a max() over peers would freeze the high-water 5; the contract is
    // the full peer-group sum 2 for both rows and for later lookups.
    val base = 1700000000000L
    val df = Seq.tabulate(200) { i =>
      val ts = new java.sql.Timestamp(base + (i % 40).toLong * 60000L)
      val v = if (i % 2 == 0) 5L else -3L
      (i.toLong, ts, (i % 5).toLong, v)
    }.toDF("id", "ts", "user", "v")
    Seq(600000L, Span, 1L).foreach(check(df, _))
  }

  test("null summands: all-null prefixes don't poison later sums; all-null frames are null") {
    val base = 1700000000000L
    val df = Seq(
      (1L, new java.sql.Timestamp(base), 1L, Some(5L)),
      // bucket 2 opens with nulls — local running sum must not go null
      (2L, new java.sql.Timestamp(base + 1200001L), 1L, None),
      (3L, new java.sql.Timestamp(base + 1200002L), 1L, Some(7L)),
      // a user whose every summand is null: sums stay null, counts don't
      (4L, new java.sql.Timestamp(base), 2L, None),
      (5L, new java.sql.Timestamp(base + 1000L), 2L, None)
    ).toDF("id", "ts", "user", "v")
    Seq(600000L, Span, 1L).foreach(check(df, _))
    val byUser2 = fast(df, 600000L).filter($"user" === 2L)
      .orderBy("id").select("n", "s").collect().toSeq
    assert(byUser2.map(_.getLong(0)) === Seq(1L, 2L))
    assert(byUser2.forall(_.isNullAt(1)), "all-null frames must sum to SQL-null")
  }

  test("tie values need only PER-KEY uniqueness — per-key sequence numbers work") {
    // Two users share the identical id sequence 0..99: the reunite
    // window must partition by (key, tie), or one user's probe cum
    // leaks into the other's rows.
    val base = 1700000000000L
    val df = Seq.tabulate(200) { i =>
      val user = (i / 100).toLong
      val seq = (i % 100).toLong // duplicated across users
      val ts = new java.sql.Timestamp(base + (i % 37).toLong * 120000L)
      (seq, ts, user, (i % 5).toLong * 7L)
    }.toDF("id", "ts", "user", "v")
    val a = naive(df).orderBy("user", "id").collect().toSeq
    val b = fast(df, 600000L).orderBy("user", "id").collect().toSeq
    assert(a === b, "per-key-duplicate tie values diverged from the range frame")
  }

  test("rows with no trailing history get their own-peer-group counts only") {
    val df = Seq(
      (1L, new java.sql.Timestamp(1700000000000L), 1L, 5L),
      (2L, new java.sql.Timestamp(1700000000000L), 1L, 7L), // peer at same ms
      (3L, new java.sql.Timestamp(1700000000000L + Span), 1L, 1L), // just inside
      (4L, new java.sql.Timestamp(1700000000000L + 2 * Span), 1L, 2L) // outside
    ).toDF("id", "ts", "user", "v")
    val out = fast(df, 600000L).orderBy("id")
      .select("n", "s").as[(Long, Long)].collect().toSeq
    // ids 1,2 are mutual peers (n=2 both); id 3 is exactly span after —
    // half-open (t-span, t] EXCLUDES them; id 4 sees only itself
    assert(out === Seq((2L, 12L), (2L, 12L), (1L, 1L), (1L, 2L)))
  }
}
