package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of Spark's native session_window, pinned after a
  * review pass caught the opposite assumption: an event EXACTLY gap after
  * the previous one MERGES into the session (strict > starts a new one) —
  * the same boundary q_sessionize's lag/cumsum form uses, which is what
  * makes the two formulations and the shared oracle agree. */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sessions(tsMs: Long*): Seq[(Timestamp, Timestamp, Long)] = {
    val df = tsMs.map(t => (1L, new Timestamp(t))).toDF("user_id", "ts")
    df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("w.end"), col("n"))
      .orderBy(col("start"))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq
  }

  test("an event exactly gap later MERGES; gap+1ms starts a new session") {
    val t0 = 1700000000000L
    val gap = 1800000L
    val merged = sessions(t0, t0 + gap)
    assert(merged.map(_._3) == Seq(2L), merged)
    assert(merged.head._2.getTime == t0 + 2 * gap) // horizon = last + gap
    val split = sessions(t0, t0 + gap + 1)
    assert(split.map(_._3) == Seq(1L, 1L), split)
  }

  test("boundary agreement with the lag/cumsum oracle formulation") {
    // The oracle's new-session condition is strict >: exactly-gap diffs
    // keep the session — mirror it in-memory over a chain crossing both
    // boundaries and compare session counts with the native operator.
    val t0 = 1700000000000L
    val gap = 1800000L
    val times = Seq(t0, t0 + gap, t0 + 2 * gap, t0 + 3 * gap + 1, t0 + 4 * gap)
    val native = sessions(times: _*).map(_._3)
    def cumsumSessions(ts: Seq[Long]): Seq[Long] = {
      val flags = ts.zip(Option.empty[Long] +: ts.init.map(Some(_))).map {
        case (t, Some(p)) if t - p > gap => 1L
        case (_, Some(_)) => 0L
        case _ => 1L
      }
      flags.scanLeft(0L)(_ + _).tail
        .groupBy(identity).toSeq.sortBy(_._1).map(_._2.length.toLong)
    }
    assert(native == cumsumSessions(times), s"native=$native")
  }
}
