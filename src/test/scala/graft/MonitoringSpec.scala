package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Monitoring

class MonitoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("countDrift: handcrafted ratios, flag thresholds, first-period null") {
    // A: 10 → 30 (3x, drift) → 20 (0.67x, no drift) → 5 (0.25x, drift)
    // B: one period only (prev null, never flagged)
    val rows =
      Seq.fill(10)(("A", 1)) ++ Seq.fill(30)(("A", 2)) ++
      Seq.fill(20)(("A", 3)) ++ Seq.fill(5)(("A", 4)) ++
      Seq.fill(7)(("B", 2))
    val out = Monitoring.countDrift(rows.toDF("t", "d"), Seq("t"), col("d"))
      .orderBy($"t", $"day")
      .select($"t", $"day", $"n", $"prev_n", $"ratio", $"is_drift")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getInt(5)))
    assert(out.toSeq == Seq(
      ("A", 1, 10L, None, None, 0),
      ("A", 2, 30L, Some(10L), Some(3.0), 1),
      ("A", 3, 20L, Some(30L), Some(20.0 / 30.0), 0),
      ("A", 4, 5L, Some(20L), Some(0.25), 1),
      ("B", 2, 7L, None, None, 0)))
  }

  test("countDrift: exact-factor boundary is NOT drift (strict comparison)") {
    // 10 → 20 is exactly 2x: n > prev*2 is false; 20 → 10 likewise.
    val rows = Seq.fill(10)(("A", 1)) ++ Seq.fill(20)(("A", 2)) ++
      Seq.fill(10)(("A", 3))
    val out = Monitoring.countDrift(rows.toDF("t", "d"), Seq("t"), col("d"))
      .orderBy($"day").select($"is_drift").as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 0))
    intercept[IllegalArgumentException](
      Monitoring.countDrift(rows.toDF("t", "d"), Nil, col("d")))
    intercept[IllegalArgumentException](
      Monitoring.countDrift(rows.toDF("n", "d"), Seq("n"), col("d")))
  }
}
