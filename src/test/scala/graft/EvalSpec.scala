package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

/** Classifier-eval and association statistics — SURVEY.md §2 rows
  * q_auc / q_calibration / q_chi2_assoc / q_cramers_v / q_ks_drift /
  * q_markov_chain / q_hhi_concentration. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("aucByGroup: hand-computed AUC with ties, perfect and inverted cases") {
    // Group g: scores pos={3,4}, neg={1,2} -> perfect separation, AUC=1.
    // Group h: pos={1}, neg={3} -> fully inverted, AUC=0.
    // Group t: pos={2,5}, neg={2,3} -> pairs: (2,2)=0.5 (2,3)=0
    //          (5,2)=1 (5,3)=1 -> AUC = 2.5/4 = 0.625.
    val df = Seq(
      ("g", 3.0, 1), ("g", 4.0, 1), ("g", 1.0, 0), ("g", 2.0, 0),
      ("h", 1.0, 1), ("h", 3.0, 0),
      ("t", 2.0, 1), ("t", 5.0, 1), ("t", 2.0, 0), ("t", 3.0, 0)
    ).toDF("grp", "score", "pos")
    val out = Eval.aucByGroup(df, "grp", "score", $"pos" === 1)
      .orderBy($"grp").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("auc_ppm"))).toSeq ==
      Seq(("g", 1000000L), ("h", 0L), ("t", 625000L)))
    assert(out.head.getAs[Long]("n_pos") == 2L)
    assert(out.head.getAs[Long]("n_neg") == 2L)
  }

  test("aucByGroup: single-class groups are excluded, random-ish is mid") {
    val df = Seq(("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1), ("b", 2.0, 0),
      ("b", 3.0, 1), ("b", 4.0, 0)).toDF("grp", "score", "pos")
    val out = Eval.aucByGroup(df, "grp", "score", $"pos" === 1).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("b"))
    // pairs: (1,2)=0 (1,4)=0 (3,2)=1 (3,4)=0 -> 1/4
    assert(out.head.getAs[Long]("auc_ppm") == 250000L)
  }

  test("calibrationBins: bin edges, rates, and the degenerate min==max corpus") {
    val df = Seq((0.0, 0), (0.1, 0), (0.5, 1), (0.9, 1), (1.0, 1))
      .toDF("score", "pos")
    val out = Eval.calibrationBins(df, "score", $"pos" === 1, nBins = 2)
      .orderBy($"bin").collect()
    // lo=0, hi=1000: bin0 = [0,500), bin1 = [500,1000] (hi clamps to last)
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("n"),
      r.getAs[Long]("n_pos"))).toSeq == Seq((0L, 2L, 0L), (1L, 3L, 3L)))
    assert(out(1).getAs[Long]("pos_rate_ppm") == 1000000L)
    // degenerate: all scores equal -> single bin 0
    val deg = Eval.calibrationBins(
      Seq((2.0, 1), (2.0, 0)).toDF("score", "pos"), "score", $"pos" === 1)
      .collect()
    assert(deg.map(_.getLong(0)).toSeq == Seq(0L))
    assert(deg.head.getAs[Long]("pos_rate_ppm") == 500000L)
  }

  test("chiSquareCells + cramersV: independence gives zero, determinism gives 1") {
    // Perfectly independent 2x2: every cell observed == expected.
    val ind = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s1", "fr")) ++
      Seq.fill(10)(("s2", "en")) ++ Seq.fill(10)(("s2", "fr"))
    val cells = Eval.chiSquareCells(ind.toDF("src", "lang"), "src", "lang")
      .collect()
    assert(cells.length == 4)
    assert(cells.forall(_.getAs[Long]("expected_micro") == 10000000L))
    assert(cells.forall(_.getAs[Long]("term_micro") == 0L))
    val v0 = Eval.cramersV(ind.toDF("src", "lang"), "src", "lang").head()
    assert(v0.getAs[Long]("chi2_micro") == 0L)
    assert(v0.getAs[Long]("cramers_v_ppm") == 0L)
    // Deterministic association: src decides lang -> V = 1.
    val det = Seq.fill(10)(("s1", "en")) ++ Seq.fill(10)(("s2", "fr"))
    val v1 = Eval.cramersV(det.toDF("src", "lang"), "src", "lang").head()
    assert(v1.getAs[Long]("cramers_v_ppm") == 1000000L)
  }

  test("ksAgainstBaseline: identical distribution -> 0; disjoint -> 1e6") {
    val df = (
      Seq.fill(5)(("base", 1.0)) ++ Seq.fill(5)(("base", 2.0)) ++
      Seq.fill(5)(("same", 1.0)) ++ Seq.fill(5)(("same", 2.0)) ++
      Seq.fill(4)(("disj", 9.0))
    ).toDF("grp", "v")
    val out = Eval.ksAgainstBaseline(df, "grp", "v", "base")
      .orderBy($"grp").collect()
    val byGrp = out.map(r => r.getString(0) -> r.getAs[Long]("ks_ppm")).toMap
    assert(byGrp("same") == 0L)
    assert(byGrp("disj") == 1000000L)
    assert(!byGrp.contains("base"))
  }

  test("ksAgainstBaseline: hand-computed sup distance at an interior jump") {
    // base: 1,2,3,4 uniform; g: 1,1,1,4 -> CDFs at v=1: 0.25 vs 0.75
    val df = (Seq(1, 2, 3, 4).map(v => ("base", v.toDouble)) ++
      Seq(1, 1, 1, 4).map(v => ("g", v.toDouble))).toDF("grp", "v")
    val r = Eval.ksAgainstBaseline(df, "grp", "v", "base").head()
    assert(r.getAs[Long]("ks_ppm") == 500000L) // sup at v=2,3: |0.75-0.25|... v=3: 0.75 vs 0.25? base cdf(3)=0.75, g cdf(3)=0.75 -> v=1: |0.75-0.25|=0.5
  }

  test("transitionMatrix: lag pairing, tie order, and exact ppm") {
    val df = Seq(
      (1L, ts(1000L), 1L, "a"), (1L, ts(2000L), 2L, "b"),
      (1L, ts(3000L), 3L, "a"), (1L, ts(3000L), 4L, "b"), // tie -> id order
      (2L, ts(1000L), 5L, "a"), (2L, ts(2000L), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Eval.transitionMatrix(df, "user_id", "ts", "event_id",
      "event_type").orderBy($"from_state", $"to_state").collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Long]("prob_ppm"))).toMap
    // user1: a->b, b->a, a->b; user2: a->b  => a->b:3, b->a:1
    assert(m(("a", "b")) == (3L, 1000000L))
    assert(m(("b", "a")) == (1L, 1000000L))
    assert(out.length == 2)
  }

  test("hhiConcentration: single part -> 1e6, uniform k parts -> 1e6/k") {
    val df = (Seq.fill(7)(("mono", "s1")) ++
      Seq.fill(5)(("quad", "s1")) ++ Seq.fill(5)(("quad", "s2")) ++
      Seq.fill(5)(("quad", "s3")) ++ Seq.fill(5)(("quad", "s4")))
      .toDF("grp", "part")
    val out = Eval.hhiConcentration(df, "grp", "part")
      .orderBy($"grp").collect()
    val m = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_parts"), r.getAs[Long]("hhi_ppm"))).toMap
    assert(m("mono") == (1L, 1000000L))
    assert(m("quad") == (4L, 250000L))
  }

  test("plan shapes: histogram windows order dimensions, margins broadcast") {
    val ev = (1 to 100).map(i =>
      (i.toLong % 7, ts(i * 1000L), i.toLong, if (i % 3 == 0) "p" else "q",
        (i % 13).toDouble)).toDF("user_id", "ts", "event_id", "event_type",
      "value")
    // AUC: the only exchanges are the histogram groupBy and the per-group
    // window — no corpus-scale sort precedes the histogram collapse.
    val aucPlan = Eval.aucByGroup(ev, "event_type", "value", $"value" > 6)
      .queryExecution.executedPlan.toString
    assert(aucPlan.contains("HashAggregate"), aucPlan)
    // chi2: both margin joins broadcast (dimension-scale sides).
    val chiPlan = Eval.chiSquareCells(ev, "event_type", "user_id")
      .queryExecution.executedPlan.toString
    assert(chiPlan.contains("BroadcastHashJoin") ||
      chiPlan.contains("BroadcastNestedLoopJoin"), chiPlan)
    assert(!chiPlan.contains("SortMergeJoin"), chiPlan)
  }
}
