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

  test("filterFunnel: cumulative stage counts, exact retention, NULL = fail") {
    val df = Seq(
      (1L, Some("long enough text"), 5),   // passes s1, fails s2
      (2L, Some("good"), 50),              // passes all
      (3L, Some(""), 50),                  // fails s1 (len 0) — s2 must not resurrect it
      (4L, None: Option[String], 50),      // NULL text: len(null) null → fails s1
      (5L, Some("also good"), 99)          // passes all
    ).toDF("id", "text", "n")
    val out = Monitoring.filterFunnel(df, Seq(
      "has_text" -> (length($"text") >= 1),
      "big_n" -> ($"n" >= 20)))
      .orderBy($"stage_ord")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0, "total", 5L, 1.0),
      (1, "has_text", 3L, 0.6),
      (2, "big_n", 2L, 0.4)))
  }

  test("columnProfile/profileCompare: nulls counted, native-order min/max, drift flags") {
    val l = Seq((Some(9L), "a"), (Some(10L), "b"), (None, "b"))
      .toDF("num", "s")
    val prof = Monitoring.columnProfile(l, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // native min(9,10)=9 — a lexicographic min over casts would say "10"
    assert(prof("num") == (1L, 2L, "9", "10"))
    assert(prof("s") == (0L, 2L, "a", "b"))
    val r2 = Seq((Some(9L), "a"), (Some(11L), "b"), (Some(2L), "b"))
      .toDF("num", "s")
    val cmp = Monitoring.profileCompare(l, r2, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Boolean]("null_drift"), r.getAs[Boolean]("distinct_drift"),
          r.getAs[Boolean]("range_drift")))).toMap
    // null count 1→0; distinct 2→3; range 9-10 → 2-11
    assert(cmp("num") == (true, true, true))
    assert(cmp("s") == (false, false, false))
    // distinct_drift fires ALONE when values shuffle inside the same
    // range with matching null counts — the case the other flags miss.
    val l3 = Seq("a", "a", "z").toDF("s")
    val r3 = Seq("a", "q", "z").toDF("s")
    val only = Monitoring.profileCompare(l3, r3, Seq("s")).collect().head
    assert(!only.getAs[Boolean]("null_drift"))
    assert(only.getAs[Boolean]("distinct_drift"))
    assert(!only.getAs[Boolean]("range_drift"))
    intercept[IllegalArgumentException](Monitoring.columnProfile(l, Nil))
    intercept[IllegalArgumentException](Monitoring.columnProfile(l, Seq("bad name")))
  }

  test("profileCompareSketch: exact flags preserved, estimate accuracy, no sketch-noise drift") {
    // Identical sides: every flag false — the sketch is deterministic
    // for a given value set, so estimate equality is exact here.
    val base = Fixtures.hiveOrders(spark, TestSpark.Sf0001)
      .select($"o_custkey", $"o_orderstatus", $"o_totalprice_cents")
    val same = Monitoring.profileCompareSketch(base, base,
        Seq("o_custkey", "o_orderstatus", "o_totalprice_cents"))
      .collect()
    assert(same.length == 3)
    assert(same.forall(r => !r.getAs[Boolean]("null_drift") &&
      !r.getAs[Boolean]("distinct_drift") && !r.getAs[Boolean]("range_drift")))
    // Estimate accuracy vs the exact profile: rsd=0.05 HLL++ lands
    // within a few percent per column at sf0.01 cardinalities.
    val exact = Monitoring.columnProfile(base,
        Seq("o_custkey", "o_orderstatus", "o_totalprice_cents"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val est = Monitoring.columnProfileSketch(base,
        Seq("o_custkey", "o_orderstatus", "o_totalprice_cents"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (c, e) =>
      val rel = math.abs(est(c) - e).toDouble / math.max(e, 1L)
      assert(rel <= 0.15, s"column $c: exact=$e est=${est(c)} relErr=$rel")
    }
    // Exact sub-flags agree with the exact variant on drifted fixtures
    // (null/range inputs are exact in both forms).
    val h = Fixtures.hiveOrders(spark, TestSpark.Sf0001)
    val s2 = Fixtures.sfOrders(spark, TestSpark.Sf0001)
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice_cents")
    val exFlags = Monitoring.profileCompare(h, s2, cols).collect()
      .map(r => r.getString(0) -> ((r.getAs[Boolean]("null_drift"),
        r.getAs[Boolean]("range_drift")))).toMap
    val skFlags = Monitoring.profileCompareSketch(h, s2, cols).collect()
      .map(r => r.getString(0) -> ((r.getAs[Boolean]("null_drift"),
        r.getAs[Boolean]("range_drift")))).toMap
    assert(exFlags == skFlags)
  }

  test("constraintReport: null/dup pks and FK misses counted exactly") {
    val child = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(20L)), (Some(2L), Some(10L)),
      (None, Some(10L)),    // null pk — not a uniqueness violation
      (Some(3L), Some(99L)), // fk miss
      (Some(4L), None)       // null fk — not a referential violation
    ).toDF("id", "parent_id")
    val parent = Seq(10L, 20L).toDF("pid")
    val out = Monitoring.constraintReport(child, Seq("id"),
        fks = Seq(("fk_child_parent", "parent_id", parent, "pid")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("pk_not_null") == (1L, false))
    assert(out("pk_unique") == (1L, false))      // id=2 twice
    assert(out("fk_child_parent") == (1L, false)) // 99 only
    val clean = Monitoring.constraintReport(parent, Seq("pid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(clean.forall(r => r._2 == 0L && r._3))
  }

  test("constraintReport: same-name FK columns and delimiter-bearing composite keys") {
    // FK column named identically on both sides (the common warehouse
    // convention) — an unqualified join condition would be ambiguous.
    val child = Seq((1L, Some(10L)), (2L, Some(99L))).toDF("id", "customer_id")
    val parent = Seq((10L, "a")).toDF("customer_id", "name")
    val fk = Monitoring.constraintReport(child, Seq("id"),
        fks = Seq(("fk", "customer_id", parent, "customer_id")))
      .filter($"constraint" === "fk").collect().head
    assert(fk.getLong(1) == 1L)
    // Distinct composite keys whose parts contain ':' must NOT alias
    // into a fake uniqueness violation ("x:1","y") vs ("x","1:y").
    val tricky = Seq(("x:1", "y"), ("x", "1:y")).toDF("a", "b")
    val uniq = Monitoring.constraintReport(tricky, Seq("a", "b"))
      .filter($"constraint" === "pk_unique").collect().head
    assert(uniq.getLong(1) == 0L && uniq.getBoolean(2))
  }

  test("filterFunnel: rejects duplicate and non-identifier stage names") {
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException](Monitoring.filterFunnel(df, Nil))
    intercept[IllegalArgumentException](Monitoring.filterFunnel(df,
      Seq("a" -> ($"x" > 0), "a" -> ($"x" > 1))))
    intercept[IllegalArgumentException](Monitoring.filterFunnel(df,
      Seq("bad name'" -> ($"x" > 0))))
  }

  test("distributionDrift: identical sides score exactly zero PSI in every bucket") {
    val l = (1 to 1000).map(i => Tuple1(i.toLong)).toDF("v")
    val out = Monitoring.distributionDrift(l, l, "v", nBuckets = 4)
      .orderBy($"bucket").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).sum == 1000L)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))            // n_left == n_right
      assert(r.getDouble(6) == 0.0, "psi_term must be exactly 0")
      assert(r.getInt(5) == 0)
    }
    assert(out.last.getDouble(7) == 0.0)              // cum_psi
  }

  test("distributionDrift: mass shift scores positive PSI; one-sided buckets flag, not poison") {
    val l = (1 to 1000).map(i => Tuple1(i.toLong)).toDF("v")
    // all right-side mass lands in the reference's first quartile
    val r = (1 to 1000).map(i => Tuple1((i % 200 + 1).toLong)).toDF("v")
    val out = Monitoring.distributionDrift(l, r, "v", nBuckets = 4)
      .orderBy($"bucket").collect()
    val b1 = out.head
    assert(b1.getLong(2) == 1000L)                    // all right rows in bucket 1
    assert(b1.getDouble(6) > 0.0, "shifted mass must contribute positive PSI")
    // buckets 2-4: right empty → one_sided, NULL term, cum_psi unpoisoned
    out.tail.foreach { x =>
      assert(x.getLong(2) == 0L && x.getInt(5) == 1)
      assert(x.isNullAt(6))
    }
    assert(out.last.getDouble(7) == b1.getDouble(6), "cum skips one-sided NULLs")
    // null values are excluded, not a bucket of their own
    val withNulls = ((1 to 1000).map(i => Option(i.toLong)) :+ Option.empty[Long])
      .map(Tuple1(_)).toDF("v")
    val nOut = Monitoring.distributionDrift(withNulls, l, "v", 4)
      .orderBy($"bucket").collect()
    assert(nOut.length == 4 && nOut.map(_.getLong(1)).sum == 1000L)
    // guards: empty reference, bad bucket count
    intercept[IllegalArgumentException](
      Monitoring.distributionDrift(l.filter(lit(false)), l, "v", 4))
    intercept[IllegalArgumentException](
      Monitoring.distributionDrift(l, l, "v", 1))
  }

  test("distributionDriftSketch: same contract as exact; cuts within sketch rank error") {
    val l = (1 to 2000).map(i => Tuple1(i.toLong)).toDF("v")
    val r = (1 to 2000).map(i => Tuple1((i * 3 % 2500 + 1).toLong)).toDF("v")
    val exact = Monitoring.distributionDrift(l, r, "v", nBuckets = 5)
      .orderBy($"bucket").collect()
    val sk = Monitoring.distributionDriftSketch(l, r, "v", nBuckets = 5)
      .orderBy($"bucket").collect()
    assert(sk.length == exact.length)
    // identical output schema (the downstream body is literally shared)
    assert(Monitoring.distributionDriftSketch(l, r, "v").schema ==
      Monitoring.distributionDrift(l, r, "v").schema)
    // accuracy=10000 bounds rank error at 1/10000: on 2000 distinct
    // values no cut can move past a neighbor, so every bucket count —
    // and therefore every share and psi term — matches the exact
    // variant EXACTLY here.
    exact.zip(sk).foreach { case (e, s) =>
      assert(e.getLong(1) == s.getLong(1) && e.getLong(2) == s.getLong(2),
        s"bucket ${e.getInt(0)}: counts diverged beyond sketch rank error")
    }
    assert(exact.last.getDouble(7) == sk.last.getDouble(7)) // total PSI
    // degenerate guards shared with the exact variant
    intercept[IllegalArgumentException](
      Monitoring.distributionDriftSketch(l.filter(lit(false)), l, "v", 4))
    intercept[IllegalArgumentException](
      Monitoring.distributionDriftSketch(l, l, "v", 1))
  }

  test("countAnomaly: spike flags against the group median, baseline days don't") {
    // A: five ~10-count days and one 100-count day. med = 10, deviations
    // (0,0,0,0,0,90) → MAD = 0 → every deviating day flags, the spike
    // included; the flat days stay quiet (strict > on 0).
    // B: counts 8,10,12,14,16 → med 12, deviations (4,2,0,2,4) → MAD = 2,
    // bar 6 → nothing flags (max deviation 4).
    val rows =
      (1 to 5).flatMap(d => Seq.fill(10)(("A", d))) ++ Seq.fill(100)(("A", 6)) ++
      Seq(8, 10, 12, 14, 16).zipWithIndex.flatMap { case (n, d) =>
        Seq.fill(n)(("B", d + 1)) }
    val out = Monitoring.countAnomaly(rows.toDF("t", "d"), Seq("t"), col("d"))
      .orderBy($"t", $"day").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getInt(6)))
    val a = out.filter(_._1 == "A")
    assert(a.map(_._6).toSeq == Seq(0, 0, 0, 0, 0, 1))
    assert(a.forall(x => x._4 == 10.0 && x._5 == 0.0))
    val b = out.filter(_._1 == "B")
    assert(b.map(_._6).toSeq == Seq(0, 0, 0, 0, 0))
    assert(b.forall(x => x._4 == 12.0 && x._5 == 2.0))
  }

  test("countAnomaly: interpolated medians stay exact; constant groups stay quiet") {
    // C: four days 10,10,20,20 → med = (10+20)/2 = 15 exactly,
    // deviations all 5 → MAD 5, bar 15 → quiet.
    // D: constant 7 → med 7, all deviations 0, MAD 0 → strict > keeps
    // every day quiet.
    val rows =
      Seq(10, 10, 20, 20).zipWithIndex.flatMap { case (n, d) =>
        Seq.fill(n)(("C", d + 1)) } ++
      (1 to 4).flatMap(d => Seq.fill(7)(("D", d)))
    val out = Monitoring.countAnomaly(rows.toDF("t", "d"), Seq("t"), col("d"))
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getInt(6)))
    assert(out.filter(_._1 == "C").forall(x => x._2 == 15.0 && x._3 == 5.0 && x._4 == 0))
    assert(out.filter(_._1 == "D").forall(x => x._2 == 7.0 && x._3 == 0.0 && x._4 == 0))
    intercept[IllegalArgumentException](
      Monitoring.countAnomaly(rows.toDF("t", "d"), Seq.empty, col("d")))
    intercept[IllegalArgumentException](
      Monitoring.countAnomaly(rows.toDF("t", "mad"), Seq("mad"), col("mad")))
  }

  test("countAnomaly: NULL-dim group is monitored, not silently dropped") {
    // the "events with no type" feed: 3 quiet days + a spike day
    val rows: Seq[(String, Int)] =
      (1 to 3).flatMap(d => Seq.fill(5)((null: String, d))) ++
      Seq.fill(50)((null: String, 4)) ++ Seq.fill(7)(("E", 1))
    val out = Monitoring.countAnomaly(rows.toDF("t", "d"), Seq("t"), col("d"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1), r.getInt(6)))
    val nullGroup = out.filter(_._1.isEmpty)
    assert(nullGroup.length == 4, s"null-dim days missing: ${out.toSeq}")
    assert(nullGroup.count(_._3 == 1) == 1 &&
      nullGroup.find(_._3 == 1).get._2 == 4)
  }

  test("distributionDrift: empty right side gives NULL shares, all one_sided") {
    val l = (1 to 100).map(i => Tuple1(i.toLong)).toDF("v")
    val out = Monitoring.distributionDrift(l, l.filter(lit(false)), "v", 4)
      .orderBy($"bucket").collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.isNullAt(4), "p_right must be NULL, not NaN, for an empty side")
      assert(r.getInt(5) == 1 && r.isNullAt(6))
    }
  }
}
