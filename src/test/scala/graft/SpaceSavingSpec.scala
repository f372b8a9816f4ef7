package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSaving
import graft.operators.{Dedup, Vocab}
import graft.queries.TextQueries
import graft.sources.Tables

/** Pins the SpaceSaving heavy-hitter sketch's two regimes and the new
  * span-dedup census.
  *
  * Exact regime (capacity ≥ distinct keys): counts equal a groupBy count
  * exactly with zero error — that is the regime the oracle-verified
  * q_heavy_hitters runs in. Approximate regime (Zipf fixture, capacity ≪
  * distinct keys): the Metwally et al. guarantees — every key with true
  * count > N/m is reported, and est − err ≤ true ≤ est for every reported
  * entry whose key we can ground-truth.
  */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: capacity >= distinct keys reproduces groupBy counts, err 0") {
    val data = (1 to 500).map(i => s"k${i % 37}").toDF("k").repartition(4)
    val hh = data.agg(SpaceSaving.spaceSaving($"k", 64).as("h"))
      .select(explode($"h").as("e"))
      .select($"e.item", $"e.est_count", $"e.max_err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = data.groupBy($"k").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh.length == 37)
    hh.foreach { case (k, c, e) =>
      assert(e == 0L, s"exact regime must carry zero error, got $e for $k")
      assert(c == truth(k), s"count mismatch for $k: $c vs ${truth(k)}")
    }
    // Output ordering contract: (est_count desc, item asc).
    assert(hh.sortBy { case (k, c, _) => (-c, k) }.toSeq == hh.toSeq)
  }

  test("approximate regime on a Zipf stream: guaranteed hitters present, bounds hold") {
    // Zipf-ish: key i appears ~N/i times → heavy head, long tail. 2000
    // distinct keys, capacity 50 → heavily over-subscribed sketch.
    val rows = (1 to 2000).flatMap(i => Seq.fill(2000 / i)(s"z$i"))
    val n = rows.size.toLong
    val m = 50
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hh = rows.toDF("k").repartition(8)
      .agg(SpaceSaving.spaceSaving($"k", m).as("h"))
      .select(explode($"h").as("e"))
      .select($"e.item", $"e.est_count", $"e.max_err")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.length == m)
    val reported = hh.map(_._1).toSet
    // Any key with true count > N/m must be present (SpaceSaving's core
    // guarantee, preserved under the mergeable-summaries merge).
    truth.filter(_._2 > n / m).keys.foreach { k =>
      assert(reported.contains(k), s"guaranteed hitter $k (count ${truth(k)}) missing")
    }
    // Every reported entry over-estimates by at most its error bound.
    hh.foreach { case (k, c, e) =>
      val t = truth(k)
      assert(t <= c, s"$k: est $c must be >= true $t")
      assert(c - e <= t, s"$k: est $c - err $e must be <= true $t")
    }
  }

  test("null keys are skipped, not counted") {
    val data = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("k")
    val hh = data.agg(SpaceSaving.spaceSaving($"k", 8).as("h"))
      .select(explode($"h").as("e")).select($"e.item", $"e.est_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh == Map("a" -> 2L, "b" -> 1L))
  }

  test("capacityFor clamps to [floor, cap] and scales with corpus size") {
    assert(Vocab.capacityFor(100) == 4096)          // floor wins
    assert(Vocab.capacityFor(1000000) == 250000)    // n / perDoc
    assert(Vocab.capacityFor(Long.MaxValue) == (1 << 20)) // cap wins
  }

  test("duplicatedSpans: hand corpus — shared span counted, within-doc repeat not") {
    // doc 1 & 2 share the 3-token span "x y z"; doc 3 repeats its own
    // span twice but shares with nobody → its dup fraction must be 0
    // (df is distinct-doc, not occurrences).
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "x y z d e f"),
      (3L, "p q r p q r")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 4 spans, 1 dup; doc 2: 4 spans, 1 dup; doc 3: 4 spans, 0 dup.
    assert(out.toSeq == Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 0L)))
  }

  test("duplicatedSpans: docs shorter than k are absent, not zero-row crashes") {
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("strikeDuplicatedSpans: covered tokens struck, survivors rebuild in order") {
    // docs 1 & 2 share the 3-token span "x y z"; doc 3 only repeats its
    // OWN span (within-doc — must NOT strike); doc 4 is too short for any
    // span and must pass through whole.
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "x y z d e f"),
      (3L, "p q r p q r"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Dedup.strikeDuplicatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 3L, "a b c"),
      (2L, 6L, 3L, "d e f"),
      (3L, 6L, 6L, "p q r p q r"),
      (4L, 2L, 2L, "a b")))
  }

  test("strikeDuplicatedSpans: overlapping duplicated spans merge; fully-covered docs drop") {
    // docs 5 & 6 are identical → every span duplicated → every token
    // covered → both dropped. doc 7 shares its PREFIX span and its
    // SUFFIX span with them; the two covered regions overlap in the
    // middle only partially — check the union-of-ranges semantics.
    val docs = Seq(
      (5L, "m n o p q"),
      (6L, "m n o p q"),
      (7L, "m n o w1 w2 o p q")).toDF("doc_id", "text")
    val out = Dedup.strikeDuplicatedSpans(docs, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 7: spans "m n o" (covers 1-3) and "o p q" (covers 6-8) are
    // duplicated; "n o w1", "o w1 w2", "w1 w2 o", "w2 o p" are unique.
    assert(out.toSeq == Seq((7L, 8L, 2L, "w1 w2")))
  }

  test("strikeDuplicatedSpans: minDocs raises the strike bar") {
    // The span appears in 2 docs — minDocs=3 must keep everything.
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "x y z d e f")).toDF("doc_id", "text")
    val out = Dedup.strikeDuplicatedSpans(docs, "doc_id", "text", k = 3, minDocs = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 6L), (2L, 6L)))
    intercept[IllegalArgumentException] {
      Dedup.strikeDuplicatedSpans(docs, "doc_id", "text", k = 3, minDocs = 1)
    }
  }

  test("strikeDuplicatedSpans agrees with the census: kept + struck = census accounting") {
    // On the sf0.001 corpus: every doc the census reports with
    // n_dup_spans = 0 must survive with ALL tokens kept; every doc with
    // dup_fraction = 1.0 (all spans duplicated) must lose at least k
    // tokens or be dropped entirely.
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val census = Dedup.duplicatedSpans(d, "doc_id", "text", k = 6)
      .select($"doc_id", $"n_dup_spans").as[(Long, Long)].collect().toMap
    val struck = Dedup.strikeDuplicatedSpans(d, "doc_id", "text", k = 6)
      .select($"doc_id", $"n_tokens", $"n_kept").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    census.foreach { case (id, nDup) =>
      struck.get(id).foreach { case (n, kept) =>
        if (nDup == 0L) assert(kept == n, s"doc $id: clean doc lost tokens")
        else assert(n - kept >= 6, s"doc $id: duplicated spans must strike >= k tokens")
      }
    }
    // At least one doc in the fixture has duplicated spans (the corpus
    // carries boilerplate) — the test must not pass vacuously.
    assert(census.values.exists(_ > 0L))
  }

  test("strikeDuplicatedSpans plan: no corpus position-stream explode") {
    // The round-7 replan: after the census only duplicated START
    // positions shuffle, and kept tokens come from a per-row
    // array_except — the plan must carry exactly the two span-start
    // Generate nodes (census branch + probe branch), never the
    // corpus-wide position explode (+2 Generates) the anti-join form
    // needed.
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val plan = Dedup.strikeDuplicatedSpans(d, "doc_id", "text", k = 6)
      .queryExecution.optimizedPlan.toString
    val generates = "(?m)^\\s*[+:]?-? *Generate ".r.findAllIn(plan).length
    assert(generates <= 2, s"expected <= 2 Generate nodes, got $generates:\n${plan.take(1500)}")
    assert(plan.contains("array_except"), plan.take(1500))
  }

  test("q_heavy_hitters runs in the exact regime on sf0.001") {
    val out = TextQueries.queries("q_heavy_hitters")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(2) == 0L), "verify-scale run must be exact (err 0)")
  }
}
