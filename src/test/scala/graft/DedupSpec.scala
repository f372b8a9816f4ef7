package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.queries.TextQueries

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = TextQueries.dupCorpus(spark, TestSpark.Sf0001).cache()

  test("shingles: docs shorter than n tokens yield empty sets, not a crash") {
    val tiny = Seq((1L, "one two"), (2L, ""), (3L, "a b c d")).toDF("doc_id", "text")
    val out = tiny.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .orderBy($"doc_id").collect()
    assert(out(0).getSeq[String](1).isEmpty)
    assert(out(1).getSeq[String](1).isEmpty)
    assert(out(2).getSeq[String](1) == Seq("a b c", "b c d"))
    // and the jaccard pipeline tolerates such docs end-to-end
    assert(Dedup.ngramJaccardPairs(tiny, "doc_id", "text").count() == 0)
  }

  test("exactGroups finds exactly the injected %7 copies") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text")
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("group_size") == 2))
    // every group is {id, id+100000}
    assert(rows.forall { r =>
      val ids = r.getAs[String]("member_ids").split(",").map(_.toLong)
      ids(0) % 7 == 0 && ids(1) == ids(0) + 100000
    })
  }

  test("ngramJaccard finds exact copies at J=1 and tail-variants above 0.5") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5, 10000)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jaccard")))
    // a < 100000 keeps copy-of-copy pairs (ids divisible by both 7 and 11,
    // e.g. 100231↔200231) out of the exact-copy bucket.
    val exact = pairs.filter { case (a, b, _) => a < 100000 && b == a + 100000 }
    val tails = pairs.filter { case (a, b, _) => a < 100000 && b == a + 200000 }
    assert(exact.nonEmpty && exact.forall(_._3 == 1.0))
    assert(tails.nonEmpty && tails.forall(t => t._3 > 0.5 && t._3 < 1.0))
  }

  test("minhash LSH recalls most true near-dup pairs") {
    val truth = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.7, 10000)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val cand = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }

  test("LSH/SimHash bucket cap drops degenerate buckets, keeps real near-dups") {
    // 30 identical boilerplate docs form one degenerate bucket per band
    // (size 30 > cap 10): with no cap that is 435 pairs × 4 bands of
    // explode; with the cap they are dropped wholesale. A genuinely
    // near-duplicate pair (distinct text, one token changed) lives in
    // buckets of size 2 and must survive.
    val boiler = (0L until 30L).map(i => (i,
      "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"))
    val near = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog while the spark engine " +
        "shuffles partitions across executors and joins the buckets deterministically"),
      (1001L, "the quick brown fox jumps over the lazy dog while the spark engine " +
        "shuffles partitions across executors and joins the buckets efficiently"))
    // SimHash needs near-IDENTICAL docs (one token in 23 flips > 3 of 64
    // bits): an exact-duplicate pair checks its cap-survival path.
    val dup = Seq(
      (2000L, "completely separate prose about columnar storage and vectorized reads"),
      (2001L, "completely separate prose about columnar storage and vectorized reads"))
    val df = (boiler ++ near ++ dup).toDF("doc_id", "text")
    // 8 bands × 2 rows: per-band collision ≈ J², so a J≈0.9 pair agrees on
    // ≥1 band with near-certainty (4×4 banding left this exact pair with
    // zero matching bands on this hash draw).
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text", bands = 8, bucketCap = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!lsh.exists { case (a, b) => a < 30 && b < 30 })
    assert(lsh.contains((1000L, 1001L)))
    val sim = Dedup.simhashPairs(df, "doc_id", "text", bucketCap = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!sim.exists { case (a, b) => a < 30 && b < 30 })
    assert(sim.contains((2000L, 2001L)))
  }

  test("simhash: identical docs collide at hamming 0; pairs are symmetric-free") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Int]("hamming")))
    val exactCopies = pairs.filter { case (a, b, _) => a < 100000 && b == a + 100000 }
    assert(exactCopies.nonEmpty && exactCopies.forall(_._3 == 0))
    assert(pairs.forall { case (a, b, _) => a < b })
  }
}
