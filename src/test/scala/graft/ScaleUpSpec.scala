package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ShinglesExpr
import graft.sources.Tables

/** ScaleUp must preserve every property the operator suite leans on:
  * intra-replica structure identical to the source, replicas disjoint,
  * output linear in the factor. */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("fact tables scale by factor, dimensions stay fixed, keys disjoint") {
    val factor = 3
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    val so = ScaleUp.scaled(orders, "orders", factor, 64)
    val sc = ScaleUp.scaled(customer, "customer", factor, 64)
    val sn = ScaleUp.scaled(Tables.load(spark, sf, "nation"), "nation", factor, 64)
    assert(so.count() === factor * orders.count())
    assert(sn.count() === Tables.load(spark, sf, "nation").count())
    // keys disjoint across replicas: distinct count scales exactly
    assert(so.select("o_orderkey").distinct.count() ===
      factor * orders.select("o_orderkey").distinct.count())
    // FK integrity: the orders->customer join scales exactly (no
    // cross-replica matches, no dropped matches)
    val base = orders.join(customer, $"o_custkey" === $"c_custkey").count()
    val scaledJoin = so.join(sc, $"o_custkey" === $"c_custkey").count()
    assert(scaledJoin === factor * base)
  }

  test("permuteText is injective, length-preserving, shingle-structure-preserving") {
    // Every replica's permutation is a BIJECTION of [a-z] (injectivity of
    // the text map), and replica 0 is the identity.
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    assert(ScaleUp.permutationFor(0) == alphabet)
    Seq(1, 3, 27, 99).foreach { r =>
      val p = ScaleUp.permutationFor(r)
      assert(p.sorted == alphabet, s"replica $r permutation not a bijection: $p")
      assert(p != alphabet, s"replica $r permutation degenerated to identity")
    }
    // Distinct replicas draw distinct permutations (1/26! to collide) —
    // including ABOVE the old rotation's period-26 ceiling.
    val perms = (0 to 100).map(ScaleUp.permutationFor)
    assert(perms.distinct.length == perms.length)
    val docs = Tables.load(spark, sf, "documents").limit(50)
      .select($"doc_id", $"text")
    val both = docs.select($"doc_id", $"text",
      ScaleUp.permuteText($"text", 3).as("rot"))
    // length preserved row-by-row
    assert(both.filter(length($"rot") =!= length($"text")).count() === 0)
    // shingle-set size preserved (tokenization sees identical structure)
    def sh(c: org.apache.spark.sql.Column) =
      size(ShinglesExpr.wordShingles(split(lower(c), "\\s+"), 3))
    assert(both.filter(sh($"rot") =!= sh($"text")).count() === 0)
    // the permutation is invertible: translating back through it restores
    val p3 = ScaleUp.permutationFor(3)
    val round = both.select($"text",
      translate($"rot", p3 + p3.toUpperCase,
        alphabet + alphabet.toUpperCase).as("back"))
    assert(round.filter($"back" =!= $"text").count() === 0)
    // cross-replica disjointness: an all-letter text shares no shingles
    // with its permuted image (a shared shingle needs three consecutive
    // tokens fixed by the permutation)
    val t = Seq("the quick brown fox jumps over the lazy dog again").toDF("text")
    val inter = t.select(size(array_intersect(
      ShinglesExpr.wordShingles(split($"text", " "), 3),
      ShinglesExpr.wordShingles(split(ScaleUp.permuteText($"text", 1), " "), 3)
    )).as("n")).head().getInt(0)
    assert(inter === 0)
  }

  test("flipSigns preserves within-replica dot products bit-exactly") {
    val emb = Tables.load(spark, sf, "embeddings").limit(20)
      .select($"vec_id", $"embedding")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select(
        graft.functions.DotProductExpr.dotProduct(
          $"a.embedding".cast("array<double>"), $"b.embedding".cast("array<double>")).as("d0"),
        graft.functions.DotProductExpr.dotProduct(
          ScaleUp.flipSigns($"a.embedding", 5, 64).cast("array<double>"),
          ScaleUp.flipSigns($"b.embedding", 5, 64).cast("array<double>")).as("d5"))
    // (s*x)*(s*y) == x*y exactly in IEEE for s = ±1, same summation order
    assert(pairs.filter($"d0" =!= $"d5").count() === 0)
    // mask genuinely flips some dims for r>0 (and none for r=0)
    val m = ScaleUp.signMask(5, 64)
    assert(m.count(_ < 0) > 8 && m.count(_ > 0) > 8)
    assert(ScaleUp.signMask(0, 64).forall(_ == 1.0f))
  }
}
