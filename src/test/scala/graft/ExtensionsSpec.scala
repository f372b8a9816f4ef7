package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes decodeurl and dot_product to SQL") {
    // TestSpark builds through GraftSession.builder, so the extensions
    // class is installed on the shared test session.
    val r = TestSpark.spark.sql(
      "SELECT decodeurl('a%20b+c') AS d, dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS p"
    ).collect().head
    assert(r.getString(0) == "a b c")
    assert(r.getDouble(1) == 11.0)
  }

  test("GraftExtensions exposes the text-dedup primitives to SQL") {
    val spark = TestSpark.spark
    val r = spark.sql(
      """SELECT word_shingles(array('a','b','c','d'), 3) AS sh,
        |       minhash_sig(array('x','y'), 4) AS sig,
        |       simhash64(array('x','y')) AS sim""".stripMargin
    ).collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // parity with the Column-API expressions on the same inputs
    import org.apache.spark.sql.functions._
    import graft.functions.{MinHashSigExpr, SimHash64Expr}
    val expected = spark.range(1).select(
      MinHashSigExpr.minhashSig(typedLit(Seq("x", "y")), 4).as("sig"),
      SimHash64Expr.simhash64(typedLit(Seq("x", "y"))).as("sim")).collect().head
    assert(r.getSeq[Long](1) == expected.getSeq[Long](0))
    assert(r.getLong(2) == expected.getLong(1))
    // non-literal hash count is rejected, not silently misread
    val err = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('x'), id + 1) FROM range(1)").collect())
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null && err.getCause.getMessage.contains("integer literal"))
  }

  test("wrong-arity SQL calls fail with a named-function arity error") {
    val spark = TestSpark.spark
    // missing second argument must NOT surface as a bare
    // IndexOutOfBoundsException from exprs(1)
    def msg(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    }
    assert(msg("SELECT word_shingles(array('a'))").contains("word_shingles expects 2"))
    assert(msg("SELECT minhash_sig(array('a'))").contains("minhash_sig expects 2"))
    assert(msg("SELECT dot_product(array(1.0D))").contains("dot_product expects 2"))
    assert(msg("SELECT simhash64(array('a'), 1)").contains("simhash64 expects 1"))
    assert(msg("SELECT decodeurl('a', 'b')").contains("decodeurl expects 1"))
  }
}
