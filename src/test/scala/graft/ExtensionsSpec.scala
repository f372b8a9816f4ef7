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
}
