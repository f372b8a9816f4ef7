package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs non-empty at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }
}
