package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergePipeline

class MergePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rankDedup keeps exactly the top row per key") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")).toDF("k", "ts", "v")
    val out = MergePipeline.rankDedup(df, Seq($"k"), Seq($"ts".desc))
      .orderBy($"k").select("v").as[String].collect().toSeq
    assert(out == Seq("b", "c"))
  }

  test("argmaxMerge resolves every value column at max rank") {
    val df = Seq((1L, 1L, "x", 1.0), (1L, 9L, "y", 2.0), (2L, 3L, "z", 3.0))
      .toDF("k", "r", "a", "b")
    val out = MergePipeline.argmaxMerge(df, $"k", $"r", Seq("a", "b"))
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "y", 2.0), (2L, "z", 3.0)))
  }

  test("argmaxMerge with a struct rank: no packed-long aliasing at scale ids") {
    import org.apache.spark.sql.functions.struct
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // The packed form unix_millis*1e6 + event_id ranked row A (ms=1,
    // id=1,500,000 -> 2.5e6) ABOVE row B (ms=2, id=100 -> 2.0001e6)
    // although B is later; the struct rank orders correctly.
    val df = Seq((1L, ts(1L), 1500000L, "A"), (1L, ts(2L), 100L, "B"))
      .toDF("k", "ts", "event_id", "v")
    val out = MergePipeline.argmaxMerge(df, $"k",
      struct($"ts", $"event_id"), Seq("v")).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "B")))
  }

  test("sparseDwMerge keeps a new-to-DW row even when its merged columns are all NULL") {
    val dw = Seq((1L, "n1")).toDF("id", "name")
    val sparse = Seq((9L, null.asInstanceOf[String])).toDF("id", "name")
    val out = MergePipeline.sparseDwMerge(sparse, dw, "id")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((9L, null.asInstanceOf[String])))
  }

  test("sparseDwMerge: changed rows survive, unchanged drop, new keys pass, preferDw wins") {
    val dw = Seq((1L, "n1", 100L, "2020"), (2L, "n2", 200L, "2021"), (3L, "n3", 300L, "2022"))
      .toDF("id", "name", "bal", "created")
    val sparse = Seq(
      (1L, 150L, "2024"),  // bal changed → survives
      (2L, 200L, "2024"),  // bal unchanged, created prefers DW → drops
      (9L, 900L, "2024")   // new key → survives
    ).toDF("id", "bal", "created")
    val out = MergePipeline.sparseDwMerge(sparse, dw, "id", preferDw = Seq("created"))
      .orderBy($"id").as[(Long, String, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "n1", 150L, "2020"),          // merged: name from DW, created prefers DW
      (9L, null.asInstanceOf[String], 900L, "2024"))) // new: DW fields null, created from sparse
  }
}
