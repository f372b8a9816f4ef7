package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CollectMaxOne
import graft.operators.Skew
import graft.sources.Tables
import graft.streaming.EventStream

class SkewAndAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed CollectMaxOne matches the declarative collectMaxOne") {
    val data = Seq(("k", "old", 1L), ("k", "new", 5L), ("k", null.asInstanceOf[String], 9L),
      ("t", "x", 3L), ("t", "y", 3L))
    val typed = data.toDS()
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(CollectMaxOne.forString)
      .collect().toMap
    assert(typed == Map("k" -> "new", "t" -> "y"))
  }

  test("saltedJoin equals the plain join") {
    val events = Tables.load(spark, TestSpark.Sf0001, "events")
      .select($"event_id", $"user_id", $"value")
    val dim = events.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val plain = events.join(dim, Seq("user_id"))
      .select($"event_id", $"n_events").as[(Long, Long)].collect().toSet
    val salted = Skew.saltedJoin(events, dim, "user_id", salts = 7,
        saltSrc = $"event_id")
      .select($"event_id", $"n_events").as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    val e = Tables.load(spark, TestSpark.Sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    e.unionByName(e).write.mode("overwrite").parquet(dir) // every event twice
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStream.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("dedup_out")
    assert(got.count() == e.count())
    assert(got.select("event_id").distinct().count() == got.count())
  }
}
