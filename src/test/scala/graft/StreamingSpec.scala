package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventQueries
import graft.sources.Tables
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stage sf0.001 events (micros ts) to a temp dir so readStream gets a
    * clean schema, then drive the stream synchronously. */
  private lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.load(spark, TestSpark.Sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowAgg over a bounded stream equals the batch twin") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val q = EventStream.windowAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val streamed = spark.table("win_out")
      .orderBy("hour_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Long, Double, Double)].collect().toSeq
    val batch = EventQueries.queries("q_event_window_agg")(spark, TestSpark.Sf0001)
      .as[(java.sql.Timestamp, String, Long, Long, Double, Double)].collect().toSeq
    assert(streamed == batch)
  }

  test("stream-static enrichment joins every event to its user dimension") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
    val dim = Tables.load(spark, TestSpark.Sf0001, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n_total"))
    val q = EventStream.enrich(stream, dim, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val out = spark.table("enrich_out")
    assert(out.count() == spark.read.parquet(stagedDir).count())
    assert(out.filter($"n_total".isNull).count() == 0)
  }

  test("stateful sessionize over a bounded stream equals the batch twin") {
    val schema = spark.read.parquet(stagedDir).schema
    val stream = spark.readStream.schema(schema).parquet(stagedDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventStream.Event]
    val q = EventStream.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally q.stop()

    // Append mode only emits CLOSED sessions; each user's last session is
    // still open in state. Compare against the batch twin minus each
    // user's final session.
    val batch = EventQueries.queries("q_sessionize")(spark, TestSpark.Sf0001)
      .withColumn("max_sid", max($"session_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")))
      .filter($"session_id" < $"max_sid")
      .select($"user_id", $"session_id", $"n_events", $"session_start",
        $"session_end", $"value_milli")
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    val streamed = spark.table("sess_out")
      .orderBy($"user_id", $"session_id")
      .as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(streamed == batch)
  }
}
