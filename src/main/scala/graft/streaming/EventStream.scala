package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators (SURVEY.md §2
  * #34): watermarked tumbling-window aggregation and stateful gap
  * sessionization via flatMapGroupsWithState.
  *
  * Designed for an unbounded 100 TB/day firehose: state is bounded by the
  * watermark (window agg) and by per-user session structs that emit and
  * drop on gap timeout (sessionization) — nothing accumulates without
  * bound.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** start/last keep the original micros-precision timestamps; gap math
    * uses epoch millis (matching the batch twin's unix_millis truncation). */
  final case class SessionState(sessionId: Long, start: java.sql.Timestamp,
                                last: java.sql.Timestamp,
                                nEvents: Long, valueMilli: Long)

  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, value_milli: Long)

  /** Hourly tumbling-window counts/sums per event type; late data beyond
    * the watermark is dropped, bounding state. Mirrors q_event_window_agg. */
  def windowAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_milli"), col("min_value"), col("max_value"))

  /** Stream-static enrichment: join the event stream against a (small)
    * static dimension with an explicit broadcast — per micro-batch, the
    * dimension never shuffles and the stream stays partition-local. */
  def enrich(events: DataFrame, dim: DataFrame, on: Seq[String]): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), on, "left_outer")

  /** The reference's incremental operating loop, streaming-native: each
    * micro-batch of sparse updates runs the full merge pipeline against
    * the current DW table (rank-dedup is the caller's upstream concern;
    * here: merge + changed-only gate, graft.operators.MergePipeline
    * .sparseDwMerge) and APPENDS the changed rows to a delta-stage
    * directory — exactly the reference's `INSERT OVERWRITE INTO
    * delta_stage_X` model (script_converter_tool.py rules 1/5/28), where
    * a downstream warehouse proc applies the staged deltas. Append-only
    * parquet keeps the sink transactional without table-format machinery;
    * dedup across re-delivered batches is the staged proc's job, as in
    * the reference. Returns the started query; callers own its lifecycle. */
  def stageDeltas(sparse: DataFrame, dw: DataFrame, pk: String,
                  stagePath: String, checkpointPath: String,
                  preferDw: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    sparse.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.MergePipeline.sparseDwMerge(batch.toDF(), dw, pk, preferDw)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(stagePath)
        ()
      }
      .start()

  /** Streaming exact dedup on event_id: state is bounded by the watermark
    * (duplicates arriving later than `watermark` after the original are
    * not suppressed — the at-least-once ingestion contract). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming CONTENT dedup for ingest pipelines: drops any document
    * whose canonical-text fingerprint ([[graft.operators.TextAnalysis
    * .docFingerprint]]) was already seen within the watermark — the
    * streaming twin of Dedup.exactGroups' duplicate detection. State is
    * one 128-bit hash per distinct doc inside the watermark window; the
    * text itself never enters state. NULL-text rows (upstream parse
    * failures) are routed AROUND the stateful operator entirely — a
    * shared null key would silently discard every such row after the
    * first (data loss, not dedup), and a synthetic unique key would bloat
    * the state store with never-matching entries for the whole window. */
  def dedupStreamByContent(docs: DataFrame, tsCol: String, textCol: String,
                           watermark: String = "2 hours"): DataFrame = {
    val withTs = docs.withColumn(tsCol, col(tsCol).cast("timestamp"))
    val deduped = withTs.filter(col(textCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .withColumn("__fp", graft.operators.TextAnalysis.docFingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
    deduped.unionByName(withTs.filter(col(textCol).isNull))
  }

  /** Stateful 30-min-gap sessionization: one SessionState per live user.
    * Sessions close (emit + state removed) either when a new event arrives
    * past the gap, or on EVENT-TIME TIMEOUT: once the watermark passes
    * `last + gap` the session can never be extended (later events would be
    * beyond the gap anyway), so it is flushed and its state dropped. A user
    * who goes silent therefore costs nothing after `watermark` — state is
    * strictly bounded on an unbounded firehose, and final sessions are not
    * silently lost. A user returning AFTER a timeout flush restarts
    * numbering at session_id 1 (the alternative — remembering the counter
    * forever — is exactly the unbounded state this timeout removes);
    * (user_id, session_start) uniquely keys every NON-sentinel session
    * (session_id 0 rows are late fragments — see the out-of-band case
    * below — and may repeat a start). The batch twin is q_sessionize.
    * NOTE: within-batch
    * events are sorted per user in-memory; at scale the trigger interval
    * bounds that batch size. */
  def sessionize(events: Dataset[Event], gapMs: Long = 1800000L,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def emit(s: SessionState): Unit = out += SessionOut(
            userId, s.sessionId, s.nEvents, s.start, s.last, s.valueMilli)
          if (state.hasTimedOut) {
            // Watermark passed last+gap: no on-time event can extend this
            // session any more — flush it and free the state.
            state.getOption.foreach(emit)
            state.remove()
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val vm = math.round(e.value * 1000)
              st match {
                case null =>
                  st = SessionState(1L, e.ts, e.ts, 1L, vm)
                case s if e.ts.getTime - s.last.getTime > gapMs =>
                  emit(s)
                  st = SessionState(s.sessionId + 1, e.ts, e.ts, 1L, vm)
                case s if s.start.getTime - e.ts.getTime > gapMs =>
                  // Out-of-band late event: more than a gap OLDER than the
                  // current session's start, so it cannot belong to it
                  // (its own session closed before this one began — state
                  // holds one live session per user). Emit it immediately
                  // as a single-event session with sentinel id 0 rather
                  // than gluing it on (which would retreat the session
                  // bounds across a gap and corrupt the timeout horizon).
                  // KNOWN divergence from the batch twin: several
                  // out-of-band events that would batch-merge into one
                  // historical session each emit their own sentinel row
                  // (merging them would need a second open session per
                  // user in state); downstream consumers should treat
                  // session_id 0 rows as mergeable late fragments.
                  out += SessionOut(userId, 0L, 1L, e.ts, e.ts, vm)
                case s =>
                  // A cross-batch late (but within-watermark) event joins
                  // the session without moving its bounds backwards: last
                  // only advances, start only retreats — otherwise the
                  // timeout horizon (last + gap) would regress and flush
                  // the session early.
                  st = s.copy(
                    start = if (e.ts.getTime < s.start.getTime) e.ts else s.start,
                    last = if (e.ts.getTime > s.last.getTime) e.ts else s.last,
                    nEvents = s.nEvents + 1,
                    valueMilli = s.valueMilli + vm)
              }
            }
            if (st != null) {
              state.update(st)
              // Fire once the watermark passes the gap horizon; the max()
              // keeps the timestamp legal if the watermark already moved.
              state.setTimeoutTimestamp(
                math.max(st.last.getTime + gapMs, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
          }
          out.iterator
      }
  }
}
