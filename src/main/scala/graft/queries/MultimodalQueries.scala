package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Query #31 of SURVEY.md §2: multimodal binary-column plumbing. Rows-only
  * (binary payloads + stubbed decode aren't oracle-expressible); the
  * deterministic checksum/shape invariants are pinned in MultimodalSpec. */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaTable(Tables.load(s, dir, "documents"))
      val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRow]).toDF()
      val frames = Multimodal.sampleFrames(media, stride = 2)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sampled_frames"))
      // Magic-byte sniff of the actual payload — rides the media scan
      // (codegen'd byte-slice compares, no UDF).
      val sniff = media.select(col("doc_id"),
        Multimodal.sniffFormat(col("media")).as("format_sniffed"))
      feats.join(frames, Seq("doc_id"), "left_outer")
        .join(sniff, Seq("doc_id"))
        .select(col("doc_id"), col("media_type"), col("format_sniffed"),
          col("n_bytes"), col("n_frames"), col("checksum"),
          element_at(col("features"), 1).as("feat_0"),
          coalesce(col("n_sampled_frames"), lit(0L)).as("n_sampled_frames"))
        .orderBy(col("doc_id"))
    })
  )
}
