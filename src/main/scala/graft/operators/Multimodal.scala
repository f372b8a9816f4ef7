package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 #31): opaque `binary` payloads
  * with typed metadata, batched decode / feature-extraction / frame
  * sampling.
  *
  * The Spark-side mechanics are real — schema, partition-preserving
  * mapPartitions over typed rows (the Scala analogue of mapInPandas batch
  * processing), explode-based frame sampling. The *codec* itself is a
  * deterministic STUB (this container has no image/audio libraries): it
  * fingerprints bytes instead of decoding pixels, and is clearly marked —
  * swap `decodeStub` for a real decoder binding to productionize.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String,
                            width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                                 n_frames: Int, checksum: Long,
                                 features: Array[Float])

  /** Attach a payload + typed metadata to each document. The payload here
    * is the UTF-8 text bytes standing in for an image/audio blob; the
    * metadata derivation is deterministic from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      (col("doc_id") % 16 + 1).cast("int").as("n_frames"))

  /** STUB decoder ??? → deterministic fake: real deployments replace this
    * with e.g. a JNI image decode. Produces an 8-dim byte-histogram-ish
    * feature vector + checksum from the raw payload. */
  def decodeStub(bytes: Array[Byte]): (Long, Array[Float]) = {
    // Null payload (a null source text encodes to NULL media) decodes
    // like an empty one — the lenient-at-scale contract; an NPE here
    // would fail the whole extractFeatures job on one bad row.
    val b = if (bytes == null) Array.emptyByteArray else bytes
    var checksum = 1125899906842597L
    val hist = new Array[Float](8)
    var i = 0
    while (i < b.length) {
      checksum = 31 * checksum + b(i)
      hist((b(i) & 0xFF) % 8) += 1.0f
      i += 1
    }
    val n = math.max(b.length, 1).toFloat
    (checksum, hist.map(_ / n))
  }

  /** Batched feature extraction: partition-preserving, no shuffle — each
    * task decodes its partition's payloads row-by-row (the batch shape a
    * vectorized decoder would consume). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, feats) = decodeStub(r.media)
        val nBytes = if (r.media == null) 0 else r.media.length
        MediaFeatures(r.doc_id, r.media_type, nBytes, r.n_frames,
          checksum, feats)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index per video row —
    * explode(sequence(...)), stays fully declarative/codegen'd.
    * Frame-less rows (n_frames ≤ 0 — corrupt/empty containers are normal
    * metadata at scale) yield zero frames instead of failing the job on
    * an illegal descending sequence (the chunk() guard pattern). */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, "stride must be positive")
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(
          when(col("n_frames") > 0,
            sequence(lit(0), col("n_frames") - 1, lit(stride)))
            .otherwise(array().cast("array<int>"))).as("frame_idx"))
  }
}
