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

  /** Attach a payload + typed metadata to each document. The payload is
    * the UTF-8 text bytes standing in for the media body, PREFIXED with
    * the genuine container magic for the row's media type (PNG / RIFF-
    * WAVE / MP4 ftyp) so [[sniffFormat]] has real headers to recognize;
    * the metadata derivation is deterministic from doc_id. A NULL text
    * yields a NULL payload (concat propagates), modeling a fetch-failed
    * blob. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    // Explicit byte escapes, not a raw string literal: the four NUL
    // placeholder bytes (RIFF chunk size) inside a literal make grep and
    // linters treat the whole SOURCE FILE as binary.
    val wavMagic = Array[Byte]('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E')
    val mp4Magic = Array[Byte](0, 0, 0, 0x20) ++ "ftypisom".getBytes("ISO-8859-1")
    // pmod, not %: Spark's % keeps the dividend's sign, so a negative
    // doc_id would feed element_at index 0 (ANSI throw) or a negative
    // index (silent wrap from the array end).
    docs.select(
      col("doc_id"),
      concat(
        element_at(array(lit(pngMagic), lit(wavMagic), lit(mp4Magic)),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
        encode(col("text"), "UTF-8")).as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      (pmod(col("doc_id"), lit(16)) + 1).cast("int").as("n_frames"))
  }

  /** Container-format sniffing from MAGIC BYTES — real multimodal
    * functionality needing no codec library: a 100 TB media crawl's first
    * pass is always "what IS this blob", and mislabeled payloads (a .png
    * that's actually HTML) are filtered here before any decoder runs.
    * Pure codegen'd byte-slice compares (Substring works on BinaryType),
    * so the sniff rides the scan — no UDF, no shuffle.
    *
    * Recognizes the common crawl payloads: PNG, JPEG, GIF, WAV/AVI
    * (RIFF-contained, refined by bytes 9-12), MP4 (ftyp at offset 5),
    * MP3 (ID3 tag or bare MPEG frame sync), PDF; everything else —
    * including NULL payloads — is "unknown". */
  def sniffFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def bytesAt(pos: Int, s: String) =
      substring(media, pos, s.length) === lit(s.getBytes("ISO-8859-1"))
    def magic(pos: Int, hexPrefix: String) =
      hex(substring(media, pos, hexPrefix.length / 2)) === lit(hexPrefix)
    when(media.isNull, lit("unknown"))
      .when(magic(1, "89504E47"), lit("png"))
      .when(magic(1, "FFD8FF"), lit("jpeg"))
      .when(bytesAt(1, "GIF8"), lit("gif"))
      .when(bytesAt(1, "RIFF") && bytesAt(9, "WAVE"), lit("wav"))
      .when(bytesAt(1, "RIFF") && bytesAt(9, "AVI "), lit("avi"))
      .when(bytesAt(5, "ftyp"), lit("mp4"))
      .when(bytesAt(1, "ID3") || magic(1, "FFFB") || magic(1, "FFF3"), lit("mp3"))
      .when(bytesAt(1, "%PDF"), lit("pdf"))
      .otherwise(lit("unknown"))
  }

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

  /** Resize planning: target dimensions at aspect-ratio-preserving
    * `maxSide`, never upscaling — the arithmetic half of an image-resize
    * stage, fully declarative (the pixel resample itself would live in
    * the [[decodeStub]] slot). round() on the scaled short side matches
    * the common resize-library contract; both dims stay ≥ 1 so a 1×N
    * strip doesn't collapse to zero height. */
  def resizePlan(media: DataFrame, maxSide: Int = 256): DataFrame = {
    require(maxSide > 0, "maxSide must be positive")
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    // Degenerate dims (0×0 or negative — corrupt/empty container
    // metadata is normal at scale, see sampleFrames) must not reach the
    // division: ANSI mode turns maxSide/0 into a job-killing
    // DIVIDE_BY_ZERO, and a negative max would fabricate an upscale.
    // Such rows get a null plan and resized=false — triage, don't crash.
    val planable = greatest(w, h) > 0.0
    val scale = when(planable,
      least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h)))
    // when() at the OUTPUT too: greatest(1, NULL) would otherwise
    // resurrect a degenerate row's plan as 1×1.
    media.withColumn("out_width",
        when(planable, greatest(lit(1), round(w * scale).cast("int"))))
      .withColumn("out_height",
        when(planable, greatest(lit(1), round(h * scale).cast("int"))))
      .withColumn("resized", coalesce(scale < 1.0, lit(false)))
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
