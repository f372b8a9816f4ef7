package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, GraftBridge}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 #31): opaque `binary` payloads
  * whose typed metadata is PARSED FROM THE BYTES — container-format
  * sniffing from magic numbers, image dimensions from PNG IHDR / GIF
  * logical-screen / JPEG SOF scan headers, video frame counts from the
  * MP4 stsz sample table, audio sample rates from the WAV fmt chunk —
  * all as codegen'd byte-slice arithmetic riding the scan (no UDF, no
  * shuffle, no codec). That is the honest first pass of a 100 TB media
  * crawl: every byte read here is real container structure, and only the
  * pixel/sample DECODE itself (which needs a codec library this
  * container doesn't have) is a deterministic, clearly-marked stub
  * ([[decodeStub]]).
  *
  * The fixture generator ([[mediaTable]]) emits REAL encoded headers —
  * a PNG IHDR chunk, a GIF89a logical screen descriptor, a baseline
  * JPEG with an APP0/JFIF segment BEFORE its SOF0 (so the SOF scan is
  * exercised, not a fixed offset), a structurally complete WAV
  * (RIFF/fmt/data with true chunk sizes), and an MP4 ftyp/stsz/mdat box
  * sequence — so the parsers are verified against genuine byte layouts
  * end-to-end (engine vs a DuckDB blob-arithmetic oracle in
  * q_multimodal_meta).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                                 checksum: Long, features: Array[Float])

  // ---- byte arithmetic (construction) --------------------------------
  // Big-endian: hex() of the masked value, zero-padded to the byte
  // width, through unhex. Little-endian: per-byte shifts. Both stay
  // whole-stage-codegen expressions.
  private def beBytes(c: Column, n: Int): Column =
    unhex(lpad(hex(c.cast("long").bitwiseAND(lit((1L << (8 * n)) - 1))),
      n * 2, "0"))
  private def leBytes(c: Column, n: Int): Column =
    concat((0 until n).map(i =>
      unhex(lpad(hex(shiftright(c.cast("long"), 8 * i).bitwiseAND(lit(255L))),
        2, "0"))): _*)

  // ---- byte arithmetic (parsing) --------------------------------------
  // Substring over BinaryType with a COLUMN position (the Scala
  // functions API only exposes literal positions) — the Catalyst
  // Substring expression itself supports binary + codegen.
  private def subB(bin: Column, pos: Column, len: Int): Column =
    GraftBridge.column(org.apache.spark.sql.catalyst.expressions.Substring(
      GraftBridge.expression(bin), GraftBridge.expression(pos),
      GraftBridge.expression(lit(len))))
  /** Big-endian unsigned int of `len` bytes at 1-based `pos`. */
  private def beLong(bin: Column, pos: Column, len: Int): Column =
    conv(hex(subB(bin, pos, len)), 16, 10).cast("long")
  /** Little-endian unsigned int of `len` bytes at 1-based `pos`. */
  private def leLong(bin: Column, pos: Column, len: Int): Column =
    (0 until len).map(i =>
      beLong(bin, pos + lit(i), 1) * lit(1L << (8 * i))).reduce(_ + _)

  /** Container-format sniffing from MAGIC BYTES — a 100 TB media
    * crawl's first pass is always "what IS this blob", and mislabeled
    * payloads (a .png that's actually HTML) are filtered here before
    * any decoder runs. Pure codegen'd byte-slice compares.
    *
    * Recognizes the common crawl payloads: PNG, JPEG, GIF, WAV/AVI
    * (RIFF-contained, refined by bytes 9-12), MP4 (ftyp at offset 5),
    * MP3 (ID3 tag or bare MPEG frame sync), PDF; everything else —
    * including NULL payloads — is "unknown". */
  def sniffFormat(media: Column): Column = {
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

  /** Image dimensions parsed from the container header, as a
    * struct(width int, height int); NULL for non-image (or truncated)
    * payloads. Pure byte arithmetic, no codec:
    *
    *   - PNG: the IHDR chunk is REQUIRED to be first, so width/height
    *     are the big-endian u32 pairs at fixed bytes 17-24 (after the
    *     8-byte signature + 4-byte length + "IHDR").
    *   - GIF (87a and 89a): logical-screen width/height, little-endian
    *     u16 at bytes 7-10.
    *   - JPEG: dimensions live in the frame header, whose position
    *     varies with the preceding APPn/COM segments — so SCAN for the
    *     first SOF0 (baseline, FFC0) or SOF2 (progressive, FFC2)
    *     marker and read height/width at offsets +5/+7 from it. The
    *     scan runs over the ISO-8859-1 decode of the bytes (a 1:1
    *     byte↔char map, so locate() positions ARE byte positions).
    *     First-marker scanning is the standard quick parse: 0xFF
    *     cannot occur in segment length fields' plausible range
    *     before the SOF in a well-formed JPEG, and entropy-coded data
    *     (where FF is escaped) only begins after it. */
  def imageDims(media: Column): Column =
    imageDimsFrom(media, sniffFormat(media), headerWindow(media))

  /** The marker-scan window: container structure (IHDR, logical
    * screen, SOF/stsz/fmt boxes) lives at the FRONT of a well-formed
    * file, so the scans decode only the first `headerScanBytes` bytes
    * instead of the whole payload \u2014 the same bound every quick-parser
    * effectively applies. Documented misses under the bound: a JPEG
    * whose APPn/EXIF preamble exceeds 64 KB before its SOF, and a
    * non-faststart MP4 whose moov/stsz trails the mdat \u2014 both yield
    * NULL metadata (triage rows), never garbage. */
  val headerScanBytes: Int = 65536
  private def headerWindow(media: Column): Column =
    decode(substring(media, 1, headerScanBytes), "ISO-8859-1")

  private def imageDimsFrom(media: Column, fmt: Column, hdr: Column): Column = {
    val p0 = locate("\u00FF\u00C0", hdr)
    val p2 = locate("\u00FF\u00C2", hdr)
    val sof = when(p0 > 0 && (p2 === 0 || p0 <= p2), p0)
      .when(p2 > 0, p2) // else NULL: no frame header found
    val (w, h) = (
      when(fmt === "png", beLong(media, lit(17), 4))
        .when(fmt === "gif", leLong(media, lit(7), 2))
        .when(fmt === "jpeg", beLong(media, sof + 7, 2)),
      when(fmt === "png", beLong(media, lit(21), 4))
        .when(fmt === "gif", leLong(media, lit(9), 2))
        .when(fmt === "jpeg", beLong(media, sof + 5, 2)))
    when(w.isNotNull && h.isNotNull,
      struct(w.cast("int").as("width"), h.cast("int").as("height")))
  }

  /** Video frame count parsed from the MP4 sample-size box: scan for
    * the `stsz` box type and read its big-endian u32 sample_count at
    * +12 (past version/flags and the fixed-sample-size field) — the
    * per-track frame count a real mp4 carries. NULL for non-mp4 or
    * stsz-less payloads. */
  def videoFrameCount(media: Column): Column =
    videoFrameCountFrom(media, sniffFormat(media), headerWindow(media))

  private def videoFrameCountFrom(media: Column, fmt: Column,
                                  hdr: Column): Column = {
    val p = locate("stsz", hdr)
    when(fmt === "mp4" && p > 0, beLong(media, p + 12, 4).cast("int"))
  }

  /** Audio sample rate parsed from the WAV `fmt ` chunk: little-endian
    * u32 at +12 from the chunk tag (past the chunk size, audio format,
    * and channel count). NULL for non-wav payloads. */
  def audioSampleRate(media: Column): Column =
    audioSampleRateFrom(media, sniffFormat(media), headerWindow(media))

  private def audioSampleRateFrom(media: Column, fmt: Column,
                                  hdr: Column): Column = {
    val p = locate("fmt ", hdr)
    when(fmt === "wav" && p > 0, leLong(media, p + 12, 4).cast("int"))
  }

  /** Attach a payload + byte-parsed metadata to each document. The
    * payload is the UTF-8 text bytes standing in for the media body,
    * prefixed with a REAL container header for the row's media type —
    * PNG IHDR / GIF89a logical screen / baseline JFIF JPEG (rotating
    * per image row) with the row's genuine dimensions encoded in the
    * header bytes; a structurally complete WAV (RIFF size, fmt chunk
    * with the true sample rate, data chunk sized to the payload); an
    * MP4 ftyp + stsz (true sample count) + mdat box sequence. The
    * metadata columns (`format`, `width`, `height`, `n_frames`,
    * `sample_rate`) are NOT copied from the generator's arithmetic —
    * they are parsed back out of the constructed bytes by
    * [[imageDims]] / [[videoFrameCount]] / [[audioSampleRate]], so
    * every downstream planner ([[resizePlan]], [[sampleFrames]]) runs
    * on byte-derived values, exactly as it would on a real crawl. A
    * NULL text yields a NULL payload (concat propagates), modeling a
    * fetch-failed blob; its metadata is NULL and its format "unknown".
    *
    * The one disclosed fiction: PNG chunk CRCs are zeroed (computing
    * CRC-32 in an expression buys nothing — dimension parsers don't
    * checksum), and payload bytes are text, not pixels — the DECODE
    * stub's slot. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    // pmod, not %: Spark's % keeps the dividend's sign, so a negative
    // doc_id would feed element_at index 0 (ANSI throw) or a negative
    // index (silent wrap from the array end).
    val sel = pmod(id, lit(3)) // 0 image, 1 audio, 2 video
    val isel = pmod(id, lit(9)) // image rows rotate 0 png / 3 gif / 6 jpeg
    val w = (pmod(id, lit(640)) + 32).cast("int")
    val h = (pmod(id, lit(480)) + 32).cast("int")
    val nf = (pmod(id, lit(16)) + 1).cast("int")
    val rate = ((pmod(id, lit(5)) + 1) * 8000).cast("int")
    val payload = encode(col("text"), "UTF-8")
    val payLen = length(payload)

    def iso(s: String) = lit(s.getBytes("ISO-8859-1"))
    // Explicit byte arrays for header constants carrying NUL bytes: a
    // raw \0 inside a source string literal makes grep and linters
    // treat the whole FILE as binary.
    val pngSigIhdr = lit(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A, 0, 0, 0, 13, 'I', 'H', 'D', 'R'))
    val pngTail = lit(Array[Byte](8, 6, 0, 0, 0, /*CRC (zeroed)*/ 0, 0, 0, 0))
    val png = concat(pngSigIhdr, beBytes(w, 4), beBytes(h, 4), pngTail)

    val gif = concat(iso("GIF89a"), leBytes(w, 2), leBytes(h, 2),
      lit(Array[Byte](0, 0, 0)))

    // SOI + APP0/JFIF (so the SOF scan crosses a real leading segment),
    // then SOF0 with height/width big-endian and three components.
    val jfif = lit(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0, 16, 'J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xFF.toByte, 0xC0.toByte, 0, 17, 8))
    val jpegComps = lit(Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val jpeg = concat(jfif, beBytes(h, 2), beBytes(w, 2), jpegComps)

    // RIFF size = 4 ("WAVE") + 24 (fmt chunk) + 8 (data header) + data.
    val wav = concat(iso("RIFF"), leBytes(payLen + 36, 4), iso("WAVEfmt "),
      leBytes(lit(16), 4), leBytes(lit(1), 2), leBytes(lit(1), 2),
      leBytes(rate, 4), leBytes(rate * 2, 4), leBytes(lit(2), 2),
      leBytes(lit(16), 2), iso("data"), leBytes(payLen, 4))

    // ftyp (16) + stsz (20, sample_count = the frame count) + mdat.
    val mp4 = concat(beBytes(lit(16), 4), iso("ftypisom"), beBytes(lit(0), 4),
      beBytes(lit(20), 4), iso("stsz"), beBytes(lit(0), 4), beBytes(lit(0), 4),
      beBytes(nf, 4), beBytes(payLen + 8, 4), iso("mdat"))

    val header = when(sel === 0,
        when(isel === 0, png).when(isel === 3, gif).otherwise(jpeg))
      .when(sel === 1, wav)
      .otherwise(mp4)
    val media = concat(header, payload)
    // ONE collapsed projection: the four parsers repeat the sniff and
    // header-window subtrees textually, and whole-stage codegen's
    // subexpression elimination evaluates each shared subtree once per
    // row — measured faster than factoring them through a second
    // Project (whose multi-referenced non-cheap aliases block
    // CollapseProject and buy an extra full-row materialization of the
    // blob + header string instead).
    docs.select(id,
        media.as("media"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (sel + 1).cast("int")).as("media_type"))
      .withColumn("format", sniffFormat(col("media")))
      .withColumn("__dims", imageDims(col("media")))
      .withColumn("width", col("__dims.width"))
      .withColumn("height", col("__dims.height"))
      .withColumn("n_frames", videoFrameCount(col("media")))
      .withColumn("sample_rate", audioSampleRate(col("media")))
      .drop("__dims")
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
        MediaFeatures(r.doc_id, r.media_type, nBytes, checksum, feats)
      }
    }
  }

  /** Resize planning: target dimensions at aspect-ratio-preserving
    * `maxSide`, never upscaling — the arithmetic half of an image-resize
    * stage, fully declarative (the pixel resample itself would live in
    * the [[decodeStub]] slot), consuming the BYTE-PARSED `width`/
    * `height` columns. round() on the scaled short side matches the
    * common resize-library contract; both dims stay ≥ 1 so a 1×N strip
    * doesn't collapse to zero height. */
  def resizePlan(media: DataFrame, maxSide: Int = 256): DataFrame = {
    require(maxSide > 0, "maxSide must be positive")
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    // Degenerate dims (NULL for non-image rows, 0×0 or negative from
    // corrupt/empty container metadata — normal at scale, see
    // sampleFrames) must not reach the division: ANSI mode turns
    // maxSide/0 into a job-killing DIVIDE_BY_ZERO, and a negative max
    // would fabricate an upscale. Such rows get a null plan and
    // resized=false — triage, don't crash.
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
    * explode(sequence(...)), stays fully declarative/codegen'd —
    * consuming the BYTE-PARSED `n_frames` column (the stsz sample
    * count). Frame-less rows (n_frames NULL or ≤ 0 — corrupt/empty
    * containers are normal metadata at scale) yield zero frames instead
    * of failing the job on an illegal descending sequence (the chunk()
    * guard pattern). */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride > 0, "stride must be positive")
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(
          when(col("n_frames") > 0,
            sequence(lit(0), col("n_frames") - 1, lit(stride)))
            .otherwise(array().cast("array<int>"))).as("frame_idx"))
  }

  /** Per-row count of the frames [[sampleFrames]] would emit — the
    * closed form ⌈n_frames / stride⌉ for frame-ful video rows, 0
    * otherwise (non-video, NULL or ≤ 0 frame counts), proven equal to
    * `sampleFrames(...).groupBy(doc_id).count()` in MultimodalSpec.
    * Exists so a per-doc census can ride the SAME projection as the
    * other metadata columns instead of exploding every frame index
    * into a corpus-scale aggregate and joining back — the explode →
    * groupBy → self-join shape evaluated the whole byte-parse tree
    * TWICE and paid two exchanges for a number each row already
    * determines locally (guide §2.4: remove shuffles outright). */
  def sampledFrameCount(stride: Int = 2): Column = {
    require(stride > 0, "stride must be positive")
    // Spark's `/` is double division; the cast truncates — exact floor
    // for the non-negative int range n_frames lives in.
    when(col("media_type") === "video" && col("n_frames") > 0,
        ((col("n_frames") - 1) / lit(stride)).cast("long") + 1)
      .otherwise(lit(0L))
  }
}
