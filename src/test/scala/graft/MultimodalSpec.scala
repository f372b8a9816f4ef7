package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media =
    Multimodal.mediaTable(Tables.load(spark, TestSpark.Sf0001, "documents")).cache()

  test("chunk yields no chunks for empty text, one for short text") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, ""), (2L, "short"), (3L, "x" * 1000)).toDF("id", "t")
      .select($"id", TextAnalysis.chunk($"t", 500, 50).as("c"))
      .orderBy($"id").collect()
    assert(df(0).getSeq[String](1).isEmpty)
    assert(df(1).getSeq[String](1) == Seq("short"))
    assert(df(2).getSeq[String](1).length == 3) // starts 0, 450, 900
  }

  test("media table: metadata is PARSED from the constructed header bytes and matches the generator arithmetic") {
    val rows = media.filter($"media".isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val fmt = r.getAs[String]("format")
      r.getAs[String]("media_type") match {
        case "image" =>
          assert(Seq("png", "gif", "jpeg").contains(fmt), s"doc $id: $fmt")
          // the parse round-trips the dimensions the header encodes
          assert(r.getAs[Int]("width") == (id % 640 + 32).toInt, s"doc $id")
          assert(r.getAs[Int]("height") == (id % 480 + 32).toInt, s"doc $id")
          assert(r.isNullAt(r.fieldIndex("n_frames")))
          assert(r.isNullAt(r.fieldIndex("sample_rate")))
        case "audio" =>
          assert(fmt == "wav")
          assert(r.getAs[Int]("sample_rate") == ((id % 5 + 1) * 8000).toInt)
          assert(r.isNullAt(r.fieldIndex("width")))
        case "video" =>
          assert(fmt == "mp4")
          assert(r.getAs[Int]("n_frames") == (id % 16 + 1).toInt)
          assert(r.isNullAt(r.fieldIndex("width")))
      }
    }
    // the image subformats all actually occur (png/gif/jpeg rotation)
    val fmts = rows.filter(_.getAs[String]("media_type") == "image")
      .map(_.getAs[String]("format")).toSet
    assert(fmts == Set("png", "gif", "jpeg"))
  }

  test("header parsers handle handcrafted real layouts: GIF87a, progressive JPEG, shifted SOF, truncated/alien payloads") {
    def b(s: String) = s.getBytes("ISO-8859-1")
    // GIF87a (sniff covers GIF8*), 303×77 little-endian
    val gif87 = b("GIF87a") ++ Array[Byte](0x2F, 0x01, 77, 0) ++ b("tail")
    // progressive JPEG: SOI + COM segment (so the scan must skip
    // non-APP0 leading bytes too) + SOF2 at a shifted offset, 77×515
    val jpegP = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xFE.toByte, 0, 6, 'h', 'i', '!', '?',
      0xFF.toByte, 0xC2.toByte, 0, 17, 8, 0, 77, 2, 3) ++ b("rest")
    // PNG truncated INSIDE the IHDR dims: parse must yield null, not garbage
    val pngTrunc = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0)
    // JPEG with NO SOF marker at all (corrupt): null dims
    val jpegNoSof = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte,
      0, 4, 1, 2) ++ b("no frame header here")
    // HTML masquerading as media: unknown, all metadata null
    val alien = b("<html>not media</html>")
    val df = Seq((1L, gif87), (2L, jpegP), (3L, pngTrunc), (4L, jpegNoSof),
        (5L, alien))
      .toDF("id", "media")
      .select($"id", Multimodal.sniffFormat($"media").as("f"),
        Multimodal.imageDims($"media").as("d"))
      .orderBy($"id").collect()
    assert(df(0).getString(1) == "gif")
    assert(df(0).getStruct(2).getInt(0) == 303 && df(0).getStruct(2).getInt(1) == 77)
    assert(df(1).getString(1) == "jpeg")
    assert(df(1).getStruct(2).getInt(0) == 515 && df(1).getStruct(2).getInt(1) == 77)
    assert(df(2).getString(1) == "png" && df(2).isNullAt(2))
    assert(df(3).getString(1) == "jpeg" && df(3).isNullAt(2))
    assert(df(4).getString(1) == "unknown" && df(4).isNullAt(2))
  }

  test("decode stub treats a null payload as empty (lenient-at-scale)") {
    val (c0, f0) = Multimodal.decodeStub(null)
    val (c1, f1) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(c0 == c1 && f0.toSeq == f1.toSeq)
    val m = Seq((1L, null.asInstanceOf[Array[Byte]], "image"))
      .toDF("doc_id", "media", "media_type")
    val out = Multimodal.extractFeatures(m.as[Multimodal.MediaRow]).collect()
    assert(out.length == 1 && out.head.n_bytes == 0)
  }

  test("decode stub is deterministic and feature shape is fixed") {
    val (c1, f1) = Multimodal.decodeStub("hello".getBytes)
    val (c2, f2) = Multimodal.decodeStub("hello".getBytes)
    assert(c1 == c2 && f1.toSeq == f2.toSeq && f1.length == 8)
    assert(math.abs(f1.sum - 1.0f) < 1e-5) // normalized histogram
  }

  test("sniffFormat recognizes real magic bytes, byte-slice only") {
    def b(s: String) = s.getBytes("ISO-8859-1")
    val payloads: Seq[(Long, Array[Byte], String)] = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 9), "png"),
      (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte), "jpeg"),
      (3L, b("GIF89a trailing"), "gif"),
      (4L, b("RIFF1234WAVEfmt "), "wav"),
      (5L, b("RIFF1234AVI LIST"), "avi"),
      (6L, Array[Byte](0, 0, 0, 0x20) ++ b("ftypisom"), "mp4"),
      (7L, b("ID3rest"), "mp3"),
      (8L, Array[Byte](0xFF.toByte, 0xFB.toByte, 0x40), "mp3"),
      (9L, b("%PDF-1.7"), "pdf"),
      (10L, b("<html>not media"), "unknown"),
      (11L, null, "unknown"),
      (12L, Array[Byte]('R', 'I'), "unknown") // shorter than any magic
    )
    val got = payloads.map { case (id, bytes, _) => (id, bytes) }
      .toDF("id", "media")
      .select($"id", Multimodal.sniffFormat($"media").as("f"))
      .orderBy($"id").collect().map(_.getString(1)).toSeq
    assert(got == payloads.map(_._3))
  }

  test("mediaTable payloads sniff to the format their media_type claims") {
    val got = media.select($"media_type",
      Multimodal.sniffFormat($"media").as("f")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // NULL-text docs (if any) sniff unknown; every real payload must
    // match its claimed container (images rotate the three formats).
    val real = got.filter(_._2 != "unknown")
    assert(real == Set(("image", "png"), ("image", "gif"), ("image", "jpeg"),
      ("audio", "wav"), ("video", "mp4")))
  }

  test("resizePlan preserves aspect ratio, never upscales, never hits zero") {
    val m = Seq(
      (1L, 640, 480),   // downscale: 256x192
      (2L, 480, 640),   // portrait: 192x256
      (3L, 100, 50),    // already small: untouched
      (4L, 2560, 1),    // extreme strip: height clamps to 1
      (5L, 256, 256)    // exactly maxSide: untouched
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.resizePlan(m, maxSide = 256)
      .select($"doc_id", $"out_width", $"out_height", $"resized")
      .orderBy($"doc_id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      (256, 192, true), (192, 256, true), (100, 50, false),
      (256, 1, true), (256, 256, false)))
    intercept[IllegalArgumentException](Multimodal.resizePlan(m, 0))
    // Degenerate dims (0×0 / negative — corrupt container metadata) get
    // a NULL plan instead of an ANSI DIVIDE_BY_ZERO killing the job.
    val bad = Seq((9L, 0, 0), (10L, -4, -3), (11L, 640, 480))
      .toDF("doc_id", "width", "height")
    val planned = Multimodal.resizePlan(bad, maxSide = 256)
      .orderBy($"doc_id").collect()
    assert(planned(0).isNullAt(planned(0).fieldIndex("out_width")))
    assert(!planned(0).getAs[Boolean]("resized"))
    assert(planned(1).isNullAt(planned(1).fieldIndex("out_height")))
    assert(planned(2).getAs[Int]("out_width") == 256) // healthy row intact
  }

  test("extractFeatures preserves rows without shuffling") {
    val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRow])
    assert(feats.count() == media.count())
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions)
  }

  test("frame sampling emits ceil(n/stride) frames per video") {
    val out = Multimodal.sampleFrames(media, stride = 2)
      .groupBy($"doc_id", $"n_frames").agg(count(lit(1)).as("n"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n") == (r.getAs[Int]("n_frames") + 1) / 2))
  }

  test("sampledFrameCount equals sampleFrames' per-doc explode count (incl. corrupt/NULL/non-video rows)") {
    // The closed form q_multimodal_meta rides must equal the operator's
    // explode census on every edge: frame-ful videos, zero/NULL frame
    // counts, non-video rows (absent from sampleFrames == counted 0).
    val m = Seq((1L, "video", Some(0)), (2L, "video", Some(3)),
                (3L, "video", None), (4L, "image", Some(7)),
                (5L, "video", Some(1)), (6L, "video", Some(16)))
      .toDF("doc_id", "media_type", "n_frames")
    for (stride <- Seq(1, 2, 3, 5)) {
      val exploded = Multimodal.sampleFrames(m, stride)
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val closed = m.select($"doc_id",
          Multimodal.sampledFrameCount(stride).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      m.select($"doc_id").collect().map(_.getLong(0)).foreach { id =>
        assert(closed(id) == exploded.getOrElse(id, 0L),
          s"doc $id stride $stride: closed ${closed(id)} vs explode ${exploded.getOrElse(id, 0L)}")
      }
    }
    intercept[IllegalArgumentException](Multimodal.sampledFrameCount(0))
  }

  test("frame sampling: frame-less videos (zero or NULL count — corrupt/stsz-less containers) yield zero rows, not a sequence error") {
    val m = Seq((1L, Array[Byte](1), "video", Some(0)), // corrupt: no frames
                (2L, Array[Byte](2), "video", Some(3)),
                (3L, Array[Byte](3), "video", None))    // no stsz parsed
      .toDF("doc_id", "media", "media_type", "n_frames")
    val out = Multimodal.sampleFrames(m, stride = 2).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 2L))
    assert(out.length == 2) // frames 0, 2
    intercept[IllegalArgumentException](Multimodal.sampleFrames(m, stride = 0))
  }
}
