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

  test("media table carries binary payload + typed metadata") {
    val r = media.orderBy($"doc_id").limit(1).collect().head
    assert(r.getAs[Array[Byte]]("media").nonEmpty)
    assert(Seq("image", "audio", "video").contains(r.getAs[String]("media_type")))
    assert(r.getAs[Int]("n_frames") >= 1)
  }

  test("decode stub treats a null payload as empty (lenient-at-scale)") {
    val (c0, f0) = Multimodal.decodeStub(null)
    val (c1, f1) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(c0 == c1 && f0.toSeq == f1.toSeq)
    val m = Seq((1L, null.asInstanceOf[Array[Byte]], "image", 64, 64, 1))
      .toDF("doc_id", "media", "media_type", "width", "height", "n_frames")
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
    // match its claimed container.
    val real = got.filter(_._2 != "unknown")
    assert(real == Set(("image", "png"), ("audio", "wav"), ("video", "mp4")))
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

  test("frame sampling: frame-less videos yield zero rows, not a sequence error") {
    val m = Seq((1L, Array[Byte](1), "video", 64, 64, 0),   // corrupt: no frames
                (2L, Array[Byte](2), "video", 64, 64, 3))
      .toDF("doc_id", "media", "media_type", "width", "height", "n_frames")
    val out = Multimodal.sampleFrames(m, stride = 2).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 2L))
    assert(out.length == 2) // frames 0, 2
    intercept[IllegalArgumentException](Multimodal.sampleFrames(m, stride = 0))
  }
}
