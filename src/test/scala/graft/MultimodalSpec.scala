package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaCodec, Multimodal}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello"), (2L, ""), (3L, "worlds!"))
    .toDF("doc_id", "text")

  test("asMediaTable produces the media schema with byte payloads") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    // nullability is tighter than declared (all inputs non-null) — names
    // and types are the contract
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = media.filter($"media_id" === 1).head()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(r.getAs[Map[String, String]]("meta")("n_bytes") == "5")
  }

  test("extractFeatures: fixed-width features, histogram mass == bytes") {
    val feats = Multimodal.extractFeatures(
      Multimodal.asMediaTable(docs, "doc_id", "text")).collect()
    assert(feats.forall(_.getSeq[Float](1).length == 16))
    val byId = feats.map(r => r.getLong(0) ->
      (r.getSeq[Float](1).sum, r.getInt(2))).toMap
    assert(byId(1L) == ((5.0f, 5)))
    assert(byId(2L) == ((0.0f, 0)))
    assert(byId(3L) == ((7.0f, 7)))
  }

  test("sampleFrames emits every Nth fixed-size frame, skips null payloads") {
    val media = Seq(
      (1L, (0 until 40).map(_.toByte).toArray),        // 10 frames of 4
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, everyNth = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getAs[Array[Byte]](2).toSeq))
    assert(frames.map(f => (f._1, f._2)).toSet ==
      Set((1L, 0), (1L, 3), (1L, 6), (1L, 9)))
    assert(frames.find(f => f._2 == 3).get._3 == Seq[Byte](12, 13, 14, 15))
  }

  test("resizePayload reduces bytes by the factor, map-only plan") {
    val media = Seq((1L, (0 until 16).map(_.toByte).toArray))
      .toDF("media_id", "payload")
    val resized = Multimodal.resizePayload(media, factor = 4)
    assert(resized.head().getAs[Array[Byte]](1).toSeq ==
      Seq[Byte](0, 4, 8, 12))
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("stubDecode is deterministic in payload bytes") {
    val a = Multimodal.stubDecode("same bytes".getBytes)
    val b = Multimodal.stubDecode("same bytes".getBytes)
    assert(a.sameElements(b))
    assert(Multimodal.stubDecode(null).sum == 0f)
  }

  test("BMP roundtrip: encode 24bpp, decode exact dims + channel sums") {
    // 3x2 gradient: r = x, g = 10*y, b = 100 (known sums by hand)
    val bytes = MediaCodec.encodeBmp24(3, 2, (x, y) => (x, 10 * y, 100))
    val s = MediaCodec.decodeBmp24(bytes).get
    assert(s.width == 3 && s.height == 2)
    assert(s.sumR == 2 * (0 + 1 + 2), s"sumR=${s.sumR}")
    assert(s.sumG == 3 * (0 + 10), s"sumG=${s.sumG}")
    assert(s.sumB == 6 * 100, s"sumB=${s.sumB}")
    // odd width exercises the 4-byte row padding path
    val padded = MediaCodec.encodeBmp24(5, 1, (_, _) => (255, 0, 1))
    val p = MediaCodec.decodeBmp24(padded).get
    assert(p.sumR == 5 * 255 && p.sumG == 0 && p.sumB == 5)
  }

  test("WAV roundtrip: encode PCM-16, decode format + amplitude sums") {
    val samples = Array[Short](1000, -1000, 500, -500, 0, 32767)
    val bytes = MediaCodec.encodeWavPcm16(16000, 2, samples)
    val s = MediaCodec.decodeWavPcm16(bytes).get
    assert(s.sampleRate == 16000 && s.channels == 2 && s.nFrames == 3)
    assert(s.sumAbs == 1000 + 1000 + 500 + 500 + 0 + 32767)
    assert(s.maxAbs == 32767)
  }

  test("strict decoders reject text and truncated payloads") {
    // a text payload starting with the BMP magic must NOT decode
    assert(MediaCodec.decodeBmp24("BMW makes cars, not bitmaps".getBytes)
      .isEmpty)
    assert(MediaCodec.decodeWavPcm16("RIFFraff is not audio".getBytes)
      .isEmpty)
    assert(MediaCodec.decodeBmp24(null).isEmpty)
    assert(MediaCodec.decodeWavPcm16(null).isEmpty)
    // truncation below the declared pixel array must fail, not read OOB
    val ok = MediaCodec.encodeBmp24(4, 4, (_, _) => (1, 2, 3))
    assert(MediaCodec.decodeBmp24(ok.take(ok.length - 5)).isEmpty)
    val wav = MediaCodec.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3, 4))
    assert(MediaCodec.decodeWavPcm16(wav.take(wav.length - 3)).isEmpty)
  }

  test("extractFeatures routes real media to the codec, text to the stub") {
    val rows = Seq(
      (1L, MediaCodec.encodeBmp24(2, 2, (_, _) => (10, 20, 30))),
      (2L, MediaCodec.encodeWavPcm16(8000, 1, Array[Short](7, -7))),
      (3L, "just some text".getBytes))
      .toDF("media_id", "payload")
    val feats = Multimodal.extractFeatures(rows).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).head == MediaCodec.KindImage)
    assert(feats(1L) == Seq(1f, 2f, 2f, 40f, 80f, 120f))
    assert(feats(2L).head == MediaCodec.KindAudio)
    assert(feats(2L) == Seq(2f, 8000f, 1f, 2f, 14f, 7f))
    assert(feats(3L).length == 16) // stub histogram fallback
  }
}
