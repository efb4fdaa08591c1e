package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

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
}
