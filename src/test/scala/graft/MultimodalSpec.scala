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

  test("stubDecode is deterministic in payload bytes") {
    val a = Multimodal.stubDecode("same bytes".getBytes)
    val b = Multimodal.stubDecode("same bytes".getBytes)
    assert(a.sameElements(b))
    assert(Multimodal.stubDecode(null).sum == 0f)
  }
}
