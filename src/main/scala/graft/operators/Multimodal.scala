package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §7E): image/audio/video travel
  * as opaque `binary` columns plus typed metadata; decode / feature
  * extraction runs per-partition in batches.
  *
  * The decode kernel is a clearly-marked DETERMINISTIC STUB (this
  * container has no image/audio codecs); everything around it — schema,
  * batch shape, partition parallelism, null passthrough — is the real
  * production plumbing. Swap `stubDecode` for a JNI/codec call and the
  * operator is unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap any table into the media schema: payload synthesized from a
    * text column's bytes (stands in for real image/audio bytes). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String,
      mediaType: String = "image/png"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      map(lit("n_bytes"), length(col(textCol)).cast("string")).as("meta"))

  /** DETERMINISTIC STUB decoder: a real codec would decode pixels /
    * samples; this produces a 16-bin byte histogram as the "feature".
    * Deterministic in the payload bytes only. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) >>> 4) += 1f
        i += 1
      }
    }
    hist
  }

  /** Feature extraction over media batches: mapPartitions so a real
    * decoder could amortize codec init per partition (the Scala analogue
    * of mapInPandas batch shape). Output keeps the id + a fixed-width
    * feature vector — joinable back to metadata. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-partition init site for a real codec
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), stubDecode(payload).toSeq,
          if (payload == null) 0 else payload.length)
      }
    }(enc)
  }
}
