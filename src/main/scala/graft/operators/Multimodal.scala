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

  /** Frame sampling for video-like payloads: every `everyNth` frame of
    * the payload, one output ROW per sampled frame (flatMap shape — the
    * row-multiplying half of multimodal plumbing that a generator/
    * mapInPandas would do). STUB framing: payload treated as
    * concatenated fixed-`frameBytes` frames; a real demuxer replaces
    * `frameAt` only. */
  def sampleFrames(media: DataFrame, frameBytes: Int,
      everyNth: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").flatMap { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      if (payload == null) Iterator.empty
      else {
        val n = payload.length / frameBytes
        (0 until n by everyNth).iterator.map { i =>
          Row(r.getLong(0), i,
            java.util.Arrays.copyOfRange(payload,
              i * frameBytes, (i + 1) * frameBytes))
        }
      }
    }(enc)
  }

  /** Resize stub: keep every `factor`-th byte of a frame/payload (a
    * real implementation bilinear-resamples decoded pixels; the
    * operator shape — map-only, fixed reduction factor, binary in/out —
    * is identical). [[resizeImages]] is the REAL path for payloads the
    * codecs can decode. */
  def resizePayload(media: DataFrame, factor: Int,
      payloadCol: String = "payload"): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else bytes.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
    }
    media.withColumn(payloadCol, resize(col(payloadCol)))
  }

  /** REAL image downsample: decodable 24bpp BMP payloads are
    * nearest-neighbor resized by `factor`
    * ([[MediaCodec.bmpResizeNearest]] — actual pixels, not the byte
    * stub) and re-encoded; anything the codec cannot strictly decode
    * passes through UNCHANGED (a curation pipeline must not corrupt
    * payloads it cannot parse). Map-only at any corpus size. */
  def resizeImages(media: DataFrame, factor: Int,
      payloadCol: String = "payload"): DataFrame = {
    val resize = udf { bytes: Array[Byte] =>
      MediaCodec.bmpResizeNearest(bytes, factor).getOrElse(bytes)
    }
    media.withColumn(payloadCol, resize(col(payloadCol)))
  }

  /** Perceptual image fingerprints over media batches: one (media_id,
    * phash) row per input, phash NULL for payloads that are not
    * structurally valid images ([[MediaCodec.imageDHash64]]: BMP, PNG,
    * or JPEG, strict, so
    * text bytes can never produce a phash). Same mapPartitions batch
    * shape as [[extractFeatures]]. The hash is the standard dHash
    * near-dup fingerprint: byte-level COPIES and uniform
    * brightness-shifted copies collide exactly (integer-exact — see
    * the codec doc), unrelated images collide with ~2⁻⁶⁴ probability.
    *
    * 100 TB shape for the dedup built on it: the decode is map-only;
    * the dedup is one exchange of (8-byte hash, id) — the exact-dedup
    * cost class, nothing pairwise. */
  def perceptualHash(media: DataFrame): DataFrame =
    fingerprintTable(media, "phash", MediaCodec.imageDHash64)

  /** Audio fingerprints — [[perceptualHash]]'s twin over the WAV
    * envelope hash ([[MediaCodec.wavEnvelopeHash64]]): volume-scaled
    * copies collide (gain-invariance is integer-exact for exact
    * gains); null for anything that is not a PCM-16 WAV. */
  def audioHash(media: DataFrame): DataFrame =
    fingerprintTable(media, "ahash", MediaCodec.wavEnvelopeHash64)

  /** (media_id, <hashCol>) via a strict per-payload fingerprint, the
    * shared mapPartitions plumbing of [[perceptualHash]] /
    * [[audioHash]]. */
  private def fingerprintTable(media: DataFrame, hashCol: String,
      fingerprint: Array[Byte] => Option[Long]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField(hashCol, LongType, nullable = true)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0),
          fingerprint(payload).map(java.lang.Long.valueOf).orNull)
      }
    }(enc)
  }

  /** Audio signal features beyond the decode summary: per payload the
    * integer-exact zero-crossing count
    * ([[MediaCodec.wavZeroCrossings]]) and the DOMINANT TONE as an
    * argmax over a Goertzel probe bank ([[MediaCodec.wavGoertzelPower]]
    * at each candidate Hz — DTMF-style detection). The raw Goertzel
    * powers are doubles and never leave the executor; only the probe
    * INDEX (ties → lowest index) and the crossing count surface, so
    * results are engine-exact. NULL columns for payloads that are not
    * PCM-16 WAV. Map-only at any corpus size, same batch shape as
    * [[perceptualHash]]. */
  def audioToneFeatures(media: DataFrame,
      candidatesHz: Seq[Double]): DataFrame = {
    require(candidatesHz.nonEmpty, "audioToneFeatures needs probes")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("zcr", LongType, nullable = true),
      StructField("dominant", LongType, nullable = true)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val zcr = MediaCodec.wavZeroCrossings(payload)
        // one Goertzel BANK pass for all probes, not one scan per probe
        val dom = MediaCodec.wavGoertzelPowers(payload, candidatesHz)
          .map(p => p.indexOf(p.max).toLong)
        Row(r.getLong(0), zcr.map(java.lang.Long.valueOf).orNull,
          dom.map(java.lang.Long.valueOf).orNull)
      }
    }(enc)
  }

  /** Perceptual near-dup image dedup: keep the smallest media_id per
    * dHash class; rows whose payload is not a decodable image keep
    * themselves (null hash never groups). min_by-style single
    * exchange on the 8-byte hash — hot-hash-proof (a viral image
    * duplicated a billion times collapses map-side). */
  def imageDedup(media: DataFrame): DataFrame =
    dedupByHash(perceptualHash(media), "phash")

  /** [[imageDedup]]'s audio twin: volume-scaled WAV copies collapse
    * to the smallest media_id; non-audio rows keep themselves. */
  def audioDedup(media: DataFrame): DataFrame =
    dedupByHash(audioHash(media), "ahash")

  private def dedupByHash(hashed: DataFrame, hashCol: String): DataFrame = {
    val survivors = hashed.filter(col(hashCol).isNotNull)
      .groupBy(hashCol).agg(min(col("media_id")).as("media_id"))
      .select("media_id")
    hashed.filter(col(hashCol).isNull).select("media_id")
      .unionByName(survivors)
  }

  /** Image NEAR-dup pairs within a dHash Hamming radius — the real
    * near-dup case (recompressed, brightness-drifted, lightly edited
    * copies whose hashes differ in a few bits). Pigeonhole banding
    * over the 64-bit hash (`nBands = maxHamming + 1`; a pair within
    * the radius must share one clean band), popcount verify — the
    * shared [[Dedup.fingerprintHammingPairs]] core, so the SimHash
    * scale envelope travels with it: radius ≤ 4 keeps band keys ≥ 12
    * bits (beyond that the band key space is too small to prune at
    * corpus scale — cluster on a stronger descriptor instead).
    * Non-image payloads (null hash) never pair. Output: (id_a, id_b,
    * hamming), id_a < id_b.
    *
    * Mass-identical caveat (same as every bucket-pairing blocker):
    * ids sharing ONE hash are unsplittable bucket-mates, so a viral
    * image duplicated a billion times makes this id-level output
    * quadratic within the class. Collapse exact classes first
    * ([[imageDedup]]) or use [[imageNearDupClasses]], which pairs
    * DISTINCT hashes and stays linear in distinct content. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 4,
      s"dHash banding envelope is maxHamming in [0,4], got $maxHamming")
    Dedup.fingerprintHammingPairs(
      perceptualHash(media).filter(col("phash").isNotNull)
        .select(col("media_id").as("id"), col("phash").as("fp")),
      maxHamming, nBands = maxHamming + 1)
  }

  /** Near-dup CLASS pairs over DISTINCT hashes — the scale form of
    * [[imageNearDupPairs]]: a class of a billion identical copies is
    * ONE row in the banding join, and a near-pair between two big
    * classes is one (fp_a, fp_b) row instead of |A|×|B| id pairs.
    * Output: (fp_a, fp_b, hamming); join [[perceptualHash]] on either
    * side for members (or keep classes as the unit of curation — drop
    * whole classes, keep one representative per class). */
  def imageNearDupClasses(media: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 4,
      s"dHash banding envelope is maxHamming in [0,4], got $maxHamming")
    Dedup.fingerprintHammingPairs(
      perceptualHash(media).filter(col("phash").isNotNull)
        .select(col("phash").as("id")).distinct()
        .withColumn("fp", col("id")),
      maxHamming, nBands = maxHamming + 1)
      .select(col("id_a").as("fp_a"), col("id_b").as("fp_b"),
        col("hamming"))
  }

  /** Shot-boundary detection over a frame-packed video payload — the
    * video leg of the perceptual family: [[sampleFrames]] splits the
    * payload into fixed-width frames, each frame gets the perceptual
    * image hash, and a boundary is a consecutive-frame Hamming
    * distance of at least `minHamming` (scene content changed;
    * within-shot motion moves few dHash gradient bits, a cut moves
    * many). Output: (media_id, frame_idx, hamming) per boundary, where
    * frame_idx is the FIRST frame of the new shot.
    *
    * Scale shape: framing + hashing are map-only; the lag comparison
    * windows per media_id ordered by frame_idx — partition size is one
    * video's frame count, never the corpus. Undecodable frames (null
    * hash) are skipped, so one corrupt frame yields at most one
    * (real, content-changed) boundary, not a crash. */
  def shotBoundaries(media: DataFrame, frameBytes: Int,
      minHamming: Int = 8, everyNth: Int = 1): DataFrame =
    boundariesOf(sampleFrames(media, frameBytes, everyNth), minHamming)

  /** [[shotBoundaries]] over a REAL container: frames come from the
    * strict MJPEG/AVI demux ([[sampleAviFrames]]) instead of
    * fixed-width payload splitting; hashing and the lag comparison are
    * the identical path. */
  def shotBoundariesAvi(media: DataFrame, minHamming: Int = 8,
      everyNth: Int = 1): DataFrame =
    boundariesOf(sampleAviFrames(media, everyNth), minHamming)

  /** The shared boundary detector: per-frame perceptual hash, then a
    * lag comparison per media_id ordered by frame_idx (partition size
    * is one video's frame count, never the corpus). */
  private def boundariesOf(frames: DataFrame,
      minHamming: Int): DataFrame = {
    val fp = udf((p: Array[Byte]) =>
      MediaCodec.imageDHash64(p).map(java.lang.Long.valueOf).orNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames
      .withColumn("__fh", fp(col("frame")))
      .filter(col("__fh").isNotNull)
      .withColumn("__prev", lag(col("__fh"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("hamming",
        bit_count(col("__fh").bitwiseXOR(col("__prev"))).cast("int"))
      .filter(col("hamming") >= minHamming)
      .select(col("media_id"), col("frame_idx"), col("hamming"))
  }

  /** REAL video demux ([[sampleFrames]]'s container twin): every
    * `everyNth` frame of a strict MJPEG/AVI payload
    * ([[MediaCodec.aviMjpegFrames]]) as its own row, the frame being
    * the intact per-frame JPEG (feeds the existing image decode/hash
    * paths unchanged). Payloads that are not structurally valid
    * MJPEG/AVI yield no rows — strict-parse, never a wrong demux.
    * frame_idx is the index in the CONTAINER (so sampled outputs keep
    * their true positions). Map-only flatMap at any corpus size. */
  def sampleAviFrames(media: DataFrame, everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").flatMap { r =>
      MediaCodec.aviMjpegFrames(r.getAs[Array[Byte]]("payload")) match {
        case None => Iterator.empty
        case Some((_, frames)) =>
          (0 until frames.length by everyNth).iterator.map(i =>
            Row(r.getLong(0), i, frames(i)))
      }
    }(enc)
  }

  /** Per-video decode summary over the full real pipeline — demux
    * ([[MediaCodec.aviMjpegFrames]]) then per-frame JPEG decode
    * ([[MediaCodec.decodeJpeg]]): geometry plus exact channel sums
    * ACROSS frames. NULL-summed rows never appear: a video whose
    * container parses but whose frames don't decode — or decode to
    * dimensions DISAGREEING with the container header (the row's
    * width/height columns must describe the frames its sums came
    * from) — is reported with n_decoded < n_frames and sums over the
    * conforming subset. Not a valid AVI → no row (strict, like every
    * codec here). Map-only. */
  def videoSummary(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("n_decoded", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").flatMap { r =>
      MediaCodec.aviMjpegFrames(r.getAs[Array[Byte]]("payload")) match {
        case None => Iterator.empty
        case Some((s, frames)) =>
          var (sr, sg, sb) = (0L, 0L, 0L)
          var decoded = 0
          frames.foreach { f =>
            MediaCodec.decodeJpeg(f)
              .filter(b => b.width == s.width && b.height == s.height)
              .foreach { b =>
                sr += b.sumR; sg += b.sumG; sb += b.sumB; decoded += 1
              }
          }
          Iterator.single(Row(r.getLong(0), s.nFrames, decoded,
            s.width, s.height, sr, sg, sb))
      }
    }(enc)
  }

  /** Feature extraction over media batches: mapPartitions so a real
    * decoder could amortize codec init per partition (the Scala analogue
    * of mapInPandas batch shape). Output keeps the id + a fixed-width
    * feature vector — joinable back to metadata.
    *
    * Payloads that parse as uncompressed 24-bit BMP or PCM-16 WAV go
    * through the REAL pure-JVM decoder ([[MediaCodec.decodeFeatures]]:
    * feature(0) = 1 for image, 2 for audio); anything else falls back
    * to the deterministic stub histogram (feature length 16). The
    * codec parsers are strict, so a text payload can never be
    * mis-decoded into the real path. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val enc = ExpressionEncoder(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-partition init site for a codec needing state
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feature = MediaCodec.decodeFeatures(payload)
          .getOrElse(stubDecode(payload))
        Row(r.getLong(0), feature.toSeq,
          if (payload == null) 0 else payload.length)
      }
    }(enc)
  }
}
