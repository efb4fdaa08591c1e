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

  test("media operators tolerate degenerate inputs: zero-row, " +
      "single-row, and null-dirty media tables") {
    val schema = "media_id BIGINT, media_type STRING, payload BINARY, " +
      "meta MAP<STRING,STRING>"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    val bmp = MediaCodec.encodeBmp24(9, 8, (x, y) => (x * 20, y * 20, 5))
    val wav = MediaCodec.encodeWavPcm16(8000, 1,
      Array.tabulate[Short](130)(i => ((i % 7) * 40 - 120).toShort))
    val single = Seq((1L, "image/bmp", bmp, Map.empty[String, String]))
      .toDF("media_id", "media_type", "payload", "meta")
    val dirty = Seq(
      (1L, "image/bmp", bmp, Map.empty[String, String]),
      (2L, null.asInstanceOf[String], null.asInstanceOf[Array[Byte]],
        null.asInstanceOf[Map[String, String]]),
      (3L, "audio/wav", wav, Map.empty[String, String]),
      (4L, "text/plain", "not media".getBytes, Map.empty[String, String]))
      .toDF("media_id", "media_type", "payload", "meta")
    for (m <- Seq(empty, single, dirty)) {
      // dedups: null/undecodable payloads keep themselves; decodable
      // singletons survive; nothing throws
      val img = Multimodal.imageDedup(m).collect()
      assert(img.length == m.count(), "imageDedup must keep every " +
        "row of a table with no duplicate content")
      val aud = Multimodal.audioDedup(m).collect()
      assert(aud.length == m.count())
      // near-dup classes: no pairs on degenerate corpora, no throw
      assert(Multimodal.imageNearDupClasses(m, maxHamming = 2)
        .collect() != null)
      // shot boundaries: payloads here are not frame-packed video, so
      // no boundaries — and no crash on null payloads
      assert(Multimodal.shotBoundaries(m, frameBytes = 64).collect()
        .isEmpty)
      // resize: BMP rows shrink, everything else passes through byte-
      // identical (nulls stay null)
      val resized = Multimodal.resizeImages(m, factor = 3)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload"))
        .toMap
      if (m eq dirty) {
        assert(resized(2L) == null)
        assert(resized(4L).toSeq == "not media".getBytes.toSeq)
        assert(resized(1L).length < bmp.length)
        assert(resized(3L).toSeq == wav.toSeq)
      }
    }
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

  test("PNG roundtrip: encode truecolor, decode exact dims + sums") {
    val bytes = MediaCodec.encodePng(3, 2, (x, y) => (x, 10 * y, 100))
    val s = MediaCodec.decodePng(bytes).get
    assert(s.width == 3 && s.height == 2)
    assert(s.sumR == 2 * (0 + 1 + 2))
    assert(s.sumG == 3 * (0 + 10))
    assert(s.sumB == 6 * 100)
  }

  test("PNG decode agrees with the JDK ImageIO reference, both ways") {
    // our encoder -> JDK reader: structure + CRCs must be conformant
    val ours = MediaCodec.encodePng(7, 5,
      (x, y) => (x * 30, y * 40, (x + y) * 10))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ours))
    assert(img != null && img.getWidth == 7 && img.getHeight == 5)
    var (r, g, b) = (0L, 0L, 0L)
    for (y <- 0 until 5; x <- 0 until 7) {
      val p = img.getRGB(x, y)
      r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
    }
    val s = MediaCodec.decodePng(ours).get
    assert((s.sumR, s.sumG, s.sumB) == ((r, g, b)))
    // JDK writer -> our decoder: whatever filters/strategy ImageIO
    // picks (incl. RGBA), our filter-undo must reconstruct the pixels
    for (imgType <- Seq(
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)) {
      val bi = new java.awt.image.BufferedImage(9, 6, imgType)
      for (y <- 0 until 6; x <- 0 until 9)
        bi.setRGB(x, y, 0xff000000 | (x * 28 << 16) |
          (y * 42 << 8) | ((x * y) % 251))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      val d = MediaCodec.decodePng(out.toByteArray).get
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until 6; x <- 0 until 9) {
        val p = bi.getRGB(x, y)
        er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
      }
      assert(d.width == 9 && d.height == 6)
      assert((d.sumR, d.sumG, d.sumB) == ((er, eg, eb)),
        s"type=$imgType")
    }
  }

  test("PNG filter reconstruction: every filter type decodes exactly") {
    // hand-build one PNG per filter type: raw scanlines are FILTERED
    // forward here, so decode must undo them back to the true pixels
    val (w, h) = (4, 3)
    def truePx(x: Int, y: Int) =
      Array((x * 50 + 3) & 0xff, (y * 70 + 5) & 0xff, (x * y * 90) & 0xff)
    for (filter <- 0 to 4) {
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride))
      val recon = Array.ofDim[Int](h, stride)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        recon(y)(x * 3 + c) = truePx(x, y)(c)
      for (y <- 0 until h) {
        raw(y * (1 + stride)) = filter.toByte
        for (i <- 0 until stride) {
          val cur = recon(y)(i)
          val a = if (i >= 3) recon(y)(i - 3) else 0
          val b = if (y > 0) recon(y - 1)(i) else 0
          val cc = if (y > 0 && i >= 3) recon(y - 1)(i - 3) else 0
          val pred = filter match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - cc
              val (pa, pb, pc) =
                (math.abs(p - a), math.abs(p - b), math.abs(p - cc))
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
          }
          raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val z = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      // assemble: reuse encodePng's chunk layout by patching its IDAT
      // is fiddly; build chunks directly
      def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
        val body = tpe.getBytes("US-ASCII") ++ data
        val c = new java.util.zip.CRC32(); c.update(body)
        val out = java.nio.ByteBuffer.allocate(body.length + 8)
        out.putInt(data.length).put(body).putInt(c.getValue.toInt)
        out.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G',
        0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
      val d = MediaCodec.decodePng(png).getOrElse(
        fail(s"filter $filter did not decode"))
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += truePx(x, y)(0); eg += truePx(x, y)(1); eb += truePx(x, y)(2)
      }
      assert((d.sumR, d.sumG, d.sumB) == ((er, eg, eb)),
        s"filter=$filter")
    }
  }

  test("PNG strictness: bad CRC, palette type, truncation all reject") {
    val ok = MediaCodec.encodePng(4, 4, (_, _) => (1, 2, 3))
    assert(MediaCodec.decodePng(ok).isDefined)
    // flip one IDAT byte: CRC check must reject
    val corrupt = ok.clone()
    corrupt(ok.length - 20) = (corrupt(ok.length - 20) ^ 0x01).toByte
    assert(MediaCodec.decodePng(corrupt).isEmpty)
    // truncation
    assert(MediaCodec.decodePng(ok.take(ok.length - 9)).isEmpty)
    assert(MediaCodec.decodePng("PNG but not really".getBytes).isEmpty)
    assert(MediaCodec.decodePng(null).isEmpty)
    // palette color type (3) must reject, not mis-decode
    val pal = ok.clone()
    pal(8 + 4 + 4 + 9) = 3 // IHDR color-type byte
    assert(MediaCodec.decodePng(pal).isEmpty) // (CRC also now wrong)
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

  test("bmpDHash64: brightness-shift invariant, orientation-normalized, " +
      "content-sensitive, strict") {
    def grad(shift: Int) = MediaCodec.encodeBmp24(12, 9, (x, y) => (
      (x * 37 + y * 11) % 200 + shift,
      (y * 29 + x * 5) % 200 + shift,
      (x * y * 3) % 200 + shift))
    val base = MediaCodec.bmpDHash64(grad(0))
    assert(base.nonEmpty)
    // different BYTES, same picture: uniform brightness shift
    assert(MediaCodec.bmpDHash64(grad(5)) == base)
    assert(!java.util.Arrays.equals(grad(0), grad(5)))
    // different content: hash moves
    val other = MediaCodec.encodeBmp24(12, 9, (x, y) => (
      (x * 151 + y * 83) % 200, (y * 97) % 200, (x * 13) % 200))
    assert(MediaCodec.bmpDHash64(other) != base)
    // a top-down encoding of the SAME pixels hashes identically:
    // flip the stored rows and negate the height field
    val bu = grad(0)
    val td = bu.clone()
    val rowSize = ((12 * 3 + 3) / 4) * 4
    (0 until 9).foreach { y =>
      System.arraycopy(bu, 54 + (9 - 1 - y) * rowSize,
        td, 54 + y * rowSize, rowSize)
    }
    val hNeg = -9
    td(22) = hNeg.toByte; td(23) = (hNeg >> 8).toByte
    td(24) = (hNeg >> 16).toByte; td(25) = (hNeg >> 24).toByte
    assert(MediaCodec.bmpDHash64(td) == base, "orientation changed the hash")
    // strictness: text and null never hash
    assert(MediaCodec.bmpDHash64("BM not a bitmap".getBytes).isEmpty)
    assert(MediaCodec.bmpDHash64(null).isEmpty)
  }

  test("imageDedup: byte-different brightness copies collapse; " +
      "non-image payloads keep themselves") {
    def img(cls: Int, shift: Int) = MediaCodec.encodeBmp24(
      10 + cls, 9, (x, y) => (
        (x * (31 + 13 * cls) + y * 17) % 200 + shift,
        (y * 23 + x * 7) % 200 + shift,
        (cls * 97 + x * 53) % 200 + shift))
    val rows = Seq(
      (1L, img(0, 0)), (2L, img(0, 3)),   // class 0: bytes differ
      (3L, img(1, 0)), (4L, img(1, 2)),   // class 1
      (5L, "not an image at all".getBytes),
      (6L, "also not an image".getBytes)) // non-images both survive
      .toDF("media_id", "payload")
    val kept = Multimodal.imageDedup(rows)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L, 6L), s"kept=$kept")
  }

  test("imageDHash64 is container-independent: the same picture in BMP " +
      "and PNG hashes identically; formats alone never collide") {
    val px = (x: Int, y: Int) =>
      ((x * 37 + y * 11) % 200, (y * 29 + x * 5) % 200, (x * y * 3) % 200)
    val bmp = MediaCodec.encodeBmp24(12, 9, px)
    val png = MediaCodec.encodePng(12, 9, px)
    val hb = MediaCodec.imageDHash64(bmp)
    val hp = MediaCodec.imageDHash64(png)
    assert(hb.nonEmpty && hb == hp,
      s"container changed the perceptual hash: bmp=$hb png=$hp")
    // a DIFFERENT picture in the same PNG container must not collide
    val other = MediaCodec.encodePng(12, 9, (x, y) =>
      ((x * 151 + y * 83) % 200, (y * 97) % 200, (x * 13) % 200))
    assert(MediaCodec.imageDHash64(other) != hb)
    // brightness invariance holds through the PNG path too
    val pngShift = MediaCodec.encodePng(12, 9, (x, y) => {
      val (r, g, b) = px(x, y); (r + 4, g + 4, b + 4)
    })
    assert(MediaCodec.imageDHash64(pngShift) == hb)
  }

  test("JPEG decode: uniform grayscale roundtrips EXACTLY at quality 1.0 " +
      "(identity YCbCr + DC-only lossless quantization)") {
    for (v <- Seq(0, 7, 63, 128, 200, 255); (w, h) <- Seq((8, 8), (11, 5), (3, 17))) {
      val jpg = MediaCodec.encodeJpeg(w, h, (_, _) => (v, v, v))
      val got = MediaCodec.decodeJpeg(jpg)
      assert(got.contains(MediaCodec.BmpSummary(
        w, h, w.toLong * h * v, w.toLong * h * v, w.toLong * h * v)),
        s"uniform gray v=$v ${w}x$h: $got")
    }
  }

  test("jpegDHash64 equals the lossless containers' hash on " +
      "margin-guarded grayscale gradients; strict on non-JPEG") {
    for (cls <- 0 until 25) {
      val w = 9 + cls % 5
      val h = 8 + cls % 4
      // grayscale kills chroma error entirely; the x-step of 25 gray
      // levels (75 in r+g+b luma) dwarfs quality-1.0 reconstruction
      // error, so no dHash comparison can flip
      val px = (x: Int, y: Int) => {
        val g = (cls * 53 + x * 25 + y * 18) % 199
        (g, g, g)
      }
      val hb = MediaCodec.bmpDHash64(MediaCodec.encodeBmp24(w, h, px))
      val hj = MediaCodec.jpegDHash64(MediaCodec.encodeJpeg(w, h, px))
      assert(hb.nonEmpty && hb == hj, s"cls=$cls bmp=$hb jpeg=$hj")
      assert(MediaCodec.imageDHash64(MediaCodec.encodeJpeg(w, h, px)) == hb)
    }
    // strictness: text, PNG bytes, and truncated JPEG all reject
    assert(MediaCodec.decodeJpeg("not an image at all".getBytes).isEmpty)
    val png = MediaCodec.encodePng(6, 6, (x, y) => (x, y, 0))
    assert(MediaCodec.decodeJpeg(png).isEmpty)
    val jpg = MediaCodec.encodeJpeg(8, 8, (_, _) => (99, 99, 99))
    assert(MediaCodec.decodeJpeg(jpg.take(jpg.length / 2)).isEmpty)
  }

  test("phash-dedup fixture law: every class collides across BMP, " +
      "shifted PNG, and JPEG; all 25 classes land on distinct hashes") {
    // the exact fixture family q_multimodal_phash_dedup plants — pinned
    // here so the closed-form survivor oracle cannot drift silently
    val hashes = (0 until 25).map { cls =>
      val w = 9 + cls % 5
      val h = 8 + cls % 4
      def px(shift: Int) = (x: Int, y: Int) => {
        val g = (cls * 53 + x * (17 + 2 * cls) + y * 18) % 199 + shift
        (g, g, g)
      }
      val hb = MediaCodec.imageDHash64(MediaCodec.encodeBmp24(w, h, px(0)))
      val hp = MediaCodec.imageDHash64(MediaCodec.encodePng(w, h, px(3)))
      val hj = MediaCodec.imageDHash64(MediaCodec.encodeJpeg(w, h, px(0)))
      assert(hb.nonEmpty && hb == hp && hb == hj,
        s"cls=$cls containers diverge: bmp=$hb png+3=$hp jpeg=$hj")
      hb.get
    }
    assert(hashes.distinct.size == 25,
      s"class hash collision: ${hashes.zipWithIndex.groupBy(_._1).filter(_._2.size > 1)}")
  }

  test("imageNearDupPairs: pigeonhole banding finds pairs within the " +
      "Hamming radius and misses beyond it; non-images never pair") {
    // monotone-in-x luma gradient; the bump at the (col 0, row 0)
    // sample point flips EXACTLY dHash bit 0 (ground truth pinned by
    // direct hash calls so the fixture cannot drift silently)
    def img(bump: Int) = MediaCodec.encodeBmp24(18, 16, (x, y) => (
      x * 3 + y + (if (x < 2 && y < 2) bump else 0),
      y * 2, x * 2))
    val h0 = MediaCodec.bmpDHash64(img(0)).get
    val h1 = MediaCodec.bmpDHash64(img(120)).get
    assert(java.lang.Long.bitCount(h0 ^ h1) == 1,
      s"fixture drifted: hamming=${java.lang.Long.bitCount(h0 ^ h1)}")
    val rows = Seq(
      (1L, img(0)), (2L, img(120)),
      (3L, "never an image".getBytes))
      .toDF("media_id", "payload")
    val at1 = Multimodal.imageNearDupPairs(rows, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(at1.toSeq == Seq((1L, 2L, 1)), s"at1=${at1.toSeq}")
    assert(Multimodal.imageNearDupPairs(rows, maxHamming = 0)
      .collect().isEmpty, "radius 0 must miss a 1-bit pair")
    // the banding envelope is enforced, not silently degraded
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(rows, maxHamming = 5)
    }
    // the CLASS form collapses mass-identical copies: 5 extra byte-
    // identical copies of each image add zero rows to the class join
    val crowded = rows.unionByName(
      (10L to 14L).map(i => (i, img(0))).toDF("media_id", "payload"))
      .unionByName(
        (20L to 24L).map(i => (i, img(120))).toDF("media_id", "payload"))
    val classes = Multimodal.imageNearDupClasses(crowded, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(classes.length == 1 && classes.head._3 == 1,
      s"classes=${classes.toSeq}")
    assert(Set(classes.head._1, classes.head._2) == Set(h0, h1))
  }

  test("wavEnvelopeHash64: exact gain-invariant, shape-sensitive, strict; " +
      "audioDedup collapses volume-scaled copies") {
    def wav(gain: Int, period: Int) = MediaCodec.encodeWavPcm16(8000, 1,
      Array.tabulate[Short](180)(i => (((i * period) % 351 - 175) * gain)
        .toShort))
    val h1 = MediaCodec.wavEnvelopeHash64(wav(1, 7))
    assert(h1.nonEmpty)
    // same sound at 3x the volume: every segment energy scales by 3,
    // every integer comparison is unchanged — bitwise-equal hash
    assert(MediaCodec.wavEnvelopeHash64(wav(3, 7)) == h1)
    // a different envelope shape moves the hash
    assert(MediaCodec.wavEnvelopeHash64(wav(1, 11)) != h1)
    // strictness: text and truncation never hash
    assert(MediaCodec.wavEnvelopeHash64("RIFFraff".getBytes).isEmpty)
    assert(MediaCodec.wavEnvelopeHash64(null).isEmpty)
    val rows = Seq(
      (1L, wav(1, 7)), (2L, wav(3, 7)),    // volume copies, bytes differ
      (3L, wav(1, 11)),                    // different sound survives
      (4L, "definitely not audio".getBytes))
      .toDF("media_id", "payload")
    assert(!java.util.Arrays.equals(wav(1, 7), wav(3, 7)))
    val kept = Multimodal.audioDedup(rows).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), s"kept=$kept")
  }

  test("shotBoundaries: cuts between distinct scenes detected, " +
      "within-shot brightness drift ignored, corrupt frame skipped") {
    // three "scenes" as distinct gradients; scene repeats are
    // brightness-drifted (within-shot lighting change — NOT a cut)
    def frame(scene: Int, drift: Int) = MediaCodec.encodeBmp24(16, 12,
      (x, y) => (
        (x * (29 + scene * 53) + y * 11) % 200 + drift,
        (y * (17 + scene * 31) + x * 7) % 200 + drift,
        (scene * 71 + x * 13 + y * 3) % 200 + drift))
    val f0 = frame(0, 0)
    val fb = frame(0, 0).length // all frames same byte size
    assert(frame(1, 0).length == fb && frame(2, 0).length == fb)
    val video = f0 ++ frame(0, 2) ++ frame(0, 4) ++ // shot A (drifting)
      frame(1, 0) ++ frame(1, 3) ++                 // cut -> shot B
      frame(2, 0)                                   // cut -> shot C
    val corrupt = java.util.Arrays.copyOf(f0, fb)   // truncated mid-video
    corrupt(0) = 'X'
    val video2 = f0 ++ corrupt ++ frame(1, 0)       // corrupt frame skipped
    val rows = Seq((1L, video), (2L, video2)).toDF("media_id", "payload")
    val cuts = Multimodal.shotBoundaries(rows, frameBytes = fb,
        minHamming = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cuts == Set((1L, 3), (1L, 5), (2L, 2)), s"cuts=$cuts")
  }

  test("AVI/MJPEG codec: roundtrip exact for uniform-gray quality-1.0 " +
      "frames; strict parse rejects structural damage") {
    def gray(v: Int) = MediaCodec.encodeJpeg(6, 4, (_, _) => (v, v, v))
    val frames = Seq(gray(10), gray(200), gray(77))
    val avi = MediaCodec.encodeAviMjpeg(6, 4, frames, fps = 5)
    val (s, got) = MediaCodec.aviMjpegFrames(avi).get
    assert(s.width == 6 && s.height == 4 && s.nFrames == 3 && s.fps == 5)
    // the demuxed frames are the INTACT input JPEGs
    got.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes not intact") }
    // and they decode exactly (uniform gray at q1.0 is lossless)
    assert(MediaCodec.decodeJpeg(got(1)).get.sumR == 6L * 4 * 200)
    // strictness: wrong magic, truncated, frame-count mismatch,
    // non-JPEG movi entry, non-AVI RIFF (a WAV) all -> None
    assert(MediaCodec.aviMjpegFrames(null).isEmpty)
    assert(MediaCodec.aviMjpegFrames("RIFFnope".getBytes).isEmpty)
    assert(MediaCodec.aviMjpegFrames(
      java.util.Arrays.copyOf(avi, avi.length - 10)).isEmpty)
    val wrongCount = avi.clone() // dwTotalFrames: avih body offset 16
    val avihAt = new String(avi, "ISO-8859-1").indexOf("avih")
    wrongCount(avihAt + 8 + 16) = 9
    assert(MediaCodec.aviMjpegFrames(wrongCount).isEmpty,
      "frame count disagreeing with header must fail strict parse")
    assert(MediaCodec.aviMjpegFrames(
      MediaCodec.encodeWavPcm16(8000, 1, Array[Short](1, 2))).isEmpty)
    // a corrupted movi payload (JPEG magic destroyed) fails the walk
    val noMagic = avi.clone()
    val firstFrameAt = new String(avi, "ISO-8859-1").indexOf("00dc") + 8
    noMagic(firstFrameAt) = 0
    assert(MediaCodec.aviMjpegFrames(noMagic).isEmpty)
    // a crafted chunk size near Int.MaxValue must fail the bounds
    // check, not wrap it negative and walk the parser out of range
    val crafted = new java.io.ByteArrayOutputStream()
    crafted.write("RIFF".getBytes); crafted.write(Array[Byte](16, 0, 0, 0))
    crafted.write("AVI ".getBytes); crafted.write("JUNK".getBytes)
    crafted.write(Array[Byte](-1, -1, -1, 0x7f)) // sz = Int.MaxValue
    crafted.write(new Array[Byte](4))
    assert(MediaCodec.aviMjpegFrames(crafted.toByteArray).isEmpty,
      "overflowing chunk size must strict-fail, not throw")
  }

  test("videoSummary: exact cross-frame sums; a frame that sniffs as " +
      "JPEG but fails decode reports n_decoded < n_frames, not a crash") {
    def gray(v: Int) = MediaCodec.encodeJpeg(5, 3, (_, _) => (v, v, v))
    val good = MediaCodec.encodeAviMjpeg(5, 3, Seq(gray(10), gray(40)))
    // magic-intact but structurally dead JPEG: passes the container's
    // sniff (FF D8 FF), fails the full ImageIO decode
    val deadJpeg = java.util.Arrays.copyOf(gray(99), 20)
    // decodes fine but disagrees with the container header's 5x3 —
    // must not be summed under that geometry
    val wrongDims = MediaCodec.encodeJpeg(9, 9, (_, _) => (7, 7, 7))
    val mixed = MediaCodec.encodeAviMjpeg(5, 3,
      Seq(gray(10), deadJpeg, gray(40), wrongDims))
    val rows = Seq((1L, good), (2L, mixed), (3L, "text".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.videoSummary(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    // uniform gray at q1.0 decodes exactly: sums are closed-form
    assert(out(1L).getInt(1) == 2 && out(1L).getInt(2) == 2)
    assert(out(1L).getLong(5) == 5L * 3 * (10 + 40))
    assert(out(2L).getInt(1) == 4 && out(2L).getInt(2) == 2,
      s"dead + wrong-dims frames must be skipped, not counted: ${out(2L)}")
    assert(out(2L).getLong(5) == 5L * 3 * (10 + 40))
    assert(!out.contains(3L), "non-AVI payload must yield no row")
  }

  test("shotBoundariesAvi: cuts detected on a REAL container via the " +
      "same per-frame hash path; non-AVI payloads yield no rows") {
    // same scene construction as the packed-frame test, but carried as
    // per-frame JPEGs inside a strict AVI container. Grayscale with
    // >=17-level gradient steps (>=51 in r+g+b luma) at the dHash
    // sample points — the JPEG-stable fixture regime.
    def frame(scene: Int, drift: Int) = MediaCodec.encodeJpeg(16, 12,
      (x, y) => {
        val g = (x * (29 + scene * 53) + y * 18) % 199 + drift
        (g, g, g)
      })
    val avi = MediaCodec.encodeAviMjpeg(16, 12, Seq(
      frame(0, 0), frame(0, 2), frame(0, 4), // shot A (drifting)
      frame(1, 0), frame(1, 3),              // cut -> shot B
      frame(2, 0)))                          // cut -> shot C
    val rows = Seq((1L, avi), (2L, "not a video".getBytes))
      .toDF("media_id", "payload")
    val cuts = Multimodal.shotBoundariesAvi(rows, minHamming = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cuts == Set((1L, 3), (1L, 5)), s"cuts=$cuts")
    // demux sampling keeps true container positions
    val sampled = Multimodal.sampleAviFrames(rows, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(sampled.toSeq.sorted == Seq((1L, 0), (1L, 2), (1L, 4)))
  }

  test("resizeImages: real nearest-neighbor pixel downsample with exact " +
      "dims and channel sums; undecodable payloads pass through") {
    // px(x, y) encodes its own coordinates, so the resized image's
    // channel sums have a closed form over the sampled grid
    val src = MediaCodec.encodeBmp24(11, 7, (x, y) => (x * 2, y * 3, 40))
    val rows = Seq((1L, src), (2L, "not an image".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImages(rows, factor = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val s = MediaCodec.decodeBmp24(out(1L)).get
    assert(s.width == 4 && s.height == 3, s) // ceil(11/3) x ceil(7/3)
    // sampled xs = {0,3,6,9}, ys = {0,3,6}: sums are exact
    assert(s.sumR == 3 * Seq(0, 3, 6, 9).map(_ * 2).sum, s)
    assert(s.sumG == 4 * Seq(0, 3, 6).map(_ * 3).sum, s)
    assert(s.sumB == 40L * 12, s)
    assert(java.util.Arrays.equals(out(2L), "not an image".getBytes),
      "undecodable payload must pass through unchanged")
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

  test("wavZeroCrossings + Goertzel tone detection on known signals") {
    // 8 kHz mono, 400 samples, 1 kHz square wave (half-period 4)
    val sq = Array.tabulate[Short](400)(i =>
      if ((i / 4) % 2 == 0) 1000 else -1000)
    val wav = MediaCodec.encodeWavPcm16(8000, 1, sq)
    assert(MediaCodec.wavZeroCrossings(wav).contains(399L / 4))
    // the 1 kHz probe beats probes at 500 Hz and 2 kHz
    val p = Seq(500.0, 1000.0, 2000.0)
      .map(hz => MediaCodec.wavGoertzelPower(wav, hz).get)
    assert(p(1) > p(0) * 5 && p(1) > p(2) * 5, p.toString)
    // zeros carry the previous sign: +A, 0, -A is ONE crossing
    val z = MediaCodec.encodeWavPcm16(8000, 1,
      Array[Short](1000, 0, -1000, 0, 0, 1000))
    assert(MediaCodec.wavZeroCrossings(z).contains(2L))
    // strictness: non-WAV bytes feature as null, never throw
    assert(MediaCodec.wavZeroCrossings("nope".getBytes).isEmpty)
    assert(MediaCodec.wavGoertzelPower("nope".getBytes, 1000.0).isEmpty)
  }
}
