package graft.operators

/** Pure-JVM media codecs for the multimodal column path (SURVEY.md
  * §7E): uncompressed 24-bit BMP, deflate-compressed 8-bit truecolor
  * PNG, and 16-bit PCM WAV — media containers parseable with zero
  * native dependencies (PNG's zlib lives in the JDK), making
  * PRODUCTION-REAL decode paths for binary payloads (everything else
  * still falls back to the documented deterministic stub in
  * [[Multimodal.stubDecode]]).
  *
  * All formats are decoded from their public specifications
  * (BITMAPFILEHEADER/BITMAPINFOHEADER; W3C PNG incl. the five
  * scanline filters and per-chunk CRC32; RIFF/WAVE chunk layout).
  * Decoders are STRICT: any structural mismatch — wrong magic, short
  * buffer, bad CRC, unsupported bpp/compression/format — returns
  * None, so a text payload that happens to start with a magic byte
  * can never be mis-decoded (the caller falls back to the stub
  * feature).
  */
object MediaCodec {

  /** Decoded image summary: dimensions + per-channel pixel SUMS.
    * Sums (not means) so fixture oracles stay exact integer
    * arithmetic; callers derive mean = sum / (w*h). */
  final case class BmpSummary(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long)

  /** Decoded audio summary: format + amplitude aggregates over all
    * samples (channel-interleaved). */
  final case class WavSummary(sampleRate: Int, channels: Int,
      nFrames: Int, sumAbs: Long, maxAbs: Int)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def put16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
  }
  private def put32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
  }

  // ------------------------------------------------------------- BMP

  private val BmpHeaderBytes = 54 // 14 file header + 40 info header

  /** Encode a 24bpp bottom-up BI_RGB BMP; `px(x, y)` returns
    * (r, g, b) for the pixel at column x, row y (y=0 is the TOP row —
    * the encoder writes rows bottom-up as the format requires). */
  def encodeBmp24(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val out = new Array[Byte](BmpHeaderBytes + rowSize * height)
    out(0) = 'B'; out(1) = 'M'
    put32(out, 2, out.length)
    put32(out, 10, BmpHeaderBytes)
    put32(out, 14, 40)
    put32(out, 18, width)
    put32(out, 22, height) // positive = bottom-up
    put16(out, 26, 1)      // planes
    put16(out, 28, 24)     // bpp
    put32(out, 30, 0)      // BI_RGB
    put32(out, 34, rowSize * height)
    var y = 0
    while (y < height) {
      val base = BmpHeaderBytes + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        out(base + x * 3) = b.toByte
        out(base + x * 3 + 1) = g.toByte
        out(base + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Validated 24bpp BI_RGB geometry: (width, height, dataOffset,
    * rowSize, topDown). None on any structural mismatch — the strict
    * validations [[decodeBmp24]] documents, factored so pixel-access
    * consumers (the perceptual hash) share them. */
  private def bmpGeom(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Boolean)] = {
    if (bytes == null || bytes.length < BmpHeaderBytes) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = i32(bytes, 10)
    val infoSize = i32(bytes, 14)
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val height = math.abs(rawHeight)
    if (infoSize < 40 || width <= 0 || height == 0) return None
    if (u16(bytes, 26) != 1 || u16(bytes, 28) != 24) return None
    if (i32(bytes, 30) != 0) return None // BI_RGB only
    val rowSize = ((width * 3 + 3) / 4) * 4
    // guard against width*height overflow before multiplying out
    if (width > (1 << 20) || height > (1 << 20)) return None
    if (dataOffset < BmpHeaderBytes ||
        dataOffset.toLong + rowSize.toLong * height > bytes.length)
      return None
    Some((width, height, dataOffset, rowSize, rawHeight < 0))
  }

  /** Strict 24bpp BI_RGB decoder; None on any structural mismatch.
    * Handles both bottom-up (height > 0) and top-down (height < 0)
    * row orders — channel sums are row-order invariant anyway. */
  def decodeBmp24(bytes: Array[Byte]): Option[BmpSummary] = {
    bmpGeom(bytes).map { case (width, height, dataOffset, rowSize, _) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < height) {
        val base = dataOffset + y * rowSize
        var x = 0
        while (x < width) {
          sb += bytes(base + x * 3) & 0xff
          sg += bytes(base + x * 3 + 1) & 0xff
          sr += bytes(base + x * 3 + 2) & 0xff
          x += 1
        }
        y += 1
      }
      BmpSummary(width, height, sr, sg, sb)
    }
  }

  /** 64-bit difference hash (dHash) of a 24bpp BMP: point-sample a
    * 9×8 luminance grid (block centers, nearest pixel), bit
    * (row*8 + col) = luma(col+1, row) > luma(col, row). All-INTEGER
    * comparisons, so two perceptually identical images hash
    * bitwise-equal with a PROOF, not a float knife-edge: a uniform
    * brightness shift adds the same constant to both sides of every
    * comparison (block-mean variants need exact rational comparisons
    * for the same guarantee). Gradient direction — what dHash
    * captures — survives brightness/contrast drift; that is why it is
    * the standard near-dup image fingerprint. None for anything that
    * is not a structurally valid 24bpp BMP ([[pngDHash64]] runs the
    * SAME sampler over reconstructed PNG pixels — [[imageDHash64]]
    * dispatches across both containers).
    * Orientation-normalized: a bottom-up and a top-down encoding of
    * the SAME image hash identically. */
  def bmpDHash64(bytes: Array[Byte]): Option[Long] =
    bmpGeom(bytes).map { case (w, h, dataOffset, rowSize, topDown) =>
      dHash64At(w, h, (x, yImg) => {
        val yStore = if (topDown) yImg else h - 1 - yImg
        val base = dataOffset + yStore * rowSize + x * 3
        // r + g + b: any fixed positive channel combination works —
        // integer keeps the shift-invariance argument exact
        (bytes(base) & 0xff) + (bytes(base + 1) & 0xff) +
          (bytes(base + 2) & 0xff)
      })
    }

  /** REAL nearest-neighbor downsample of a 24bpp BMP by an integer
    * `factor`: output pixel (x, y) is input pixel (x·f, y·f), output
    * dims ceil(w/f) × ceil(h/f), re-encoded as a bottom-up BMP. None
    * for anything that is not a structurally valid 24bpp BMP — the
    * strict-parse contract of every codec here. (PNG payloads resize
    * by the same sampler over [[pngDHash64]]'s reconstruction path if
    * ever needed; the operator-level resize dispatches only what it
    * can decode and passes the rest through.) */
  def bmpResizeNearest(bytes: Array[Byte], factor: Int)
      : Option[Array[Byte]] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    bmpGeom(bytes).map { case (w, h, dataOffset, rowSize, topDown) =>
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      encodeBmp24(ow, oh, (ox, oy) => {
        val x = math.min(ox * factor, w - 1)
        val yImg = math.min(oy * factor, h - 1)
        val yStore = if (topDown) yImg else h - 1 - yImg
        val base = dataOffset + yStore * rowSize + x * 3
        ((bytes(base + 2) & 0xff), (bytes(base + 1) & 0xff),
          (bytes(base) & 0xff))
      })
    }
  }

  /** The dHash bit loop over any luma accessor in IMAGE orientation
    * (y = 0 is the top row) — format-independent, so the same picture
    * in different containers hashes identically. */
  private def dHash64At(w: Int, h: Int,
      lumaAt: (Int, Int) => Int): Long = {
    def sampleX(g: Int): Int = math.min((2 * g + 1) * w / 18, w - 1)
    def sampleY(g: Int): Int = math.min((2 * g + 1) * h / 16, h - 1)
    var hash = 0L
    var row = 0
    while (row < 8) {
      val y = sampleY(row)
      var colLuma = lumaAt(sampleX(0), y)
      var col = 0
      while (col < 8) {
        val next = lumaAt(sampleX(col + 1), y)
        if (next > colLuma) hash |= 1L << (row * 8 + col)
        colLuma = next
        col += 1
      }
      row += 1
    }
    hash
  }

  // ------------------------------------------------------------- PNG

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def crcOf(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** Encode an 8-bit truecolor (RGB, color type 2) non-interlaced PNG:
    * zlib-deflated scanlines with filter type 0 — the minimal valid
    * encoding every conformant reader accepts. `px(x, y)` as in
    * [[encodeBmp24]] (y=0 top). */
  def encodePng(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val raw = new Array[Byte](height * (1 + width * 3))
    var y = 0
    while (y < height) {
      val base = y * (1 + width * 3)
      raw(base) = 0 // filter: None
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        raw(base + 1 + x * 3) = r.toByte
        raw(base + 1 + x * 3 + 1) = g.toByte
        raw(base + 1 + x * 3 + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zbuf = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zbuf.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = zbuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig, 0, PngSig.length)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val hdr = new Array[Byte](4)
      putBe32(hdr, 0, data.length)
      out.write(hdr, 0, 4)
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new Array[Byte](4)
      putBe32(crc, 0, crcOf(body, 0, body.length))
      out.write(crc, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** STRICT PNG decode (public spec, RFC 2083 / W3C PNG): 8-bit
    * truecolor with or without alpha (color types 2 and 6), deflate
    * compression, no interlace; every chunk CRC is verified; all five
    * scanline filters (None/Sub/Up/Average/Paeth) are undone. Any
    * structural or CRC mismatch returns None — never a wrong decode.
    * Alpha (type 6) is parsed but excluded from the channel sums. */
  def decodePng(bytes: Array[Byte]): Option[BmpSummary] = {
    pngPixels(bytes).map { case (width, height, bpp, raw) =>
      val stride = width * bpp
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < height) {
        val base = y * (1 + stride) + 1
        var x = 0
        while (x < stride) {
          val v = raw(base + x) & 0xff
          (x % bpp) match {
            case 0 => sr += v
            case 1 => sg += v
            case 2 => sb += v
            case _ => // alpha: excluded from sums
          }
          x += 1
        }
        y += 1
      }
      BmpSummary(width, height, sr, sg, sb)
    }
  }

  /** Reconstructed PNG pixel buffer: (width, height, bytesPerPixel,
    * raw) where `raw` is the unfiltered scanline stream (each row is
    * one leading filter byte — now meaningless — followed by
    * `width*bpp` reconstructed samples, top-down). The strict parse +
    * zlib inflate + filter reconstruction previously inlined in
    * [[decodePng]], factored so pixel-access consumers (the
    * perceptual hash) share it. */
  private def pngPixels(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) {
      if (bytes(i) != PngSig(i)) return None
      i += 1
    }
    var pos = PngSig.length
    var width, height = -1
    var bpp = 0 // bytes per pixel
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 12 > bytes.length) return None
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      if (crcOf(bytes, pos + 4, 4 + len) != be32(bytes, pos + 8 + len))
        return None
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, pos + 8)
          height = be32(bytes, pos + 12)
          val (depth, color) = (bytes(pos + 16), bytes(pos + 17))
          val (comp, filt, inter) =
            (bytes(pos + 18), bytes(pos + 19), bytes(pos + 20))
          if (depth != 8 || (color != 2 && color != 6)) return None
          if (comp != 0 || filt != 0 || inter != 0) return None
          if (width <= 0 || height <= 0 ||
              width > (1 << 20) || height > (1 << 20)) return None
          bpp = if (color == 2) 3 else 4
        case "IDAT" =>
          if (width < 0) return None // IDAT before IHDR
          idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (width < 0 || idat.size() == 0) return None

    val stride = width * bpp
    val expect = height.toLong * (1 + stride)
    if (expect > Int.MaxValue) return None
    val raw = new Array[Byte](expect.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()

    // undo scanline filters in place (prev = reconstructed row above)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < height) {
      val base = y * (1 + stride) + 1
      val filter = raw(base - 1) & 0xff
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) raw(base + x - bpp) & 0xff else 0
        val b = if (y > 0) raw(base - 1 - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp)
          raw(base - 1 - stride + x - bpp) & 0xff else 0
        val add = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(base + x) = (((raw(base + x) & 0xff) + add) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some((width, height, bpp, raw))
  }

  /** [[bmpDHash64]]'s fingerprint for a PNG payload: the SAME sampler
    * over the reconstructed pixel buffer, so the same picture in
    * either container hashes IDENTICALLY (alpha, when present, is
    * excluded from luma exactly as it is excluded from sums). */
  def pngDHash64(bytes: Array[Byte]): Option[Long] =
    pngPixels(bytes).map { case (w, h, bpp, raw) =>
      val stride = w * bpp
      dHash64At(w, h, (x, y) => {
        val base = y * (1 + stride) + 1 + x * bpp
        (raw(base) & 0xff) + (raw(base + 1) & 0xff) +
          (raw(base + 2) & 0xff)
      })
    }

  // ------------------------------------------------------------ JPEG

  /** Strict JPEG decode via the JDK's bundled ImageIO plugin (public
    * `javax.imageio` API — the same pure-JDK dependency MediaCodecSpec
    * already uses to cross-validate the PNG codec). Real crawl corpora
    * are overwhelmingly JPEG, so the perceptual image family must not
    * no-op on the dominant container. Strict-parse contract as
    * everywhere here: magic sniff (FF D8 FF) before any decode work,
    * bounded dimensions, any reader error → None, never a wrong
    * decode. The stream is wrapped in a MemoryCacheImageInputStream so
    * executors never touch ImageIO's temp-file disk cache.
    *
    * JPEG is lossy: unlike BMP/PNG, a JPEG copy of a picture decodes
    * to APPROXIMATELY the source pixels, so cross-container hash
    * equality holds when the picture's luma gradients at the dHash
    * sample points exceed the codec's reconstruction error (small at
    * high quality; exact for uniform grayscale blocks, where the
    * YCbCr roundtrip is the identity and a constant block's DC-only
    * DCT quantizes losslessly at quality 1.0). */
  def decodeJpegImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8 ||
        (bytes(2) & 0xff) != 0xff) return None
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
    if (!it.hasNext) return None
    val reader = it.next()
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(in, true, true)
      val w = reader.getWidth(0)
      val h = reader.getHeight(0)
      if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) None
      else Option(reader.read(0))
    } catch { case _: Exception => None }
    finally { reader.dispose(); in.close() }
  }

  /** JPEG channel sums in [[BmpSummary]] form — the decode-dispatch
    * member for the feature path. */
  def decodeJpeg(bytes: Array[Byte]): Option[BmpSummary] =
    decodeJpegImage(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      BmpSummary(w, h, sr, sg, sb)
    }

  /** [[bmpDHash64]]'s fingerprint for a JPEG payload: the SAME sampler
    * over the ImageIO-decoded pixels. */
  def jpegDHash64(bytes: Array[Byte]): Option[Long] =
    decodeJpegImage(bytes).map { img =>
      dHash64At(img.getWidth, img.getHeight, (x, y) => {
        val rgb = img.getRGB(x, y)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      })
    }

  /** Encode a JPEG at explicit `quality` (1.0 = least lossy; the JDK
    * writer disables chroma subsampling there) — fixture/test support
    * for the decode path above, same role as [[encodeBmp24]] /
    * [[encodePng]]. */
  def encodeJpeg(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int),
      quality: Float = 1.0f): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Container-independent perceptual fingerprint: BMP, PNG, or JPEG —
    * same pixels → same hash (exactly for the lossless containers;
    * within gradient margin for JPEG, see [[decodeJpegImage]]). */
  def imageDHash64(bytes: Array[Byte]): Option[Long] =
    bmpDHash64(bytes).orElse(pngDHash64(bytes)).orElse(jpegDHash64(bytes))

  // ------------------------------------------------------------- WAV

  /** Encode a 16-bit PCM RIFF/WAVE file; `samples` are
    * channel-interleaved frames. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"bad channel layout: ${samples.length} samples / $channels ch")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    put32(out, 4, 36 + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    put32(out, 16, 16)              // fmt chunk size
    put16(out, 20, 1)               // PCM
    put16(out, 22, channels)
    put32(out, 24, sampleRate)
    put32(out, 28, sampleRate * channels * 2) // byte rate
    put16(out, 32, channels * 2)    // block align
    put16(out, 34, 16)              // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    put32(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) {
      put16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Strict PCM-16 RIFF/WAVE decoder; walks the chunk list (fmt may
    * be followed by LIST/fact/etc. before data). None on any
    * structural mismatch or non-PCM-16 stream. */
  /** Validated PCM-16 RIFF/WAVE geometry: (sampleRate, channels,
    * dataOffset, nSamples) — the strict validations [[decodeWavPcm16]]
    * documents, factored so sample-access consumers (the envelope
    * hash) share them. */
  private def wavGeom(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F') return None
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
        bytes(11) != 'E') return None
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val sz = i32(bytes, pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        if (u16(bytes, pos + 8) != 1) return None    // PCM only
        channels = u16(bytes, pos + 10)
        sampleRate = i32(bytes, pos + 12)
        if (u16(bytes, pos + 22) != 16) return None  // 16-bit only
      } else if (id == "data") {
        dataOff = pos + 8
        dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || dataOff < 0) return None
    if (dataLen % (2 * channels) != 0) return None
    Some((sampleRate, channels, dataOff, dataLen / 2))
  }

  def decodeWavPcm16(bytes: Array[Byte]): Option[WavSummary] = {
    wavGeom(bytes).map { case (sampleRate, channels, dataOff, n) =>
      var sumAbs = 0L
      var maxAbs = 0
      var i = 0
      while (i < n) {
        val v = u16(bytes, dataOff + i * 2).toShort.toInt
        val a = math.abs(v)
        sumAbs += a
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      WavSummary(sampleRate, channels, n / channels, sumAbs, maxAbs)
    }
  }

  /** 64-bit envelope difference hash of a PCM-16 WAV — the audio twin
    * of the image dHash: split the (channel-interleaved) sample stream
    * into 65 equal segments, e_k = Σ|sample| over segment k (exact
    * Long), bit k = e(k+1) > e(k). The envelope SHAPE is the
    * fingerprint, so a copy at a different volume collides: an exact
    * gain change (s' = g·s, integer g, no clipping) scales every
    * segment energy by the same factor and every integer comparison is
    * PROVABLY unchanged (real-world resampled/re-encoded gain is
    * approximately invariant — use [[graft.operators.Dedup
    * .fingerprintHammingPairs]] with a small radius there). Strict:
    * None for anything that is not a valid PCM-16 WAV. */
  def wavEnvelopeHash64(bytes: Array[Byte]): Option[Long] =
    wavGeom(bytes).map { case (_, _, dataOff, n) =>
      val e = new Array[Long](65)
      var k = 0
      while (k < 65) {
        val lo = (k.toLong * n / 65).toInt
        val hi = ((k + 1).toLong * n / 65).toInt
        var s = 0L
        var i = lo
        while (i < hi) {
          s += math.abs(u16(bytes, dataOff + i * 2).toShort.toInt)
          i += 1
        }
        e(k) = s
        k += 1
      }
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (e(b + 1) > e(b)) hash |= 1L << b
        b += 1
      }
      hash
    }

  /** Zero-crossing count over channel 0 — the classic integer-exact
    * audio activity feature (speech/music/noise discrimination): the
    * number of adjacent sample pairs whose signs differ. Zero samples
    * carry the previous sign (no crossing until the signal actually
    * changes side). None for anything that is not PCM-16 WAV. */
  def wavZeroCrossings(bytes: Array[Byte]): Option[Long] =
    wavGeom(bytes).map { case (_, channels, dataOff, n) =>
      val frames = n / channels
      var z = 0L
      var prevPos = false
      var started = false
      var k = 0
      while (k < frames) {
        val v = u16(bytes, dataOff + (k * channels) * 2).toShort.toInt
        if (v != 0) {
          val pos = v > 0
          if (started && pos != prevPos) z += 1
          prevPos = pos
          started = true
        }
        k += 1
      }
      z
    }

  /** Single-bin DFT powers at each of `freqsHz` over channel 0 — the
    * Goertzel algorithm (Goertzel 1958, the standard tone-detection
    * kernel; the DTMF decoder's workhorse), run as a BANK: one pass
    * over the samples updates every probe's resonator state, so B
    * probes cost one header parse and one sample scan, not B+1.
    * Double-valued, so consumers should COMPARE powers (argmax) rather
    * than export raw magnitudes to an oracle. */
  def wavGoertzelPowers(bytes: Array[Byte], freqsHz: Seq[Double])
      : Option[Array[Double]] =
    wavGeom(bytes).map { case (rate, channels, dataOff, n) =>
      val frames = n / channels
      val b = freqsHz.length
      val coeff = new Array[Double](b)
      var j = 0
      while (j < b) {
        coeff(j) = 2.0 * math.cos(2.0 * math.Pi * freqsHz(j) / rate)
        j += 1
      }
      val s1 = new Array[Double](b)
      val s2 = new Array[Double](b)
      var k = 0
      while (k < frames) {
        val v = u16(bytes, dataOff + (k * channels) * 2).toShort.toInt
        j = 0
        while (j < b) {
          val s0 = v + coeff(j) * s1(j) - s2(j)
          s2(j) = s1(j)
          s1(j) = s0
          j += 1
        }
        k += 1
      }
      Array.tabulate(b)(i =>
        s1(i) * s1(i) + s2(i) * s2(i) - coeff(i) * s1(i) * s2(i))
    }

  /** Single-probe convenience over [[wavGoertzelPowers]]. */
  def wavGoertzelPower(bytes: Array[Byte], freqHz: Double)
      : Option[Double] =
    wavGoertzelPowers(bytes, Seq(freqHz)).map(_(0))

  // ----------------------------------------------- AVI (MJPEG in RIFF)

  /** Validated MJPEG/AVI geometry. */
  final case class AviSummary(width: Int, height: Int, nFrames: Int,
      fps: Int)

  /** Encode a minimal strict MJPEG/AVI (RIFF — the WAV parser's
    * container family; AVI layout per the public RIFF/AVI spec):
    * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' 00dc...))`, one 'vids'/'MJPG' stream, each frame an
    * intact JPEG. Fixture/test support for [[aviMjpegFrames]], same
    * role as [[encodeJpeg]] for the image path. */
  def encodeAviMjpeg(width: Int, height: Int,
      frames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty)
    require(frames.forall(f => f.length >= 3 && (f(0) & 0xff) == 0xff &&
      (f(1) & 0xff) == 0xd8 && (f(2) & 0xff) == 0xff),
      "every AVI frame must be a JPEG payload")
    val bos = new GrowBuf
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def fourcc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def chunk(id: String)(body: => Unit): Unit = {
      fourcc(id)
      val sizeAt = bos.size; w32(0)
      body
      val sz = bos.size - sizeAt - 4
      if ((sz & 1) == 1) bos.write(0) // word alignment
      bos.patch32(sizeAt, sz)
    }
    def list(tpe: String)(body: => Unit): Unit =
      chunk("LIST") { fourcc(tpe); body }
    val maxFrame = frames.map(_.length).max
    chunk("RIFF") {
      fourcc("AVI ")
      list("hdrl") {
        chunk("avih") {
          w32(1000000 / fps); w32(maxFrame * fps); w32(0)
          w32(0) // dwFlags: no idx1 is written, so no AVIF_HASINDEX
          w32(frames.length); w32(0); w32(1); w32(maxFrame)
          w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
        }
        list("strl") {
          chunk("strh") {
            fourcc("vids"); fourcc("MJPG")
            w32(0); w32(0); w32(0)
            w32(1); w32(fps) // scale / rate
            w32(0); w32(frames.length); w32(maxFrame)
            w32(-1); w32(0)
            w16(0); w16(0); w16(width); w16(height) // rcFrame
          }
          chunk("strf") { // BITMAPINFOHEADER
            w32(40); w32(width); w32(height)
            w16(1); w16(24)
            fourcc("MJPG")
            w32(width * height * 3); w32(0); w32(0); w32(0); w32(0)
          }
        }
      }
      list("movi") {
        frames.foreach(f => chunk("00dc") { bos.write(f) })
      }
    }
    bos.toByteArray
  }

  /** Growable byte buffer with random-access size back-patching (the
    * RIFF writer closes nested chunks after their bodies are known). */
  private final class GrowBuf {
    private var arr = new Array[Byte](256)
    var size = 0
    private def ensure(n: Int): Unit =
      if (size + n > arr.length)
        arr = java.util.Arrays.copyOf(arr,
          math.max(arr.length * 2, size + n))
    def write(b: Int): Unit = { ensure(1); arr(size) = b.toByte; size += 1 }
    def write(bs: Array[Byte]): Unit = {
      ensure(bs.length)
      System.arraycopy(bs, 0, arr, size, bs.length)
      size += bs.length
    }
    def patch32(at: Int, v: Int): Unit = put32(arr, at, v)
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(arr, size)
  }

  /** Strict MJPEG/AVI demux: the frame JPEGs plus validated geometry,
    * None on ANY structural mismatch — wrong magic, non-'vids' or
    * non-'MJPG' stream, chunk overrun, a movi entry that is not an
    * intact JPEG, or a frame count disagreeing with the header. The
    * frames feed [[decodeJpegImage]] / [[jpegDHash64]] unchanged —
    * this parser only walks the container. */
  def aviMjpegFrames(bytes: Array[Byte])
      : Option[(AviSummary, IndexedSeq[Array[Byte]])] = {
    if (bytes == null || bytes.length < 12) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F') return None
    val riffSz = i32(bytes, 4)
    if (riffSz < 4 || 8 + riffSz > bytes.length) return None
    if (bytes(8) != 'A' || bytes(9) != 'V' || bytes(10) != 'I' ||
        bytes(11) != ' ') return None
    var width = -1; var height = -1; var total = -1; var fps = -1
    var vidsMjpg = false
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def fcc(at: Int): String = new String(bytes, at, 4, "US-ASCII")
    // returns false on any structural violation
    def walk(from: Int, to: Int, inHdrl: Boolean, inStrl: Boolean,
        inMovi: Boolean): Boolean = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fcc(pos)
        val sz = i32(bytes, pos + 4)
        // Long arithmetic: a crafted sz near Int.MaxValue must fail the
        // bound check, not wrap it negative and walk pos out of range
        if (sz < 0 || 8L + sz > (to - pos).toLong) return false
        val body = pos + 8
        if (id == "LIST") {
          if (sz < 4) return false
          val tpe = fcc(body)
          val ok = tpe match {
            case "hdrl" => walk(body + 4, body + sz, true, false, false)
            case "strl" if inHdrl =>
              walk(body + 4, body + sz, false, true, false)
            case "movi" => walk(body + 4, body + sz, false, false, true)
            case _ => true // INFO etc.: structurally walked, ignored
          }
          if (!ok) return false
        } else if (id == "avih" && inHdrl) {
          if (sz < 40) return false
          val usPerFrame = i32(bytes, body)
          if (usPerFrame > 0) fps = math.max(1, 1000000 / usPerFrame)
          total = i32(bytes, body + 16)
          if (i32(bytes, body + 24) != 1) return false // exactly 1 stream
          width = i32(bytes, body + 32)
          height = i32(bytes, body + 36)
        } else if (id == "strh" && inStrl) {
          if (sz < 8) return false
          if (fcc(body) != "vids" || fcc(body + 4) != "MJPG") return false
          vidsMjpg = true
        } else if (id == "strf" && inStrl) {
          if (sz < 20 || fcc(body + 16) != "MJPG") return false
        } else if ((id == "00dc" || id == "00db") && inMovi) {
          if (sz < 3 || (bytes(body) & 0xff) != 0xff ||
              (bytes(body + 1) & 0xff) != 0xd8 ||
              (bytes(body + 2) & 0xff) != 0xff) return false
          frames += java.util.Arrays.copyOfRange(bytes, body, body + sz)
        }
        pos += 8 + sz + (sz & 1)
      }
      true
    }
    if (!walk(12, 8 + riffSz, false, false, false)) return None
    if (!vidsMjpg || width <= 0 || height <= 0 || fps <= 0) return None
    if (width > (1 << 20) || height > (1 << 20)) return None
    if (total != frames.length || frames.isEmpty) return None
    Some((AviSummary(width, height, frames.length, fps), frames.toIndexedSeq))
  }

  // ------------------------------------------------- feature dispatch

  /** Kind tags leading the feature vector, so downstream consumers can
    * route on feature(0) without re-sniffing payload bytes. */
  val KindStub = 0f
  val KindImage = 1f
  val KindAudio = 2f

  /** Real decode dispatch: BMP/PNG/JPEG → [1, w, h, sumR, sumG, sumB],
    * WAV → [2, rate, channels, frames, sumAbs, maxAbs], anything
    * else → None (caller falls back to the stub histogram). Sums are
    * exact in Float up to 2^24 — beyond that they are approximate
    * feature values, which is what a feature vector is. */
  def decodeFeatures(payload: Array[Byte]): Option[Array[Float]] =
    decodeBmp24(payload).orElse(decodePng(payload))
      .orElse(decodeJpeg(payload)).map { b =>
      Array(KindImage, b.width.toFloat, b.height.toFloat,
        b.sumR.toFloat, b.sumG.toFloat, b.sumB.toFloat)
    }.orElse(decodeWavPcm16(payload).map { w =>
      Array(KindAudio, w.sampleRate.toFloat, w.channels.toFloat,
        w.nFrames.toFloat, w.sumAbs.toFloat, w.maxAbs.toFloat)
    })
}
