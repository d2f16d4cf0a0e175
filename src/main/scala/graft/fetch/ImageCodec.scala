package graft.fetch

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.url.Hashing

/** Deterministic grayscale image encode/decode + PSNR.
  *
  * Backs the input_hint payload contract: `bytes` is a real encoded
  * image (PNG/BMP lossless, JPEG lossy), `phash` = xxh64 of the
  * decoded pixels, and the per-row invariant is PSNR ≥ 40 dB for
  * lossy / bit-exact for lossless vs the generator's pixels
  * (BASELINE.json.input_hint; magic-byte validation mirrors
  * reference portal_saude_mg.py:551-556).
  *
  * Uses only in-JDK javax.imageio (java.desktop, headless-safe for
  * these formats) — no external image libraries exist in this
  * environment. Synthetic pixels are smooth 2-D cosine fields (JPEG
  * retains ≥40 dB on smooth content; white noise would not).
  */
object ImageCodec {

  /** Deterministic smooth pixel field keyed by `key`: a DC level plus
    * three low-frequency cosine terms with seeded phases/amplitudes. */
  def synthPixels(key: Long, w: Int, h: Int): Array[Byte] = {
    val dc = 96 + Hashing.draw(key, 1, 64) // 96..159
    val a1 = 20 + Hashing.draw(key, 2, 30)
    val a2 = 10 + Hashing.draw(key, 3, 20)
    val a3 = 5 + Hashing.draw(key, 4, 10)
    val fx1 = 1 + Hashing.draw(key, 5, 3)
    val fy1 = 1 + Hashing.draw(key, 6, 3)
    val fx2 = 1 + Hashing.draw(key, 7, 5)
    val fy2 = 1 + Hashing.draw(key, 8, 5)
    val p1 = Hashing.draw(key, 9, 628) / 100.0
    val p2 = Hashing.draw(key, 10, 628) / 100.0
    // cos(a±b) = cos a cos b ∓ sin a sin b with per-axis tables: O(w+h)
    // trig calls instead of 3 per pixel (the fetch stage encodes tens of
    // millions of pixels per bench run)
    val cx1 = new Array[Double](w); val sx1 = new Array[Double](w)
    val cx2 = new Array[Double](w); val sx2 = new Array[Double](w)
    val cx3 = new Array[Double](w); val sx3 = new Array[Double](w)
    var x = 0
    while (x < w) {
      val u = 2 * math.Pi * x / w
      cx1(x) = a1 * math.cos(fx1 * u + p1); sx1(x) = a1 * math.sin(fx1 * u + p1)
      cx2(x) = a2 * math.cos(fx2 * u + p2); sx2(x) = a2 * math.sin(fx2 * u + p2)
      cx3(x) = a3 * math.cos(u); sx3(x) = a3 * math.sin(u)
      x += 1
    }
    val cy1 = new Array[Double](h); val sy1 = new Array[Double](h)
    val cy2 = new Array[Double](h); val sy2 = new Array[Double](h)
    val cy3 = new Array[Double](h); val sy3 = new Array[Double](h)
    var yy = 0
    while (yy < h) {
      val v = 2 * math.Pi * yy / h
      cy1(yy) = math.cos(fy1 * v); sy1(yy) = math.sin(fy1 * v)
      cy2(yy) = math.cos(fy2 * v); sy2(yy) = math.sin(fy2 * v)
      cy3(yy) = math.cos(v); sy3(yy) = math.sin(v)
      yy += 1
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      // row-invariant factors hoisted to locals (same multiply order,
      // bit-identical doubles — just no per-pixel array reads for the
      // y-axis tables)
      val c1 = cy1(y); val s1 = sy1(y)
      val c2 = cy2(y); val s2 = sy2(y)
      val c3 = cy3(y); val s3 = sy3(y)
      var i = y * w
      var xx = 0
      while (xx < w) {
        val g = dc +
          (cx1(xx) * c1 - sx1(xx) * s1) + // cos(fx1·u+p1+fy1·v)
          (cx2(xx) * c2 + sx2(xx) * s2) + // cos(fx2·u+p2−fy2·v)
          (cx3(xx) * c3 - sx3(xx) * s3) // cos(u+v)
        out(i) = math.max(0, math.min(255, math.round(g))).toByte
        xx += 1; i += 1
      }
      y += 1
    }
    out
  }

  private def toImage(pixels: Array[Byte], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    img
  }

  // per-thread JPEG writer: ImageIO's registry lookup synchronizes
  // globally and would serialize 32 executor threads (measured: 0.61
  // scaling efficiency before this cache); ImageWriter instances are
  // not thread-safe, hence ThreadLocal
  private val jpegWriter =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("jpeg").next())

  /** Encode gray pixels as `fmt` ∈ {png, bmp, jpeg}. PNG/BMP use
    * lock-free from-scratch encoders (zlib/CRC32 from java.util.zip);
    * JPEG uses the in-JDK codec at fixed 0.95 quality for a
    * deterministic, ≥40 dB round-trip on smooth fields. */
  def encode(pixels: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] =
    fmt match {
      case "png" => encodePng(pixels, w, h)
      case "bmp" => encodeBmp(pixels, w, h)
      case "jpeg" =>
        val bos = new ByteArrayOutputStream()
        val writer = jpegWriter.get()
        // direct stream: ImageIO.createImageOutputStream consults the
        // globally-synchronized IIORegistry on every call and
        // serializes 32 executor threads
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.95f)
        writer.write(null, new IIOImage(toImage(pixels, w, h), null, null), p)
        ios.close()
        val enc = bos.toByteArray
        // P3 floor (see encodePng): trailing bytes after EOI are
        // ignored by JPEG decoders
        if (enc.length >= 1024) enc
        else enc ++ Array.fill[Byte](1024 - enc.length)('p'.toByte)
      case other => throw new IllegalArgumentException(s"fmt: $other")
    }

  // per-thread Deflater, reset per image: construction/end allocate a
  // native zlib stream each call; reset() + identical input at the
  // same level produces identical bytes (zlib is deterministic), so
  // payload content is unchanged
  private val pngDeflater =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(6))

  /** Minimal 8-bit grayscale PNG (color type 0, filter 0 per
    * scanline, one zlib-deflated IDAT) — the published PNG format,
    * nothing shared between threads. */
  private[fetch] def encodePng(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1280 + px.length / 8)
    bos.write(Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = body.length
      bos.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val crc = new java.util.zip.CRC32()
      val tagB = tag.getBytes("US-ASCII")
      crc.update(tagB); crc.update(body)
      bos.write(tagB); bos.write(body)
      val c = crc.getValue
      bos.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    // scanlines with filter byte 0
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      System.arraycopy(px, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val deflater = pngDeflater.get()
    deflater.reset()
    deflater.setInput(raw); deflater.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    chunk("IDAT", out.toByteArray)
    // keep every payload above the 1 KiB validity floor (P3): very
    // smooth small images deflate below it — pad with an ancillary
    // tEXt chunk (ignored by decoders, deterministic content)
    val sizeSoFar = bos.size() + 12 // + IEND
    if (sizeSoFar < 1024) {
      val key = "Comment".getBytes("US-ASCII") :+ 0.toByte
      chunk("tEXt", key ++ Array.fill[Byte](1024 - sizeSoFar)('p'.toByte))
    }
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Minimal 8-bit BMP (BITMAPINFOHEADER + 256-gray palette,
    * bottom-up rows padded to 4 bytes) — the published BMP format. */
  private[fetch] def encodeBmp(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowSize = (w + 3) & ~3
    val dataOffset = 14 + 40 + 256 * 4
    val fileSize = dataOffset + rowSize * h
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(dataOffset)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(8)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835)
      .putInt(256).putInt(0)
    var i = 0
    while (i < 256) { // BGRA gray palette
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    var y = h - 1
    while (y >= 0) { // bottom-up
      b.put(px, y * w, w)
      var pad = w
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  /** Decode our 8-bit gray BMP exactly (ImageIO's palette→gray
    * conversion is not guaranteed identity; ours is). */
  private def decodeBmpGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val w = b.getInt(18)
    val h = b.getInt(22)
    val rowSize = (w + 3) & ~3
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(bytes, dataOffset + (h - 1 - y) * rowSize,
        out, y * w, w)
      y += 1
    }
    (w, h, out)
  }

  // per-thread decoders, same rationale as jpegWriter: ImageIO.read's
  // registry lookup + stream-SPI scan synchronize globally per call;
  // the JDK registers exactly one reader per format, so binding it
  // once per thread decodes bit-identically without the global lock
  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("png").next())
  private val jpegReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("jpeg").next())

  /** Decode back to gray pixels (w*h bytes, row-major). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (bytes.length > 2 && bytes(0) == 'B' && bytes(1) == 'M')
      return decodeBmpGray(bytes)
    val img =
      if (bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
        val r = pngReader.get()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try { r.setInput(iis); r.read(0) }
        finally { r.setInput(null); iis.close() }
      } else if (bytes.length > 2 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8) {
        val r = jpegReader.get()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        try { r.setInput(iis); r.read(0) }
        finally { r.setInput(null); iis.close() }
      } else ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val gg = g.createGraphics(); gg.drawImage(img, 0, 0, null); gg.dispose()
        g
      }
    val out = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, out)
    (w, h, out)
  }

  /** Peak signal-to-noise ratio between two equal-size gray buffers;
    * Double.PositiveInfinity when identical. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "pixel buffers differ in size")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * a.length / se)
  }

  /** Content fingerprint = xxh64 over decoded pixels (input_hint
    * `phash`). */
  def phash(pixels: Array[Byte]): Long =
    Hashing.xxh64(pixels, Hashing.SparkSeed)

  /** 64-bit perceptual difference hash (dHash, the published
    * average/difference-hash family): box-downscale the gray image to
    * a 9×8 grid of cell means and emit one bit per horizontal
    * neighbor comparison (8 rows × 8 comparisons). Near-duplicate
    * images — re-encoded, lightly noised, brightness-shifted — land
    * within a few bits of Hamming distance, while unrelated images
    * differ in ~32; `phash` (exact pixel hash) catches none of those.
    * Integer-exact: cell means are compared as cross-multiplied Long
    * sums, so the hash is bit-stable across partitionings and JVMs
    * (no floating-point rounding). */
  def dhash(pixels: Array[Byte], w: Int, h: Int): Long = {
    val gw = 9; val gh = 8
    val sums = new Array[Long](gh * gw)
    val cnts = new Array[Long](gh * gw)
    var y = 0
    while (y < h) {
      val gy = y * gh / h
      val row = y * w
      var x = 0
      while (x < w) {
        val cell = gy * gw + x * gw / w
        sums(cell) += (pixels(row + x) & 0xff)
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var i = 0
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val l = gy * gw + gx
        // mean(l) > mean(l+1)  ⇔  sumL·cntR > sumR·cntL (exact)
        if (sums(l) * cnts(l + 1) > sums(l + 1) * cnts(l)) bits |= 1L << i
        i += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Horizontal mirror of a row-major gray image (x → w−1−x) — the
    * geometric normalization behind mirror-aware perceptual dedup:
    * `dhash(mirror(px))` of a flipped copy equals `dhash(px)` of the
    * original bit-for-bit when the copy round-trips a lossless codec
    * (mirror is an involution), and lands within a few Hamming bits
    * under lossy re-encode. Pure pixel shuffle, no resampling. */
  def mirror(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](pixels.length)
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        out(row + x) = pixels(row + (w - 1 - x))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Magic-byte payload validation (P3): size ≥ 1024 B and a magic
    * matching the claimed format — the image-domain analogue of the
    * reference's `%PDF-` check (portal_saude_mg.py:539-561). */
  def validMagic(bytes: Array[Byte], fmt: String): Boolean = {
    if (bytes == null || bytes.length < 1024) return false
    fmt match {
      case "png" =>
        bytes.length > 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G'
      case "jpeg" =>
        bytes.length > 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
      case "bmp" => bytes.length > 2 && bytes(0) == 'B' && bytes(1) == 'M'
      case _ => false
    }
  }
}
