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
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = 2 * math.Pi * x / w
        val v = 2 * math.Pi * y / h
        val g = dc +
          a1 * math.cos(fx1 * u + fy1 * v + p1) +
          a2 * math.cos(fx2 * u - fy2 * v + p2) +
          a3 * math.cos(u + v)
        out(y * w + x) = math.max(0, math.min(255, math.round(g))).toByte
        x += 1
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

  /** Encode gray pixels as `fmt` ∈ {png, bmp, jpeg}. JPEG uses a fixed
    * 0.95 quality for a deterministic, ≥40 dB round-trip on smooth
    * fields. */
  def encode(pixels: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = toImage(pixels, w, h)
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "jpeg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.95f)
        writer.write(null, new IIOImage(img, null, null), p)
        writer.dispose(); ios.close()
      case f =>
        ImageIO.write(img, f, bos)
    }
    bos.toByteArray
  }

  /** Decode back to gray pixels (w*h bytes, row-major). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
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
