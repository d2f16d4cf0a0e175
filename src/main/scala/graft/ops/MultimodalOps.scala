package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.fetch.ImageCodec

/** Multimodal-column operators: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata (the input_hint table
  * shape); per-row transforms run as Scala UDFs / mapPartitions — the
  * JVM-side equivalent of `mapInPandas` batch UDFs.
  *
  * Image decode/resize/histogram are REAL (in-JDK javax.imageio —
  * the one image stack present in this container). Audio/video
  * decoders do not exist here, so `frameSampleStub` is a clearly
  * marked deterministic placeholder that keeps the Spark-side plumbing
  * (schema, batching, partitioning) real and tested; a production
  * build swaps the stub body for ffmpeg/soundfile bindings.
  */
object MultimodalOps {

  /** (w, h) of an encoded image, or null when undecodable — decode
    * failures must not kill a 100 TB scan. */
  val decodeDims: Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) null else Array(img.getWidth, img.getHeight)
      } catch { case _: Exception => null }
    })
    c => u(c)
  }

  /** Bilinear resize to (w2, h2), re-encoded as PNG. */
  def resizeUdf(w2: Int, h2: Int): Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val src = ImageIO.read(new ByteArrayInputStream(bytes))
        if (src == null) null
        else {
          val dst = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w2, h2, null)
          g.dispose()
          val px = new Array[Byte](w2 * h2)
          dst.getRaster.getDataElements(0, 0, w2, h2, px)
          ImageCodec.encode(px, w2, h2, "png")
        }
      } catch { case _: Exception => null }
    })
    c => u(c)
  }

  /** `bins`-bucket grayscale histogram — the feature-extraction shape
    * (decode → reduce to a small vector). */
  def grayHistogram(bins: Int): Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val (_, _, px) = ImageCodec.decode(bytes)
        val hist = new Array[Long](bins)
        var i = 0
        while (i < px.length) {
          hist(((px(i) & 0xff) * bins) / 256) += 1L
          i += 1
        }
        hist
      } catch { case _: Exception => null }
    })
    c => u(c)
  }

  /** Mean/stddev of decoded pixels (quality/brightness signal). */
  val pixelStats: Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val (_, _, px) = ImageCodec.decode(bytes)
        var s = 0.0; var s2 = 0.0
        px.foreach { b => val v = (b & 0xff).toDouble; s += v; s2 += v * v }
        val n = px.length.toDouble
        val mean = s / n
        Array(mean, math.sqrt(math.max(0, s2 / n - mean * mean)))
      } catch { case _: Exception => null }
    })
    c => u(c)
  }

  /** STUB — deterministic frame sampler for video-shaped binary
    * columns. No video codec exists in this container: a real build
    * replaces the body with an ffmpeg-backed extractor keeping this
    * exact signature (binary, everyNth) → array<binary> of "frames".
    * The stub slices the payload into fixed 1 KiB pseudo-frames so the
    * downstream schema/batch plumbing is exercised for real. */
  def frameSampleStub(everyNth: Int): Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else {
        val frameSize = 1024
        val nFrames = math.max(1, bytes.length / frameSize)
        (0 until nFrames by everyNth)
          .map(i => java.util.Arrays.copyOfRange(bytes, i * frameSize,
            math.min(bytes.length, (i + 1) * frameSize)))
          .toArray
      }
    })
    c => u(c)
  }

  /** 64-bit perceptual hash column ([[ImageCodec.dhash]]) — decode
    * failures → null (filtered by callers), never a task failure. */
  val dhashUdf: Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val (w, h, px) = ImageCodec.decode(bytes)
        ImageCodec.dhash(px, w, h): java.lang.Long
      } catch { case _: Exception => null }
    })
    c => u(c)
  }

  /** Perceptual near-duplicate image pairs: dHash per image map-side
    * (the heavy decode runs exactly once per row, and only the 8-byte
    * sketch + id ever shuffle — payload bytes stay in their scan
    * partitions, the PayloadStage rule), then banded Hamming pairing
    * via [[DedupOps.hammingPairs64]] — no n² comparison at any scale.
    * Catches re-encoded / lightly-noised / brightness-shifted copies
    * that the exact pixel `phash` cannot. */
  def imageNearDup(images: DataFrame, idCol: String, bytesCol: String,
      maxDist: Int = 4): DataFrame =
    DedupOps.hammingPairs64(
      images.select(col(idCol).as("id"),
          dhashUdf(col(bytesCol)).as("dh"))
        .filter(col("dh").isNotNull),
      "id", "dh", maxDist)

  /** Append a batch of images to a persisted perceptual-sketch index
    * ([[SketchIndex]], `SketchIndex.init(dir, maxDist)` once first):
    * each payload is decoded + dHashed exactly ONCE, ever — the index
    * stores chunk rows, so settled images are never re-decoded (the
    * dominant cost of the batch path at corpus scale). Undecodable
    * payloads are dropped, as in [[imageNearDup]]. `runId` makes
    * streaming replays idempotent. */
  def imageIndexAppend(images: DataFrame, idCol: String,
      bytesCol: String, dir: String, runId: String = "")
      : SketchIndex.Meta =
    SketchIndex.append(
      images.select(col(idCol).as("id"), dhashUdf(col(bytesCol)).as("dh"))
        .filter(col("dh").isNotNull),
      "id", "dh", dir, runId)

  /** Perceptual near-dup pairs a NEW image batch introduces against
    * everything already indexed (plus within-batch pairs) — decodes
    * ONLY the batch; the corpus side streams its persisted chunk rows
    * map-side. Probe first, then [[imageIndexAppend]]. */
  def imageIndexProbe(newImages: DataFrame, idCol: String,
      bytesCol: String, dir: String): DataFrame =
    SketchIndex.probePairs(
      newImages.select(col(idCol).as("id"),
          dhashUdf(col(bytesCol)).as("dh"))
        .filter(col("dh").isNotNull),
      "id", "dh", dir)

  /** One-call image curation: perceptual near-dup pairs resolved
    * transitively ([[DedupOps.connectedComponents]]), keeping the
    * minimum-id image of every duplicate cluster plus all unpaired
    * images. The pair/cluster dataflow shuffles only (id, 8-byte
    * dHash) tuples; the final anti-join keys on ids alone, so AQE
    * broadcasts the loser set whenever it fits and payload bytes never
    * shuffle. For a corpus whose loser set outgrows broadcast, run
    * this over the (id, bytes) scan and let the shuffled anti-join
    * move payloads ONCE — or anti-join a metadata projection and
    * recover payloads by partition-pruned scan. */
  def imageDedupSurvivors(images: DataFrame, idCol: String,
      bytesCol: String, maxDist: Int = 4): DataFrame =
    DedupOps.dedupSurvivors(images, idCol,
      imageNearDup(images, idCol, bytesCol, maxDist))

  /** All per-image features from ONE decode. The composable single-
    * feature columns above ([[decodeDims]], [[grayHistogram]],
    * [[pixelStats]]) each decode the payload; at corpus scale the
    * decode dominates, so the canonical feature job must not pay it
    * per feature — three decodes per row tripled the dominant cost. */
  private val allFeaturesUdf = udf((bytes: Array[Byte]) => {
    try {
      val (w, h, px) = ImageCodec.decode(bytes)
      val hist = new Array[Long](16)
      var s = 0.0; var s2 = 0.0
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        hist((v * 16) / 256) += 1L
        s += v; s2 += v.toDouble * v
        i += 1
      }
      val n = px.length.toDouble
      val mean = s / n
      (w, h, hist, mean, math.sqrt(math.max(0, s2 / n - mean * mean)))
    } catch { case _: Exception => null }
  })

  /** LAION/DataComp-style image quality filter (Schuhmann et al.
    * arXiv:2210.08402 §2.2 filter on minimum dimension and aspect
    * ratio; the contrast floor rejects blank/flat payloads): keeps an
    * image iff it decodes, `min(w,h) >= minDim`, aspect ratio
    * `max/min <= maxAspect`, and pixel stddev `>= minStd`. Returns the
    * input plus feature columns (`decoded`, `dec_w`, `dec_h`,
    * `px_std`) and the `keep` flag — callers filter or route.
    *
    * One decode per row (shares [[imageFeatures]]' single-decode UDF);
    * undecodable payloads yield `keep=false`, never an exception — a
    * 100 TB scan must survive corrupt bytes. Map-side only: no
    * shuffle, payload bytes never leave their partition. */
  def imageQualityFilter(images: DataFrame, minDim: Int = 32,
      maxAspect: Double = 3.0, minStd: Double = 5.0): DataFrame = {
    images
      .withColumn("ft", allFeaturesUdf(col("bytes")))
      .withColumn("decoded", col("ft").isNotNull)
      .withColumn("dec_w", col("ft._1"))
      .withColumn("dec_h", col("ft._2"))
      .withColumn("px_std", col("ft._5"))
      .withColumn("keep", coalesce(
        col("decoded") &&
          least(col("dec_w"), col("dec_h")) >= minDim &&
          (greatest(col("dec_w"), col("dec_h")).cast("double") /
            least(col("dec_w"), col("dec_h"))) <= maxAspect &&
          col("px_std") >= minStd,
        lit(false)))
      .drop("ft")
  }

  /** Feature table for an image table (input_hint schema): dims from
    * the real decode, 16-bin histogram, pixel stats — the canonical
    * multimodal feature-extraction job. One decode per row. */
  def imageFeatures(images: DataFrame): DataFrame = {
    images
      .withColumn("ft", allFeaturesUdf(col("bytes")))
      .select(col("image_id"), col("fmt"),
        col("ft._1").as("dec_w"),
        col("ft._2").as("dec_h"),
        col("w"), col("h"),
        col("ft._3").as("hist16"),
        round(col("ft._4"), 4).as("px_mean"),
        round(col("ft._5"), 4).as("px_std"))
  }
}
