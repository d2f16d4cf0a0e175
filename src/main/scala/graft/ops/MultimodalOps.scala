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

  /** Plain + mirrored dHash from ONE decode (the decode dominates at
    * corpus scale — a separate mirror pass would double it). */
  private val dhashBothUdf: Column => Column = {
    val u = udf((bytes: Array[Byte]) => {
      try {
        val (w, h, px) = ImageCodec.decode(bytes)
        Some((ImageCodec.dhash(px, w, h),
          ImageCodec.dhash(ImageCodec.mirror(px, w, h), w, h)))
      } catch { case _: Exception => None }
    })
    c => u(c)
  }

  /** Mirror-aware perceptual near-duplicate pairs: [[imageNearDup]]
    * additionally catching HORIZONTALLY FLIPPED copies — the cheapest
    * and most common transform that defeats a plain dHash (the
    * horizontal-gradient bits all reverse, pushing Hamming to ~32).
    * Each image gets TWO 64-bit sketches from one decode — `dh` of
    * the pixels and `dhm` of their mirror — and ONE banding pass
    * pairs both channels at once: ids are channel-encoded (`2·id`
    * plain, `2·id+1` mirrored) into [[DedupOps.hammingPairs64]], then
    * decoded. A cross-channel hit (a's mirror sketch near b's plain
    * sketch, either direction) means b is a flipped copy of a;
    * mirror–mirror hits duplicate plain–plain information and are
    * dropped, as are self-pairs (an image pairing its own mirror =
    * left-right symmetry, not duplication). The encoding doubles
    * ids (`id·2 + channel`) and decodes with arithmetic shift +
    * bit-mask, so NEGATIVE ids (xxhash64 keys, negative half the
    * time) round-trip exactly; only |id| > 2⁶² would overflow.
    *
    * Scale shape: identical to [[imageNearDup]] with 2× the sketch
    * rows — still only (8-byte sketch, id) tuples ever shuffle,
    * payloads decode exactly once and never leave their scan
    * partitions. Returns (id_a, id_b, hamming, mirrored) with
    * id_a < id_b, one row per pair: the minimum-Hamming channel wins,
    * plain preferred on ties (deterministic). */
  def mirrorNearDup(images: DataFrame, idCol: String, bytesCol: String,
      maxDist: Int = 4): DataFrame = {
    val sk = images
      .select(col(idCol).as("id"), dhashBothUdf(col(bytesCol)).as("s"))
      .filter(col("s").isNotNull)
      // channel encoding doubles the id: |id| ≥ 2^62 would wrap and
      // mis-decode (half of such pairs would carry ids that exist
      // nowhere and silently vanish in downstream joins) — fail loudly
      // instead; xxhash64 ids are uniform 64-bit, so callers keying on
      // raw hashes must map to surrogates first (r5 advice finding)
      .select(
        when(abs(col("id")) < lit(1L << 62), col("id"))
          .otherwise(raise_error(concat(
            lit("mirrorNearDup: |id| >= 2^62 cannot be channel-" +
              "encoded; map to surrogate ids first (id="),
            col("id").cast("string"), lit(")")))).as("id"),
        col("s._1").as("dh"), col("s._2").as("dhm"))
    val chan = sk.select((col("id") * 2).as("cid"), col("dh").as("h"))
      .unionByName(
        sk.select((col("id") * 2 + 1).as("cid"), col("dhm").as("h")))
    val raw = DedupOps.hammingPairs64(chan, "cid", "h", maxDist)
    // arithmetic shiftright = floor-div-2 and &1 = channel bit for
    // ANY sign — `div 2`/`% 2` truncate toward zero and would
    // mis-decode negative (hash-keyed) ids
    val decoded = raw.select(
        expr("shiftright(id_a, 1)").as("a"),
        expr("id_a & 1").as("ca"),
        expr("shiftright(id_b, 1)").as("b"),
        expr("id_b & 1").as("cb"),
        col("hamming"))
      .filter(!(col("ca") === 1 && col("cb") === 1))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"),
        col("hamming"), (col("ca") =!= col("cb")).as("mirrored"))
    decoded.groupBy(col("id_a"), col("id_b"))
      .agg(min(struct(col("hamming"),
        col("mirrored").cast("int").as("mi"))).as("best"))
      .select(col("id_a"), col("id_b"),
        col("best.hamming").as("hamming"),
        (col("best.mi") === 1).as("mirrored"))
  }

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

  /** The default aspect-ratio bucket ladder, `(bw, bh)` target shapes
    * (the multi-aspect training trick of NovelAI's public
    * aspect-ratio-bucketing repo, adopted by SDXL — Podell et al.
    * arXiv:2307.01952 App. I): nine ratios from 1:3 to 3:1. Order
    * matters — exact-cost ties resolve to the EARLIEST entry. */
  val defaultAspectLadder: Seq[(Int, Int)] = Seq(
    (64, 64), (128, 96), (96, 128), (96, 64), (64, 96),
    (128, 64), (64, 128), (192, 64), (64, 192))

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** The ladder with each entry's common-denominator multiplier:
    * `(idx, bw, bh, L/bh)` where `L = lcm(all bh)`. Choosing the
    * bucket minimizing the TRUE ratio difference `|w/h − bw/bh|`
    * reduces to an integer argmin: the difference equals
    * `|w·bh − h·bw| / (h·bh)`, `h` is common across buckets, and
    * multiplying the per-bucket fraction `|w·bh − h·bw| / bh` by
    * `L/bh` puts every cost on one shared denominator — so the whole
    * selection is BIGINT compares, bit-identical on any engine.
    * Exposed so the DuckDB oracle can embed the SAME table. */
  def ladderWithMult(ladder: Seq[(Int, Int)] = defaultAspectLadder)
      : Seq[(Int, Int, Int, Long)] = {
    require(ladder.nonEmpty && ladder.forall { case (a, b) => a > 0 && b > 0 })
    val l = ladder.map(_._2.toLong).reduce((a, b) => a / gcd(a, b) * b)
    ladder.zipWithIndex.map { case ((bw, bh), i) => (i, bw, bh, l / bh) }
  }

  /** Nearest aspect-ratio bucket per image — the assignment half of
    * multi-aspect batching. Pure map-side fold over the LITERAL ladder
    * array (whole-stage codegen, no shuffle, no UDF): for each row the
    * exact common-denominator cost (see [[ladderWithMult]]) is
    * minimized with a strict `<`, so ties keep the lowest ladder
    * index deterministically. Payload bytes are never touched — the
    * op projects `(id, w, h)` before any work. Returns the projection
    * plus `(bucket_idx, bucket_w, bucket_h)`. */
  def aspectBucket(images: DataFrame, idCol: String = "image_id",
      wCol: String = "w", hCol: String = "h",
      ladder: Seq[(Int, Int)] = defaultAspectLadder): DataFrame = {
    val entries = ladderWithMult(ladder).map { case (i, bw, bh, mult) =>
      struct(lit(i).as("idx"), lit(bw).as("bw"), lit(bh).as("bh"),
        lit(mult).as("mult"))
    }
    val w = col(wCol).cast("long"); val h = col(hCol).cast("long")
    val best = aggregate(array(entries: _*),
      struct(lit(-1).as("idx"), lit(Long.MaxValue).as("cost"),
        lit(0).as("bw"), lit(0).as("bh")),
      (acc, b) => {
        val c = abs(w * b.getField("bh") - h * b.getField("bw")) *
          b.getField("mult")
        when(c < acc.getField("cost"),
          struct(b.getField("idx").as("idx"), c.as("cost"),
            b.getField("bw").as("bw"), b.getField("bh").as("bh")))
          .otherwise(acc)
      })
    images.select(col(idCol), col(wCol), col(hCol))
      .withColumn("bkt", best)
      .select(col(idCol), col(wCol), col(hCol),
        col("bkt.idx").as("bucket_idx"), col("bkt.bw").as("bucket_w"),
        col("bkt.bh").as("bucket_h"))
  }

  /** Multi-aspect training batches: every image assigned to its
    * nearest-ratio bucket ([[aspectBucket]]) and packed, in `idCol`
    * order within the bucket, into fixed-size batches —
    * `(id, bucket_idx, bucket_w, bucket_h, batch_idx, slot, full)`
    * where `full` marks batches that reached `batchSize` (a training
    * loader drops or pads the ragged tail batch per bucket). Integer
    * division end to end, so the layout is engine- and
    * partitioning-exact.
    *
    * Scale shape: assignment is map-side; packing shuffles ONLY
    * `(id, 3 small ints)` rows on the bucket key (the [[TextOps
    * .packShards]] discipline — both windows share one exchange,
    * payload bytes stay in their scan partitions and are re-joined by
    * id downstream). The ladder has ~10 entries, so per-bucket rank is
    * the one inherently sequential step; at 10^10 rows pack per
    * (bucket × corpus shard) and offset by broadcast shard counts —
    * the cumulative formulation here is that same arithmetic. */
  def aspectBatches(images: DataFrame, idCol: String = "image_id",
      wCol: String = "w", hCol: String = "h", batchSize: Int = 8,
      ladder: Seq[(Int, Int)] = defaultAspectLadder): DataFrame = {
    require(batchSize >= 1)
    val b = aspectBucket(images, idCol, wCol, hCol, ladder)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_idx")).orderBy(col(idCol))
    val cnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_idx"))
    b.withColumn("rn", row_number().over(win))
      .withColumn("n_bucket", count(lit(1)).over(cnt))
      .select(col(idCol), col("bucket_idx"), col("bucket_w"),
        col("bucket_h"),
        expr(s"CAST((rn - 1) DIV $batchSize AS BIGINT)").as("batch_idx"),
        expr(s"CAST((rn - 1) % $batchSize AS BIGINT)").as("slot"),
        expr(s"((rn - 1) DIV $batchSize + 1) * $batchSize <= n_bucket")
          .as("full"))
  }

  /** Template/watermark caption filter (the LAION-2B curation step —
    * Schuhmann et al. arXiv:2210.08402 §2.2 drop exact-duplicate
    * captions past a frequency bound: "thumbnail", SEO boilerplate and
    * stock-photo watermarks caption thousands of distinct images and
    * teach a caption model nothing). A caption is a template when its
    * whitespace-normalized form captions `>= maxFreq` rows. Returns
    * `(id, caption_n, template)` — callers anti-join or filter.
    *
    * Scale shape: normalization + md5 are map-side; the frequency
    * count and the verdict join both key on the 16-byte hash, so
    * caption TEXT (and a fortiori payload bytes) never enters any
    * exchange — the count side is an aggregate of distinct-caption
    * cardinality that AQE broadcasts when it fits. The flag is an
    * integer compare, engine-exact. */
  def captionTemplateFilter(images: DataFrame, idCol: String = "image_id",
      captionCol: String = "caption", maxFreq: Int = 3): DataFrame = {
    require(maxFreq >= 2)
    val norm = trim(regexp_replace(col(captionCol), "\\s+", " "))
    val keyed = images.select(col(idCol),
      md5(norm.cast("binary")).as("ch"))
    val counts = keyed.groupBy(col("ch"))
      .agg(count(lit(1)).cast("long").as("caption_n"))
    keyed.join(counts, Seq("ch"))
      .select(col(idCol), col("caption_n"),
        (col("caption_n") >= maxFreq).as("template"))
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
