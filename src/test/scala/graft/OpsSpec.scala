package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{AnnOps, DedupOps, MultimodalOps, TextOps}
import graft.fetch.ImageCodec

class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("minhash-LSH finds planted near-dups, no random false pairs") {
    val planted = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" documento duplicado")))
    val pairs = DedupOps.minhashPairs(docs.unionByName(planted),
      "doc_id", "text", threshold = 0.5).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 20).map(i => (i.toLong, i + 1000000L)).toSet
    // all planted pairs found (suffix edit keeps Jaccard ≫ 0.5)
    assert((expected -- found).isEmpty,
      s"missed planted pairs: ${expected -- found}")
    // every reported pair is a REAL near-dup: re-verify exact Jaccard
    // directly (the low-entropy synthetic corpus contains genuine
    // near-duplicates beyond the planted ones — those are true hits)
    val texts = docs.unionByName(planted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    found.foreach { case (a, b) =>
      val j = DedupOps.jaccard(
        DedupOps.shingles(texts(a), 5), DedupOps.shingles(texts(b), 5))
      assert(j >= 0.5, s"pair ($a,$b) reported with true jaccard $j < 0.5")
    }
  }

  test("exact dedup groups identical texts on a 128-bit key, keeps lowest id") {
    import spark.implicits._
    val copies = docs.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val d = DedupOps.exactDedup(docs.unionByName(copies), "doc_id", "text")
    // every copied text groups with its original under the lowest id
    val dupGroups = d.filter($"n_dupes" >= 2)
    assert(dupGroups.count() >= 5)
    assert(dupGroups.filter($"keep_id" >= 1000000L).count() === 0)
    // the key is the 128-bit md5 hex digest, not a 64-bit hash
    val key = d.select("content_hash").as[String].head()
    assert(key.length === 32 && key.matches("[0-9a-f]{32}"))
  }

  test("simhash finds planted near-dups within hamming 3") {
    val planted = docs.orderBy("doc_id").limit(10)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" x")))
    val pairs = DedupOps.simhashPairs(docs.unionByName(planted),
      "doc_id", "text", maxDist = 6).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, i + 1000000L)).toSet
    assert((expected -- found).isEmpty,
      s"missed planted simhash pairs: ${expected -- found}")
  }

  test("dhash: brightness-shift invariant, noise-stable, discriminative across images") {
    val w = 120; val h = 90
    val px = ImageCodec.synthPixels(0x1234L, w, h)
    val d0 = ImageCodec.dhash(px, w, h)
    // global brightness shift (in-range for the synthetic field's
    // 36..219 span) preserves every cell-mean ORDER comparison
    val brighter = px.map(b => math.min(255, (b & 0xff) + 10).toByte)
    assert(ImageCodec.dhash(brighter, w, h) === d0)
    // jpeg re-encode round-trip stays within a few bits
    val jpg = ImageCodec.encode(px, w, h, "jpeg")
    val (dw, dh, dec) = ImageCodec.decode(jpg)
    assert(DedupOps.hamming64(ImageCodec.dhash(dec, dw, dh), d0) <= 4)
    // unrelated images are far apart (expected ~32 bits)
    val other = ImageCodec.synthPixels(0x9999L, w, h)
    assert(DedupOps.hamming64(ImageCodec.dhash(other, w, h), d0) > 10)
  }

  test("image near-dup recovers perturbed re-encoded copies, no false pairs") {
    import spark.implicits._
    val w = 120; val h = 90
    val rows = (0 until 30).map { i =>
      val px = ImageCodec.synthPixels(i * 7919L + 13, w, h)
      val fmt = Seq("png", "jpeg", "bmp")(i % 3)
      (i.toLong, ImageCodec.encode(px, w, h, fmt))
    }
    // planted copies: ±2 deterministic noise, re-encoded as jpeg
    val planted = rows.take(20).map { case (id, bytes) =>
      val (iw, ih, px) = ImageCodec.decode(bytes)
      val noisy = px.zipWithIndex.map { case (b, i) =>
        val n = java.lang.Math.floorMod(
          graft.url.Hashing.mix(id * 31L + i), 5L).toInt - 2
        math.max(0, math.min(255, (b & 0xff) + n)).toByte
      }
      (id + 1000000L, ImageCodec.encode(noisy, iw, ih, "jpeg"))
    }
    val df = (rows ++ planted).toDF("rid", "bytes")
    val pairs = MultimodalOps.imageNearDup(df, "rid", "bytes", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recovered = (0 until 20).count(i =>
      pairs.contains((i.toLong, i + 1000000L)))
    assert(recovered >= 16, s"recovered only $recovered/20 planted pairs")
    // no pair between UNRELATED images (distinct synth keys)
    val false_ = pairs.filterNot { case (a, b) => b == a + 1000000L }
    assert(false_.isEmpty, s"false near-dup pairs: $false_")
  }

  test("word n-gram Jaccard finds planted near-dups; sets are token-granular") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val planted = docs.orderBy("doc_id").limit(20)
      .withColumn("doc_id", $"doc_id" + lit(1000000L))
      .withColumn("text", concat($"text", lit(" documento duplicado")))
    val pairs = DedupOps.ngramJaccardPairs(docs.unionByName(planted),
      "doc_id", "text", n = 2, threshold = 0.5)
    val hits = pairs.collect()
      .filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(hits.length === 20, "every planted copy re-found via bigrams")
    // reported jaccard really is the word-bigram set similarity
    hits.take(3).foreach { r =>
      val a = docs.filter($"doc_id" === r.getLong(0))
        .select("text").collect()(0).getString(0)
      val exp = DedupOps.jaccard(DedupOps.wordNgrams(a, 2),
        DedupOps.wordNgrams(a + " documento duplicado", 2))
      assert(math.abs(r.getDouble(2) - exp) < 1e-5)
    }
    // token granularity: ~one set element per token, not per char
    val t = "um dois tres quatro cinco"
    assert(DedupOps.wordNgrams(t, 2).length === 4)
    assert(DedupOps.wordNgrams("curto", 2).length === 1) // < n tokens
    assert(DedupOps.shingles(t, 5).length > 15)
  }

  test("shingle fast path (byte ranges) is bit-identical to the substring form") {
    val rnd = new scala.util.Random(7)
    def substrShingles(text: String, k: Int): Array[Long] = {
      val t = text.toLowerCase.replaceAll("\\s+", " ")
      if (t.length < k) Array(graft.url.Hashing.xxh64(t))
      else (0 until t.length - k + 1)
        .map(i => graft.url.Hashing.xxh64(t.substring(i, i + k)))
        .distinct.sorted.toArray
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "São João do Acaraú — análise orçamentária nº 42", // non-ASCII path
      "short",
      (1 to 200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    for (s <- samples; k <- Seq(3, 5, 9))
      assert(DedupOps.shingles(s, k).toSeq === substrShingles(s, k).toSeq,
        s"k=$k text=$s")
  }

  test("jaccard + shingles basics") {
    val a = DedupOps.shingles("the quick brown fox", 5)
    assert(DedupOps.jaccard(a, a) === 1.0)
    val b = DedupOps.shingles("completely different words here", 5)
    assert(DedupOps.jaccard(a, b) < 0.1)
  }

  test("embedding near-dup finds planted copies") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val copies = e.orderBy("vec_id").limit(10)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val pairs = DedupOps.embeddingNearDup(e.unionByName(copies),
      "vec_id", "embedding", threshold = 0.999).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 10).map(i => (i.toLong, i + 1000000L)).toSet
    assert((expected -- found).isEmpty,
      s"missed planted vector copies: ${expected -- found}")
  }

  test("embedding near-dup multi-table recall on PERTURBED (non-identical) copies") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // perturb one component — near-dup but not sketch-identical
    val perturbed = rows.map { case (id, v) =>
      val w = v.clone; w(0) = w(0) + 0.3f; (id + 1000000L, w)
    }
    // only pairs whose TRUE cosine clears the threshold are expected
    val expected = rows.zip(perturbed).collect {
      case ((a, va), (b, vb))
        if graft.ops.AnnOps.cosine(va, vb) >= 0.9 => (a, b)
    }.toSet
    assert(expected.nonEmpty, "perturbation too strong for the test")
    val df = spark.createDataset((rows ++ perturbed).toSeq)
      .toDF("vec_id", "embedding")
    val found = DedupOps.embeddingNearDup(df, "vec_id", "embedding",
      threshold = 0.9, planes = 16, tables = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (expected & found).size.toDouble / expected.size
    assert(recall >= 0.5, s"multi-table recall $recall < 0.5")
    // and every reported pair really clears the threshold
    val vecs = (rows ++ perturbed).toMap
    found.foreach { case (a, b) =>
      assert(graft.ops.AnnOps.cosine(vecs(a), vecs(b)) >= 0.9 - 1e-6) }
  }

  test("LSH top-k recall >= 0.6 vs brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val brute = AnnOps.bruteTopK(q, c, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnOps.lshTopK(q, c, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall < 0.6")
  }

  test("IVF top-k recall >= 0.5 vs brute force; probes nProbe/nlist of the data") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val brute = AnnOps.bruteTopK(q, c, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnOps.ivfTopK(q, c, 10, nlist = 16, nProbe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall < 0.5")
    // every reported neighbor is a genuine candidate with k results
    assert(ivf.size === 5 * 10)
  }

  test("ann recall query entries (driver value gates) hold the spec floors") {
    val lsh = graft.queries.OpsQueries.queries("ann_lsh_recall")(spark, sf)
      .collect()
    assert(lsh.length === 3, "one recall row per query id")
    val lshAvg = lsh.map(_.getAs[Long]("recall_x1000")).sum / lsh.length
    assert(lshAvg >= 600, s"LSH avg recall_x1000 $lshAvg < 600")
    val ivf = graft.queries.OpsQueries.queries("ann_ivf_recall")(spark, sf)
      .collect()
    assert(ivf.length === 3)
    val ivfAvg = ivf.map(_.getAs[Long]("recall_x1000")).sum / ivf.length
    assert(ivfAvg >= 500, s"IVF avg recall_x1000 $ivfAvg < 500")
    // sanity: the metric is a fraction of exactly k=5 hits
    (lsh ++ ivf).foreach { r =>
      val v = r.getAs[Long]("recall_x1000")
      assert(v >= 0 && v <= 1000 && v % 200 == 0,
        s"recall_x1000 $v is not an n/5 fraction")
    }
  }

  test("language ID on real-language samples") {
    assert(TextOps.langIdScala(
      "the cat sat on the mat and it is warm in the sun") === "en")
    assert(TextOps.langIdScala(
      "der Hund ist nicht müde und die Katze schläft") === "de")
    assert(TextOps.langIdScala(
      "el perro no es grande y la casa es bonita por la mañana") === "es")
    assert(TextOps.langIdScala(
      "le chien est dans la maison et les enfants sont une famille") === "fr")
    assert(TextOps.langIdScala(
      "o governo não divulgou os dados para uma análise em detalhe") === "pt")
    assert(TextOps.langIdScala("我在这里他是一个人不是的了") === "zh")
    assert(TextOps.langIdScala("xyzzy qwerty 12345") === "und")
  }

  test("every langid_planted_recovery snippet classifies as expected") {
    // the driver gate's oracle states these as literals — pin each
    // snippet here so a profile tweak cannot silently break the gate
    graft.queries.OpsQueries.langIdPlanted.foreach { case (want, text) =>
      assert(TextOps.langIdScala(text) === want, s"snippet: $text")
    }
  }

  test("winnowing fingerprint is whitespace-normalization invariant") {
    val a = TextOps.winnowFingerprint("the quick  brown   fox jumps")
    val b = TextOps.winnowFingerprint("the quick brown fox jumps")
    assert(a === b)
    val c = TextOps.winnowFingerprint("a totally different document body")
    assert(a !== c)
  }

  test("multimodal: decode dims, histogram mass, resize round-trip") {
    import spark.implicits._
    val px = ImageCodec.synthPixels(42L, 96, 64)
    val rows = Seq(
      ("img-1", ImageCodec.encode(px, 96, 64, "png"), 96, 64, "png"),
      ("img-2", ImageCodec.encode(px, 96, 64, "jpeg"), 96, 64, "jpeg"),
      ("img-3", Array[Byte](1, 2, 3), 0, 0, "png")) // undecodable
      .toDF("image_id", "bytes", "w", "h", "fmt")
    val feats = MultimodalOps.imageFeatures(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(feats("img-1").getInt(2) === 96) // dec_w
    assert(feats("img-1").getInt(3) === 64) // dec_h
    assert(feats("img-3").isNullAt(2), "undecodable must yield null, not crash")
    // histogram mass = pixel count
    val hist = MultimodalOps.grayHistogram(16)(col("bytes"))
    val mass = rows.filter($"image_id" === "img-1")
      .select(aggregate(hist, lit(0L), _ + _)).collect()(0).getLong(0)
    assert(mass === 96L * 64L)
    // resize produces a decodable image of the target dims
    val resized = rows.filter($"image_id" === "img-1")
      .select(MultimodalOps.resizeUdf(32, 32)(col("bytes"))).collect()(0)
      .getAs[Array[Byte]](0)
    val (rw, rh, _) = ImageCodec.decode(resized)
    assert((rw, rh) === ((32, 32)))
    // frame-sample stub: deterministic chunking
    val frames = rows.filter($"image_id" === "img-1")
      .select(MultimodalOps.frameSampleStub(2)(col("bytes"))).collect()(0)
      .getSeq[Array[Byte]](0)
    assert(frames.nonEmpty)
  }

  test("repetition stats: counts, deterministic argmax bigram, dup fraction") {
    import spark.implicits._
    // "a b a b a b" -> bigrams [a b, b a, a b, b a, a b]: 5 total,
    // 2 distinct, top = "a b" (count 3), dup_fraction = 1 - 2/5
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "x y z"),           // all distinct: dup_fraction 0
      (3L, "w"),               // single word: no bigram, absent
      (4L, "t t t t")          // [t t]*3: argmax unique
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L), "single-word doc must be absent")
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_bigrams") === 5L)
    assert(d1.getAs[Long]("distinct_bigrams") === 2L)
    assert(d1.getAs[String]("top_bigram") === "a b")
    assert(d1.getAs[Long]("top_count") === 3L)
    assert(math.abs(d1.getAs[Double]("dup_fraction") - 0.6) < 1e-9)
    assert(out(2L).getAs[Double]("dup_fraction") === 0.0)
    assert(out(4L).getAs[String]("top_bigram") === "t t")
    // tie-break: "b a b a" -> [b a, a b, b a]? no — [b a, a b, b a]:
    // top is "b a" (2). "a b b a" -> [a b, b b, b a] all count 1:
    // lexicographically smallest wins
    val tie = TextOps.repetitionStats(
      Seq((9L, "a b b a")).toDF("doc_id", "text")).collect()(0)
    assert(tie.getAs[String]("top_bigram") === "a b")
  }

  test("pii scrub: counts every planted span, redacts with typed placeholders") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at alice.w@corp.example.com or +1-555-0199 now"),
      (2L, "two mails a@b.io c.d@e.org one phone +1-555-1234"),
      (3L, "nothing sensitive here"),
      (4L, "+1-555-9999 leads; trailing bob@x.yz")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TextOps.piiEmailCount($"text").as("e"),
        TextOps.piiPhoneCount($"text").as("p"),
        TextOps.piiRedact($"text").as("red"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Int]("e") === 1 && got(1L).getAs[Int]("p") === 1)
    assert(got(2L).getAs[Int]("e") === 2 && got(2L).getAs[Int]("p") === 1)
    assert(got(3L).getAs[Int]("e") === 0 && got(3L).getAs[Int]("p") === 0)
    assert(got(1L).getAs[String]("red") ===
      "mail me at [EMAIL] or [PHONE] now")
    assert(got(2L).getAs[String]("red") ===
      "two mails [EMAIL] [EMAIL] one phone [PHONE]")
    assert(got(3L).getAs[String]("red") === "nothing sensitive here")
    assert(got(4L).getAs[String]("red") === "[PHONE] leads; trailing [EMAIL]")
  }

  test("sessionization: gap strictly over the threshold starts a new session") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1700000000000L // ms
    val gapMs = 8L * 3600 * 1000
    val events = Seq(
      // user 1: second event EXACTLY at the 8h gap -> same session;
      // third event 1ms past it -> new session
      (10L, new Timestamp(base), 1L, "click", 1.0, "{}"),
      (11L, new Timestamp(base + gapMs), 1L, "view", 2.0, "{}"),
      (12L, new Timestamp(base + 2 * gapMs + 1), 1L, "click", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q50_event_sessions")(spark, dir)
      .collect()
    assert(out.length === 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[Long]("n_clicks") === 1L)
    assert(out(1).getAs[Long]("n_events") === 1L)
  }

  test("c4 line cleaning: terminal-punctuation + min-words rules, order preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "A good first sentence.\nshort.\nno punct line\nKeep this one too!\nAnd a third good line?"),
      (2L, "nothing survives here\nat all"),
      (3L, "One single proper line.")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextOps.c4CleanLines($"text").as("cl"),
        TextOps.c4KeptLineCount($"text").as("k"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("cl") ===
      "A good first sentence.\nKeep this one too!\nAnd a third good line?")
    assert(out(1L).getAs[Int]("k") === 3)
    assert(out(2L).getAs[String]("cl") === "" &&
      out(2L).getAs[Int]("k") === 0)
    assert(out(3L).getAs[String]("cl") === "One single proper line.")
    // CRLF input: lines split on \r?\n, so no stray \r survives into
    // the predicate or the cleaned output (endings normalize to LF)
    val crlf = Seq((4L, "A good crlf sentence.\r\nno punct\r\nAnother kept line!"))
      .toDF("doc_id", "text")
      .select(TextOps.c4CleanLines($"text").as("cl"),
        TextOps.c4KeptLineCount($"text").as("k")).collect()(0)
    assert(crlf.getAs[String]("cl") ===
      "A good crlf sentence.\nAnother kept line!")
    assert(crlf.getAs[Int]("k") === 2)
  }

  test("per-group quota cap: longest docs kept, doc_id tie-break, groups under the cap intact") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", 100L), (2L, "s1", 300L), (3L, "s1", 300L), (4L, "s1", 50L),
      (5L, "s2", 10L)
    ).toDF("doc_id", "source", "n_chars")
    val out = TextOps.capPerGroup(df, 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rk"))).toSet
    // s1 cap 2: the two 300-char docs win, doc_id 2 ranks before 3
    assert(out === Set(("s1", 2L, 1), ("s1", 3L, 2), ("s2", 5L, 1)))
  }

  test("image quality filter: each planted defect rejected for its own rule, good image kept, corrupt survives") {
    import spark.implicits._
    def px(n: Int, f: Int => Int): Array[Byte] =
      Array.tabulate(n)(i => f(i).toByte)
    val imgs = Seq(
      ("good", ImageCodec.encode(px(4096, i => (i * 53) % 251), 64, 64, "png")),
      ("tiny", ImageCodec.encode(px(64, _ * 37), 8, 8, "png")),
      ("stretched", ImageCodec.encode(px(800, _ * 31), 200, 4, "png")),
      ("flat", ImageCodec.encode(px(4096, _ => 128), 64, 64, "png")),
      ("corrupt", "not an image".getBytes("UTF-8"))
    ).toDF("image_id", "bytes")
    val out = MultimodalOps.imageQualityFilter(imgs).collect()
      .map(r => r.getAs[String]("image_id") -> r).toMap
    assert(out("good").getAs[Boolean]("keep"))
    assert(!out("tiny").getAs[Boolean]("keep") &&
      out("tiny").getAs[Boolean]("decoded"))
    assert(!out("stretched").getAs[Boolean]("keep") &&
      out("stretched").getAs[Boolean]("decoded"))
    assert(!out("flat").getAs[Boolean]("keep") &&
      out("flat").getAs[Double]("px_std") === 0.0)
    assert(!out("corrupt").getAs[Boolean]("keep") &&
      !out("corrupt").getAs[Boolean]("decoded"))
  }

  test("aspect buckets: exact rational argmin with lowest-index tie-break") {
    import spark.implicits._
    val rows = Seq(
      ("sq", 100, 100),   // 1:1 exact → idx 0
      ("w43", 120, 90),   // 4:3 exact → idx 1
      ("t34", 90, 120),   // 3:4 exact → idx 2
      // EXACT common-denominator cost tie between idx 3 (3:2, cost
      // |112·64−64·96|·6 = 6144) and idx 5 (2:1, |112·64−64·128|·6 =
      // 6144) — the strict < fold must keep the EARLIER ladder entry
      ("tie", 112, 64),
      ("wide", 5000, 10), // off-ladder extreme clamps to 3:1 → idx 7
      ("tall", 10, 5000)  // → 1:3 → idx 8
    ).toDF("image_id", "w", "h")
    val out = MultimodalOps.aspectBucket(rows).collect()
      .map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(out === Map("sq" -> 0, "w43" -> 1, "t34" -> 2, "tie" -> 3,
      "wide" -> 7, "tall" -> 8))
  }

  test("aspect buckets: agrees with a from-scratch rational argmin on 200 randomized dims") {
    import spark.implicits._
    val lad = MultimodalOps.ladderWithMult()
    val rnd = new scala.util.Random(42)
    val dims = (1 to 200).map(i =>
      (s"r$i", 1 + rnd.nextInt(4000), 1 + rnd.nextInt(4000)))
    val out = MultimodalOps.aspectBucket(dims.toDF("image_id", "w", "h"))
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    dims.foreach { case (id, w, h) =>
      val exp = lad.minBy { case (i, bw, bh, mult) =>
        (math.abs(w.toLong * bh - h.toLong * bw) * mult, i) }._1
      assert(out(id) == exp, s"$id (${w}x$h): got ${out(id)}, want $exp")
    }
  }

  test("aspect batches: per-bucket id-ordered fixed layout with honest full flags") {
    import spark.implicits._
    // ten square images + one wide → square bucket packs 10 into
    // batches of 4: two full, one ragged; the wide singleton's batch
    // is never full
    val rows = ((1 to 10).map(i => (f"s$i%02d", 64, 64)) :+
      (("wide1", 192, 64))).toDF("image_id", "w", "h")
    val out = MultimodalOps.aspectBatches(rows, batchSize = 4).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))).toMap
    (1 to 10).foreach { i =>
      val (b, batch, slot, full) = out(f"s$i%02d")
      assert(b == 0 && batch == (i - 1) / 4 && slot == (i - 1) % 4)
      assert(full == (i <= 8), s"s$i full=$full")
    }
    assert(out("wide1") === ((7, 0L, 0L, false)))
  }

  test("caption template filter: normalized counts, integer boundary, repartition-independent") {
    import spark.implicits._
    val rows = Seq(
      ("a", "compra de  insumos"),   // 3 whitespace-variant copies
      ("b", "compra de insumos"),    //  → normalize-equal, == maxFreq
      ("c", " compra de\tinsumos "), //  → template
      ("d", "legenda dupla"),        // 2 exact copies < maxFreq → kept
      ("e", "legenda dupla"),
      ("f", "legenda única")         // singleton → kept
    ).toDF("image_id", "caption")
    def run(df: org.apache.spark.sql.DataFrame) =
      MultimodalOps.captionTemplateFilter(df, maxFreq = 3).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
        .toMap
    val out = run(rows)
    assert(out("a") === ((3L, true)) && out("b") === ((3L, true)) &&
      out("c") === ((3L, true)))
    assert(out("d") === ((2L, false)) && out("e") === ((2L, false)))
    assert(out("f") === ((1L, false)))
    assert(run(rows.repartition(7)) === out)
  }

  test("spam mass: link farm flagged with mass == rank, trusted chain never flags") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val out = graft.ops.GraphOps.spamMass(nodes, edges, seeds, 3, 5L, 1L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    Seq(3L, 4L).foreach { id =>
      val (pr, tr, mass, spam) = out(id)
      assert(tr == 0L && mass == pr && pr > 0L && spam,
        s"farm node $id: $pr $tr $mass $spam")
    }
    Seq(0L, 1L, 2L).foreach { id =>
      val (_, tr, _, spam) = out(id)
      assert(tr > 0L && !spam, s"trusted-chain node $id must not flag")
    }
  }

  test("decontamination: planted benchmark 5-gram is flagged, clean and short docs are not") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val corpus = Seq(
      // embeds "beta gamma delta epsilon zeta" (a benchmark 5-gram)
      (1L, "intro words then beta gamma delta epsilon zeta outro"),
      // shares words but no 5-gram run
      (2L, "alpha beta something gamma delta other epsilon zeta"),
      (3L, "tiny doc"), // < 5 words: zero counts, still present
      (4L, "completely unrelated content with many extra words here")
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminate(corpus, bench, 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("contaminated"))
    assert(out(1L).getAs[Long]("n_hit_grams") === 1L)
    assert(out(1L).getAs[Long]("n_bench_docs") === 1L)
    assert(!out(2L).getAs[Boolean]("contaminated"))
    assert(out(3L).getAs[Long]("n_grams") === 0L &&
      !out(3L).getAs[Boolean]("contaminated"))
    assert(!out(4L).getAs[Boolean]("contaminated"))
    // n_grams counts DISTINCT grams from raw text
    assert(out(4L).getAs[Long]("n_grams") === 4L)
  }

  test("stratified sample: reproducible under repartitioning, rates realized, zero-rate stratum empty") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val rates = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.9)
    val s1 = TextOps.sampleStratified(d, rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = TextOps.sampleStratified(d.repartition(7, col("text")), rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "sample must be independent of partitioning")
    // strata not in the rate map (es, fr) default to rate 0.0
    val langs = TextOps.sampleStratified(d, rates)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("es") && !langs.contains("fr"))
    // realized rate within a loose tolerance of the target (small n)
    val en = d.filter(col("lang") === "en").count().toDouble
    val enKept = TextOps.sampleStratified(d, rates)
      .filter(col("lang") === "en").count().toDouble
    assert(math.abs(enKept / en - 0.5) < 0.2,
      s"en realized rate ${enKept / en} far from 0.5")
  }

  test("fixed-point pagerank: 3-cycle fixed point exact, hubs dominate, partition-invariant") {
    import spark.implicits._
    import graft.ops.GraphOps
    // 0→1→2→0, outdeg 1 each: pr0 = floor(1e12/3) = 333333333333;
    // contribution = floor(pr·85/100) = 283333333333; base =
    // floor(1e12·15/300) = 50000000000 → pr stays 333333333333 forever
    val cyc = Seq(0L, 1L, 2L).toDF("id")
    val cycE = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val fixed = GraphOps.pageRankFixedPoint(cyc, cycE, 3, 3L).collect()
    assert(fixed.forall(_.getAs[Long]("pr") === 333333333333L),
      s"3-cycle fixed point broken: ${fixed.toSeq}")
    // synthetic web graph: the 10 hub nodes out-rank the field, and
    // the rank vector is bit-identical under a different partitioning
    val nodes = spark.range(200).toDF("id")
    val edges = GraphOps.syntheticEdges(nodes, 200L)
    val pr1 = GraphOps.pageRankFixedPoint(nodes, edges, 5, 200L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr2 = GraphOps.pageRankFixedPoint(
        nodes.repartition(7, col("id")),
        edges.repartition(5, col("dst")), 5, 200L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr1 === pr2, "rank vector not partition-invariant")
    val hubAvg = (0L until 10L).map(pr1).sum / 10.0
    val fieldAvg = (10L until 200L).map(pr1).sum / 190.0
    assert(hubAvg > 2 * fieldAvg,
      s"hub backbone not dominant: $hubAvg vs $fieldAvg")
    // mass is conserved up to per-edge floor loss: never above scale,
    // never below the pure-damping floor
    val total = pr1.values.sum
    assert(total <= 1000000000000L && total >= 150000000000L)
  }

  test("uniform draw: web-scale ids neither overflow nor collide across 2^20 strides") {
    import spark.implicits._
    // ids past 3.5e9 overflow a naive id*K mixer under ANSI; the
    // two-lane masked form must stay in [0,1) for the full Int64 range
    val ids = Seq(0L, 1L, 3500000000L, 4000000000L, Long.MaxValue,
      7L, 7L + 1048576L, 7L + 2097152L)
    val us = ids.toDF("doc_id")
      .select(TextOps.uniformFromId(col("doc_id")).as("u"))
      .collect().map(_.getDouble(0))
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    // the high lane must decorrelate ids equal in the low 20 bits
    assert(Set(us(5), us(6), us(7)).size === 3,
      s"2^20-stride ids collided: ${us.toSeq}")
  }

  test("shard packing: offsets land in the shard's budget window, shards contiguous, totals preserved") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val budget = 500L
    val out = TextOps.packShards(d, budget).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      ordered.foreach { r =>
        val shard = r.getAs[Long]("shard")
        assert(shard === cum / budget,
          s"$lang doc ${r.getAs[Long]("doc_id")}: shard $shard at offset $cum")
        cum += r.getAs[Long]("n_tokens")
      }
      // NOTE: shard ids need not be contiguous — a doc spanning a full
      // budget window legitimately skips an id; the exact
      // shard == offset/budget check above is the whole contract
    }
    assert(out.length === d.count(), "packing must keep every doc")
  }

  test("containment pairs catch a snippet Jaccard misses; cap prunes stop-grams") {
    val spark2 = spark
    import spark2.implicits._
    // doc 2 is a contiguous 10-token slice of doc 1 (60 distinct
    // tokens): containment = 100% while 4-gram Jaccard ≈ 7/57
    val longToks = (0 until 60).map(i => s"tok$i")
    val corpus = Seq(
      (1L, longToks.mkString(" ")),
      (2L, longToks.slice(20, 30).mkString(" ")),
      (3L, (0 until 30).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = DedupOps.containmentPairs(corpus, "doc_id", "text",
      n = 4, freqCap = 64, pct = 90, minSize = 4).collect()
    assert(pairs.length === 1, s"expected exactly (1,2): ${pairs.toSeq}")
    val p = pairs.head
    assert(p.getLong(0) === 1L && p.getLong(1) === 2L)
    assert(p.getAs[Long]("shared") === 7L) // 7 four-grams in the slice
    assert(p.getAs[Long]("size_a") === 57L)
    assert(p.getAs[Long]("size_b") === 7L)
    assert(p.getAs[Long]("cont_x1000") === 1000L)
    // the Jaccard family structurally misses the same pair
    val jac = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 4, threshold = 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "4-gram Jaccard should NOT pair the snippet with its host")
    // freqCap prune: a gram shared by MORE than cap docs cannot pair
    // them (and is excluded from sizes) — 70 identical short docs
    // collapse to one df-70 gram, pruned before any join
    val flood = (0 until 70).map(i => (100L + i, "aa bb"))
      .toDF("doc_id", "text")
    val fp = DedupOps.containmentPairs(flood, "doc_id", "text",
      n = 4, freqCap = 64, pct = 90, minSize = 1).collect()
    assert(fp.isEmpty, s"stop-gram flood must not pair: ${fp.length}")
    // minSize prune: two docs sharing their ONLY gram would score
    // 100 % — meaningless on a near-empty set, excluded by default
    val tiny = Seq((200L, "x1 x2 x3 x4"), (201L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val tp = DedupOps.containmentPairs(tiny, "doc_id", "text",
      n = 4, freqCap = 64, pct = 90, minSize = 4).collect()
    assert(tp.isEmpty, s"sub-minSize docs must not pair: ${tp.toSeq}")
  }

  test("mirror near-dup finds flipped jpeg reposts via the cross channel") {
    val spark2 = spark
    import spark2.implicits._
    val w = 120; val h = 90
    val rows = (0 until 30).map { i =>
      val px = ImageCodec.synthPixels(i * 7919L + 13, w, h)
      val fmt = Seq("png", "jpeg", "bmp")(i % 3)
      (i.toLong, ImageCodec.encode(px, w, h, fmt))
    }
    // planted flipped reposts: mirror + lossy jpeg re-encode
    val flipped = rows.take(20).map { case (id, bytes) =>
      val (iw, ih, px) = ImageCodec.decode(bytes)
      (id + 1000000L,
        ImageCodec.encode(ImageCodec.mirror(px, iw, ih), iw, ih, "jpeg"))
    }
    val df = (rows ++ flipped).toDF("rid", "bytes")
    // plain dHash pairing must MISS the flips (gradient bits reverse)
    val plain = MultimodalOps.imageNearDup(df, "rid", "bytes", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plainHits = (0 until 20).count(i =>
      plain.contains((i.toLong, i + 1000000L)))
    assert(plainHits <= 4, s"plain dHash found $plainHits/20 flips — " +
      "synth images too symmetric for the mirror test to mean anything")
    // mirror-aware pairing recovers them, flagged via the cross channel
    val pairs = MultimodalOps.mirrorNearDup(df, "rid", "bytes", maxDist = 4)
      .collect()
    val hits = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(hits.length >= 16, s"recovered only ${hits.length}/20 flips")
    assert(hits.count(_.getAs[Boolean]("mirrored")) >= 16,
      "recoveries must come via the mirror channel")
    // no pair between unrelated images
    val false_ = pairs.map(r => (r.getLong(0), r.getLong(1)))
      .filterNot { case (a, b) => b == a + 1000000L }
    assert(false_.isEmpty, s"false mirror pairs: ${false_.toSeq}")
    // a plain (unflipped) noisy copy still pairs, flagged mirrored=false
    val noisy = {
      val (iw, ih, px) = ImageCodec.decode(rows.head._2)
      Seq((2000000L, ImageCodec.encode(px, iw, ih, "jpeg")))
    }
    val withPlain = (rows ++ noisy).toDF("rid", "bytes")
    val pp = MultimodalOps.mirrorNearDup(withPlain, "rid", "bytes",
      maxDist = 4).collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(1) == 2000000L)
    assert(pp.length === 1 && !pp.head.getAs[Boolean]("mirrored"),
      s"plain re-encode must pair via the plain channel: ${pp.toSeq}")
    // NEGATIVE (hash-like) ids round-trip the channel encoding: the
    // shift/mask decode must attribute pairs to the right ids
    val negDf = (rows.take(3).map { case (id, b) => (id - 100L, b) } ++
      flipped.take(3).map { case (id, b) => (id - 100L, b) })
      .toDF("rid", "bytes")
    val np = MultimodalOps.mirrorNearDup(negDf, "rid", "bytes",
      maxDist = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(np === Set((-100L, 999900L), (-99L, 999901L),
      (-98L, 999902L)), s"negative-id pairs: $np")
  }
}
