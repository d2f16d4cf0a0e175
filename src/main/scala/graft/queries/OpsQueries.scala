package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AnnOps, DedupOps, MultimodalOps, SemDedup, SubstringDedup, TextOps}

/** Training-data pipeline queries (dedup / ANN / text analysis /
  * multimodal). Hash-based signatures are not SQL-expressible in
  * DuckDB, so these are rows-only for the driver; their semantics are
  * pinned by OpsSpec (planted near-duplicates found, LSH recall vs the
  * oracle-checked brute-force baseline q36, language-ID on real
  * samples).
  *
  * Near-dup inputs plant mutated copies of real documents
  * deterministically inside the query (id + 1e6, one token appended /
  * a small edit), so every SF has known-positive pairs.
  */
object OpsQueries {

  /** Planted language-ID snippets (expected code, text). Each is
    * dominated by its profile's function words or diagnostic chars so
    * classification is deterministic; the `und` row pins the
    * no-signal fallback. Unit-pinned in OpsSpec BEFORE the driver
    * compares the aggregate against literal expectations. */
  private[graft] val langIdPlanted: Seq[(String, String)] = Seq(
    ("en", "the report of the ministry and the data that it published " +
      "for the year is available in full"),
    ("en", "it is the case that the numbers for the region and the " +
      "city are in the annex of the report"),
    ("de", "der bericht und die daten sind nicht mit ein kommentar " +
      "das ministerium ist zuständig für die zahlen"),
    ("de", "das portal ist nicht der richtige ort und die zahlen " +
      "sind mit ein vermerk versehen"),
    ("es", "el informe de la salud que los datos y el portal es por " +
      "la región en el año"),
    ("es", "la ciudad y el estado que es de los registros en el " +
      "portal por el mes y el año"),
    ("fr", "le rapport et les données est que des chiffres une dans " +
      "le portail de la santé à côté"),
    ("fr", "la ville et le mois est que les données des années une " +
      "dans le rapport du même côté"),
    ("pt", "o relatório que os dados de saúde e não para uma análise " +
      "em o portal da região"),
    ("pt", "a cidade e o estado que não é de os registros em uma " +
      "para o mês das ações"),
    ("zh", "的一是不了人我在有他的一是不了"),
    ("und", "xq zr 1234 5678 blorp klatu 9900"))

  /** Stable fixture root for the driver value gates whose oracle SQL
    * reads staged parquet back in DuckDB (absolute-path FROM). Written
    * fresh by the Spark query each run; single-driver contract (the
    * correctness harness runs Verify, then the oracle, sequentially). */
  private val gateFxBase = "/tmp/graft_gate_fx"

  /** ±2-gray-level deterministic pixel noise + jpeg re-encode — the
    * planted "same image, different file" copy the perceptual gates
    * (image_neardup_recovery, image_index_parity) must re-find. */
  private val perturbJpeg = udf((bytes: Array[Byte], key: Long) => {
    try {
      val (iw, ih, px) = graft.fetch.ImageCodec.decode(bytes)
      val out = new Array[Byte](px.length)
      var i = 0
      while (i < px.length) {
        val n = java.lang.Math.floorMod(
          graft.url.Hashing.mix(key + i * 0x9E3779B97F4A7C15L), 5L)
          .toInt - 2
        out(i) = math.max(0, math.min(255, (px(i) & 0xff) + n)).toByte
        i += 1
      }
      graft.fetch.ImageCodec.encode(out, iw, ih, "jpeg")
    } catch { case _: Exception => null }
  })

  /** Horizontally mirrored + jpeg re-encoded copy — the planted
    * "flipped repost" the mirror-aware perceptual gate
    * (image_mirror_recovery) must re-find via the CROSS channel. */
  private val mirrorJpeg = udf((bytes: Array[Byte]) => {
    try {
      val (iw, ih, px) = graft.fetch.ImageCodec.decode(bytes)
      graft.fetch.ImageCodec.encode(
        graft.fetch.ImageCodec.mirror(px, iw, ih), iw, ih, "jpeg")
    } catch { case _: Exception => null }
  })

  /** The planted boilerplate paragraph of the paragraph-dedup gate —
    * artificial tokens so it can never occur naturally. */
  private[graft] val boilerPara: String =
    "graftpara cookie banner legal footer navigation menu"

  /** Planted Gopher-rule probes: one doc per rule, each violating
    * exactly the failure mode its comment names (several also trip
    * secondary rules — irrelevant: the gate checks row-wise parity of
    * every count and flag, not keep rates). Defined ONCE here; the
    * oracle SQL's VALUES clause is generated from this same Seq, so
    * Spark and DuckDB derive their answers from identical text. */
  private[graft] val gopherPlanted: Seq[(Long, String)] = {
    val good = Seq.fill(4)("the quick brown fox jumps over that lazy " +
      "dog with some vigor and speed").mkString(" ")
    Seq(
      9000001L -> good, // passes all seven rules
      9000002L -> "the word list is here the word list is here", // <50 words
      9000003L -> "### of the data ### with more #", // symbol ratio
      9000004L -> "- the item one\n- the item two\n- the item three", // bullets
      9000005L -> "the end...\nthe wait…\nall of that is done", // ellipsis
      9000006L -> "111 222 333 444 555 666 777 888", // no alpha words
      9000007L -> ("extraordinarily sophisticated implementations " +
        "notwithstanding incomprehensibilities")) // mean word len > 10
  }

  /** Ten artificial tokens no natural document contains — the planted
    * paragraph of the exact-substring gates. Boundary windows (mixing
    * a doc's own tail tokens with the paragraph's head) stay unique
    * across the planted docs because the 8 lowest doc_ids carry
    * distinct 7-token tails at every SF (verified in TESTDATA). */
  private val substrPara: String =
    (0 until 10).map(i => s"graftdup$i").mkString(" ")

  /** The corpus with ` uqq<doc_id> ` + `substrPara` appended to the 8
    * lowest doc_ids — a known duplicated region of exactly 10 tokens
    * whose char offset DuckDB re-derives from the raw table. The
    * per-doc `uqq<doc_id>` buffer token makes every LEFT-boundary
    * window (doc tail tokens + paragraph head) unique per doc: without
    * it, two planted docs sharing even their single last word would
    * extend the merged span before the paragraph and break the
    * recovery gate's literal offsets (observed at sf0.001/sf0.1). */
  private def withPlantedPara(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val low = d.orderBy("doc_id").limit(8)
      .withColumn("text", concat(col("text"), lit(" uqq"),
        col("doc_id").cast("string"), lit(" " + substrPara)))
    d.join(low.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(low)
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents ∪ mutated copies of the 20 lowest-id docs. */
  private def withPlantedDupes(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val mutated = d.orderBy("doc_id").limit(20)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" documento duplicado")))
    d.unionByName(mutated)
  }

  /** Deterministic MULTI-HOP pair fixture for the cluster-resolution
    * oracle: an edge between consecutive doc ids sharing a language,
    * so same-lang runs chain (A-B, B-C, no A-C edge) and the generic
    * connected-components path must propagate transitively. DuckDB
    * expresses the ground truth with one window pass over doc_id. */
  private def chainPairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("lang"))
    val b = d.select(col("doc_id").as("id_b"), col("lang").as("lang_b"))
    d.join(b, col("id_b") === col("doc_id") + 1 &&
        col("lang_b") === col("lang"))
      .select(col("doc_id").as("id_a"), col("id_b"))
  }

  private def annSides(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val e = emb(s, dir)
    (e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      e.filter(col("vec_id") >= 3)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")))
  }

  /** Recall@5 of an approximate ANN path, ORACLE-GATED: the approx
    * top-5 set is staged as a parquet fixture, Spark computes recall
    * against the integer-quantized brute ranking (bit-for-bit the
    * cross-engine baseline ann_recall_vs_oracle established), and the
    * per-algo oracle SQL independently recomputes the SAME brute set
    * in DuckDB and re-derives recall@5 from the staged fixture — the
    * hash compare certifies the recall VALUES, one row per query id,
    * as a BIGINT fraction ×1000. */
  private def annRecall(s: SparkSession, dir: String, algo: String,
      approx: (DataFrame, DataFrame, Int) => DataFrame): DataFrame = {
    val (q, c) = annSides(s, dir)
    val nVecs = emb(s, dir).count()
    val path = s"$gateFxBase/annrecall_$algo/sf_$nVecs"
    approx(q, c, 5).select(col("qid"), col("cid"))
      .withColumn("n_vecs", lit(nVecs))
      .write.mode("overwrite").parquet(path)
    val got = s.read.parquet(path)
      .select(col("qid"), col("cid")).distinct()
      .withColumn("hit", lit(1))
    // integer-quantized dot ranking, ties by cid — must mirror the
    // oracle SQL exactly so both engines agree on the baseline set
    def qz(v: org.apache.spark.sql.Column) =
      transform(v, x => round(x.cast("double") * 1000).cast("long"))
    val qq = q.select(col("qid"), qz(col("qv")).as("qv"))
    val cc = c.select(col("cid"), qz(col("cv")).as("cv"))
    val dot = aggregate(zip_with(col("qv"), col("cv"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dot").desc, col("cid").asc)
    val brute = cc.crossJoin(broadcast(qq))
      .withColumn("dot", dot)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("cid"))
    brute.join(got, Seq("qid", "cid"), "left_outer")
      .groupBy(col("qid"))
      .agg(floor(sum(coalesce(col("hit"), lit(0))) * 1000.0 /
        count(lit(1))).cast("long").as("recall_x1000"))
      .orderBy(col("qid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // operating points sized for the toy-scale tables (500-2k vectors):
    // LSH 2^6=64 buckets keeps bucket occupancy ~8-30 (planes grows
    // with log n at corpus scale); IVF probes nProbe/nlist = 1/2 of
    // the lists. Measured recall@5 across sf0.001/0.01/0.1:
    // LSH 0.93/0.80/1.00, IVF 0.73/0.73/0.73 — floors 0.6/0.5 pinned
    // in OpsSpec.
    "ann_lsh_recall" -> ((s: SparkSession, dir: String) =>
      annRecall(s, dir, "lsh",
        AnnOps.lshTopK(_, _, _, planes = 6, tables = 8))),

    "ann_ivf_recall" -> ((s: SparkSession, dir: String) =>
      annRecall(s, dir, "ivf",
        AnnOps.ivfTopK(_, _, _, nlist = 16, nProbe = 8))),

    "dedup_minhash_pairs" -> ((s: SparkSession, dir: String) =>
      DedupOps.minhashPairs(withPlantedDupes(s, dir), "doc_id", "text",
        threshold = 0.5)),

    "dedup_simhash_pairs" -> ((s: SparkSession, dir: String) =>
      DedupOps.simhashPairs(withPlantedDupes(s, dir), "doc_id", "text",
        maxDist = 3)),

    // PRECISION gate for the LSH pair family (the planted gates cover
    // recall): every emitted pair's exact Jaccard is recomputed by
    // DuckDB from RAW 5-char substring sets of the staged corpus,
    // independently of the engine's xxhash64 shingle path, and the
    // oracle states ge_threshold=true as a literal — a false-positive
    // pair (true similarity below threshold) flips the row false and
    // fails the hash compare. jaccard_x1000 uses the same double
    // division+floor on both engines, so values are bit-deterministic
    // (hashed-set vs raw-set Jaccard agree absent 64-bit collisions).
    "dedup_minhash_precision" -> ((s: SparkSession, dir: String) => {
      val corpus = withPlantedDupes(s, dir)
      val pairs = DedupOps.minhashPairs(corpus, "doc_id", "text",
        threshold = 0.5)
      // SF-keyed path + an n_docs column (the simhash-gate pattern):
      // fixtures of several SFs coexist in /tmp across verify/bench
      // runs, and the oracle selects the current SF's rows by content
      val nDocs = docs(s, dir).count()
      val base = s"$gateFxBase/minhash_prec/sf_$nDocs"
      corpus.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/corpus")
      pairs.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/pairs")
      val p = s.read.parquet(s"$base/pairs")
      val c = s.read.parquet(s"$base/corpus")
      val jacUdf = udf((a: String, b: String) =>
        DedupOps.jaccard(DedupOps.shingles(a, 5), DedupOps.shingles(b, 5)))
      p.join(c.select(col("doc_id").as("id_a"), col("text").as("text_a")),
          "id_a")
        .join(c.select(col("doc_id").as("id_b"), col("text").as("text_b")),
          "id_b")
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          floor(jacUdf(col("text_a"), col("text_b")) * 1000)
            .cast("long").as("jaccard_x1000"))
        // 5-permille slack under the 0.5 pipeline threshold: a pair
        // the verify stage legitimately admitted via its 6-decimal
        // rounding must not flake the gate; real LSH false positives
        // sit far below
        .withColumn("ge_threshold", col("jaccard_x1000") >= 495)
        .orderBy("id_a", "id_b")
    }),

    "dedup_ngram_pairs" -> ((s: SparkSession, dir: String) =>
      DedupOps.ngramJaccardPairs(withPlantedDupes(s, dir), "doc_id",
        "text", n = 2, threshold = 0.5)),

    // EXACT containment pairs (Broder containment — the case Jaccard
    // dedup structurally misses: a snippet pasted inside a long doc).
    // TWO-SIDED exact gate, no staging: every doc_id % 100 == 0
    // contributes a planted contained snippet — its first
    // max(4, ntoks div 3) whitespace tokens — at id + 2e6, and DuckDB
    // re-derives the ENTIRE pair set (shared counts, pruned sizes,
    // integer containment) from the raw documents table with the same
    // plant. One wrong df prune, one drifted count, or one missed
    // boundary pair shifts a row.
    "q81_containment_pairs" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = docs(s, dir)
        .select($"doc_id", coalesce($"text", lit("")).as("text"))
      val toks = array_remove(split(regexp_replace(trim($"text"), "\\s+", " "), " "), "")
      val planted = d.filter($"doc_id" % 100 === 0)
        .select(($"doc_id" + 2000000L).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1),
            greatest(lit(4), (size(toks) / 3).cast("int")))).as("text"))
      DedupOps.containmentPairs(d.unionByName(planted), "doc_id",
          "text", n = 4, freqCap = 64, pct = 90, minSize = 4)
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL containment-index parity, fully TWO-SIDED: the
    // index is built on the corpus (stop set frozen from corpus df),
    // the q81 planted slices probe it, and DuckDB independently
    // re-derives the frozen stop set, the postings, the pruned
    // sizes, and EVERY batch-touching pair from raw text — no
    // staging. A stale posting, a wrong frozen df, a drifted size,
    // or one missed cross/within pair shifts a row.
    "containment_index_parity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = docs(s, dir)
        .select($"doc_id", coalesce($"text", lit("")).as("text"))
      val toks = array_remove(split(regexp_replace(trim($"text"), "\\s+", " "), " "), "")
      val planted = d.filter($"doc_id" % 100 === 0)
        .select(($"doc_id" + 2000000L).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1),
            greatest(lit(4), (size(toks) / 3).cast("int")))).as("text"))
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-cont-gate").toString
      graft.ops.ContainmentIndex.build(d, "doc_id", "text", idxDir)
      graft.ops.ContainmentIndex
        .probePairs(planted, "doc_id", "text", idxDir)
        .orderBy("id_a", "id_b")
    }),

    // PRECISION gate for the word-bigram family (dedup_minhash_precision
    // pattern): DuckDB re-derives every emitted pair's exact bigram
    // Jaccard from RAW token lists of the staged corpus (list
    // comprehension — no hashing) and asserts ge_threshold as a
    // literal; the Spark side recomputes it from the hashed sets. A
    // false-positive pair flips the oracle row and fails the hash
    // compare (hashed-set vs raw-set Jaccard agree absent 64-bit
    // collisions, as with the char-shingle gate).
    "dedup_ngram_precision" -> ((s: SparkSession, dir: String) => {
      val corpus = withPlantedDupes(s, dir)
      val pairs = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 2, threshold = 0.5)
      val nDocs = docs(s, dir).count()
      val base = s"$gateFxBase/ngram_prec/sf_$nDocs"
      corpus.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/corpus")
      pairs.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/pairs")
      val p = s.read.parquet(s"$base/pairs")
      val c = s.read.parquet(s"$base/corpus")
      val jacUdf = udf((a: String, b: String) =>
        DedupOps.jaccard(DedupOps.wordNgrams(a, 2),
          DedupOps.wordNgrams(b, 2)))
      p.join(c.select(col("doc_id").as("id_a"), col("text").as("text_a")),
          "id_a")
        .join(c.select(col("doc_id").as("id_b"), col("text").as("text_b")),
          "id_b")
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          floor(jacUdf(col("text_a"), col("text_b")) * 1000)
            .cast("long").as("jaccard_x1000"))
        // same 5-permille slack as the minhash gate: the verify
        // stage's 6-decimal rounding must not flake a legitimate
        // threshold-exact admit
        .withColumn("ge_threshold", col("jaccard_x1000") >= 495)
        .orderBy("id_a", "id_b")
    }),

    // PRECISION gate for the SimHash family: the per-doc 64-bit
    // sketches are staged alongside the emitted pairs, and DuckDB
    // re-derives every pair's Hamming distance INDEPENDENTLY as
    // bit_count(xor(sketch_a, sketch_b)) with le_max stated as a
    // literal — a pairing/banding/verify defect (wrong distance, or a
    // pair beyond maxDist) fails the hash compare. Recall is pinned by
    // dedup_simhash_recovery; this pins precision.
    "dedup_simhash_precision" -> ((s: SparkSession, dir: String) => {
      val corpus = withPlantedDupes(s, dir)
      val pairs = DedupOps.simhashPairs(corpus, "doc_id", "text",
        maxDist = 3)
      val nDocs = docs(s, dir).count()
      val base = s"$gateFxBase/simhash_prec/sf_$nDocs"
      val shUdf = udf((t: String) => DedupOps.simhash64(t))
      corpus.select(col("doc_id"), shUdf(col("text")).as("sh"))
        .withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/sketches")
      pairs.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/pairs")
      s.read.parquet(s"$base/pairs")
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          col("hamming").cast("long").as("hamming"))
        .withColumn("le_max", col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL-vs-BATCH parity as a driver value gate: a batch
    // probed against the persisted signature index must emit exactly
    // the pairs the full recompute emits among pairs touching a batch
    // id — the full recompute is staged to parquet and DuckDB
    // re-derives the restriction independently, so a probe that
    // misses a bucket (or self-pairs) hash-mismatches
    "dedup_index_parity" -> ((s: SparkSession, dir: String) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.filter(col("doc_id") % 3 =!= 0)
      // batch: the remaining third PLUS perturbed copies of the 10
      // lowest ids — guaranteed cross-batch near-dups
      val copies = d.orderBy("doc_id").limit(10)
        .withColumn("doc_id", col("doc_id") + lit(3000000L))
        .withColumn("text", concat(col("text"), lit(" versão revisada")))
      val batch = d.filter(col("doc_id") % 3 === 0).unionByName(copies)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-idx-gate").toString
      graft.ops.DedupIndex.write(corpus, "doc_id", "text", idxDir)
      val inc = graft.ops.DedupIndex.probePairs(batch, corpus,
        "doc_id", "text", idxDir, threshold = 0.5)
      val full = DedupOps.minhashPairs(corpus.unionByName(batch),
        "doc_id", "text", threshold = 0.5)
      val nDocs = docs(s, dir).count()
      val base = s"$gateFxBase/dedup_index/sf_$nDocs"
      full.withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/full")
      batch.select(col("doc_id")).withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(s"$base/batch_ids")
      inc.select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          round(col("jaccard") * 1000000).cast("long").as("jaccard_x1e6"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_embedding_pairs" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      // plant near-identical copies: same vector, id offset
      val copies = e.orderBy("vec_id").limit(10)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      DedupOps.embeddingNearDup(e.unionByName(copies), "vec_id", "embedding",
        threshold = 0.999)
    }),

    // PRECISION gate for the embedding family: every emitted pair's
    // cosine is recomputed by DuckDB in double precision from the RAW
    // embeddings table (a planted copy shares its original's vector,
    // so ids ≥ 1e6 map back by subtraction) and compared at 6 dp —
    // the engine's codegen dot kernel and the oracle's list arithmetic
    // agree bit-for-bit (sequential double sums over float-exact
    // values; verified across all SFs). ge_threshold is RECOMPUTED on
    // the oracle side, so a below-threshold false positive flips the
    // row false and fails the hash compare.
    "dedup_embedding_precision" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.orderBy("vec_id").limit(10)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      val pairs = DedupOps.embeddingNearDup(e.unionByName(copies),
        "vec_id", "embedding", threshold = 0.999)
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/emb_prec/sf_$nVecs"
      pairs.withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          round(col("cosine") * 1e6).cast("long").as("cos_x1e6"))
        .withColumn("ge_threshold", lit(true))
        .orderBy("id_a", "id_b")
    }),

    // ORACLE-gated approximate top-k (both paths): the op's OWN output
    // — ranks, tie-breaks, and 6-dp cosines — must match DuckDB's
    // independent exact re-ranking of the STAGED candidate set (the
    // ids the probe actually surfaced). Candidate QUALITY is pinned by
    // ann_recall_vs_oracle; this pins the scoring/ranking end to end:
    // a wrong dot kernel, a dropped candidate, or a tie-break
    // regression all fail the hash compare. Cross-engine cosine
    // equality at 6 dp holds bit-for-bit (sequential double sums over
    // float-exact values, verified across all SFs).
    "ann_lsh_top5" -> ((s: SparkSession, dir: String) => {
      val (q, c) = annSides(s, dir)
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/lsh_top5/sf_$nVecs"
      AnnOps.lshCandidates(q, c, planes = 6, tables = 8)
        .withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      AnnOps.lshTopK(q, c, k = 5, planes = 6, tables = 8)
        .select(col("qid"), col("cid"),
          round(col("cosine") * 1e6).cast("long").as("cos_x1e6"),
          col("rk"))
        .orderBy("qid", "rk")
    }),

    "ann_ivf_top5" -> ((s: SparkSession, dir: String) => {
      val (q, c) = annSides(s, dir)
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/ivf_top5/sf_$nVecs"
      // the quantizer is deterministic (seeded, 6-dp-quantized) and
      // trained ONCE here — the candidate derivation and the topK call
      // share it (bit-identical to training per call, half the k-means
      // job chains)
      val model = AnnOps.ivfModel(c, nlist = 16, iters = 2)
      AnnOps.ivfCandidatesFrozen(q, c, model, nProbe = 4)
        .withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      AnnOps.ivfTopKFrozen(q, c, model, k = 5, nProbe = 4)
        .select(col("qid"), col("cid"),
          round(col("cosine") * 1e6).cast("long").as("cos_x1e6"),
          col("rk"))
        .orderBy("qid", "rk")
    }),

    // ORACLE-checked planted-duplicate gates: the 20 lowest-id docs
    // get a mutated copy (one appended token); every original must be
    // re-found as a (id, id+1e6) MinHash-LSH pair — structural at
    // threshold 0.5 (the mutation moves Jaccard of a >=57-char doc to
    // ~0.73+), so DuckDB can assert ALL-TRUE from the documents table
    // alone. A banding/signature/verify regression flips rows false
    // and fails the hash compare. (SimHash is excluded: one appended
    // token legitimately moves short docs past hamming 3; its planted
    // recovery is pinned in OpsSpec instead.)
    "dedup_planted_text" -> ((s: SparkSession, dir: String) => {
      val planted = withPlantedDupes(s, dir)
      def hits(pairs: DataFrame, as: String): DataFrame = pairs
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("doc_id"), lit(true).as(as))
      docs(s, dir).orderBy("doc_id").limit(20).select(col("doc_id"))
        .join(hits(DedupOps.minhashPairs(planted, "doc_id", "text",
          threshold = 0.5), "mh"), Seq("doc_id"), "left_outer")
        .join(hits(DedupOps.ngramJaccardPairs(planted, "doc_id", "text",
          n = 2, threshold = 0.5), "ng"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("mh"), lit(false)).as("minhash_found"),
          coalesce(col("ng"), lit(false)).as("ngram_found"))
        .orderBy("doc_id")
    }),

    // same gate for the embedding path: IDENTICAL copies share every
    // sign-LSH sketch by construction and verify at cosine 1.0, so
    // all-true is structural, not empirical.
    "dedup_planted_embedding" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.orderBy("vec_id").limit(10)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      val pairs = DedupOps
        .embeddingNearDup(e.unionByName(copies), "vec_id", "embedding",
          threshold = 0.999)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("vec_id"), lit(true).as("found"))
      e.orderBy("vec_id").limit(10).select(col("vec_id"))
        .join(pairs, Seq("vec_id"), "left_outer")
        .select(col("vec_id"),
          coalesce(col("found"), lit(false)).as("embedding_found"))
        .orderBy("vec_id")
    }),

    // SimHash planted recovery as a DRIVER VALUE gate (honest ratio,
    // not all-true: one appended token legitimately moves short docs
    // past hamming distance 3 — measured 15-17/20 across SFs, floor
    // pinned in OpsSpec). The per-doc recovered flags are staged as a
    // parquet fixture that DuckDB re-aggregates, so the ratio is
    // hash-compared at the driver instead of living only in sbt test.
    // The fixture is keyed by the documents row count so concurrent
    // Verify/Bench runs at different SFs cannot clobber each other's
    // gate (the oracle selects its SF's rows by n_docs).
    "dedup_simhash_recovery" -> ((s: SparkSession, dir: String) => {
      val planted = withPlantedDupes(s, dir)
      val hits = DedupOps.simhashPairs(planted, "doc_id", "text",
          maxDist = 3)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("doc_id"), lit(true).as("rec"))
      val nDocs = docs(s, dir).count()
      val fx = docs(s, dir).orderBy("doc_id").limit(20).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("rec"), lit(false)).as("recovered"),
          lit(nDocs).as("n_docs"))
      val path = s"$gateFxBase/simhash/sf_$nDocs"
      fx.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .agg(count(lit(1)).cast("long").as("planted"),
          sum(col("recovered").cast("int")).cast("long").as("recovered"),
          floor(sum(col("recovered").cast("int")) * 1000.0 /
            count(lit(1))).cast("long").as("recall_x1000"))
    }),

    // The north rule's per-row invariant as a DRIVER VALUE gate: every
    // committed image decodes, carries the claimed magic, matches its
    // metadata dims, reproduces the original synthetic pixels
    // (PSNR>=40 dB for lossy jpeg, bit-exact — infinite PSNR — for
    // png/bmp), and its phash equals the original pixels' hash.
    // Structurally all-true (ImageCodec round-trip invariants), so
    // DuckDB can assert the aggregate from the staged per-image
    // fixture. The demo crawl is SF-independent — the fixture path is
    // stable and its content identical across runs.
    "multimodal_invariants" -> ((s: SparkSession, _: String) => {
      val images = CrawlQueries.demoResult(s).images.toDF()
      val inv = udf((bytes: Array[Byte], w: Int, h: Int, fmt: String,
          urlHash: Long, phash: Long) => {
        try {
          val magicOk = graft.fetch.ImageCodec.validMagic(bytes, fmt)
          val (dw, dh, px) = graft.fetch.ImageCodec.decode(bytes)
          val orig = graft.fetch.ImageCodec.synthPixels(urlHash, w, h)
          val psnrOk = dw == w && dh == h &&
            graft.fetch.ImageCodec.psnr(orig, px) >= 40.0
          (true, magicOk, dw == w && dh == h, psnrOk,
            graft.fetch.ImageCodec.phash(orig) == phash)
        } catch { case _: Exception => (false, false, false, false, false) }
      })
      val fx = images.withColumn("inv", inv(col("bytes"), col("w"),
          col("h"), col("fmt"), col("urlHash"), col("phash")))
        .select(col("image_id"), col("fmt"),
          col("inv._1").as("decoded"), col("inv._2").as("magic_ok"),
          col("inv._3").as("dims_ok"), col("inv._4").as("psnr_ok"),
          col("inv._5").as("phash_ok"))
      val path = s"$gateFxBase/mm"
      fx.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .groupBy(col("fmt"))
        .agg(count(lit(1)).cast("long").as("n"),
          bool_and(col("decoded")).as("all_decoded"),
          bool_and(col("magic_ok")).as("all_magic"),
          bool_and(col("dims_ok")).as("all_dims"),
          bool_and(col("psnr_ok")).as("all_psnr"),
          bool_and(col("phash_ok")).as("all_phash"))
        .orderBy(col("fmt"))
    }),

    // Winnowing-fingerprint stability gate: the fingerprint of every
    // document is identical under two different partitionings/plans
    // (catches nondeterministic UDF state); n_docs doubles as the
    // DuckDB-checked oracle value.
    "doc_fingerprint_stability" -> ((s: SparkSession, dir: String) => {
      val d = docs(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      val fp1 = d.repartition(8, col("doc_id"))
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp1"))
      val fp2 = d.repartition(3, col("text"))
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp2"))
      fp1.join(fp2, Seq("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("fp1") === col("fp2"), 1).otherwise(0))
            .cast("long").as("stable_docs"),
          bool_and(col("fp1") === col("fp2")).as("all_stable"))
    }),

    // Perceptual image near-dup (dHash + banded Hamming pairs) as a
    // DRIVER VALUE gate: the 20 lowest-urlHash demo images get a
    // planted near-duplicate — pixels perturbed by deterministic ±2
    // noise, then RE-ENCODED as jpeg — and must be re-found as an
    // (id, id+1e6) pair at Hamming ≤ 4. Honest ratio, not all-true: a
    // cell-mean near-tie in a smooth field can legitimately flip more
    // than 4 bits under noise; the measured floor is pinned in
    // OpsSpec. Per-image flags are staged as a parquet fixture DuckDB
    // re-aggregates (demo crawl is SF-independent → stable path).
    "image_neardup_recovery" -> ((s: SparkSession, _: String) => {
      val images = CrawlQueries.demoResult(s).images.toDF()
      // deterministic dense ids from the unique urlHash ordering (the
      // string image_id cannot take the +1e6 pair-offset trick). The
      // single-partition rank window sees ONLY the 8-byte hashes —
      // payload bytes must never cross a shuffle (PayloadStage rule;
      // the rid map is broadcast back onto the in-place payload rows).
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("urlHash"))
      val ridMap = images.select(col("urlHash"))
        .withColumn("rid", row_number().over(w).cast("long"))
      val base = images.select(col("urlHash"), col("bytes"))
        .join(broadcast(ridMap), Seq("urlHash"))
      val planted = base.filter(col("rid") <= 20)
        .select((col("rid") + lit(1000000L)).as("rid"),
          perturbJpeg(col("bytes"), col("urlHash")).as("bytes"))
      val pairs = graft.ops.MultimodalOps.imageNearDup(
        base.select(col("rid"), col("bytes")).unionByName(planted),
        "rid", "bytes", maxDist = 4)
      val hits = pairs.filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("rid"), lit(true).as("rec"))
      val fx = base.filter(col("rid") <= 20).select(col("rid"))
        .join(hits, Seq("rid"), "left_outer")
        .select(col("rid"), coalesce(col("rec"), lit(false)).as("recovered"))
      // unkeyed fixture path (unlike the simhash gate): the demo crawl
      // is SF-independent, so every run at every SF writes IDENTICAL
      // content here — concurrent overwrites converge; the sequential
      // Verify→oracle driver contract covers the transient window
      // (same contract the mm fixture relies on)
      val path = s"$gateFxBase/imgdup"
      fx.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .agg(count(lit(1)).cast("long").as("planted"),
          sum(col("recovered").cast("int")).cast("long").as("recovered"),
          floor(sum(col("recovered").cast("int")) * 1000.0 /
            count(lit(1))).cast("long").as("recall_x1000"))
    }),

    // Mirror-aware perceptual near-dup gate: the 20 lowest-urlHash
    // demo images get a planted HORIZONTALLY FLIPPED + jpeg
    // re-encoded copy at rid + 1e6 — the transform that pushes a
    // plain dHash to ~32 Hamming bits — and mirrorNearDup must
    // re-find each as an (id, id+1e6) pair; via_mirror records
    // honestly which recoveries needed the cross channel (a
    // left-right-symmetric image can legitimately recover plain).
    // Per-image flags staged as a parquet fixture DuckDB
    // re-aggregates (demo crawl is SF-independent → stable path).
    "image_mirror_recovery" -> ((s: SparkSession, _: String) => {
      val images = CrawlQueries.demoResult(s).images.toDF()
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("urlHash"))
      val ridMap = images.select(col("urlHash"))
        .withColumn("rid", row_number().over(w).cast("long"))
      val base = images.select(col("urlHash"), col("bytes"))
        .join(broadcast(ridMap), Seq("urlHash"))
      val planted = base.filter(col("rid") <= 20)
        .select((col("rid") + lit(1000000L)).as("rid"),
          mirrorJpeg(col("bytes")).as("bytes"))
      val pairs = graft.ops.MultimodalOps.mirrorNearDup(
        base.select(col("rid"), col("bytes")).unionByName(planted),
        "rid", "bytes", maxDist = 4)
      val hits = pairs.filter(col("id_b") === col("id_a") + 1000000L)
        .select(col("id_a").as("rid"), lit(true).as("rec"),
          col("mirrored"))
      val fx = base.filter(col("rid") <= 20).select(col("rid"))
        .join(hits, Seq("rid"), "left_outer")
        .select(col("rid"),
          coalesce(col("rec"), lit(false)).as("recovered"),
          coalesce(col("mirrored"), lit(false)).as("via_mirror"))
      val path = s"$gateFxBase/imgmirror"
      fx.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .agg(count(lit(1)).cast("long").as("planted"),
          sum(col("recovered").cast("int")).cast("long").as("recovered"),
          sum(col("via_mirror").cast("int")).cast("long").as("via_mirror"),
          floor(sum(col("recovered").cast("int")) * 1000.0 /
            count(lit(1))).cast("long").as("recall_x1000"))
    }),

    // INCREMENTAL image-index parity: a perturbed-copy batch probed
    // against the persisted perceptual-sketch index must emit exactly
    // the pairs the full recompute emits among batch-touching pairs —
    // the staged recompute is restricted by DuckDB independently
    // (batch rids sit above 1e6, corpus rids below, so the
    // restriction is a literal predicate)
    "image_index_parity" -> ((s: SparkSession, _: String) => {
      val images = CrawlQueries.demoResult(s).images.toDF()
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("urlHash"))
      val ridMap = images.select(col("urlHash"))
        .withColumn("rid", row_number().over(w).cast("long"))
      val base = images.select(col("urlHash"), col("bytes"))
        .join(broadcast(ridMap), Seq("urlHash"))
      val corpus = base.select(col("rid"), col("bytes"))
      val batch = base.filter(col("rid") <= 20)
        .select((col("rid") + lit(1000000L)).as("rid"),
          perturbJpeg(col("bytes"), col("urlHash")).as("bytes"))
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-skidx-gate").toString
      graft.ops.SketchIndex.init(idxDir, maxDist = 4)
      graft.ops.MultimodalOps.imageIndexAppend(corpus, "rid", "bytes",
        idxDir)
      val inc = graft.ops.MultimodalOps.imageIndexProbe(batch, "rid",
        "bytes", idxDir)
      val full = graft.ops.MultimodalOps.imageNearDup(
        corpus.unionByName(batch), "rid", "bytes", maxDist = 4)
      // unkeyed fixture path: the demo crawl is SF-independent (same
      // contract as the imgdup fixture above)
      full.write.mode("overwrite").parquet(s"$gateFxBase/imgidx")
      inc.select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // PERSISTED-IVF parity: top-k over the AnnIndex (frozen persisted
    // quantizer + cell-partitioned vectors, static partition pruning)
    // must equal the per-call ivfTopK verbatim — ranks and cosines.
    // The per-call result is staged and DuckDB replays it as the
    // oracle, so the hash compare pins the equality externally.
    "ann_index_parity" -> ((s: SparkSession, dir: String) => {
      val (q, c) = annSides(s, dir)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-ann-gate").toString
      // ONE quantizer training shared by the persisted build and the
      // per-call baseline (deterministic — bit-identical to training
      // each side separately, as before)
      val model = AnnOps.ivfModel(c, nlist = 16, iters = 2)
      graft.ops.AnnIndex.buildFrozen(c, idxDir, model)
      val perCall = AnnOps.ivfTopKFrozen(q, c, model, 5, nProbe = 4)
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/annidx/sf_$nVecs"
      perCall.withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      graft.ops.AnnIndex.topK(q, idxDir, 5, nProbe = 4)
        .select(col("qid"), col("cid"),
          floor(col("cosine") * 1000000).cast("long").as("cos_x1e6"),
          col("rk"))
        .orderBy("qid", "rk")
    }),

    // ANN recall as a CROSS-ENGINE oracle gate: the approximate pairs
    // (LSH and IVF, same operating points as the *_recall entries) are
    // staged as a parquet fixture; DuckDB independently recomputes the
    // EXACT integer-quantized brute-force top-5 (bit-for-bit the
    // oracle-green q36 ranking) from the embeddings table and
    // re-derives recall@5 from the staged pairs. The hash compare
    // therefore certifies the recall VALUES cross-engine — the
    // *_recall entries only prove Spark agrees with its own brute
    // baseline. Works even if an approx path were nondeterministic:
    // both engines score the SAME staged fixture. Keyed by vector
    // count (SF-dependent input, like the simhash gate).
    "ann_recall_vs_oracle" -> ((s: SparkSession, dir: String) => {
      val (q, c) = annSides(s, dir)
      val lsh = AnnOps.lshTopK(q, c, 5, planes = 6, tables = 8)
        .select(lit("lsh").as("algo"), col("qid"), col("cid"))
      val ivf = AnnOps.ivfTopK(q, c, 5, nlist = 16, nProbe = 8)
        .select(lit("ivf").as("algo"), col("qid"), col("cid"))
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/ann/sf_$nVecs"
      lsh.unionByName(ivf).withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      val approx = s.read.parquet(path).select(
        col("algo"), col("qid"), col("cid")).distinct()
      // brute top-5 on integer-quantized dots, ties by cid — must
      // mirror the q36 oracle ranking exactly so both engines agree
      // on the baseline set
      def qz(v: org.apache.spark.sql.Column) =
        transform(v, x => round(x.cast("double") * 1000).cast("long"))
      val qq = q.select(col("qid"), qz(col("qv")).as("qv"))
      val cc = c.select(col("cid"), qz(col("cv")).as("cv"))
      val dot = aggregate(zip_with(col("qv"), col("cv"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dot").desc, col("cid").asc)
      val brute = cc.crossJoin(broadcast(qq))
        .withColumn("dot", dot)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("cid"))
      brute.crossJoin(approx.select(col("algo")).distinct())
        .join(approx.withColumn("hit", lit(1)),
          Seq("algo", "qid", "cid"), "left_outer")
        .groupBy(col("algo"), col("qid"))
        .agg(floor(sum(coalesce(col("hit"), lit(0))) * 1000.0 /
          count(lit(1))).cast("long").as("recall_x1000"))
        .orderBy(col("algo"), col("qid"))
    }),

    "dedup_clusters" -> ((s: SparkSession, dir: String) =>
      DedupOps.connectedComponents(chainPairs(s, dir), "id_a", "id_b")
        .orderBy(col("id"))),

    "dedup_survivors" -> ((s: SparkSession, dir: String) =>
      DedupOps.dedupSurvivors(
        docs(s, dir).select(col("doc_id"), col("lang"), col("source"),
          col("n_chars")),
        "doc_id", chainPairs(s, dir))
        .orderBy(col("doc_id"))),

    "text_analysis" -> ((s: SparkSession, dir: String) =>
      docs(s, dir)
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .withColumn("tokens", TextOps.tokenCount(col("text")))
        .withColumn("subwords", TextOps.subwordCountEstimate(col("text")))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("quality")), 4).as("avg_quality"),
          sum(col("tokens")).cast("long").as("tokens"),
          sum(col("subwords")).cast("long").as("subwords"))
        .orderBy(col("lang"), col("lang_pred"))),

    // language-ID as a DRIVER VALUE gate: planted snippets with
    // unambiguous function-word/diagnostic-character profiles must
    // each classify to their language (recovery is deterministic by
    // construction — langIdScala is pure — so the oracle states the
    // expected per-language counts as literals, like
    // dedup_planted_text)
    "langid_planted_recovery" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      langIdPlanted.toDF("lang", "text")
        .withColumn("pred", TextOps.langId(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum((col("pred") === col("lang")).cast("int")).cast("long")
            .as("n_correct"))
        .orderBy(col("lang"))
    }),

    "doc_fingerprints" -> ((s: SparkSession, dir: String) =>
      docs(s, dir)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    "multimodal_features" -> ((s: SparkSession, _: String) => {
      val images = CrawlQueries.demoResult(s).images.toDF()
      MultimodalOps.imageFeatures(images)
        .drop("hist16") // array col: keep the dump schema flat
        .orderBy(col("image_id"), col("fmt"))
    }),

    // LAION-style image quality filter as a ROW-WISE parity gate: the
    // demo images plus four planted rejects (too small, extreme
    // aspect, flat/contrast-free, corrupt bytes) run through the
    // operator; per-image features AND the operator's keep decision
    // are staged, and DuckDB independently RE-DERIVES every keep flag
    // from the staged raw features (dims/std are exact — doubles
    // round-trip bit-identically through parquet). Row-wise compare:
    // one flipped decision anywhere fails the gate.
    "image_quality_parity" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      val demo = CrawlQueries.demoResult(s).images.toDF()
        .select(col("image_id"), col("fmt"), col("bytes"))
      def px(n: Int, f: Int => Int): Array[Byte] =
        Array.tabulate(n)(i => f(i).toByte)
      val planted = Seq(
        ("planted-tiny", "png",
          graft.fetch.ImageCodec.encode(px(64, _ * 37), 8, 8, "png")),
        ("planted-aspect", "png",
          graft.fetch.ImageCodec.encode(px(800, _ * 31), 200, 4, "png")),
        ("planted-flat", "png",
          graft.fetch.ImageCodec.encode(px(4096, _ => 128), 64, 64, "png")),
        ("planted-corrupt", "png",
          "definitely not an image payload".getBytes("UTF-8"))
      ).toDF("image_id", "fmt", "bytes")
      val out = MultimodalOps.imageQualityFilter(demo.unionByName(planted))
        .select(col("image_id"), col("fmt"), col("decoded"),
          col("dec_w"), col("dec_h"), col("px_std"), col("keep"))
      val path = s"$gateFxBase/imgqual"
      out.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("image_id"), col("fmt"), col("decoded"), col("keep"))
        .orderBy(col("image_id"))
    }),

    // SemDeDup (ops/SemDedup.scala) precision gate — the emb_prec
    // pattern: 10 planted exact copies guarantee a non-empty pair set
    // (identical vectors share a k-means cell under ANY centroid
    // outcome), and DuckDB re-scores EVERY emitted pair's cosine from
    // the raw embeddings — a false pair, a wrong cell-join, or a wrong
    // dot kernel all fail the row compare.
    "semdedup_precision" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = e.orderBy("vec_id").limit(10)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      val pairs = SemDedup.semanticPairs(e.unionByName(copies),
        "vec_id", "embedding", threshold = 0.999, nlist = 16)
      val nVecs = e.count()
      val path = s"$gateFxBase/semdedup_prec/sf_$nVecs"
      pairs.withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("id_a").cast("long").as("id_a"),
          col("id_b").cast("long").as("id_b"),
          round(col("cosine") * 1e6).cast("long").as("cos_x1e6"))
        .withColumn("ge_threshold", lit(true))
        .orderBy("id_a", "id_b")
    }),

    // SemDeDup end to end on a CONSTRUCTED corpus whose ground truth
    // is centroid-independent (SemDedupSpec proves why): 4 orthogonal
    // direction groups of 3 exact copies plus 4 singletons — survivors
    // are each group's lowest id + every singleton, a pure literal for
    // DuckDB. Pins quantizer → cell join → pairs → connected
    // components → keep-first survivors in one row compare.
    "semdedup_planted_survivors" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      val rows = (for { g <- 0 until 4; c <- 0 until 3 } yield {
        val v = Array.fill(8)(0f); v(g) = 1f + g * 0.25f
        (g * 10L + c, v.toSeq)
      }) ++ (for (k <- 0 until 4) yield {
        val v = Array.fill(8)(0.1f * (k + 1)); v(4 + k) = 2f
        (100L + k, v.toSeq)
      })
      val corpus = rows.toDF("id", "vec")
      SemDedup.semanticDedup(corpus.select("id"), "id",
          corpus, "id", "vec", threshold = 0.999, nlist = 4)
        .select(col("id")).orderBy("id")
    }),

    // Exact-substring dedup (ops/SubstringDedup.scala) as a ROW-WISE
    // parity gate: every duplicated-window occurrence Spark emits is
    // re-derived by DuckDB — it rebuilds the planted corpus, extracts
    // each claimed window's text by the claimed offsets with substr,
    // regroups by that text, and recomputes n_occ and the keep-first
    // flag. A wrong offset changes the extracted text and breaks the
    // regrouping; a missed or phantom occurrence breaks the counts.
    "substring_spans_parity" -> ((s: SparkSession, dir: String) => {
      val planted = withPlantedPara(s, dir)
      val nDocs = docs(s, dir).count()
      val path = s"$gateFxBase/substr_windows/sf_$nDocs"
      SubstringDedup.duplicateWindows(planted, "doc_id", "text", w = 8)
        .withColumn("n_docs", lit(nDocs))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("id"), col("start"), col("stop"), col("n_occ"),
          col("keep"))
        .orderBy("id", "start")
    }),

    // Exact-substring RECALL as a fully independent oracle: the merged
    // remove-spans inside the planted region must be exactly one span
    // per non-keeper planted doc covering the whole paragraph — DuckDB
    // derives the expected rows from the raw documents table alone
    // (offset = length(text)+1), never looking at Spark's output.
    "substring_planted_recovery" -> ((s: SparkSession, dir: String) => {
      val planted = withPlantedPara(s, dir)
      val spans = SubstringDedup.duplicateSpans(planted, "doc_id",
        "text", w = 8)
      val lens = docs(s, dir).select(col("doc_id").as("id"),
        length(col("text")).as("orig_len"))
      spans.join(lens, Seq("id"))
        .filter(col("start") >= col("orig_len"))
        .select(col("id"), col("start").cast("long").as("start"),
          col("stop").cast("long").as("stop"))
        .orderBy("id")
    }),

    // Incremental SemDeDup (AnnIndex.probePairs) parity gate, the
    // ann_index_parity pattern: build the index on the settled 80%,
    // probe the remaining 20% plus planted copies (two copies of five
    // base vectors — guaranteed cross-index AND within-batch pairs at
    // cosine 1.0 in the copies' frozen cells); the STAGED side is the
    // full SemDeDup recompute on the SAME frozen quantizer over
    // base ∪ batch restricted to batch-touching pairs, which DuckDB
    // replays — any probe/recompute divergence (assignment, pruning,
    // stored-norm drift, orientation) fails the row compare.
    "semdedup_index_parity" -> ((s: SparkSession, dir: String) => {
      val e = emb(s, dir).select(col("vec_id").as("cid"),
        col("embedding").as("cv"))
      val base = e.filter(col("cid") % 5 =!= 0)
      val copies1 = base.orderBy("cid").limit(5)
        .withColumn("cid", col("cid") + lit(1000000L))
      val copies2 = base.orderBy("cid").limit(5)
        .withColumn("cid", col("cid") + lit(2000000L))
      val batch = e.filter(col("cid") % 5 === 0)
        .unionByName(copies1).unionByName(copies2)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-semidx-gate").toString
      graft.ops.AnnIndex.build(base, idxDir, nlist = 16, iters = 2)
      val frozen = graft.ops.AnnIndex.readCentroids(s, idxDir)
      val full = SemDedup.semanticPairsFrozen(
          base.unionByName(batch), frozen, threshold = 0.999)
        .join(batch.select(col("cid").as("bid")),
          col("id_a") === col("bid") || col("id_b") === col("bid"),
          "left_semi")
      val nVecs = emb(s, dir).count()
      val path = s"$gateFxBase/semidx/sf_$nVecs"
      full.withColumn("n_vecs", lit(nVecs))
        .write.mode("overwrite").parquet(path)
      graft.ops.AnnIndex.probePairs(batch, idxDir, threshold = 0.999)
        .select(col("id_a"), col("id_b"), col("cl"),
          round(col("cosine") * 1e6).cast("long").as("cos_x1e6"))
        .orderBy("id_a", "id_b")
    }),

    // Inverted-index dictionary build (ops/InvertedIndex.scala) as a
    // two-sided exact derivation: both engines tokenize the documents
    // table, aggregate per-term document frequency, corpus-wide
    // occurrence count, and the 10 lowest containing doc ids, and
    // compare every dictionary row bit-for-bit.
    "q61_inverted_index" -> ((s: SparkSession, dir: String) => {
      graft.ops.InvertedIndex.dictionary(docs(s, dir), "doc_id", "text")
        .orderBy("term")
    }),

    // Paragraph-level exact dedup (ops/ParagraphDedup.scala) as a
    // two-sided exact derivation: both engines build the SAME
    // synthetic multi-paragraph corpus (doc triples joined by the
    // separator — the flat testdata docs carry no newlines — plus a
    // boilerplate paragraph planted on the four lowest synth ids),
    // run the keep-first paragraph dedup independently, and compare
    // md5(clean_text) byte-for-byte plus the paragraph counts.
    "q59_paragraph_dedup" -> ((s: SparkSession, dir: String) => {
      val synth = docs(s, dir)
        .groupBy(expr("doc_id div 3").as("id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          "\n\n").as("text"))
        .withColumn("text", when(col("id") < 4,
          concat(col("text"), lit("\n\n" + boilerPara)))
          .otherwise(col("text")))
      graft.ops.ParagraphDedup.paragraphDedup(synth, "id", "text")
        .select(col("id"),
          md5(col("clean_text").cast("binary")).as("clean_md5"),
          col("n_paras"), col("n_kept"))
        .orderBy("id")
    }),

    // Host-level boilerplate removal (ParagraphDedup
    // .hostBoilerplateClean) as a two-sided exact derivation: both
    // engines build the same synthetic multi-paragraph corpus hashed
    // onto 5 hosts, plant the boilerplate paragraph on ALL of h0's
    // docs (far past the 50% threshold) and on roughly HALF of h1's
    // (the integer cross-multiplication boundary), drop site-template
    // paragraphs in every occurrence, and compare md5(clean_text) +
    // counts. Distinct from q59's keep-first: no copy survives here.
    "q76_host_boilerplate" -> ((s: SparkSession, dir: String) => {
      val synth = docs(s, dir)
        .groupBy(expr("doc_id div 3").as("id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          "\n\n").as("text"))
        .withColumn("host",
          concat(lit("h"), (col("id") % 5).cast("string")))
        .withColumn("text", when(
          expr("id % 5 = 0 OR (id % 5 = 1 AND (id div 5) % 2 = 0)"),
          concat(col("text"), lit("\n\n" + boilerPara)))
          .otherwise(col("text")))
      graft.ops.ParagraphDedup
        .hostBoilerplateClean(synth, "id", "text", "host")
        .select(col("id"),
          md5(col("clean_text").cast("binary")).as("clean_md5"),
          col("n_paras"), col("n_kept"))
        .orderBy("id")
    }),

    // Template/watermark caption filter (MultimodalOps
    // .captionTemplateFilter) over the REAL demo crawl's image+caption
    // table plus planted boundary rows: three whitespace-variant
    // copies of one caption (normalize-equal, == maxFreq → template),
    // an exact-duplicate pair (== maxFreq-1 → kept), and a singleton.
    // The raw (image_id, caption) rows are staged and DuckDB
    // re-derives every normalized count and verdict from the TEXT —
    // the operator's md5 keying must agree with plain string grouping.
    // The demo crawl's NÃO-INFORMADO sentinel captions are natural
    // templates, so the gate exercises real repeats too.
    "q77_caption_template" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      val demo = CrawlQueries.demoResult(s).images.toDF()
        .select(col("image_id"), col("caption"))
      val planted = Seq(
        ("planted-t1", "Orçamento  anual\t2024"),
        ("planted-t2", "Orçamento anual 2024"),
        ("planted-t3", " Orçamento anual 2024 "),
        ("planted-p1", "par de legenda rara"),
        ("planted-p2", "par de legenda rara"),
        ("planted-s1", "legenda única")
      ).toDF("image_id", "caption")
      // unkeyed fixture path: demo crawl + planted literals are
      // SF-independent, every run writes identical content (mm rule)
      val path = s"$gateFxBase/captions"
      demo.unionByName(planted).write.mode("overwrite").parquet(path)
      graft.ops.MultimodalOps.captionTemplateFilter(
          s.read.parquet(path), "image_id", "caption", maxFreq = 3)
        .orderBy("image_id")
    }),

    // Multi-aspect training batches (MultimodalOps.aspectBatches) over
    // the demo image table's REAL (w, h) dims plus planted probes: an
    // exact common-denominator cost TIE (112×64 is equidistant from
    // 3:2 and 2:1 — the lowest ladder index must win), off-ladder
    // extremes clamping to 3:1 / 1:3, and a near-square. The raw dims
    // are staged; DuckDB re-derives bucket argmin (same integer
    // common-denominator costs, embedded from the SAME ladder), batch
    // index, slot, and the full-batch flag — layout row-for-row.
    "q78_aspect_batches" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      // demo image_ids repeat across sites (same portal filename on
      // different hosts); the packing order contract needs a UNIQUE
      // key, so the fixture keys on image_id#urlHash (urlHash is
      // unique by construction — the seen-set dedup guarantees one
      // committed row per URL)
      val demo = CrawlQueries.demoResult(s).images.toDF()
        .select(concat_ws("#", col("image_id"), col("urlHash"))
          .as("image_id"), col("w"), col("h"))
      val planted = Seq(
        ("planted-tie", 112, 64),
        ("planted-wide", 1000, 10),
        ("planted-tall", 10, 1000),
        ("planted-square", 65, 64)
      ).toDF("image_id", "w", "h")
      val path = s"$gateFxBase/aspect"
      demo.unionByName(planted).write.mode("overwrite").parquet(path)
      graft.ops.MultimodalOps.aspectBatches(
          s.read.parquet(path), "image_id", "w", "h", batchSize = 8)
        .orderBy("image_id")
    }),

    // The full Gopher quality-rule battery (TextOps.gopherQualityRules)
    // as a two-sided exact derivation: no staging — DuckDB recomputes
    // every count and every rule boolean from the text itself (all
    // rules are integer comparisons, so cross-engine equality is
    // structural, not float-lucky). The planted probes (one per rule)
    // guarantee each failure mode appears at every SF.
    "q58_gopher_rules" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val corpus = docs(s, dir).select(col("doc_id"), col("text"))
        .unionByName(gopherPlanted.toDF("doc_id", "text"))
      TextOps.gopherQualityRules(corpus).orderBy("doc_id")
    }),

    // BM25 top-k retrieval (InvertedIndex.bm25TopK) as a two-sided
    // exact derivation: both engines tokenize, build postings for the
    // three query terms, and walk the identical fixed-point integer
    // chain (rational idf, Okapi tf-saturation, floor division
    // end-to-end) — every score micro-unit, and therefore the ranking
    // with its ascending-doc-id tie-break, compares bit-for-bit.
    "q64_bm25_topk" -> ((s: SparkSession, dir: String) => {
      graft.ops.InvertedIndex.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "vector", "merge"), 20)
        .orderBy("rk")
    }),

    // Unigram rarity scoring (TextOps.rarityScore — the integer-exact
    // CCNet perplexity-filter stand-in) as a two-sided exact
    // derivation: DuckDB recomputes every token's document frequency,
    // the micro-unit rarity, and the per-document occurrence-weighted
    // mean with the same floor divisions.
    "q68_rarity_score" -> ((s: SparkSession, dir: String) => {
      graft.ops.TextOps.rarityScore(docs(s, dir)).orderBy("doc_id")
    }),

    // Exact-phrase retrieval (InvertedIndex.phraseTopK) as a
    // two-sided exact derivation: DuckDB re-derives every token
    // position, intersects the two witness sets on (doc, start), and
    // re-ranks by match count with the ascending-doc-id tie-break —
    // a positional off-by-one, a lost duplicate occurrence, or a
    // broken tie-break shifts a row.
    "q73_phrase_topk" -> ((s: SparkSession, dir: String) => {
      graft.ops.InvertedIndex.phraseTopK(docs(s, dir), "doc_id",
        "text", Seq("table", "hash"), 10)
        .orderBy("rk")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // ground truth for the chain fixture: maximal runs of consecutive
    // same-lang doc_ids ARE the connected components; run head = the
    // component id. WHERE linked (evaluated before the SELECT window)
    // restricts both the rows and the min() to nodes with >=1 edge,
    // matching connectedComponents' domain exactly.
    "dedup_clusters" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         lag(doc_id) OVER w AS pid, lag(lang) OVER w AS plang,
        |         lead(doc_id) OVER w AS nid, lead(lang) OVER w AS nlang
        |  FROM documents WINDOW w AS (ORDER BY doc_id)),
        |g AS (
        |  SELECT doc_id,
        |         CASE WHEN plang = lang AND pid = doc_id - 1
        |              THEN 0 ELSE 1 END AS brk,
        |         ((plang = lang AND pid = doc_id - 1) OR
        |          (nlang = lang AND nid = doc_id + 1)) AS linked
        |  FROM d),
        |r AS (SELECT doc_id, linked,
        |             sum(brk) OVER (ORDER BY doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM g)
        |SELECT doc_id AS id,
        |       min(doc_id) OVER (PARTITION BY grp) AS component
        |FROM r WHERE linked ORDER BY id""".stripMargin,
    "dedup_survivors" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         lag(doc_id) OVER w AS pid, lag(lang) OVER w AS plang,
        |         lead(doc_id) OVER w AS nid, lead(lang) OVER w AS nlang
        |  FROM documents WINDOW w AS (ORDER BY doc_id)),
        |g AS (
        |  SELECT doc_id,
        |         CASE WHEN plang = lang AND pid = doc_id - 1
        |              THEN 0 ELSE 1 END AS brk,
        |         ((plang = lang AND pid = doc_id - 1) OR
        |          (nlang = lang AND nid = doc_id + 1)) AS linked
        |  FROM d),
        |r AS (SELECT doc_id, linked,
        |             sum(brk) OVER (ORDER BY doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM g),
        |cc AS (SELECT doc_id,
        |              min(doc_id) OVER (PARTITION BY grp) AS component
        |       FROM r WHERE linked)
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN
        |  (SELECT doc_id FROM cc WHERE doc_id <> component)
        |ORDER BY doc_id""".stripMargin,
    // word-bigram mutation adds ~2 of ~T ngrams -> jaccard near 1:
    // all-true is structural for BOTH jaccard families
    "dedup_planted_text" ->
      """SELECT doc_id, true AS minhash_found, true AS ngram_found
        |FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20)
        |ORDER BY doc_id""".stripMargin,
    "dedup_planted_embedding" ->
      """SELECT vec_id, true AS embedding_found
        |FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 10)
        |ORDER BY vec_id""".stripMargin,
    // re-aggregates the staged per-doc recovery flags; the n_docs key
    // selects this SF's fixture rows (concurrent SFs write disjoint
    // subdirs). floor() before the BIGINT cast on BOTH sides — DuckDB
    // rounds double->bigint casts while Spark truncates.
    "dedup_simhash_recovery" ->
      """SELECT CAST(count(*) AS BIGINT) AS planted,
        | CAST(count(*) FILTER (WHERE recovered) AS BIGINT) AS recovered,
        | CAST(floor(count(*) FILTER (WHERE recovered) * 1000.0
        |   / count(*)) AS BIGINT) AS recall_x1000
        |FROM '/tmp/graft_gate_fx/simhash/*/*.parquet'
        |WHERE n_docs = (SELECT count(*) FROM documents)""".stripMargin,
    "multimodal_invariants" ->
      """SELECT fmt, CAST(count(*) AS BIGINT) AS n,
        | bool_and(decoded) AS all_decoded,
        | bool_and(magic_ok) AS all_magic,
        | bool_and(dims_ok) AS all_dims,
        | bool_and(psnr_ok) AS all_psnr,
        | bool_and(phash_ok) AS all_phash
        |FROM '/tmp/graft_gate_fx/mm/*.parquet'
        |GROUP BY fmt ORDER BY fmt""".stripMargin,
    "doc_fingerprint_stability" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(count(*) AS BIGINT) AS stable_docs,
        | true AS all_stable
        |FROM documents""".stripMargin,
    // literal expectations, like dedup_planted_text: every planted
    // snippet must classify to its language (n_correct = n)
    "langid_planted_recovery" ->
      """SELECT lang, CAST(n AS BIGINT) AS n, CAST(n AS BIGINT) AS n_correct
        |FROM (VALUES ('de', 2), ('en', 2), ('es', 2), ('fr', 2),
        |  ('pt', 2), ('und', 1), ('zh', 1)) AS t(lang, n)
        |ORDER BY lang""".stripMargin,
    // recomputes the exact quantized brute-force top-5 independently
    // (the q36 ranking) and re-derives recall@5 from the staged
    // approximate pairs — a genuine cross-engine value check
    // per-algo recall gates: identical brute derivation, each against
    // its own staged approx fixture (one fixture per entry so query
    // execution order cannot stale a shared one)
    "ann_lsh_recall" ->
      """WITH qz AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |  FROM embeddings),
        | q AS (SELECT vec_id AS qid, v AS qv FROM qz WHERE vec_id < 3),
        | c AS (SELECT vec_id AS cid, v AS cv FROM qz WHERE vec_id >= 3),
        | ranked AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |   ORDER BY CAST(list_dot_product(qv, cv) AS BIGINT) DESC,
        |     cid ASC) AS rk
        |  FROM q CROSS JOIN c),
        | brute AS (SELECT qid, cid FROM ranked WHERE rk <= 5),
        | approx AS (SELECT DISTINCT qid, cid
        |  FROM '/tmp/graft_gate_fx/annrecall_lsh/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings))
        |SELECT b.qid AS qid,
        | CAST(floor(count(a.cid) * 1000.0 / count(*)) AS BIGINT)
        |   AS recall_x1000
        |FROM brute b
        |LEFT JOIN approx a ON a.qid = b.qid AND a.cid = b.cid
        |GROUP BY b.qid
        |ORDER BY qid""".stripMargin,
    "ann_ivf_recall" ->
      """WITH qz AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |  FROM embeddings),
        | q AS (SELECT vec_id AS qid, v AS qv FROM qz WHERE vec_id < 3),
        | c AS (SELECT vec_id AS cid, v AS cv FROM qz WHERE vec_id >= 3),
        | ranked AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |   ORDER BY CAST(list_dot_product(qv, cv) AS BIGINT) DESC,
        |     cid ASC) AS rk
        |  FROM q CROSS JOIN c),
        | brute AS (SELECT qid, cid FROM ranked WHERE rk <= 5),
        | approx AS (SELECT DISTINCT qid, cid
        |  FROM '/tmp/graft_gate_fx/annrecall_ivf/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings))
        |SELECT b.qid AS qid,
        | CAST(floor(count(a.cid) * 1000.0 / count(*)) AS BIGINT)
        |   AS recall_x1000
        |FROM brute b
        |LEFT JOIN approx a ON a.qid = b.qid AND a.cid = b.cid
        |GROUP BY b.qid
        |ORDER BY qid""".stripMargin,
    "ann_recall_vs_oracle" ->
      """WITH qz AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |  FROM embeddings),
        | q AS (SELECT vec_id AS qid, v AS qv FROM qz WHERE vec_id < 3),
        | c AS (SELECT vec_id AS cid, v AS cv FROM qz WHERE vec_id >= 3),
        | ranked AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |   ORDER BY CAST(list_dot_product(qv, cv) AS BIGINT) DESC,
        |     cid ASC) AS rk
        |  FROM q CROSS JOIN c),
        | brute AS (SELECT qid, cid FROM ranked WHERE rk <= 5),
        | approx AS (SELECT DISTINCT algo, qid, cid
        |  FROM '/tmp/graft_gate_fx/ann/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings)),
        | algos AS (SELECT DISTINCT algo FROM approx)
        |SELECT al.algo AS algo, b.qid AS qid,
        | CAST(floor(count(a.cid) * 1000.0 / count(*)) AS BIGINT)
        |   AS recall_x1000
        |FROM brute b CROSS JOIN algos al
        |LEFT JOIN approx a
        |  ON a.algo = al.algo AND a.qid = b.qid AND a.cid = b.cid
        |GROUP BY al.algo, b.qid
        |ORDER BY algo, qid""".stripMargin,
    // the staged FULL recompute restricted to batch-touching pairs
    // must equal the incremental probe's output row-for-row
    "dedup_index_parity" ->
      """WITH b AS (SELECT doc_id
        |  FROM '/tmp/graft_gate_fx/dedup_index/*/batch_ids/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | f AS (SELECT id_a, id_b, jaccard
        |  FROM '/tmp/graft_gate_fx/dedup_index/*/full/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents))
        |SELECT CAST(id_a AS BIGINT) AS id_a,
        | CAST(id_b AS BIGINT) AS id_b,
        | CAST(round(jaccard * 1000000) AS BIGINT) AS jaccard_x1e6
        |FROM f
        |WHERE id_a IN (SELECT doc_id FROM b)
        |   OR id_b IN (SELECT doc_id FROM b)
        |ORDER BY id_a, id_b""".stripMargin,
    // recomputes each emitted pair's exact Jaccard from RAW 5-char
    // substring sets (list comprehension over the normalized text) —
    // no hashing involved — and asserts ge_threshold as a literal
    "dedup_minhash_precision" ->
      """WITH pairs AS (SELECT id_a, id_b
        |  FROM '/tmp/graft_gate_fx/minhash_prec/*/pairs/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | corpus AS (SELECT doc_id,
        |   lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
        |  FROM '/tmp/graft_gate_fx/minhash_prec/*/corpus/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | sh AS (SELECT doc_id,
        |   CASE WHEN length(t) < 5 THEN [t]
        |        ELSE list_distinct([substring(t, i, 5)
        |          for i in range(1, length(t) - 3)])
        |   END AS s
        |  FROM corpus),
        | j AS (SELECT p.id_a, p.id_b,
        |   len(list_intersect(a.s, b.s)) AS inter,
        |   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
        |  FROM pairs p
        |  JOIN sh a ON a.doc_id = p.id_a
        |  JOIN sh b ON b.doc_id = p.id_b)
        |SELECT id_a, id_b,
        | CAST(floor((CAST(inter AS DOUBLE) / uni) * 1000) AS BIGINT)
        |   AS jaccard_x1000,
        | true AS ge_threshold
        |FROM j ORDER BY id_a, id_b""".stripMargin,
    // recomputes each emitted pair's exact word-bigram Jaccard from
    // RAW token lists of the staged corpus (no hashing) and asserts
    // ge_threshold as a literal — the bigram-family twin of
    // dedup_minhash_precision
    "dedup_ngram_precision" ->
      """WITH pairs AS (SELECT id_a, id_b
        |  FROM '/tmp/graft_gate_fx/ngram_prec/*/pairs/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | corpus AS (SELECT doc_id,
        |   list_filter(string_split_regex(lower(text), '\s+'),
        |     x -> x <> '') AS toks
        |  FROM '/tmp/graft_gate_fx/ngram_prec/*/corpus/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | sh AS (SELECT doc_id,
        |   CASE WHEN len(toks) < 2
        |        THEN [coalesce(array_to_string(toks, ' '), '')]
        |        ELSE list_distinct([toks[i] || ' ' || toks[i+1]
        |          for i in range(1, len(toks))])
        |   END AS s
        |  FROM corpus),
        | j AS (SELECT p.id_a, p.id_b,
        |   len(list_intersect(a.s, b.s)) AS inter,
        |   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
        |  FROM pairs p
        |  JOIN sh a ON a.doc_id = p.id_a
        |  JOIN sh b ON b.doc_id = p.id_b)
        |SELECT id_a, id_b,
        | CAST(floor((CAST(inter AS DOUBLE) / uni) * 1000) AS BIGINT)
        |   AS jaccard_x1000,
        | true AS ge_threshold
        |FROM j ORDER BY id_a, id_b""".stripMargin,
    // TWO-SIDED exact containment oracle: DuckDB rebuilds the planted
    // corpus (doc_id%100==0 → first max(4, ntoks//3) tokens at
    // id+2e6), derives word 4-grams, prunes df > 64 and sub-4-gram
    // docs, and re-derives the FULL pair set with integer
    // cross-multiplied verdicts — the raw-string twin of Spark's
    // hashed-gram computation (they agree absent 64-bit collisions,
    // as with every gram-family gate).
    "q81_containment_pairs" ->
      """WITH raw AS (SELECT doc_id, coalesce(text, '') AS text
        |  FROM documents),
        | tok AS (SELECT doc_id,
        |   list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     x -> x <> '') AS toks
        |  FROM raw),
        | planted AS (SELECT doc_id + 2000000 AS doc_id,
        |   toks[1:greatest(4, len(toks)//3)] AS toks
        |  FROM tok WHERE doc_id % 100 = 0),
        | alltok AS (SELECT doc_id, toks FROM tok
        |  UNION ALL SELECT doc_id, toks FROM planted),
        | gr AS (SELECT doc_id,
        |   CASE WHEN len(toks) < 4
        |        THEN [coalesce(array_to_string(toks, ' '), '')]
        |        ELSE list_distinct([array_to_string(toks[i:i+3], ' ')
        |          for i in range(1, len(toks) - 2)])
        |   END AS gs FROM alltok),
        | gd AS (SELECT doc_id, unnest(gs) AS g FROM gr),
        | dfq AS (SELECT g, count(*) AS dfreq FROM gd GROUP BY 1),
        | kept AS (SELECT gd.doc_id, gd.g, dfq.dfreq
        |  FROM gd JOIN dfq USING (g) WHERE dfq.dfreq <= 64),
        | sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
        | szok AS (SELECT doc_id FROM sz WHERE sz >= 4),
        | kp AS (SELECT k.doc_id, k.g FROM kept k
        |  JOIN szok USING (doc_id) WHERE k.dfreq >= 2),
        | pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   count(*) AS shared
        |  FROM kp a JOIN kp b
        |    ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.shared,
        | sa.sz AS size_a, sb.sz AS size_b,
        | (p.shared * 1000) // least(sa.sz, sb.sz) AS cont_x1000
        |FROM pr p
        |JOIN sz sa ON sa.doc_id = p.id_a
        |JOIN sz sb ON sb.doc_id = p.id_b
        |WHERE p.shared * 100 >= least(sa.sz, sb.sz) * 90
        |ORDER BY id_a, id_b""".stripMargin,
    // TWO-SIDED frozen-universe oracle for the containment index:
    // stop set from CORPUS-ONLY df (the frozen build), grams of
    // corpus + planted batch, pruned sizes, and every batch-touching
    // pair re-derived from raw text — the incremental probe must
    // equal this restriction exactly
    "containment_index_parity" ->
      """WITH raw AS (SELECT doc_id, coalesce(text, '') AS text
        |  FROM documents),
        | tok AS (SELECT doc_id,
        |   list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |     x -> x <> '') AS toks
        |  FROM raw),
        | ptok AS (SELECT doc_id + 2000000 AS doc_id,
        |   toks[1:greatest(4, len(toks)//3)] AS toks
        |  FROM tok WHERE doc_id % 100 = 0),
        | grc AS (SELECT doc_id,
        |   CASE WHEN len(toks) < 4
        |        THEN [coalesce(array_to_string(toks, ' '), '')]
        |        ELSE list_distinct([array_to_string(toks[i:i+3], ' ')
        |          for i in range(1, len(toks) - 2)])
        |   END AS gs FROM tok),
        | grp AS (SELECT doc_id,
        |   CASE WHEN len(toks) < 4
        |        THEN [coalesce(array_to_string(toks, ' '), '')]
        |        ELSE list_distinct([array_to_string(toks[i:i+3], ' ')
        |          for i in range(1, len(toks) - 2)])
        |   END AS gs FROM ptok),
        | gdc AS (SELECT doc_id, unnest(gs) AS g FROM grc),
        | gdp AS (SELECT doc_id, unnest(gs) AS g FROM grp),
        | stops AS (SELECT g FROM gdc GROUP BY g HAVING count(*) > 64),
        | gdall AS (SELECT doc_id, g FROM gdc
        |  UNION ALL SELECT doc_id, g FROM gdp),
        | kept AS (SELECT a.doc_id, a.g FROM gdall a
        |  LEFT JOIN stops s ON a.g = s.g WHERE s.g IS NULL),
        | sz AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
        | szok AS (SELECT doc_id FROM sz WHERE sz >= 4),
        | kp AS (SELECT k.doc_id, k.g FROM kept k
        |  JOIN szok USING (doc_id)),
        | pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |   count(*) AS shared
        |  FROM kp a JOIN kp b
        |    ON a.g = b.g AND a.doc_id < b.doc_id
        |  WHERE a.doc_id >= 2000000 OR b.doc_id >= 2000000
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, p.shared,
        | sa.sz AS size_a, sb.sz AS size_b,
        | (p.shared * 1000) // least(sa.sz, sb.sz) AS cont_x1000
        |FROM pr p
        |JOIN sz sa ON sa.doc_id = p.id_a
        |JOIN sz sb ON sb.doc_id = p.id_b
        |WHERE p.shared * 100 >= least(sa.sz, sb.sz) * 90
        |ORDER BY id_a, id_b""".stripMargin,
    // re-derives each emitted pair's Hamming distance independently
    // from the staged per-doc sketches (bit_count over xor) and states
    // le_max as a literal
    "dedup_simhash_precision" ->
      """WITH p AS (SELECT id_a, id_b
        |  FROM '/tmp/graft_gate_fx/simhash_prec/*/pairs/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | sk AS (SELECT doc_id, sh
        |  FROM '/tmp/graft_gate_fx/simhash_prec/*/sketches/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents))
        |SELECT CAST(p.id_a AS BIGINT) AS id_a,
        | CAST(p.id_b AS BIGINT) AS id_b,
        | CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming,
        | true AS le_max
        |FROM p
        |JOIN sk a ON a.doc_id = p.id_a
        |JOIN sk b ON b.doc_id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,
    // recomputes each emitted pair's cosine in double from the raw
    // embeddings table (planted ids >= 1e6 share their original's
    // vector) — ge_threshold is the ORACLE's judgment of the pair
    "dedup_embedding_precision" ->
      """WITH p AS (SELECT id_a, id_b
        |  FROM '/tmp/graft_gate_fx/emb_prec/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings)),
        | e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        | scored AS (SELECT p.id_a, p.id_b,
        |   round(CASE WHEN sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0
        |     ELSE list_dot_product(a.v, b.v) /
        |       (sqrt(list_dot_product(a.v, a.v)) *
        |        sqrt(list_dot_product(b.v, b.v))) END, 6) AS cosine
        |  FROM p
        |  JOIN e a ON a.vec_id = CASE WHEN p.id_a >= 1000000
        |    THEN p.id_a - 1000000 ELSE p.id_a END
        |  JOIN e b ON b.vec_id = CASE WHEN p.id_b >= 1000000
        |    THEN p.id_b - 1000000 ELSE p.id_b END)
        |SELECT id_a, id_b,
        | CAST(round(cosine * 1e6) AS BIGINT) AS cos_x1e6,
        | CAST(round(cosine * 1e6) AS BIGINT) >= 999000 AS ge_threshold
        |FROM scored ORDER BY id_a, id_b""".stripMargin,
    // independently re-ranks the STAGED LSH candidate set by exact
    // double cosine — the op's own top-5 (ranks, ties, 6-dp cosines)
    // must match rank-for-rank
    "ann_lsh_top5" ->
      """WITH cand AS (SELECT DISTINCT qid, cid
        |  FROM '/tmp/graft_gate_fx/lsh_top5/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings)),
        | e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        | scored AS (SELECT c.qid, c.cid,
        |   round(CASE WHEN sqrt(list_dot_product(q.v, q.v)) *
        |       sqrt(list_dot_product(d.v, d.v)) = 0 THEN 0
        |     ELSE list_dot_product(q.v, d.v) /
        |       (sqrt(list_dot_product(q.v, q.v)) *
        |        sqrt(list_dot_product(d.v, d.v))) END, 6) AS cosine
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.qid
        |  JOIN e d ON d.vec_id = c.cid),
        | ranked AS (SELECT qid, cid,
        |   CAST(round(cosine * 1e6) AS BIGINT) AS cos_x1e6,
        |   CAST(row_number() OVER (PARTITION BY qid
        |     ORDER BY cosine DESC, cid ASC) AS BIGINT) AS rk
        |  FROM scored)
        |SELECT qid, cid, cos_x1e6, rk FROM ranked WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin,
    // same re-ranking gate over the staged IVF candidate set
    "ann_ivf_top5" ->
      """WITH cand AS (SELECT DISTINCT qid, cid
        |  FROM '/tmp/graft_gate_fx/ivf_top5/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings)),
        | e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        | scored AS (SELECT c.qid, c.cid,
        |   round(CASE WHEN sqrt(list_dot_product(q.v, q.v)) *
        |       sqrt(list_dot_product(d.v, d.v)) = 0 THEN 0
        |     ELSE list_dot_product(q.v, d.v) /
        |       (sqrt(list_dot_product(q.v, q.v)) *
        |        sqrt(list_dot_product(d.v, d.v))) END, 6) AS cosine
        |  FROM cand c
        |  JOIN e q ON q.vec_id = c.qid
        |  JOIN e d ON d.vec_id = c.cid),
        | ranked AS (SELECT qid, cid,
        |   CAST(round(cosine * 1e6) AS BIGINT) AS cos_x1e6,
        |   CAST(row_number() OVER (PARTITION BY qid
        |     ORDER BY cosine DESC, cid ASC) AS BIGINT) AS rk
        |  FROM scored)
        |SELECT qid, cid, cos_x1e6, rk FROM ranked WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin,
    // re-aggregates the staged per-image recovery flags (same floor()
    // rule as dedup_simhash_recovery)
    "image_neardup_recovery" ->
      """SELECT CAST(count(*) AS BIGINT) AS planted,
        | CAST(count(*) FILTER (WHERE recovered) AS BIGINT) AS recovered,
        | CAST(floor(count(*) FILTER (WHERE recovered) * 1000.0
        |   / count(*)) AS BIGINT) AS recall_x1000
        |FROM '/tmp/graft_gate_fx/imgdup/*.parquet'""".stripMargin,
    // re-aggregates the staged per-image mirror-recovery flags (same
    // floor() rule as image_neardup_recovery; via_mirror re-counted)
    "image_mirror_recovery" ->
      """SELECT CAST(count(*) AS BIGINT) AS planted,
        | CAST(count(*) FILTER (WHERE recovered) AS BIGINT) AS recovered,
        | CAST(count(*) FILTER (WHERE via_mirror) AS BIGINT)
        |   AS via_mirror,
        | CAST(floor(count(*) FILTER (WHERE recovered) * 1000.0
        |   / count(*)) AS BIGINT) AS recall_x1000
        |FROM '/tmp/graft_gate_fx/imgmirror/*.parquet'""".stripMargin,
    // replays the staged per-call IVF ranking — the persisted index's
    // output must hash-match it rank-for-rank, cosine included
    "ann_index_parity" ->
      """SELECT qid, cid,
        | CAST(floor(cosine * 1000000) AS BIGINT) AS cos_x1e6, rk
        |FROM '/tmp/graft_gate_fx/annidx/*/*.parquet'
        |WHERE n_vecs = (SELECT count(*) FROM embeddings)
        |ORDER BY qid, rk""".stripMargin,
    // the staged full recompute restricted to batch-touching pairs
    // (batch rids >= 1e6 by construction) must equal the incremental
    // probe's output row-for-row, Hamming distances included
    "image_index_parity" ->
      """SELECT CAST(id_a AS BIGINT) AS id_a,
        | CAST(id_b AS BIGINT) AS id_b,
        | CAST(hamming AS BIGINT) AS hamming
        |FROM '/tmp/graft_gate_fx/imgidx/*.parquet'
        |WHERE id_a >= 1000000 OR id_b >= 1000000
        |ORDER BY id_a, id_b""".stripMargin,
    // re-derives every keep decision from the staged raw features
    // (decode flag, dims, pixel stddev) with the same thresholds the
    // operator used — the staged `keep` column itself is NOT read
    "image_quality_parity" ->
      """SELECT image_id, fmt, decoded,
        | coalesce(decoded AND least(dec_w, dec_h) >= 32 AND
        |   greatest(dec_w, dec_h) * 1.0 / least(dec_w, dec_h) <= 3.0 AND
        |   px_std >= 5.0, false) AS keep
        |FROM '/tmp/graft_gate_fx/imgqual/*.parquet'
        |ORDER BY image_id""".stripMargin,
    // re-scores every SemDeDup pair by exact double cosine from the
    // raw embeddings (planted copies map back to their source vector)
    "semdedup_precision" ->
      """WITH p AS (SELECT id_a, id_b
        |  FROM '/tmp/graft_gate_fx/semdedup_prec/*/*.parquet'
        |  WHERE n_vecs = (SELECT count(*) FROM embeddings)),
        | e AS (SELECT vec_id,
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        | scored AS (SELECT p.id_a, p.id_b,
        |   round(CASE WHEN sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v)) = 0 THEN 0
        |     ELSE list_dot_product(a.v, b.v) /
        |       (sqrt(list_dot_product(a.v, a.v)) *
        |        sqrt(list_dot_product(b.v, b.v))) END, 6) AS cosine
        |  FROM p
        |  JOIN e a ON a.vec_id = CASE WHEN p.id_a >= 1000000
        |    THEN p.id_a - 1000000 ELSE p.id_a END
        |  JOIN e b ON b.vec_id = CASE WHEN p.id_b >= 1000000
        |    THEN p.id_b - 1000000 ELSE p.id_b END)
        |SELECT id_a, id_b,
        | CAST(round(cosine * 1e6) AS BIGINT) AS cos_x1e6,
        | CAST(round(cosine * 1e6) AS BIGINT) >= 999000 AS ge_threshold
        |FROM scored ORDER BY id_a, id_b""".stripMargin,
    // the constructed-corpus survivor set is a pure literal: each
    // exact-copy group's lowest id plus the four singletons
    "semdedup_planted_survivors" ->
      """SELECT CAST(id AS BIGINT) AS id FROM (VALUES
        | (0), (10), (20), (30), (100), (101), (102), (103)) t(id)
        |ORDER BY id""".stripMargin,
    // rebuilds the planted corpus, extracts every claimed window by
    // its claimed offsets, regroups by the extracted TEXT, and
    // recomputes occurrence counts and keep-first flags — the staged
    // n_occ/keep columns themselves are NOT read
    "substring_spans_parity" ->
      ("""WITH low AS (SELECT doc_id FROM documents
        |  ORDER BY doc_id LIMIT 8),
        | d AS (SELECT doc_id, CASE WHEN doc_id IN
        |    (SELECT doc_id FROM low)
        |   THEN text || ' uqq' || CAST(doc_id AS VARCHAR) || ' """ +
        (0 until 10).map(i => s"graftdup$i").mkString(" ") +
        """' ELSE text END AS text FROM documents),
        | st AS (SELECT id, start, stop
        |  FROM '/tmp/graft_gate_fx/substr_windows/*/*.parquet'
        |  WHERE n_docs = (SELECT count(*) FROM documents)),
        | j AS (SELECT st.id, st.start, st.stop,
        |   substr(d.text, st.start + 1, st.stop - st.start) AS sub
        |  FROM st JOIN d ON d.doc_id = st.id),
        | g AS (SELECT id, start, stop,
        |   count(*) OVER (PARTITION BY sub) AS n_occ,
        |   (row_number() OVER (PARTITION BY sub ORDER BY id, start) = 1)
        |     AS keep
        |  FROM j)
        |SELECT id, start, stop, CAST(n_occ AS BIGINT) AS n_occ, keep
        |FROM g ORDER BY id, start""").stripMargin,
    // fully independent recall ground truth: one span per non-keeper
    // planted doc, covering exactly the appended paragraph — derived
    // from the raw documents table alone (never from Spark's output)
    "substring_planted_recovery" ->
      ("""WITH low AS (SELECT doc_id,
        |   length(text || ' uqq' || CAST(doc_id AS VARCHAR) || ' ')
        |     AS pfx
        |  FROM documents ORDER BY doc_id LIMIT 8)
        |SELECT doc_id AS id, CAST(pfx AS BIGINT) AS start,
        | CAST(pfx + length('""" +
        (0 until 10).map(i => s"graftdup$i").mkString(" ") +
        """') AS BIGINT) AS stop
        |FROM low WHERE doc_id > (SELECT min(doc_id) FROM low)
        |ORDER BY id""").stripMargin,
    // replays the staged frozen-quantizer full recompute — the
    // incremental probe must match it pair-for-pair, cosines included
    "semdedup_index_parity" ->
      """SELECT id_a, id_b, cl,
        | CAST(round(cosine * 1e6) AS BIGINT) AS cos_x1e6
        |FROM '/tmp/graft_gate_fx/semidx/*/*.parquet'
        |WHERE n_vecs = (SELECT count(*) FROM embeddings)
        |ORDER BY id_a, id_b""".stripMargin,
    // two-sided exact dictionary: DuckDB tokenizes, builds the same
    // per-(term, doc) postings, ranks by doc id, and re-derives df,
    // tf_total, and the capped lowest-id sample
    "q61_inverted_index" ->
      """WITH p AS (SELECT doc_id, unnest(string_split(text, ' '))
        |   AS term FROM documents),
        | g AS (SELECT term, doc_id, count(*) AS tf FROM p
        |  GROUP BY term, doc_id),
        | r AS (SELECT term, doc_id, tf, row_number() OVER
        |   (PARTITION BY term ORDER BY doc_id) AS rk FROM g)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        | CAST(sum(tf) AS BIGINT) AS tf_total,
        | array_to_string(list_sort(list(doc_id) FILTER (rk <= 10)),
        |   ',') AS sample_docs
        |FROM r GROUP BY term ORDER BY term""".stripMargin,
    // two-sided exact BM25: DuckDB rebuilds the filtered postings and
    // replays the identical fixed-point chain (rational idf, Okapi
    // tf-saturation) in BIGINT floor division; `//` on positive
    // BIGINTs matches Spark's `div` exactly
    "q64_bm25_topk" ->
      """WITH lens AS (SELECT doc_id,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |   CAST(sum(dl) AS BIGINT) AS total_len FROM lens),
        | p0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        | p AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM p0 WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY 1, 2),
        | d AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM p GROUP BY 1),
        | c AS (SELECT p.doc_id, lens.dl, p.tf,
        |   ((n_docs - df + 1) * 1000000) // (df + 1) AS idf_u,
        |   (lens.dl * n_docs * 1000000) // total_len AS lenr_u
        |  FROM p JOIN d USING (term)
        |  JOIN lens ON p.doc_id = lens.doc_id, tot),
        | c2 AS (SELECT doc_id, dl, tf, idf_u,
        |   (1000000 - 750000) + (750000 * lenr_u) // 1000000 AS norm_u
        |  FROM c),
        | c3 AS (SELECT doc_id, dl, tf, idf_u,
        |   tf * 1000000 + (1200000 * norm_u) // 1000000 AS denom_u
        |  FROM c2),
        | c4 AS (SELECT doc_id, dl,
        |   (idf_u * ((tf * (1200000 + 1000000) * 1000000) // denom_u))
        |     // 1000000 AS contrib_u
        |  FROM c3),
        | sc AS (SELECT doc_id, CAST(sum(contrib_u) AS BIGINT) AS score_u,
        |   max(dl) AS dl FROM c4 GROUP BY 1),
        | top AS (SELECT * FROM sc ORDER BY score_u DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY score_u DESC, doc_id)
        |   AS INT) AS rk, doc_id, score_u, dl
        |FROM top ORDER BY rk""".stripMargin,
    // two-sided exact rarity scoring: DuckDB re-derives df, the
    // micro-unit rarity, and the occurrence-weighted floor-mean
    "q68_rarity_score" ->
      """WITH p AS (SELECT doc_id, unnest(string_split(text, ' '))
        |   AS term FROM documents),
        | tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM p GROUP BY 1, 2),
        | d AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        | n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        | c AS (SELECT doc_id, tf, (n_docs * 1000000) // df AS rarity_u
        |  FROM tf JOIN d USING (term), n)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        | CAST(sum(tf * rarity_u) // sum(tf) AS BIGINT) AS rarity_u
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // positional intersection re-derived: token positions via
    // generate_subscripts, witness starts per phrase term, (doc,
    // start) equi-intersection, count-desc/doc-asc re-rank
    "q73_phrase_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
        |   AS term,
        |   generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        | s0 AS (SELECT doc_id, CAST(pos AS BIGINT) AS start FROM t
        |  WHERE term = 'table'),
        | s1 AS (SELECT doc_id, CAST(pos - 1 AS BIGINT) AS start FROM t
        |  WHERE term = 'hash'),
        | m AS (SELECT s0.doc_id, s0.start FROM s0
        |  JOIN s1 USING (doc_id, start)),
        | g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |  FROM m GROUP BY doc_id),
        | top AS (SELECT * FROM g ORDER BY n_matches DESC, doc_id
        |  LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY n_matches DESC, doc_id)
        |   AS INT) AS rk, doc_id, n_matches
        |FROM top ORDER BY rk""".stripMargin,
    // two-sided exact paragraph dedup: DuckDB rebuilds the identical
    // synthetic corpus, runs its own keep-first over (paragraph text,
    // doc id, position), reassembles, and compares md5 + counts
    "q59_paragraph_dedup" ->
      ("""WITH synth0 AS (
        |  SELECT doc_id // 3 AS id,
        |   string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS text
        |  FROM documents GROUP BY doc_id // 3),
        | synth AS (SELECT id, CASE WHEN id < 4
        |   THEN text || chr(10) || chr(10) || '""" + boilerPara +
        """' ELSE text END AS text FROM synth0),
        | p AS (SELECT id, unnest(list_transform(
        |    string_split(text, chr(10) || chr(10)),
        |    (x, i) -> struct_pack(idx := i, para := x))) AS u
        |  FROM synth),
        | q AS (SELECT id, u.idx AS idx, u.para AS para FROM p),
        | k AS (SELECT id, idx, para,
        |   (row_number() OVER (PARTITION BY para ORDER BY id, idx) = 1)
        |     AS keep
        |  FROM q),
        | r AS (SELECT id,
        |   CAST(count(*) AS BIGINT) AS n_paras,
        |   CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept,
        |   coalesce(string_agg(para, chr(10) || chr(10)
        |     ORDER BY idx) FILTER (keep), '') AS clean_text
        |  FROM k GROUP BY id)
        |SELECT id, md5(clean_text) AS clean_md5, n_paras, n_kept
        |FROM r ORDER BY id""").stripMargin,
    // two-sided exact host-boilerplate removal: DuckDB rebuilds the
    // identical hosted corpus, derives per-(host, paragraph) distinct-
    // doc counts and the integer cross-multiplication verdict itself,
    // reassembles survivors, and compares md5 + counts
    "q76_host_boilerplate" ->
      ("""WITH synth0 AS (
        |  SELECT doc_id // 3 AS id,
        |   string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS text
        |  FROM documents GROUP BY doc_id // 3),
        | synth AS (SELECT id, 'h' || CAST(id % 5 AS VARCHAR) AS host,
        |   CASE WHEN id % 5 = 0 OR (id % 5 = 1 AND (id // 5) % 2 = 0)
        |   THEN text || chr(10) || chr(10) || '""" + boilerPara +
        """' ELSE text END AS text FROM synth0),
        | p AS (SELECT id, host, unnest(list_transform(
        |    string_split(text, chr(10) || chr(10)),
        |    (x, i) -> struct_pack(idx := i, para := x))) AS u
        |  FROM synth),
        | q AS (SELECT id, host, u.idx AS idx, u.para AS para FROM p),
        | hd AS (SELECT host, count(DISTINCT id) AS n_docs_host
        |  FROM synth GROUP BY 1),
        | pd AS (SELECT host, para, count(DISTINCT id) AS n_with
        |  FROM q GROUP BY 1, 2),
        | v AS (SELECT q.id, q.idx, q.para,
        |   (hd.n_docs_host >= 2 AND pd.n_with >= 2 AND
        |    pd.n_with * 100 >= hd.n_docs_host * 50) AS boiler
        |  FROM q JOIN pd ON q.host = pd.host AND q.para = pd.para
        |   JOIN hd ON q.host = hd.host),
        | r AS (SELECT id,
        |   CAST(count(*) AS BIGINT) AS n_paras,
        |   CAST(count(*) FILTER (NOT boiler) AS BIGINT) AS n_kept,
        |   coalesce(string_agg(para, chr(10) || chr(10)
        |     ORDER BY idx) FILTER (NOT boiler), '') AS clean_text
        |  FROM v GROUP BY id)
        |SELECT id, md5(clean_text) AS clean_md5, n_paras, n_kept
        |FROM r ORDER BY id""").stripMargin,
    // re-derives every normalized caption count and template verdict
    // from the staged raw TEXT — plain string grouping must agree
    // with the operator's md5 keying row for row
    "q77_caption_template" ->
      """WITH c AS (SELECT image_id,
        |   trim(regexp_replace(caption, '\s+', ' ', 'g')) AS n
        |  FROM '/tmp/graft_gate_fx/captions/*.parquet'),
        | f AS (SELECT n, CAST(count(*) AS BIGINT) AS caption_n
        |  FROM c GROUP BY 1)
        |SELECT c.image_id, f.caption_n, f.caption_n >= 3 AS template
        |FROM c JOIN f USING (n) ORDER BY image_id""".stripMargin,
    // re-derives the bucket argmin from the staged raw dims with the
    // SAME integer common-denominator cost table (embedded from the
    // SAME ladder Seq), then the batch layout from scratch
    "q78_aspect_batches" -> {
      val lad = graft.ops.MultimodalOps.ladderWithMult()
        .map { case (i, bw, bh, m) => s"($i,$bw,$bh,$m)" }.mkString(",")
      s"""WITH raw AS (SELECT image_id, w, h
        |  FROM '/tmp/graft_gate_fx/aspect/*.parquet'),
        | lad AS (SELECT * FROM (VALUES $lad) t(idx, bw, bh, mult)),
        | costs AS (SELECT r.image_id, l.idx, l.bw, l.bh,
        |   abs(CAST(r.w AS BIGINT) * l.bh - CAST(r.h AS BIGINT) * l.bw)
        |     * l.mult AS cost
        |  FROM raw r CROSS JOIN lad l),
        | best AS (SELECT image_id, idx, bw, bh, row_number() OVER
        |   (PARTITION BY image_id ORDER BY cost, idx) AS rk FROM costs),
        | b AS (SELECT image_id, idx AS bucket_idx, bw AS bucket_w,
        |   bh AS bucket_h FROM best WHERE rk = 1),
        | rn AS (SELECT *, row_number() OVER
        |   (PARTITION BY bucket_idx ORDER BY image_id) AS rn,
        |   count(*) OVER (PARTITION BY bucket_idx) AS n_bucket FROM b)
        |SELECT image_id, bucket_idx, bucket_w, bucket_h,
        | CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
        | CAST((rn - 1) % 8 AS BIGINT) AS slot,
        | ((rn - 1) // 8 + 1) * 8 <= n_bucket AS "full"
        |FROM rn ORDER BY image_id""".stripMargin
    },
    // two-sided exact derivation: DuckDB rebuilds the corpus (same
    // planted literals — generated from the same Seq) and recomputes
    // every count and integer-comparison rule from the text alone
    "q58_gopher_rules" -> {
      val values = gopherPlanted
        .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
      (s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT * FROM (VALUES $values) pl(doc_id, text)),
        | feat AS (SELECT doc_id,
        |   list_filter(string_split_regex(text, '\\s+'),
        |     w -> len(w) > 0) AS words,
        |   string_split(text, chr(10)) AS lines,
        |   (len(text) - len(replace(text, '#', ''))) +
        |    (len(text) - len(replace(text, '...', ''))) // 3 +
        |    (len(text) - len(replace(text, '…', ''))) AS n_symbols
        |  FROM corpus),
        | cnt AS (SELECT doc_id,
        |   CAST(len(words) AS BIGINT) AS n_words,
        |   CAST(coalesce(list_sum(list_transform(words,
        |     w -> len(w))), 0) AS BIGINT) AS sum_word_len,
        |   CAST(n_symbols AS BIGINT) AS n_symbols,
        |   CAST(len(lines) AS BIGINT) AS n_lines,
        |   CAST(len(list_filter(lines, l ->
        |     regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT)
        |     AS n_bullet_lines,
        |   CAST(len(list_filter(lines, l ->
        |     regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT)
        |     AS n_ellipsis_lines,
        |   CAST(len(list_filter(words, w ->
        |     regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |   CAST(len(list_intersect(list_distinct(list_transform(words,
        |     w -> lower(w))), ['the','be','to','of','and','that',
        |     'have','with'])) AS BIGINT) AS n_stop_words
        |  FROM feat),
        | rules AS (SELECT *,
        |   n_words BETWEEN 50 AND 100000 AS r_word_count,
        |   n_words > 0 AND sum_word_len >= n_words * 3 AND
        |     sum_word_len <= n_words * 10 AS r_mean_word_len,
        |   n_words > 0 AND n_symbols * 10 <= n_words AS r_symbol_ratio,
        |   n_bullet_lines * 10 <= n_lines * 9 AS r_bullet,
        |   n_ellipsis_lines * 10 <= n_lines * 3 AS r_ellipsis,
        |   n_words > 0 AND n_alpha_words * 5 >= n_words * 4 AS r_alpha,
        |   n_stop_words >= 2 AS r_stop
        |  FROM cnt)
        |SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines,
        | n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_words,
        | r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet,
        | r_ellipsis, r_alpha, r_stop,
        | r_word_count AND r_mean_word_len AND r_symbol_ratio AND
        |  r_bullet AND r_ellipsis AND r_alpha AND r_stop AS keep
        |FROM rules ORDER BY doc_id""").stripMargin
    }
  )
}
