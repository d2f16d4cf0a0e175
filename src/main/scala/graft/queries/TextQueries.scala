package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over `documents` / `embeddings`
  * (TESTDATA.md): exact dedup, token/quality stats, and exact
  * integer-quantized k-NN with a DuckDB oracle. The approximate paths
  * (MinHash-LSH, SimHash, LSH-bucketed ANN, language-ID) live in
  * [[graft.ops]] and surface as oracle-free queries there.
  *
  * Cross-engine notes: float embeddings are cast to double element-wise
  * before arithmetic (identical sequential fold order in Spark
  * `aggregate` and DuckDB `list_sum∘list_transform`); k-NN quantizes to
  * BIGINT (exact dot products → fully deterministic ranking).
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Σ x_i² over a float-array column, computed in double, sequential. */
  private def sqNorm(c: Column): Column =
    aggregate(c, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Quantize a float vector to BIGINT at 3 decimals (exact math). */
  private def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact dedup by content hash (hash-groupBy; keep-first keeps the
    //      lowest doc_id, mirroring D1 keep-first semantics)
    "q30_doc_dedup_exact" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(md5($"text".cast("binary")).as("h"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dupes"))
        .orderBy($"h")
    }),

    // ---- the corpus-curation PIPELINE as one oracle-checked query:
    //      min-text filter (P4) → exact content dedup keep-first (D1
    //      semantics on documents) → per-source corpus report. Every
    //      stage is deterministic + SQL-expressible, so DuckDB verifies
    //      the operator COMPOSITION end-to-end, not just each stage.
    "q47_pipeline_curation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy(md5($"text".cast("binary")))
        .orderBy($"doc_id")
      t(s, dir, "documents")
        .filter(length($"text") >= 100)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", " "))).cast("long").as("tokens"),
          round(avg(length($"text")), 4).as("avg_chars"))
        .orderBy($"source")
    }),

    // ---- token counting (whitespace tokenizer) per language
    "q31_token_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("toks", size(split($"text", " ")))
        .groupBy($"lang")
        .agg(sum($"toks").cast("long").as("total_toks"),
          round(avg($"toks"), 4).as("avg_toks"),
          max($"toks").cast("long").as("max_toks"))
        .orderBy($"lang")
    }),

    // ---- quality scoring: length + letter-ratio signals
    "q32_quality_scores" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("letter_ratio",
          length(regexp_replace($"text", "[^a-z]", "")) / length($"text"))
        .groupBy($"lang")
        .agg(round(avg($"n_chars"), 4).as("avg_chars"),
          round(avg($"letter_ratio"), 6).as("avg_letter_ratio"),
          count(lit(1)).as("n"))
        .orderBy($"lang")
    }),

    // ---- per-source corpus stats (sharding/partitioning diagnostics)
    "q33_source_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("n"),
          countDistinct($"lang").as("langs"),
          sum($"n_chars").cast("long").as("chars"))
        .orderBy($"source")
    }),

    // ---- P4 min-text gate as a standalone operator (pdf_call.py:73)
    "q45_min_text_filter" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter(graft.ops.TextOps.minTextOk($"text", 200))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"),
          min(length(trim($"text"))).cast("long").as("min_len"))
        .orderBy($"lang")
    }),

    // ---- embedding norms per label (array fold in double)
    "q35_embedding_norms" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .withColumn("norm", sqrt(sqNorm($"embedding")))
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), round(avg($"norm"), 4).as("avg_norm"))
        .orderBy($"label")
    }),

    // ---- exact k-NN (brute-force top-5 by quantized dot product):
    //      the correctness baseline for the ANN paths in graft.ops.AnnOps
    "q36_knn_top5" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("qid"), quantize($"embedding").as("qv"))
      val c = emb.filter($"vec_id" >= 3)
        .select($"vec_id".as("cid"), quantize($"embedding").as("cv"))
      val dot = aggregate(zip_with($"qv", $"cv", (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      val w = Window.partitionBy($"qid").orderBy($"dot".desc, $"cid".asc)
      c.crossJoin(broadcast(q))
        .withColumn("dot", dot)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"qid", $"cid", $"dot", $"rk")
        .orderBy($"qid", $"rk")
    }),

    // ---- Gopher-style repetition stats (duplicate-bigram rules): the
    //      boilerplate/template-spam quality signal, per document —
    //      DuckDB re-derives every row (counts, argmax bigram with a
    //      deterministic tie-break, duplicate fraction) from raw text
    "q48_repetition_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.ops.TextOps.repetitionStats(t(s, dir, "documents"))
        .orderBy($"doc_id")
    }),

    // ---- PII scrub (C4/Dolma-style): deterministic PII is planted
    //      from doc_id arithmetic IDENTICALLY in both engines, then the
    //      op under test — regexp detection counts + typed-placeholder
    //      redaction — must agree span-for-span (md5 of the redacted
    //      text). Map-side codegen'd regexp, zero shuffles: the shape
    //      of a 100 TB pre-training scrub.
    "q49_pii_scrub" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val planted = concat(
        $"text", lit(" contact user"), $"doc_id".cast("string"),
        lit("@ex"), ($"doc_id" % 7).cast("string"),
        lit(".com or +1-555-"),
        lpad(($"doc_id" * 37 % 10000).cast("string"), 4, "0"),
        when($"doc_id" % 3 === 0, lit(" cc admin@site.net"))
          .otherwise(lit("")))
      val red = graft.ops.TextOps.piiRedact(planted)
      t(s, dir, "documents")
        .select($"doc_id",
          graft.ops.TextOps.piiEmailCount(planted).cast("long")
            .as("n_emails"),
          graft.ops.TextOps.piiPhoneCount(planted).cast("long")
            .as("n_phones"),
          md5(red.cast("binary")).as("redacted_md5"),
          length(red).cast("long").as("redacted_len"))
        .orderBy($"doc_id")
    }),

    // ---- benchmark decontamination (GPT-3 §C / Dolma style): corpus
    //      docs sharing any word 5-gram with a held-out "benchmark"
    //      slice (doc_id % 23 == 0 — an eval-set-sized side that
    //      BROADCASTS; plan-gated in PlanAuditSpec). DuckDB re-derives
    //      every count from raw text.
    "q51_decontamination" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      graft.ops.TextOps.decontaminate(
          d.filter($"doc_id" % 23 =!= 0), d.filter($"doc_id" % 23 === 0), 5)
        .orderBy($"doc_id")
    }),

    // ---- deterministic stratified sampling (training-mixture
    //      construction): per-language quota rates, id-derived uniform
    //      draw by pure integer arithmetic — the kept SET is the
    //      oracle check (exact, reproducible under any partitioning).
    "q52_stratified_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.ops.TextOps.sampleStratified(t(s, dir, "documents"),
          Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.75, "fr" -> 0.1,
            "zh" -> 0.9))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // ---- token-budget shard packing (pre-training shard prep):
    //      cumulative-offset packing at 2000 whitespace tokens per
    //      shard, partitioned by language (never a global window).
    "q53_shard_pack" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.ops.TextOps.packShards(t(s, dir, "documents"), 2000L)
        .groupBy($"lang", $"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"lang", $"shard")
    }),

    // ---- C4 line cleaning (Raffel et al. §2.2): multi-line text is
    //      planted deterministically (the corpus is single-line), then
    //      the keep-terminal-punctuation + min-words line filter must
    //      agree with DuckDB byte-for-byte (md5 of the cleaned text).
    "q54_c4_clean" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val planted = concat($"text",
        lit("\nThis sentence terminates properly."),
        lit("\nno terminal punctuation here"),
        lit("\nTiny."),
        when($"doc_id" % 4 === 0, lit("\nAnother good kept line!"))
          .otherwise(lit("\ntrailing junk")))
      val cleaned = graft.ops.TextOps.c4CleanLines(planted)
      t(s, dir, "documents")
        .select($"doc_id",
          size(split(planted, "\n")).cast("long").as("n_lines"),
          graft.ops.TextOps.c4KeptLineCount(planted).cast("long")
            .as("n_kept"),
          md5(cleaned.cast("binary")).as("cleaned_md5"),
          length(cleaned).cast("long").as("cleaned_len"))
        .orderBy($"doc_id")
    }),

    // ---- per-source quota cap (domain-contribution bound): top-40
    //      docs per source by length, doc_id tie-break — WindowGroupLimit
    //      keeps each group's materialization at its cap (plan-gated).
    "q55_source_quota" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.ops.TextOps.capPerGroup(t(s, dir, "documents"), 40)
        .select($"source", $"rk".cast("long").as("rk"), $"doc_id", $"n_chars")
        .orderBy($"source", $"rk")
    }),

    // ---- the FULL pre-training curation pipeline as ONE declarative
    //      plan, end-to-end DuckDB-oracle-checked: plant PII +
    //      multi-line noise → C4 line cleaning → PII redaction →
    //      min-token gate → exact dedup (keep-first) → per-source
    //      quota cap → stratified language sampling → token-budget
    //      shard packing → per-shard rollup. Every stage is one of the
    //      library's curation operators; Catalyst fuses the map-side
    //      stages (plant/clean/redact/gate) into one codegen'd
    //      projection, and the whole chain carries exactly four
    //      exchanges (md5 dedup window, source cap window, lang pack
    //      window, final rollup) — the 100 TB shape.
    "q56_full_pipeline" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ops = graft.ops.TextOps
      val planted = concat($"text", lit(" properly ends."),
        lit("\nReach admin"), ($"doc_id" % 50).cast("string"),
        lit("@ex.com right now."),
        lit("\nno terminal punctuation here"),
        lit("\nCall +1-555-"),
        lpad(($"doc_id" * 37 % 10000).cast("string"), 4, "0"),
        lit(" today!"),
        when($"doc_id" % 4 === 0,
          lit("\nAn extra quality sentence appears here."))
          .otherwise(lit("\nshort.")))
      val red = ops.piiRedact(ops.c4CleanLines(planted))
      val gated = t(s, dir, "documents")
        .select($"doc_id", $"lang", $"source", red.as("text"))
        .filter(size(split($"text", " ")) >= 20)
      val dw = Window.partitionBy(md5($"text".cast("binary")))
        .orderBy($"doc_id")
      val deduped = gated.withColumn("rn", row_number().over(dw))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"source", $"text",
          length($"text").as("n_chars"))
      val capped = ops.capPerGroup(deduped, 40).drop("rk", "n_chars")
      val sampled = ops.sampleStratified(capped,
        Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.75, "fr" -> 0.1,
          "zh" -> 0.9)).drop("u")
      ops.packShards(sampled, 1000L)
        .groupBy($"lang", $"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("n_tokens"),
          sum($"doc_id").as("sum_doc"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"lang", $"shard")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q30_doc_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dupes
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q47_pipeline_curation" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
        | round(avg(length(text)), 4) AS avg_chars
        |FROM (SELECT *, row_number() OVER (PARTITION BY md5(text)
        |        ORDER BY doc_id) AS rn
        |      FROM documents WHERE length(text) >= 100)
        |WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_token_stats" ->
      """SELECT lang,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_toks,
        | round(avg(len(string_split(text, ' '))),4) AS avg_toks,
        | CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_toks
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_quality_scores" ->
      """SELECT lang, round(avg(n_chars),4) AS avg_chars,
        | round(avg(length(regexp_replace(text,'[^a-z]','','g'))
        |   * 1.0 / length(text)),6) AS avg_letter_ratio,
        | count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q33_source_stats" ->
      """SELECT source, count(*) AS n, count(DISTINCT lang) AS langs,
        | CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_min_text_filter" ->
      """SELECT lang, count(*) AS n_kept,
        | CAST(min(length(trim(text))) AS BIGINT) AS min_len
        |FROM documents
        |WHERE text IS NOT NULL AND length(trim(text)) >= 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q35_embedding_norms" ->
      """SELECT label, count(*) AS n,
        | round(avg(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),4) AS avg_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_knn_top5" ->
      """WITH qz AS (SELECT vec_id, list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v
        |  FROM embeddings),
        | q AS (SELECT vec_id AS qid, v AS qv FROM qz WHERE vec_id < 3),
        | c AS (SELECT vec_id AS cid, v AS cv FROM qz WHERE vec_id >= 3),
        | scored AS (SELECT qid, cid,
        |   CAST(list_dot_product(qv, cv) AS BIGINT) AS dot FROM q CROSS JOIN c),
        | ranked AS (SELECT qid, cid, dot, CAST(row_number() OVER (
        |   PARTITION BY qid ORDER BY dot DESC, cid ASC) AS BIGINT) AS rk
        |  FROM scored)
        |SELECT qid, cid, dot, rk FROM ranked WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin,
    "q48_repetition_stats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |      FROM documents),
        | u AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |      FROM w WHERE len(ws) >= 2),
        | b AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM u),
        | c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
        | r AS (SELECT doc_id, bg, c, row_number() OVER (
        |   PARTITION BY doc_id ORDER BY c DESC, bg ASC) AS rk FROM c)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        | count(*) AS distinct_bigrams,
        | max(CASE WHEN rk = 1 THEN bg END) AS top_bigram,
        | CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS top_count,
        | round(1.0 - count(*) * 1.0 / sum(c), 6) AS dup_fraction
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        |   text || ' contact user' || CAST(doc_id AS VARCHAR)
        |     || '@ex' || CAST(doc_id % 7 AS VARCHAR)
        |     || '.com or +1-555-'
        |     || lpad(CAST(doc_id * 37 % 10000 AS VARCHAR), 4, '0')
        |     || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@site.net'
        |        ELSE '' END AS pt
        |  FROM documents),
        | r AS (SELECT doc_id, pt, regexp_replace(regexp_replace(pt,
        |     '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |     '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS red
        |  FROM p)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(pt,
        |   '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}')) AS BIGINT)
        |   AS n_emails,
        | CAST(len(regexp_extract_all(pt,
        |   '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
        | md5(red) AS redacted_md5,
        | CAST(length(red) AS BIGINT) AS redacted_len
        |FROM r ORDER BY doc_id""".stripMargin,
    "q51_decontamination" ->
      """WITH c AS (SELECT doc_id, string_split(text, ' ') AS ws
        |      FROM documents WHERE doc_id % 23 <> 0),
        | b AS (SELECT doc_id, string_split(text, ' ') AS ws
        |      FROM documents WHERE doc_id % 23 = 0),
        | cg AS (SELECT DISTINCT doc_id,
        |     array_to_string(list_slice(ws, i, i + 4), ' ') AS g
        |   FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
        |         FROM c WHERE len(ws) >= 5)),
        | bg AS (SELECT DISTINCT doc_id AS bid,
        |     array_to_string(list_slice(ws, i, i + 4), ' ') AS bg
        |   FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 3)) AS i
        |         FROM b WHERE len(ws) >= 5)),
        | j AS (SELECT cg.doc_id, cg.g, bg.bid
        |   FROM cg LEFT JOIN bg ON cg.g = bg.bg)
        |SELECT c2.doc_id,
        | CAST(count(DISTINCT j.g) AS BIGINT) AS n_grams,
        | CAST(count(DISTINCT CASE WHEN j.bid IS NOT NULL THEN j.g END)
        |   AS BIGINT) AS n_hit_grams,
        | CAST(count(DISTINCT j.bid) AS BIGINT) AS n_bench_docs,
        | count(DISTINCT CASE WHEN j.bid IS NOT NULL THEN j.g END) > 0
        |   AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 23 <> 0) c2
        |LEFT JOIN j ON c2.doc_id = j.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (((doc_id & 1048575) * 2654435761
        |       + ((doc_id >> 20) & 1048575) * 998244353
        |       + 40503) % 1048576) / 1048576.0 <
        |  CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |    WHEN 'es' THEN 0.75 WHEN 'fr' THEN 0.1 WHEN 'zh' THEN 0.9
        |    ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,
    "q53_shard_pack" ->
      """WITH t AS (SELECT doc_id, lang,
        |     len(string_split(text, ' ')) AS nt FROM documents),
        | s AS (SELECT *, CAST(floor((sum(nt) OVER (PARTITION BY lang
        |     ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nt) / 2000)
        |   AS BIGINT) AS shard FROM t)
        |SELECT lang, shard, count(*) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q54_c4_clean" ->
      """WITH p AS (SELECT doc_id,
        |   text || chr(10) || 'This sentence terminates properly.'
        |        || chr(10) || 'no terminal punctuation here'
        |        || chr(10) || 'Tiny.'
        |        || CASE WHEN doc_id % 4 = 0
        |           THEN chr(10) || 'Another good kept line!'
        |           ELSE chr(10) || 'trailing junk' END AS pt
        |  FROM documents),
        | c AS (SELECT doc_id, pt,
        |   array_to_string(list_filter(string_split(pt, chr(10)),
        |     l -> regexp_matches(l, '[.!?]$')
        |          AND len(string_split(l, ' ')) >= 3), chr(10)) AS cl
        |  FROM p)
        |SELECT doc_id,
        | CAST(len(string_split(pt, chr(10))) AS BIGINT) AS n_lines,
        | CAST(len(list_filter(string_split(pt, chr(10)),
        |   l -> regexp_matches(l, '[.!?]$')
        |        AND len(string_split(l, ' ')) >= 3)) AS BIGINT) AS n_kept,
        | md5(cl) AS cleaned_md5,
        | CAST(length(cl) AS BIGINT) AS cleaned_len
        |FROM c ORDER BY doc_id""".stripMargin,
    "q55_source_quota" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |   CAST(row_number() OVER (PARTITION BY source
        |     ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rk
        |  FROM documents)
        |SELECT source, rk, doc_id, n_chars FROM r WHERE rk <= 40
        |ORDER BY source, rk""".stripMargin,
    "q56_full_pipeline" ->
      """WITH p AS (SELECT doc_id, lang, source,
        |   text || ' properly ends.'
        |    || chr(10) || 'Reach admin' || CAST(doc_id % 50 AS VARCHAR)
        |    || '@ex.com right now.'
        |    || chr(10) || 'no terminal punctuation here'
        |    || chr(10) || 'Call +1-555-'
        |    || lpad(CAST(doc_id * 37 % 10000 AS VARCHAR), 4, '0')
        |    || ' today!'
        |    || CASE WHEN doc_id % 4 = 0
        |       THEN chr(10) || 'An extra quality sentence appears here.'
        |       ELSE chr(10) || 'short.' END AS pt
        |  FROM documents),
        | cl AS (SELECT doc_id, lang, source,
        |   array_to_string(list_filter(string_split(pt, chr(10)),
        |     l -> regexp_matches(l, '[.!?]$')
        |          AND len(string_split(l, ' ')) >= 3), chr(10)) AS t
        |  FROM p),
        | red AS (SELECT doc_id, lang, source,
        |   regexp_replace(regexp_replace(t,
        |     '[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |     '\+1-555-[0-9]{4}', '[PHONE]', 'g') AS t
        |  FROM cl),
        | gate AS (SELECT * FROM red WHERE len(string_split(t, ' ')) >= 20),
        | ded AS (SELECT *, row_number() OVER (PARTITION BY md5(t)
        |     ORDER BY doc_id) AS rn FROM gate),
        | ded2 AS (SELECT doc_id, lang, source, t, length(t) AS n_chars
        |  FROM ded WHERE rn = 1),
        | cap AS (SELECT *, row_number() OVER (PARTITION BY source
        |     ORDER BY n_chars DESC, doc_id ASC) AS rk FROM ded2),
        | cap2 AS (SELECT * FROM cap WHERE rk <= 40),
        | samp AS (SELECT * FROM cap2
        |  WHERE (((doc_id & 1048575) * 2654435761
        |        + ((doc_id >> 20) & 1048575) * 998244353
        |        + 40503) % 1048576) / 1048576.0 <
        |    CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |      WHEN 'es' THEN 0.75 WHEN 'fr' THEN 0.1 WHEN 'zh' THEN 0.9
        |      ELSE 0.0 END),
        | tok AS (SELECT *, len(string_split(t, ' ')) AS nt FROM samp),
        | sh AS (SELECT *, CAST(floor((sum(nt) OVER (PARTITION BY lang
        |     ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nt) / 1000)
        |   AS BIGINT) AS shard FROM tok)
        |SELECT lang, shard, count(*) AS n_docs,
        | CAST(sum(nt) AS BIGINT) AS n_tokens,
        | CAST(sum(doc_id) AS BIGINT) AS sum_doc,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM sh GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
