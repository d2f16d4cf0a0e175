package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.url.Hashing

/** Text-analysis operators for the training-data pipeline: language
  * identification (character/stopword n-gram heuristic), quality
  * scoring, token counting (whitespace + BPE-ish subword estimate) and
  * winnowing document fingerprints.
  */
object TextOps {

  // ---- language ID ----------------------------------------------------

  /** Tiny per-language profiles: frequent function words + diagnostic
    * characters. A real pipeline plugs fastText/CLD here; the contract
    * (deterministic scoring, argmax with stable tie-break) is what the
    * engine-level tests pin down. */
  private val profiles: Seq[(String, Set[String], String)] = Seq(
    ("en", Set("the", "and", "of", "to", "in", "is", "that", "it", "for"), ""),
    ("de", Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein"), "äöüß"),
    ("es", Set("el", "la", "los", "que", "de", "y", "en", "es", "por"), "ñ¿¡"),
    ("fr", Set("le", "la", "les", "et", "est", "que", "des", "une", "dans"), "çàêô"),
    ("pt", Set("o", "a", "os", "que", "de", "e", "em", "não", "para", "uma"), "ãõç"),
    ("zh", Set.empty[String], "的一是不了人我在有他"))

  // precompiled: String.split/replaceAll recompile their pattern per
  // call — a per-document cost for map-side ops that run on every
  // document of the corpus (same fix as DedupOps' shingle patterns)
  private val NonLetterRun = java.util.regex.Pattern.compile("[^\\p{L}]+")
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def langIdScala(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val lower = text.toLowerCase
    val toks = NonLetterRun.split(lower).filter(_.nonEmpty)
    val total = math.max(1, toks.length)
    val charTotal = math.max(1, lower.length)
    var best = "und"
    var bestScore = 0.0
    profiles.foreach { case (code, stops, chars) =>
      val stopHits = if (stops.isEmpty) 0.0
        else toks.count(stops.contains).toDouble / total
      val charHits = if (chars.isEmpty) 0.0
        else lower.count(c => chars.contains(c)).toDouble / charTotal * 5.0
      val score = stopHits + charHits
      if (score > bestScore + 1e-12) { best = code; bestScore = score }
    }
    if (bestScore < 0.02) "und" else best
  }

  val langId: Column => Column = {
    val u = udf((t: String) => langIdScala(t))
    c => u(c)
  }

  // ---- token counting -------------------------------------------------

  /** Whitespace token count — pure built-ins (codegen'd). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword estimate: words shorter than 5 chars ≈ 1 token,
    * longer words ≈ ceil(len/4) tokens — the standard ~4 chars/token
    * heuristic, as one expression (no UDF). */
  def subwordCountEstimate(text: Column): Column =
    aggregate(split(trim(text), "\\s+"), lit(0L),
      (acc, w) => acc + when(length(w) <= 4, 1L)
        .otherwise(ceil(length(w) / 4.0).cast("long")))

  /** P4 min-text gate (pdf_call.py:73: documents whose stripped text
    * is under 100 chars are dropped before extraction): a codegen'd
    * predicate — null-safe, trims first like the reference. */
  def minTextOk(text: Column, minChars: Int = 100): Column =
    text.isNotNull && length(trim(text)) >= minChars

  // ---- quality scoring --------------------------------------------------

  /** Composite quality score in [0,1] from length, alpha ratio, mean
    * word length and stopword-ish ratio — built-ins only, one pass. */
  def qualityScore(text: Column): Column = {
    val len = length(text)
    val alphaRatio = (length(regexp_replace(text, "[^\\p{L} ]", "")) /
      greatest(len, lit(1))).cast("double")
    val words = split(trim(text), "\\s+")
    val meanWordLen = (len / greatest(size(words), lit(1))).cast("double")
    val lenScore = least(len / lit(500.0), lit(1.0))
    val wordScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * 0.3 + alphaRatio * 0.4 + wordScore * 0.3, 6)
  }

  // ---- document fingerprinting -----------------------------------------

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03 — public
    * algorithm): k-gram rolling hashes, keep the minimum per sliding
    * window, fingerprint = xxh64 of the distinct minima sequence.
    * Robust to small local edits. */
  def winnowFingerprint(text: String, k: Int = 8, window: Int = 4): Long = {
    val t = WsRun.matcher(text.toLowerCase).replaceAll(" ")
    if (t.length <= k) return Hashing.xxh64(t)
    val n = t.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = Hashing.xxh64(t.substring(i, i + k)); i += 1 }
    val minima = scala.collection.mutable.ArrayBuffer.empty[Long]
    var w = 0
    var lastMin = -1
    while (w + window <= n) {
      var mi = w
      var j = w + 1
      while (j < w + window) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
      if (mi != lastMin) { minima += hs(mi); lastMin = mi }
      w += 1
    }
    Hashing.xxh64(minima.mkString(","))
  }

  val fingerprint: Column => Column = {
    val u = udf((t: String) => winnowFingerprint(t))
    c => u(c)
  }

  // ---- repetition / boilerplate stats (Gopher-style rules) -------------

  /** Per-document word-bigram repetition statistics — the public
    * Gopher-report quality-rule family (Rae et al., arXiv:2112.11446,
    * Table A1: "duplicate n-gram fraction" rules): for each document,
    * the total and distinct bigram counts, the most frequent bigram
    * (count-desc, lexicographic tie-break so the answer is unique) and
    * the duplicate-bigram fraction `1 - distinct/total`. Boilerplate
    * and template spam score high; natural prose scores near 0.
    *
    * Scale shape: bigrams are built by pure array expressions
    * (`slice` + `zip_with`, codegen'd — no UDF), then ONE explode +
    * ONE hash-groupBy on (doc_id, bigram), a per-doc rank window and a
    * final per-doc groupBy that reuses the same doc_id partitioning
    * (no extra exchange after the window sort). Work is linear in
    * corpus tokens and partitions by doc hash — no all-pairs term, so
    * the same plan runs at 100 TB.
    *
    * Expects `doc_id` + `text` columns; documents with fewer than two
    * words carry no bigram and are absent from the result. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val words = split(col("text"), " ")
    val n = size(words)
    val bigrams = zip_with(
      slice(words, lit(1), n - 1), slice(words, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    val counts = docs
      .filter(n >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
    val top = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("c").desc, col("bg").asc)
    counts
      .withColumn("rk", row_number().over(top))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        max(when(col("rk") === 1, col("bg"))).as("top_bigram"),
        max(when(col("rk") === 1, col("c"))).cast("long").as("top_count"))
      .withColumn("dup_fraction",
        round(lit(1.0) - col("distinct_bigrams").cast("double") /
          col("n_bigrams"), 6))
  }

  // ---- PII detection / redaction ---------------------------------------

  /** Email/phone patterns shared by detection and redaction. Kept to
    * syntax that Java regex (Spark codegen) and RE2 (the DuckDB
    * oracle) interpret identically: character classes, bounded
    * repetition, a literal `+` — no backreferences or lookaround. */
  val EmailPattern = "[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+1-555-[0-9]{4}"

  /** Count of email-shaped spans (codegen regexp, map-side). */
  def piiEmailCount(c: Column): Column =
    size(regexp_extract_all(c, lit(EmailPattern), lit(0)))

  /** Count of NANP-style phone spans (codegen regexp, map-side). */
  def piiPhoneCount(c: Column): Column =
    size(regexp_extract_all(c, lit(PhonePattern), lit(0)))

  /** Redact every email/phone span with a typed placeholder — the
    * C4/Dolma-style pre-training scrub step as one narrow projection:
    * pure `regexp_replace` chains, whole-stage-codegen'd, zero
    * shuffles — the shape that matters when the scrub runs over
    * 100 TB of raw text. */
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, lit(EmailPattern), lit("[EMAIL]")),
      lit(PhonePattern), lit("[PHONE]"))

  // ---- C4-style line-level cleaning ------------------------------------

  /** C4's line-level cleaning rule (Raffel et al. arXiv:1910.10683
    * §2.2: "retained lines that ended in a terminal punctuation mark"
    * and dropped too-short lines): keep a line iff it ends in
    * `.`/`!`/`?` and has at least `minWords` whitespace words, then
    * re-join. Pure array expressions (`split`/`filter`/`array_join`)
    * — whole-stage codegen, map-side, zero shuffles: the shape of a
    * 100 TB cleaning pass. */
  /** Split on `\r?\n` (not bare `\n`): real crawl text mixes CRLF and
    * LF, a bare-`\n` split leaves a trailing `\r` on every line —
    * which Java's `$` (match-before-final-line-terminator) would then
    * still accept while RE2-family engines reject, AND which would
    * leak into the "cleaned" output. Splitting both variants
    * normalizes line endings to LF as a side effect. */
  private val LineSplit = "\r?\n"

  def c4CleanLines(c: Column, minWords: Int = 3): Column =
    array_join(
      filter(split(c, LineSplit), l =>
        l.rlike("[.!?]$") && size(split(l, " ")) >= minWords),
      "\n")

  /** Number of lines a [[c4CleanLines]] pass would keep (same
    * predicate, count instead of re-join). */
  def c4KeptLineCount(c: Column, minWords: Int = 3): Column =
    size(filter(split(c, LineSplit), l =>
      l.rlike("[.!?]$") && size(split(l, " ")) >= minWords))

  // ---- per-group quota capping -----------------------------------------

  /** Per-source quota cap — the crawl-curation rule that bounds any
    * single domain's contribution to the corpus: keep at most `n`
    * documents per group, preferring the highest `orderCol` (document
    * length by default) with doc_id as the deterministic tie-break.
    * One hash exchange on the group column; `WindowGroupLimit` pushes
    * the rank filter into the sort at plan level, so no group ever
    * materializes beyond its top-n. */
  def capPerGroup(docs: org.apache.spark.sql.DataFrame, n: Int,
      groupCol: String = "source",
      orderCol: String = "n_chars"): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col("doc_id").asc)
    docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
  }

  // ---- benchmark decontamination ---------------------------------------

  /** Distinct word n-grams of a text column as an array — pure array
    * expressions (`split`/`sequence`/`slice`, whole-stage codegen'd,
    * no UDF). Documents with fewer than `n` words yield an empty
    * array (guarded: Spark's `sequence(1, 0)` would count DOWN). */
  def wordNGrams(c: Column, n: Int): Column = {
    val words = split(c, " ")
    val nw = size(words)
    when(nw >= n,
      array_distinct(transform(sequence(lit(1), nw - (n - 1)),
        i => concat_ws(" ", slice(words, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination — the GPT-3/Dolma pre-training step
    * that flags corpus documents sharing any word n-gram with a
    * held-out evaluation set (Brown et al. arXiv:2005.14165 §C use
    * 13-grams; Dolma uses paragraph Bloom membership). Returns one row
    * per corpus document: total distinct n-grams, distinct n-grams
    * also present in the benchmark, distinct benchmark documents hit,
    * and the contamination flag.
    *
    * Scale shape: the benchmark side is an eval set — thousands of
    * documents against a 100 TB corpus — so its exploded (gram,
    * bench-id) table is broadcast (`broadcastBench=true`, the
    * default) and the corpus side never shuffles for the join; the
    * only exchange is the per-doc hash aggregation, linear in corpus
    * grams. Corpus docs with fewer than `n` words survive via
    * `explode_outer` with zero counts. */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame,
      benchmark: org.apache.spark.sql.DataFrame, n: Int = 5,
      broadcastBench: Boolean = true): org.apache.spark.sql.DataFrame = {
    // r6 shape: the old three-countDistinct aggregate planned a
    // 3-projection Expand of the exploded corpus-gram stream and its
    // multi-distinct first phase grouped by (doc_id, gram, bid, gid) —
    // the dominant shuffle carried ~3× the corpus's gram rows. Split
    // the question into two narrow branches instead, each with plain
    // codegen aggregates (no Expand, no distinct on the corpus side):
    //  - hit counting joins the DEDUPLICATED benchmark gram set
    //    (distinct per doc by wordNGrams construction on both sides,
    //    so every count is distinct-free) and partial-aggregates
    //    map-side — the exchange carries O(docs) partial rows, not
    //    O(grams);
    //  - bench-doc counting inner-joins the (bid, gram) table, so only
    //    HIT rows (rare by definition of decontamination) ever shuffle,
    //    through a single-distinct aggregate (no Expand for one
    //    distinct group).
    // Values are identical to the old form by construction.
    val bgAll0 = benchmark.select(col("doc_id").as("bid"),
      explode(wordNGrams(col("text"), n)).as("bg"))
    val bgAll = if (broadcastBench) broadcast(bgAll0) else bgAll0
    val bgGrams0 = bgAll0.select(col("bg")).distinct()
    val bgGrams = if (broadcastBench) broadcast(bgGrams0) else bgGrams0
    def exploded = corpus.select(col("doc_id"),
      explode_outer(wordNGrams(col("text"), n)).as("g"))
    val hits = exploded
      .join(bgGrams, col("g") === col("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("g")).as("n_grams"),
        count(col("bg")).as("n_hit_grams"))
    val bdocs = exploded
      .join(bgAll, col("g") === col("bg"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bid")).as("n_bench_docs"))
    // doc-grain merge of the two branches: both sides arrive hash-
    // partitioned by doc_id from their aggregations, and the bench-doc
    // side holds only CONTAMINATED docs — hash-build it per partition
    // (shuffle_hash) instead of letting the planner sort both sides
    // for a merge join
    hits.join(bdocs.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_hit_grams"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }

  // ---- deterministic stratified sampling -------------------------------

  /** Uniform-in-[0,1) draw derived from a NON-NEGATIVE id column by
    * pure 64-bit integer arithmetic (two 20-bit lanes of the id, each
    * multiplicatively mixed, folded into a 2^20 bucket — the quotient
    * is an exact binary fraction both engines represent identically).
    * Both lanes are masked to 20 bits BEFORE multiplying, so the
    * largest intermediate is ~2^52 — no Int64 overflow for any id up
    * to 2^63-1 in either engine (ANSI Spark and DuckDB both THROW on
    * overflow; a naive `id * K` form dies at ids >= ~3.5e9, i.e.
    * exactly at web-corpus scale). A production pipeline would plug
    * the native xxhash64 here; the arithmetic form keeps the DuckDB
    * oracle bit-exact without porting xxHash to SQL. */
  def uniformFromId(id: Column): Column =
    pmod(
      id.bitwiseAND(lit(1048575L)) * lit(2654435761L) +
        shiftright(id, 20).bitwiseAND(lit(1048575L)) * lit(998244353L) +
        lit(40503L),
      lit(1048576L)).cast("double") / lit(1048576.0)

  /** Deterministic stratified sampling for training-mixture
    * construction: keep a document iff its id-derived uniform draw
    * falls under its stratum's target rate. Reproducible (same ids →
    * same sample, any partitioning), single map-side projection +
    * filter — no shuffle, no RNG state; the per-stratum rate map
    * rides along as a literal `CASE` (strata are languages/sources —
    * small). Unknown strata default to `defaultRate`. */
  def sampleStratified(docs: org.apache.spark.sql.DataFrame,
      rates: Map[String, Double], stratumCol: String = "lang",
      idCol: String = "doc_id",
      defaultRate: Double = 0.0): org.apache.spark.sql.DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    docs.withColumn("u", uniformFromId(col(idCol)))
      .filter(col("u") < rate)
  }

  // ---- token-budget shard packing --------------------------------------

  /** Pack documents into fixed token-budget shards by cumulative
    * offset within each partition group — the pre-training shard-prep
    * step (docs are concatenated and split into fixed-length
    * sequences downstream, so offset packing is the standard layout;
    * see e.g. the T5/GPT "pack to sequence length" preprocessing).
    * Shard k of a group holds the docs whose EXCLUSIVE cumulative
    * token offset lands in [k·budget, (k+1)·budget) — deterministic
    * given the (group, order) columns, one window over the group
    * partitioning and nothing else.
    *
    * Scale shape: partitioned by `groupCol` (language/source), never a
    * global single-partition window; at 100 TB you pack per
    * (source, date-bucket) so every window partition is bounded. */
  def packShards(docs: org.apache.spark.sql.DataFrame, budget: Long,
      groupCol: String = "lang", orderCol: String = "doc_id")
      : org.apache.spark.sql.DataFrame = {
    val toks = size(split(col("text"), " ")).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .withColumn("n_tokens", toks)
      .withColumn("shard",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget)
          .cast("long"))
  }

  // ---- Gopher document-level quality rules ------------------------------

  /** The Gopher stop-word set (Rae et al., arXiv:2112.11446, A1.1):
    * a document must contain at least two of these. */
  private[graft] val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher document-level quality-rule battery (Rae et al.,
    * arXiv:2112.11446, Appendix A1.1) as ONE map-side pass of pure
    * array/string expressions — no UDF, whole-stage codegen, nothing
    * shuffles. Seven rules, each evaluated by INTEGER comparison so
    * the booleans are bit-exact across engines (no float thresholds):
    *
    *   r_word_count     minWords ≤ words ≤ maxWords
    *   r_mean_word_len  3 ≤ Σlen/words ≤ 10     ⟺ 3n ≤ Σlen ≤ 10n
    *   r_symbol_ratio   (#'#' + #'...' + #'…')/words ≤ 0.1
    *                                             ⟺ 10·symbols ≤ n
    *   r_bullet         lines starting with a bullet ≤ 90 %
    *                                             ⟺ 10·bullets ≤ 9·lines
    *   r_ellipsis       lines ending with an ellipsis ≤ 30 %
    *                                             ⟺ 10·ell ≤ 3·lines
    *   r_alpha          words containing [A-Za-z] ≥ 80 %
    *                                             ⟺ 5·alpha ≥ 4·words
    *   r_stop           ≥ 2 DISTINCT [[gopherStopWords]] present
    *
    * Words are maximal non-empty whitespace-split runs (empties from
    * leading/trailing whitespace dropped on both engines identically).
    * Emits the raw integer counts alongside the rule booleans and the
    * conjunction `keep`, so an oracle can re-derive every decision
    * from the text alone. Documents with zero words fail every
    * ratio rule by definition (guarded denominators). */
  def gopherQualityRules(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000)
      : org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, "\\s+"), w => length(w) > 0)
    val lines = split(t, "\n")
    def occurrences(needle: String, len: Int): Column =
      ((length(t) - length(regexp_replace(t,
        java.util.regex.Pattern.quote(needle), ""))) / len).cast("long")
    docs
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("sum_word_len",
        aggregate(words, lit(0L), (a, w) => a + length(w)))
      .withColumn("n_symbols",
        occurrences("#", 1) + occurrences("...", 3) + occurrences("…", 1))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_bullet_lines",
        size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long"))
      .withColumn("n_ellipsis_lines",
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
          .cast("long"))
      .withColumn("n_alpha_words",
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stop_words",
        size(array_intersect(
          array_distinct(transform(words, w => lower(w))),
          array(gopherStopWords.map(lit): _*))).cast("long"))
      .withColumn("r_word_count",
        col("n_words").between(minWords.toLong, maxWords.toLong))
      .withColumn("r_mean_word_len",
        col("n_words") > 0 &&
          col("sum_word_len") >= col("n_words") * 3 &&
          col("sum_word_len") <= col("n_words") * 10)
      .withColumn("r_symbol_ratio",
        col("n_words") > 0 && col("n_symbols") * 10 <= col("n_words"))
      .withColumn("r_bullet",
        col("n_bullet_lines") * 10 <= col("n_lines") * 9)
      .withColumn("r_ellipsis",
        col("n_ellipsis_lines") * 10 <= col("n_lines") * 3)
      .withColumn("r_alpha",
        col("n_words") > 0 &&
          col("n_alpha_words") * 5 >= col("n_words") * 4)
      .withColumn("r_stop", col("n_stop_words") >= 2)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet") &&
          col("r_ellipsis") && col("r_alpha") && col("r_stop"))
      .select(col(idCol), col("n_words"), col("sum_word_len"),
        col("n_symbols"), col("n_lines"), col("n_bullet_lines"),
        col("n_ellipsis_lines"), col("n_alpha_words"),
        col("n_stop_words"), col("r_word_count"),
        col("r_mean_word_len"), col("r_symbol_ratio"), col("r_bullet"),
        col("r_ellipsis"), col("r_alpha"), col("r_stop"), col("keep"))
  }

  /** Unigram rarity score — the integer-exact stand-in for the LM
    * perplexity filter of CCNet (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): a document whose tokens are corpus-common scores low, a
    * document full of corpus-rare tokens scores high — the same
    * band-filtering signal CCNet draws from a KenLM, derivable from
    * the corpus itself with no model artifact. Per token the rarity
    * is the exact rational `n_docs·scale div df(token)` in
    * micro-units (floor division, all BIGINT); the document score is
    * the mean over token OCCURRENCES, `sum(tf·rarity) div n_tokens`
    * — so the score, like the BM25 and PageRank fixed points, is
    * bit-identical across engines and partitionings. Returns
    * `(doc_id, n_tokens, rarity_u)`.
    *
    * Overflow headroom: `tf·rarity ≤ n_tokens(doc)·n_docs·scale`; at
    * the default 1e6 scale a 1e4-token document is safe to ~9e8 docs
    * per scoring shard — larger corpora lower `scale` or shard.
    *
    * Scale shape: one (term, doc) exchange to build per-doc term
    * frequencies, one term-keyed aggregate for df (both partial-agg
    * friendly, no stopword posting list ever in one task), a df
    * lookup join keyed on term, then one doc-keyed aggregation. */
  def rarityScore(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(scale > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val dfr = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfr, "term")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"tf",
        expr(s"n_docs * ${scale}L div df").as("rarity_u"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tokens"),
        expr(s"sum(tf * rarity_u) div sum(tf)").as("rarity_u"))
  }
}
