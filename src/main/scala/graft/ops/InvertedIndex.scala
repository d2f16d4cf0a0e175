package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction — the retrieval-side artifact a
  * curated corpus feeds (term → the documents containing it, with
  * per-document frequencies and first positions). Deduplication and
  * quality gating decide WHAT survives into a training corpus; the
  * inverted index is how anything is ever found in it again
  * (decontamination audits, targeted resampling, eyeball queries).
  * The reference has no retrieval layer (its outputs are opaque
  * files, src/services/file_manager.py); at 10^10 documents the
  * postings table IS the queryable catalog.
  *
  * Scale shape: [[postings]] is ONE term-keyed shuffle of (term,
  * doc_id, pos) triples aggregated per (term, doc) — no unbounded
  * per-term state anywhere, the posting list for a stopword never
  * materializes in one task. [[dictionary]]'s per-term aggregate
  * state is two counters plus at most `cap` sampled ids (the
  * rank-limit `when` feeds `collect_list` nothing past the cap — its
  * df/tf_total counters still see every posting, which is why the
  * rank window cannot be pruned away entirely), and the rank window
  * and the final aggregation share one term-keyed exchange on top of
  * the postings build's (term, doc_id) exchange — two shuffles end
  * to end, even for the `the`-term group. */
object InvertedIndex {

  /** The full postings table `(term, doc_id, tf, first_pos)`:
    * whitespace tokenization, one row per (term, document) pair,
    * `tf` the in-document frequency, `first_pos` the 0-based token
    * position of the first occurrence. */
  def postings(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"),
        min($"pos").cast("long").as("first_pos"))
  }

  /** BM25 top-k retrieval in FIXED-POINT integer arithmetic — the
    * retrieval query the [[postings]] table exists to serve, scored
    * with Robertson's Okapi tf-saturation (Robertson & Zaragoza 2009,
    * "The Probabilistic Relevance Framework: BM25 and Beyond") but
    * with the transcendental `log`-idf replaced by the exact rational
    * `(N - df + 1)/(df + 1)` in `scale`-denominated micro-units: every
    * multiply/divide is BIGINT with floor division, so the score — and
    * therefore the ranking, tie-broken by ascending doc id — is
    * bit-identical under any partitioning, shuffle order, or engine
    * (a float BM25's sum drifts with aggregation order, which breaks
    * cross-engine value oracles and run-to-run reproducibility).
    *
    * Fixed-point chain (all BIGINT, all quantities positive):
    * {{{
    *   lenr  = (dl * N * scale) div total_len            // len/avgdl
    *   norm  = (scale - b) + (b * lenr) div scale
    *   denom = tf * scale + (k1 * norm) div scale
    *   tfsat = (tf * (k1 + scale) * scale) div denom
    *   idf   = ((N - df + 1) * scale) div (df + 1)
    *   score = sum over matched query terms of (idf * tfsat) div scale
    * }}}
    * Overflow headroom at the default `scale` 1e6: `idf·tfsat ≤
    * N·scale · (k1+scale) ≈ N·2.2e12` — safe in int64 to N ≈ 4e6 docs
    * per retrieval SHARD; for larger corpora lower `scale` (1e4 buys
    * N ≈ 4e8) or shard the corpus and merge the per-shard top-k,
    * which is how a 10^10-doc deployment runs this anyway.
    *
    * Scale shape: the postings build's (term, doc) exchange carries
    * ONLY the query terms (the `isin` filter sits on a grouping key,
    * so Catalyst pushes it below the aggregation into the explode);
    * the matched-postings side of the doc-length join is a few rows
    * per query term and broadcasts under AQE; the final top-k is
    * `orderBy().limit(k)` — Spark plans TakeOrderedAndProject
    * (per-partition heaps + driver merge), never a global sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1Micro: Long = 1200000L,
      bMicro: Long = 750000L, scale: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k > 0 && queryTerms.nonEmpty && scale > 0)
    require(bMicro >= 0 && bMicro <= scale && k1Micro >= 0)
    val lens = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    val tot = lens.agg(count(lit(1)).as("n_docs"),
      sum($"dl").as("total_len"))
    val p = postings(docs, idCol, textCol)
      .where($"term".isin(queryTerms: _*))
    val dfr = p.groupBy($"term").agg(count(lit(1)).as("df"))
    p.join(broadcast(dfr), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("idf_u",
        expr(s"(n_docs - df + 1) * ${scale}L div (df + 1)"))
      .withColumn("lenr_u",
        expr(s"dl * n_docs * ${scale}L div total_len"))
      .withColumn("norm_u",
        expr(s"(${scale}L - ${bMicro}L) + " +
          s"(${bMicro}L * lenr_u) div ${scale}L"))
      .withColumn("denom_u",
        expr(s"tf * ${scale}L + (${k1Micro}L * norm_u) div ${scale}L"))
      .withColumn("contrib_u",
        expr(s"(idf_u * ((tf * (${k1Micro}L + ${scale}L) * ${scale}L)" +
          s" div denom_u)) div ${scale}L"))
      .groupBy($"doc_id")
      .agg(sum($"contrib_u").as("score_u"), max($"dl").as("dl"))
      .orderBy($"score_u".desc, $"doc_id")
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"score_u".desc, $"doc_id")))
      .select($"rk", $"doc_id", $"score_u", $"dl")
  }

  /** Exact-phrase retrieval over positional postings: documents are
    * ranked by their count of EXACT consecutive occurrences of
    * `phrase` (whitespace tokens), ties broken by ascending doc id —
    * the positional-index query a [[postings]]-style catalog exists to
    * answer beyond bag-of-words (decontamination audits ask precisely
    * this: "which documents contain this benchmark sentence verbatim").
    * Returns `(rk, doc_id, n_matches)`, top `k` only.
    *
    * Matching is the classic positional-intersection: term `i` of the
    * phrase at token position `p` witnesses a candidate start `p - i`,
    * and a full match is one `(doc_id, start)` key present in ALL
    * `phrase.length` witness sets — so repeated terms in the phrase
    * ("a a") need no special casing, each offset filters independently.
    *
    * Scale shape: each witness set is the token explode FILTERED to
    * one term before any exchange (the filter sits under the join, so
    * only phrase-term tokens — a vanishing fraction of the corpus —
    * ever shuffle); the intersection is `phrase.length - 1` equi-joins
    * all keyed on the same `(doc_id, start)`, which AQE plans as
    * broadcasts when the rarest term is small; the final top-k is
    * `orderBy().limit(k)` — TakeOrderedAndProject (per-partition heaps
    * + driver merge), never a global sort. */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(phrase.nonEmpty && k > 0)
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    val witnesses = phrase.zipWithIndex.map { case (t, i) =>
      toks.where($"term" === t)
        .select($"doc_id", ($"pos" - i).cast("long").as("start"))
    }
    witnesses.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_matches"))
      .orderBy($"n_matches".desc, $"doc_id")
      .limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy($"n_matches".desc, $"doc_id")))
      .select($"rk", $"doc_id", $"n_matches")
  }

  /** The dictionary view `(term, df, tf_total, sample_docs)`: per
    * term, its document frequency, corpus-wide occurrence count, and
    * the `cap` LOWEST doc ids containing it as a comma-joined string
    * (a deterministic sample — lowest-id, not arbitrary — so the
    * output is engine-independent). */
  def dictionary(docs: DataFrame, idCol: String, textCol: String,
      cap: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(cap > 0, s"cap must be positive: $cap")
    val grp = Window.partitionBy($"term").orderBy($"doc_id")
    postings(docs, idCol, textCol)
      .withColumn("rk", row_number().over(grp))
      .groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("tf_total"),
        array_join(
          transform(
            array_sort(collect_list(when($"rk" <= cap, $"doc_id"))),
            x => x.cast("string")),
          ",").as("sample_docs"))
  }
}
