package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level exact deduplication — the Dolma / CCNet curation
  * step (Soldaini et al., arXiv:2402.00159 §2: "paragraph-level
  * deduplication"; CCNet dedups at the same granularity): a paragraph
  * that occurs verbatim ANYWHERE in the corpus keeps only its first
  * occurrence (by doc id, then position), every later copy is dropped,
  * and documents are reassembled from their surviving paragraphs.
  * Catches repeated boilerplate blocks (navigation, legal footers,
  * cookie banners) that whole-document hashes miss and that
  * [[SubstringDedup]] would find only at ≥w-token granularity — the
  * natural unit of web boilerplate is the paragraph.
  *
  * Scale shape: ONE hash shuffle keyed on the paragraph's 128-bit md5
  * ([[DedupOps.exactDedup]]'s collision argument) carrying (hash, id,
  * idx, paragraph); keep-first is a rank over that same partitioning;
  * reassembly groups by doc id — the paragraph text shuffles twice
  * (it must: the surviving text is the output), but never joins
  * against anything and never fans out beyond its own size. */
object ParagraphDedup {

  /** Every paragraph occurrence with its keep-first verdict:
    * `(id, idx, para, n_occ, keep)` — `idx` is the paragraph's
    * 0-based position in doc `id`, `n_occ` the corpus-wide count of
    * identical paragraphs, `keep` true iff this occurrence is the
    * group's first by (id, idx). */
  def paragraphOccurrences(docs: DataFrame, idCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grp = Window.partitionBy($"h")
    docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("idx", "para")))
      .withColumn("h", md5($"para".cast("binary")))
      .withColumn("n_occ", count(lit(1)).over(grp))
      .withColumn("rk", row_number().over(grp.orderBy($"id", $"idx")))
      .select($"id", $"idx", $"para", $"n_occ", ($"rk" === 1).as("keep"))
  }

  /** Every paragraph occurrence with its per-HOST boilerplate verdict:
    * `(id, host, idx, para, n_docs_host, n_docs_with_para, boiler)`.
    * A paragraph is boilerplate on host `h` when it appears in at
    * least `pctThreshold`% of `h`'s documents, in at least TWO of them
    * (template means repetition — a paragraph seen once is content no
    * matter how small the host), AND `h` has at least `minHostDocs`
    * documents — the CCNet/Dolma-style template filter
    * (navigation bars, cookie banners, legal footers repeat across a
    * SITE, not the corpus: corpus-wide keep-first dedup keeps exactly
    * one stray copy of each, this drops them everywhere). The
    * threshold test is pure integer cross-multiplication
    * (`n_with·100 >= n_host·pct`), so verdicts are engine-exact.
    *
    * Scale shape: host doc totals are a host-keyed aggregate of the
    * doc table (rows = hosts, tiny); per-(host, paragraph) distinct-doc
    * counts aggregate the occurrence set AFTER projecting away the
    * text (only the 128-bit md5 travels); the verdict join back to
    * full occurrences is keyed (host, hash) — one shuffle of the
    * occurrence rows, the same key the count was built on. The
    * host-totals join rides AQE's broadcast pick (an aggregate of
    * cardinality = distinct hosts). */
  def hostBoilerplateOccurrences(docs: DataFrame, idCol: String,
      textCol: String, hostCol: String, pctThreshold: Int = 50,
      minHostDocs: Int = 2, sep: String = "\n\n"): DataFrame = {
    require(pctThreshold >= 1 && pctThreshold <= 100 && minHostDocs >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = docs
      .select(col(idCol).as("id"), col(hostCol).as("host"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("idx", "para")))
      .withColumn("h", md5($"para".cast("binary")))
    val hostDocs = docs
      .groupBy(col(hostCol).as("host"))
      .agg(countDistinct(col(idCol)).as("n_docs_host"))
    val paraDocs = occ.select($"host", $"h", $"id").distinct()
      .groupBy($"host", $"h")
      .agg(count(lit(1)).as("n_docs_with_para"))
      .join(hostDocs, Seq("host"))
    occ.join(paraDocs, Seq("host", "h"))
      .select($"id", $"host", $"idx", $"para",
        $"n_docs_host", $"n_docs_with_para",
        ($"n_docs_host" >= minHostDocs && $"n_docs_with_para" >= 2 &&
          $"n_docs_with_para" * 100 >= $"n_docs_host" * pctThreshold)
          .as("boiler"))
  }

  /** The host-boilerplate-cleaned corpus:
    * `(id, clean_text, n_paras, n_kept)` — each document rebuilt from
    * its non-boilerplate paragraphs in original order (every input doc
    * appears exactly once; empty string when everything was template).
    * Unlike [[paragraphDedup]] no copy survives: a paragraph judged
    * site-template is noise in ALL its occurrences. */
  def hostBoilerplateClean(docs: DataFrame, idCol: String,
      textCol: String, hostCol: String, pctThreshold: Int = 50,
      minHostDocs: Int = 2, sep: String = "\n\n"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = hostBoilerplateOccurrences(docs, idCol, textCol, hostCol,
      pctThreshold, minHostDocs, sep)
    val rebuilt = occ
      .groupBy($"id")
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(!$"boiler", 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!$"boiler", struct($"idx", $"para")))),
            s => s.getField("para")),
          sep).as("clean_text"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select($"id", coalesce($"clean_text", lit("")).as("clean_text"),
        coalesce($"n_paras", lit(0L)).as("n_paras"),
        coalesce($"n_kept", lit(0L)).as("n_kept"))
  }

  /** The deduplicated corpus: `(id, clean_text, n_paras, n_kept)` —
    * each document rebuilt from its surviving paragraphs in original
    * order (empty string when every paragraph was a later duplicate;
    * every input doc appears exactly once). */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val occ = paragraphOccurrences(docs, idCol, textCol, sep)
    val rebuilt = occ
      .groupBy($"id")
      .agg(
        count(lit(1)).as("n_paras"),
        count(when($"keep", 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when($"keep", struct($"idx", $"para")))),
            s => s.getField("para")),
          sep).as("clean_text"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select($"id", coalesce($"clean_text", lit("")).as("clean_text"),
        coalesce($"n_paras", lit(0L)).as("n_paras"),
        coalesce($"n_kept", lit(0L)).as("n_kept"))
  }
}
