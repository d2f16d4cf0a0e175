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
