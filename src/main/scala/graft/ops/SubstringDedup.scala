package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", arXiv:2107.06499, the
  * ExactSubstr variant): find every w-token span whose text occurs
  * verbatim more than once in the corpus — across documents or within
  * one — keep the first occurrence, and cut the rest out of the
  * documents. This catches what the whole-document families in
  * [[DedupOps]] cannot: a boilerplate paragraph pasted into thousands
  * of otherwise-distinct pages leaves every MinHash/SimHash pair below
  * threshold, yet is exactly the text a training run memorizes.
  *
  * The paper builds a suffix array — a single-machine data structure.
  * The Spark-first formulation is a sliding-window group-by:
  *
  *   tokenize with char offsets + hash every w-token window (map-side;
  *     the window TEXT never leaves the task — only its 128-bit md5,
  *     [[DedupOps.exactDedup]]'s collision argument at 10^10-doc scale)
  *   → ONE hash shuffle keyed on the window hash: count occurrences,
  *     rank by (doc id, start) — keep-first, the library convention
  *   → per-doc interval merge of the non-kept windows (window
  *     functions over (id, start) — no UDF, no driver)
  *   → optional string surgery producing the cleaned corpus.
  *
  * Stride is 1, so a duplicated region of L ≥ w tokens is L-w+1
  * duplicated windows that merge back into the one maximal span —
  * equivalent coverage to the suffix-array spans at w-token
  * granularity (regions shorter than w are below the dedup threshold
  * by definition). Shuffle payload per window is (16 B hash, id,
  * 2×int), independent of document size.
  */
object SubstringDedup {

  /** Char spans `(start, stop)` (0-based, end-exclusive) of every
    * w-token sliding window; tokens are maximal non-whitespace runs
    * (the tokenizer [[TextOps.tokenCount]] counts). */
  private[graft] def windowSpansScala(text: String,
      w: Int): Array[(Int, Int)] = {
    val n = text.length
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      if (!text.charAt(i).isWhitespace) {
        val s = i
        while (i < n && !text.charAt(i).isWhitespace) i += 1
        starts += s; ends += i
      } else i += 1
    }
    val m = starts.length - w + 1
    if (m <= 0) Array.empty
    else Array.tabulate(m)(j => (starts(j), ends(j + w - 1)))
  }

  /** Every occurrence of a duplicated w-token window, as
    * `(id, start, stop, n_occ, keep)`: the window text at
    * `[start, stop)` of doc `id` occurs `n_occ ≥ 2` times in the
    * corpus, and `keep` marks the group's first occurrence by
    * (id, start). The two window computations share one partitioning
    * (count + row_number over the same hash key → a single shuffle). */
  def duplicateWindows(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val spansUdf = udf((t: String) => windowSpansScala(t, w))
    val occ = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sp", explode(spansUdf($"text")))
      .withColumn("sub",
        expr("substring(text, sp._1 + 1, sp._2 - sp._1)"))
      .select($"id", $"sp._1".as("start"), $"sp._2".as("stop"),
        md5($"sub".cast("binary")).as("h"))
    val grp = Window.partitionBy($"h")
    occ
      .withColumn("n_occ", count(lit(1)).over(grp))
      .withColumn("rk",
        row_number().over(grp.orderBy($"id", $"start")))
      .filter($"n_occ" >= 2)
      .select($"id", $"start", $"stop", $"n_occ",
        ($"rk" === 1).as("keep"))
  }

  /** Maximal char spans to REMOVE per document: the non-kept
    * duplicated windows of [[duplicateWindows]], merged per doc
    * wherever they overlap or touch (interval merge via a running-max
    * window — no UDF, no driver round-trip). A kept occurrence that
    * overlaps a removed one inside the same document keeps only its
    * non-removed part — the greedy behavior of span-level cutting,
    * same as the paper's. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byDoc = Window.partitionBy($"id").orderBy($"start", $"stop")
    duplicateWindows(docs, idCol, textCol, w)
      .filter(!$"keep")
      .withColumn("pmax", max($"stop").over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when($"pmax".isNull || $"pmax" < $"start", 1).otherwise(0))
      .withColumn("grp", sum($"brk").over(byDoc))
      .groupBy($"id", $"grp")
      .agg(min($"start").as("start"), max($"stop").as("stop"))
      .select($"id", $"start", $"stop")
  }

  /** The cleaned corpus: `docs` with every [[duplicateSpans]] region
    * cut out (single justified UDF — string surgery over the doc's
    * own sorted, disjoint span list; the heavy lifting — finding the
    * spans — stayed declarative). Adds `clean_text` and
    * `n_cut_chars`; docs with nothing to cut pass through. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String,
      textCol: String, w: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cuts = duplicateSpans(docs, idCol, textCol, w)
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"start", $"stop")))
        .as("cuts"))
      .select($"id", $"cuts.start".as("cs"), $"cuts.stop".as("ce"))
    val cutUdf = udf((t: String, cs: Seq[Int], ce: Seq[Int]) => {
      val sb = new java.lang.StringBuilder(t.length)
      var prev = 0
      var i = 0
      while (i < cs.length) {
        sb.append(t, prev, cs(i)); prev = ce(i); i += 1
      }
      sb.append(t, prev, t.length)
      sb.toString
    })
    docs.join(cuts, docs(idCol) === cuts("id"), "left")
      .withColumn("clean_text",
        when($"cs".isNull, col(textCol))
          .otherwise(cutUdf(col(textCol), $"cs", $"ce")))
      .withColumn("n_cut_chars",
        coalesce(aggregate($"ce", lit(0), (a, x) => a + x)
          - aggregate($"cs", lit(0), (a, x) => a + x), lit(0)))
      .drop("id", "cs", "ce")
  }
}
