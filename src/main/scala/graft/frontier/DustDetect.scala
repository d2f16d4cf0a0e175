package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-pathology detection over fetched (url, content) pairs — the
  * two classic frontier-poisoning patterns a web-scale crawler must
  * mine from its own output and feed back into scheduling:
  *
  *  - DUST ("Different URLs with Similar Text", Bar-Yossef et al.
  *    WWW 2007): URL aliasing rules — query parameters whose removal
  *    maps a fetched URL onto ANOTHER fetched URL with identical
  *    content. Each discovered (host, param) rule lets the frontier
  *    canonicalize away the parameter BEFORE fetching, collapsing
  *    session-id/tracking-param URL families that would otherwise
  *    multiply the frontier without adding content.
  *  - Crawl traps: hosts whose URL count vastly exceeds their
  *    distinct-content count (calendar pages, faceted search,
  *    infinite redirects) — the budget allocator
  *    ([[BudgetAllocator]]) starves them once flagged.
  *
  * The reference has no self-diagnosis layer (its site list is three
  * hand-vetted portals, config/sites_config.json); at a 10^10-URL
  * frontier these rules ARE the difference between crawling the web
  * and crawling one infinite calendar.
  */
object DustDetect {

  private val hostRe = "^[a-z]+://([^/]+)"

  /** DUST parameter-rule mining. `pages` carries one row per fetched
    * URL: a `url` string column and a `content_hash` column (any
    * equality-comparable content digest). For every URL with a query
    * string, every single-parameter deletion is generated; a deletion
    * that lands EXACTLY on another fetched URL with the SAME content
    * hash witnesses one alias pair. Returns one row per discovered
    * rule: `(host, param, n_pairs)` — strip `param` on `host` —
    * with `n_pairs` the number of witnessing URL pairs.
    *
    * All string surgery is built-in expressions (split / filter with
    * index / array_join) — no UDF, fully codegen. Scale shape: the
    * candidate generator is map-side (≤ #params rows per URL, no
    * state); the witness check is ONE equi-join keyed on
    * (stripped_url, content_hash) against the fetched set — at
    * 10^10 URLs that is the same shuffle a seen-set anti-join costs,
    * and the rule aggregation after it is a two-column groupBy. */
  def paramAliasRules(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val withQ = pages
      .where(instr($"url", "?") > 0)
      .select($"url", $"content_hash",
        regexp_extract($"url", hostRe, 1).as("host"),
        substring_index($"url", "?", 1).as("base"),
        split(substring_index($"url", "?", -1), "&").as("params"))
    val cand = withQ
      .select($"url", $"content_hash", $"host", $"base",
        posexplode($"params").as(Seq("i", "param")),
        $"params")
      .select($"url", $"content_hash", $"host",
        substring_index($"param", "=", 1).as("pname"),
        when(size($"params") === 1, $"base")
          .otherwise(concat($"base", lit("?"),
            array_join(
              filter($"params", (_, j) => j =!= $"i"), "&")))
          .as("stripped"))
    cand
      .join(pages.select($"url".as("u2"), $"content_hash".as("h2")),
        $"stripped" === $"u2" && $"content_hash" === $"h2" &&
          $"url" =!= $"u2")
      .groupBy($"host", $"pname".as("param"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Crawl-trap host detection: per host, the fetched-URL count, the
    * distinct-content count, and the maximum path depth (number of
    * `/`-separated segments below the host); a host is flagged a trap
    * when it has at least `minUrls` URLs and its distinct content
    * covers at most a `1/dupFactor` fraction of them (the comparison
    * is the integer cross-multiplication `n_distinct · dupFactor ≤
    * n_urls`, so the flag is engine-exact). Returns
    * `(host, n_urls, n_distinct, max_depth, is_trap)`.
    *
    * Scale shape: one host-keyed aggregation; the distinct-content
    * count is a two-level partial aggregate (Spark plans
    * count(distinct) as such), nothing per-host is ever unbounded. */
  def trapHosts(pages: DataFrame, minUrls: Long = 5L,
      dupFactor: Long = 4L): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    require(minUrls >= 1 && dupFactor >= 1)
    pages
      .select(regexp_extract($"url", hostRe, 1).as("host"),
        $"content_hash",
        (size(split(substring_index(
          regexp_replace($"url", hostRe, ""), "?", 1), "/")) - 1)
          .cast("long").as("depth"))
      .groupBy($"host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct($"content_hash").as("n_distinct"),
        max($"depth").as("max_depth"))
      .withColumn("is_trap",
        $"n_urls" >= minUrls &&
          $"n_distinct" * dupFactor <= $"n_urls")
  }

  /** Apply mined DUST rules to a URL set — the enforcement half of
    * [[paramAliasRules]]: every query parameter named by a `(host,
    * param)` rule is stripped from URLs on that host, yielding a
    * `canonical` column the frontier dedups on BEFORE fetching (the
    * collapse is where the crawl budget is actually saved; mining
    * without application is a report, not an operator). URLs on hosts
    * with no rule, and URLs without a query string, canonicalize to
    * themselves; a URL whose every parameter is stripped canonicalizes
    * to its bare base. Input needs a `url` column (other columns pass
    * through); `rules` needs `(host, param)`. Returns the input plus
    * `host` and `canonical`.
    *
    * Scale shape: the rule table is tiny by construction (one row per
    * (host, param) — bounded by hosts, not URLs), so the join is an
    * explicit broadcast and the rewrite is pure map-side built-in
    * string/array surgery (split / filter / array_join — no UDF, fully
    * codegen): canonicalizing a 10^10-row frontier costs one scan and
    * zero shuffles. */
  def applyParamRules(urls: DataFrame, rules: DataFrame): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val perHost = rules.groupBy($"host")
      .agg(collect_set($"param").as("strip_set"))
    val base = substring_index($"url", "?", 1)
    val kept = filter(split(substring_index($"url", "?", -1), "&"),
      p => !array_contains($"strip_set", substring_index(p, "=", 1)))
    urls
      .withColumn("host", regexp_extract($"url", hostRe, 1))
      .join(broadcast(perHost), Seq("host"), "left")
      .withColumn("canonical",
        when($"strip_set".isNull || instr($"url", "?") === 0, $"url")
          .otherwise(when(size(kept) === 0, base)
            .otherwise(concat(base, lit("?"), array_join(kept, "&")))))
      .drop("strip_set")
  }
}
