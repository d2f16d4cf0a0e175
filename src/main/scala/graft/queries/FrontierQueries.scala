package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.frontier.SeedExpansion
import graft.jobs.CrawlJob
import graft.model._

/** Frontier-expansion queries (SURVEY §2.4 G1–G4 + §2.1 S5 + §2.2
  * P2/P5/P10).
  *
  * `q29_municipality_expansion` is the oracle-checked witness of the
  * site-3 crawl shape: year×month×municipality enumeration with the
  * dropdown scan, placeholder filter, UF validation, future-month
  * guard, and the frozen seedSeq order (reference:
  * mds_saldo.py:296-379 enumeration, :643-662 dropdown scan;
  * mds_parcelas.py:424-428 placeholder filter; mds_saldo_ui.py:783-804
  * UF validation). The municipality dimension is pure integer
  * arithmetic on the UF ordinal, so DuckDB regenerates it exactly.
  *
  * `crawl_municipality` drives the full distributed crawl over an
  * ALL_MG config (rows-only for the driver; exact-match parity vs the
  * reference simulator is pinned in CrawlParitySpec).
  */
object FrontierQueries {

  /** MG = ordinal 12 in the reference's state list; mirrored by the
    * hard-coded 12 in the oracle SQL below. */
  private val expansionConfig = CrawlConfig(
    sites = Seq("mds_saldo"),
    years = YearSelector.Range(2023, 2024),
    months = MonthSelector.All,
    nowYear = 2024, nowMonth = 6,
    uf = "MG", municipality = Some(MunicipalitySelector.All))

  private val munCrawlConfig = CrawlConfig(
    sites = Seq("mds_saldo"),
    years = YearSelector.Single(2024),
    months = MonthSelector.Multiple(Seq(1, 2)),
    nowYear = 2024, nowMonth = 6, maxPages = 3,
    uf = "MG", municipality = Some(MunicipalitySelector.All))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sitemap ingestion round-trip (SURVEY §2.1 extra source):
    //      one sitemap XML blob per host is BUILT in-query from the
    //      documents table (deterministic loc/lastmod/priority
    //      arithmetic), parsed back through SitemapSource.parse
    //      (regexp built-ins, map-side), anti-joined against a seen
    //      set (doc_id % 3 == 0), and rank-ordered per host. DuckDB
    //      never parses XML: it derives the expected OUTPUT directly
    //      from documents with the same arithmetic — so any parse
    //      defect (regex group, date, priority tenth, a dropped or
    //      duplicated <url> block) breaks the two-sided compare.
    "q83_sitemap_ingest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", ($"doc_id" % 20).as("host"),
          (($"doc_id" % 28) + 1).as("dd"), ($"doc_id" % 10).as("p"))
      val frag = concat(
        lit("<url><loc>https://h"), $"host", lit(".example/p"),
        $"doc_id", lit("</loc><lastmod>2026-01-"),
        lpad($"dd".cast("string"), 2, "0"),
        lit("</lastmod><priority>0."), $"p",
        lit("</priority></url>"))
      val xml = d.select($"host", $"doc_id", frag.as("f"))
        .groupBy($"host")
        .agg(array_join(transform(
          array_sort(collect_list(struct($"doc_id".as("k"),
            $"f".as("v")))), x => x.getField("v")), "").as("xml"))
      val entries = graft.sources.SitemapSource.parse(xml, "xml")
      val seen = d.filter($"doc_id" % 3 === 0)
        .select(concat(lit("https://h"), $"host", lit(".example/p"),
          $"doc_id").as("url"))
      val fresh = graft.sources.SitemapSource
        .freshCandidates(entries, seen, "url")
      graft.sources.SitemapSource.prioritize(fresh, "host")
        .select($"host", $"loc", $"lastmod", $"priority_x10", $"rk")
        .orderBy($"host", $"rk")
    }),

    // Hamilton largest-remainder crawl-budget apportionment
    // (frontier/BudgetAllocator.scala) as a two-sided exact
    // derivation: both engines weight hosts (user_id) by event count
    // and apportion a prime budget (997 — guarantees nontrivial
    // remainders) independently; every base share, remainder seat,
    // and tie-break is integer-exact, so rows compare bit-for-bit.
    "q62_crawl_budget" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val w = s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("user_id").as("host"))
        .agg(count(lit(1)).as("w"))
      graft.frontier.BudgetAllocator.apportion(w, "host", "w", 997L)
        .select(col("key").as("host"), col("weight"), col("alloc"))
        .orderBy("host")
    }),
    // Budget-capped frontier (BudgetAllocator.capPerHost composed on
    // apportion) as a two-sided exact derivation: each host keeps its
    // first alloc(host) URLs (event_ids) in priority order. The gate
    // pins the per-host kept COUNT and the rank boundary itself (the
    // highest kept url), so membership — not just cardinality — must
    // match.
    "q63_budgeted_frontier" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("host"), col("event_id").as("url"))
      val w = ev.groupBy(col("host")).agg(count(lit(1)).as("w"))
      val alloc = graft.frontier.BudgetAllocator
        .apportion(w, "host", "w", 997L)
      graft.frontier.BudgetAllocator
        .capPerHost(ev, "host", "url", alloc)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_kept"), max(col("url")).as("max_url"))
        .orderBy("host")
    }),
    // Freshness-driven recrawl scheduling (frontier/RecrawlSchedule
    // .scala) as a two-sided exact derivation: both engines derive the
    // same fetch history from the events table (user_id as the url
    // key, epoch-micros fetch times, event_type as the content hash),
    // run the integer-arithmetic Cho-style estimator independently,
    // and compare every interval and next-fetch time exactly.
    "q60_recrawl_schedule" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val h = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id").as("url"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("event_type").as("ch"))
      graft.frontier.RecrawlSchedule.schedule(h, "url", "ts_us", "ch")
        .orderBy("url")
    }),
    // DUST parameter-rule mining (frontier/DustDetect.paramAliasRules)
    // as a two-sided exact derivation: both engines synthesize the
    // same URL universe from the documents table — canonical URLs,
    // same-content ?session= aliases (a true DUST family),
    // different-content ?ref= variants (must NOT become rules), and
    // two-parameter session+lang URLs (the lang deletion aliases only
    // when the session URL was itself crawled with equal content) —
    // mine single-parameter deletion rules independently, and compare
    // every (host, param, n_pairs) row exactly.
    "q66_dust_rules" -> ((s: SparkSession, dir: String) => {
      graft.frontier.DustDetect.paramAliasRules(dustUniverse(s, dir))
        .orderBy("host", "param")
    }),

    // The mine→apply DUST loop closed (frontier/DustDetect
    // .applyParamRules): the rules q66 mines are broadcast back over
    // the SAME fetched-URL universe and every query parameter they
    // name is stripped map-side; the gate pins, per host, the URL
    // count and the count of DISTINCT canonical forms — so a rule
    // that over-strips (collapsing distinct content), under-strips
    // (missing an alias family), or leaks across hosts shifts a row.
    // DuckDB re-mines and re-applies the rules from raw data.
    "q71_dust_apply" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val pages = dustUniverse(s, dir)
      val rules = graft.frontier.DustDetect.paramAliasRules(pages)
        .select(col("host"), col("param"))
      graft.frontier.DustDetect
        .applyParamRules(pages.select(col("url")), rules)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical")).as("n_canonical"))
        .orderBy("host")
    }),

    // Crawl-trap host detection (frontier/DustDetect.trapHosts) as a
    // two-sided exact derivation: hosts 0-2 of the synthetic URL
    // universe serve only two distinct contents across all their
    // URLs (a planted trap at every SF), the rest one distinct
    // content per URL; both engines aggregate and flag independently
    // and every count, depth, and flag compares exactly.
    "q67_trap_hosts" -> ((s: SparkSession, dir: String) => {
      graft.frontier.DustDetect
        .trapHosts(trapUniverse(s, dir), minUrls = 3L, dupFactor = 2L)
        .orderBy("host")
    }),

    // The closed frontier-policy loop — trap exclusion → budget
    // apportionment → per-host enforcement composed into ONE plan —
    // as a two-sided exact derivation: hosts flagged by trapHosts
    // over the q67 universe are anti-joined out of the event-derived
    // frontier, the (prime) budget 499 is re-apportioned over the
    // SURVIVING hosts only, and each keeps its first alloc(host) URLs.
    // The gate pins per-host kept counts AND the rank boundary, so a
    // regression in any stage (a trap leaking through, one seat
    // misassigned, an off-by-one cap) shifts a row.
    "q70_frontier_policy" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(concat(lit("h"), (col("user_id") % 20).cast("string"),
          lit(".test")).as("host"), col("event_id").as("url"))
      val traps = graft.frontier.DustDetect
        .trapHosts(trapUniverse(s, dir), minUrls = 3L, dupFactor = 2L)
        .where(col("is_trap")).select(col("host"))
      val clean = ev.join(broadcast(traps), Seq("host"), "left_anti")
      val w = clean.groupBy(col("host")).agg(count(lit(1)).as("w"))
      val alloc = graft.frontier.BudgetAllocator
        .apportion(w, "host", "w", 499L)
      graft.frontier.BudgetAllocator
        .capPerHost(clean, "host", "url", alloc)
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_kept"), max(col("url")).as("max_url"))
        .orderBy("host")
    }),

    "q29_municipality_expansion" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      s.createDataset(SeedExpansion.expand(expansionConfig))
        .select($"site", $"year", $"month", $"uf",
          $"municipality", $"munValue".as("mun_value"),
          $"seedSeq".as("seed_seq"))
        .orderBy($"seed_seq")
    }),

    "crawl_municipality" -> ((s: SparkSession, _: String) => {
      CrawlJob.run(s, munCrawlConfig).log.toDF()
        .select(col("site"), col("uf"), col("municipality"), col("year"),
          col("month"), col("seq"), col("imageId"), col("url"),
          col("urlHash"), col("vtimeMs"), col("attempts"), col("status"))
        .orderBy(col("uf"), col("municipality"), col("year"), col("month"),
          col("seq"))
    }),

    // G4 crawl ORACLE row (not just rows-only): the per-municipality
    // numbering spine of a full distributed crawl. 2011 months {1,10}
    // is a deterministic fixture where every MG municipality period is
    // non-empty (checked against SyntheticWeb.pageCount), so the
    // grouped log must cover the exact year×month×municipality
    // product; within each group the O1 numbering starts at 1, is
    // contiguous (row_number semantics survive the distributed dedup +
    // robots pipeline), and the seq-1 artifact name is the pure
    // integer-format string DuckDB regenerates.
    "q46_municipality_crawl_spine" -> ((s: SparkSession, _: String) => {
      CrawlJob.run(s, spineConfig).log.toDF()
        .groupBy(col("site"), col("year"), col("month"), col("uf"),
          col("municipality"))
        .agg(min(col("seq")).cast("long").as("first_seq"),
          (max(col("seq")) === count(lit(1))).as("contiguous"),
          min(when(col("seq") === 1, col("imageId")))
            .as("first_image_id"))
        .orderBy(col("year"), col("month"), col("municipality"))
    })
  )

  /** q66/q71's synthetic fetched-URL universe: 37 hosts keyed off
    * doc_id, every base URL fetched once, plus three deterministic
    * query-string families — `?session=sN` (same content as the base:
    * a strippable alias), `?ref=rN` (DIFFERENT content: must survive),
    * and `?session=sN&lang=en` (same content; stripping `lang` lands
    * on the fetched session URL) — regenerable exactly by any SQL
    * engine. */
  private def dustUniverse(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(lit("http://h"), (col("doc_id") % 37).cast("string"),
          lit(".test/d/"), col("doc_id").cast("string")).as("u"),
        md5(col("text").cast("binary")).as("ch"),
        md5(concat(col("text"), lit("x")).cast("binary")).as("chx"))
    d.select(col("u").as("url"), col("ch").as("content_hash"))
      .unionByName(d.where(col("doc_id") % 3 === 0)
        .select(concat(col("u"), lit("?session=s"),
          col("doc_id").cast("string")).as("url"),
          col("ch").as("content_hash")))
      .unionByName(d.where(col("doc_id") % 5 === 0)
        .select(concat(col("u"), lit("?ref=r"),
          col("doc_id").cast("string")).as("url"),
          col("chx").as("content_hash")))
      .unionByName(d.where(col("doc_id") % 11 === 0)
        .select(concat(col("u"), lit("?session=s"),
          col("doc_id").cast("string"), lit("&lang=en")).as("url"),
          col("ch").as("content_hash")))
  }

  /** q67/q70's synthetic fetched-page universe: 20 hosts keyed off
    * doc_id, hosts 0-2 serving only two distinct contents (planted
    * traps at every SF), integer-derived path depths — regenerable
    * exactly by any SQL engine. */
  private def trapUniverse(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.parquet(s"$dir/documents.parquet")
      .select(
        concat(lit("http://h"), (col("doc_id") % 20).cast("string"),
          lit(".test"),
          expr("repeat('/seg', CAST(doc_id % 8 AS INT) + 1)"),
          lit("/doc"), col("doc_id").cast("string")).as("url"),
        when(col("doc_id") % 20 < 3,
          md5(concat(lit("trap"), (col("doc_id") % 20).cast("string"),
            lit("_"), (col("doc_id") % 2).cast("string"))
            .cast("binary")))
          .otherwise(md5(concat(lit("u"),
            col("doc_id").cast("string")).cast("binary")))
          .as("content_hash"))
  }

  /** All-municipality crawl over a fixture period set with NO empty
    * (year, month, municipality) — see q46's oracle note. */
  private val spineConfig = CrawlConfig(
    sites = Seq("mds_saldo"),
    years = YearSelector.Single(2011),
    months = MonthSelector.Multiple(Seq(1, 10)),
    nowYear = 2024, nowMonth = 6, maxPages = 3,
    uf = "MG", municipality = Some(MunicipalitySelector.All))

  val oracleSql: Map[String, String] = Map(
    // derives the expected sitemap-ingest OUTPUT directly from the
    // documents table (no XML anywhere): same loc/lastmod/priority
    // arithmetic, same %3 seen exclusion, same per-host rank — the
    // Spark side must round-trip build→parse→merge to the same rows
    "q83_sitemap_ingest" ->
      """WITH d AS (SELECT doc_id, doc_id % 20 AS host,
        |   (doc_id % 28) + 1 AS dd, doc_id % 10 AS p FROM documents),
        | ent AS (SELECT host, doc_id,
        |   'https://h' || host || '.example/p' || doc_id AS loc,
        |   CAST('2026-01-' || lpad(CAST(dd AS VARCHAR), 2, '0') AS DATE)
        |     AS lastmod,
        |   p AS priority_x10 FROM d),
        | fresh AS (SELECT * FROM ent WHERE doc_id % 3 <> 0),
        | ranked AS (SELECT host, loc, lastmod, priority_x10,
        |   CAST(row_number() OVER (PARTITION BY host
        |     ORDER BY priority_x10 DESC, lastmod DESC, loc ASC)
        |     AS BIGINT) AS rk
        |  FROM fresh)
        |SELECT host, loc, lastmod, priority_x10, rk FROM ranked
        |ORDER BY host, rk""".stripMargin,
    // the same Hamilton apportionment re-derived end to end: integer
    // base shares, leftover count, largest-remainder seats with the
    // ascending-host tie-break
    "q62_crawl_budget" ->
      """WITH w AS (SELECT user_id AS host,
        |   CAST(count(*) AS BIGINT) AS weight FROM events
        |  GROUP BY user_id),
        | t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w
        |  WHERE weight > 0),
        | b AS (SELECT host, weight,
        |   CASE WHEN weight > 0 THEN (997 * weight) // tot
        |     ELSE 0 END AS base,
        |   CASE WHEN weight > 0 THEN (997 * weight) % tot
        |     ELSE -1 END AS rem FROM w, t),
        | l AS (SELECT 997 - sum(base) AS lcnt FROM b),
        | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
        |   host ASC) AS rk FROM b)
        |SELECT host, weight, CAST(base + CASE WHEN weight > 0
        |  AND rk <= (SELECT lcnt FROM l) THEN 1 ELSE 0 END
        |  AS BIGINT) AS alloc
        |FROM r ORDER BY host""".stripMargin,
    // the same apportionment re-derived, then the same per-host
    // keep-first-alloc cap: counts and the exact rank boundary
    "q63_budgeted_frontier" ->
      """WITH ev AS (SELECT user_id AS host, event_id AS url
        |  FROM events),
        | w AS (SELECT host, CAST(count(*) AS BIGINT) AS weight
        |  FROM ev GROUP BY host),
        | t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w
        |  WHERE weight > 0),
        | b AS (SELECT host, weight,
        |   CASE WHEN weight > 0 THEN (997 * weight) // tot
        |     ELSE 0 END AS base,
        |   CASE WHEN weight > 0 THEN (997 * weight) % tot
        |     ELSE -1 END AS rem FROM w, t),
        | l AS (SELECT 997 - sum(base) AS lcnt FROM b),
        | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
        |   host ASC) AS rk FROM b),
        | a AS (SELECT host, base + CASE WHEN weight > 0
        |   AND rk <= (SELECT lcnt FROM l) THEN 1 ELSE 0 END
        |   AS alloc FROM r),
        | f AS (SELECT ev.host, ev.url, row_number() OVER
        |   (PARTITION BY ev.host ORDER BY ev.url) AS urk, a.alloc
        |  FROM ev JOIN a ON ev.host = a.host)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_kept,
        | max(url) AS max_url
        |FROM f WHERE urk <= alloc GROUP BY host ORDER BY host""".stripMargin,
    // the same DUST mining re-derived end to end: identical synthetic
    // URL universe, single-parameter deletions (1-based lambda index
    // in DuckDB vs 0-based in Spark — each engine is internally
    // consistent, which is all the semantics need), witness join on
    // (stripped url, content hash), rule aggregation
    "q66_dust_rules" ->
      """WITH b AS (SELECT doc_id,
        |   'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.test/d/' ||
        |     CAST(doc_id AS VARCHAR) AS u,
        |   md5(text) AS ch, md5(text || 'x') AS chx FROM documents),
        | pages AS (
        |  SELECT u AS url, ch AS content_hash FROM b
        |  UNION ALL SELECT u || '?session=s' || CAST(doc_id AS VARCHAR),
        |   ch FROM b WHERE doc_id % 3 = 0
        |  UNION ALL SELECT u || '?ref=r' || CAST(doc_id AS VARCHAR),
        |   chx FROM b WHERE doc_id % 5 = 0
        |  UNION ALL SELECT u || '?session=s' || CAST(doc_id AS VARCHAR)
        |   || '&lang=en', ch FROM b WHERE doc_id % 11 = 0),
        | withq AS (SELECT url, content_hash,
        |   regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |   substr(url, 1, instr(url, '?') - 1) AS base,
        |   string_split(substr(url, instr(url, '?') + 1), '&') AS params
        |  FROM pages WHERE instr(url, '?') > 0),
        | cand0 AS (SELECT url, content_hash, host, base, params,
        |   unnest(list_transform(params,
        |     (x, i) -> struct_pack(i := i, p := x))) AS pp
        |  FROM withq),
        | cand AS (SELECT url, content_hash, host,
        |   string_split(pp.p, '=')[1] AS pname,
        |   CASE WHEN len(params) = 1 THEN base
        |     ELSE base || '?' || array_to_string(
        |       list_filter(params, (x, j) -> j <> pp.i), '&') END
        |     AS stripped
        |  FROM cand0),
        | hits AS (SELECT c.host, c.pname FROM cand c JOIN pages p2
        |   ON c.stripped = p2.url AND c.content_hash = p2.content_hash
        |     AND c.url <> p2.url)
        |SELECT host, pname AS param, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM hits GROUP BY 1, 2 ORDER BY host, param""".stripMargin,
    // q66's mining chain verbatim, then the application re-derived:
    // per-host strip list, map-side parameter filter, per-host
    // distinct-canonical counts
    "q71_dust_apply" ->
      """WITH b AS (SELECT doc_id,
        |   'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.test/d/' ||
        |     CAST(doc_id AS VARCHAR) AS u,
        |   md5(text) AS ch, md5(text || 'x') AS chx FROM documents),
        | pages AS (
        |  SELECT u AS url, ch AS content_hash FROM b
        |  UNION ALL SELECT u || '?session=s' || CAST(doc_id AS VARCHAR),
        |   ch FROM b WHERE doc_id % 3 = 0
        |  UNION ALL SELECT u || '?ref=r' || CAST(doc_id AS VARCHAR),
        |   chx FROM b WHERE doc_id % 5 = 0
        |  UNION ALL SELECT u || '?session=s' || CAST(doc_id AS VARCHAR)
        |   || '&lang=en', ch FROM b WHERE doc_id % 11 = 0),
        | withq AS (SELECT url, content_hash,
        |   regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |   substr(url, 1, instr(url, '?') - 1) AS base,
        |   string_split(substr(url, instr(url, '?') + 1), '&') AS params
        |  FROM pages WHERE instr(url, '?') > 0),
        | cand0 AS (SELECT url, content_hash, host, base, params,
        |   unnest(list_transform(params,
        |     (x, i) -> struct_pack(i := i, p := x))) AS pp
        |  FROM withq),
        | cand AS (SELECT url, content_hash, host,
        |   string_split(pp.p, '=')[1] AS pname,
        |   CASE WHEN len(params) = 1 THEN base
        |     ELSE base || '?' || array_to_string(
        |       list_filter(params, (x, j) -> j <> pp.i), '&') END
        |     AS stripped
        |  FROM cand0),
        | hits AS (SELECT c.host, c.pname FROM cand c JOIN pages p2
        |   ON c.stripped = p2.url AND c.content_hash = p2.content_hash
        |     AND c.url <> p2.url),
        | sp AS (SELECT host, list(DISTINCT pname) AS strip_set
        |  FROM hits GROUP BY host),
        | u AS (SELECT url,
        |   regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
        |  FROM pages),
        | c1 AS (SELECT u.url, u.host, sp.strip_set,
        |   string_split(u.url, '?')[1] AS base,
        |   CASE WHEN instr(u.url, '?') > 0 THEN
        |     list_filter(string_split(substr(u.url,
        |       instr(u.url, '?') + 1), '&'),
        |      p -> NOT list_contains(sp.strip_set,
        |        string_split(p, '=')[1]))
        |   END AS kept
        |  FROM u LEFT JOIN sp ON u.host = sp.host),
        | c AS (SELECT host,
        |   CASE WHEN strip_set IS NULL OR instr(url, '?') = 0 THEN url
        |     WHEN len(kept) = 0 THEN base
        |     ELSE base || '?' || array_to_string(kept, '&') END
        |     AS canonical
        |  FROM c1)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical
        |FROM c GROUP BY host ORDER BY host""".stripMargin,
    // the same trap detection re-derived: identical URL universe,
    // host/depth extraction, per-host counts, integer flag
    "q67_trap_hosts" ->
      """WITH pages AS (SELECT
        |   'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.test' ||
        |     repeat('/seg', CAST(doc_id % 8 AS INT) + 1) || '/doc' ||
        |     CAST(doc_id AS VARCHAR) AS url,
        |   CASE WHEN doc_id % 20 < 3
        |     THEN md5('trap' || CAST(doc_id % 20 AS VARCHAR) || '_' ||
        |       CAST(doc_id % 2 AS VARCHAR))
        |     ELSE md5('u' || CAST(doc_id AS VARCHAR)) END
        |     AS content_hash
        |  FROM documents),
        | s AS (SELECT
        |   regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
        |   content_hash,
        |   CAST(len(string_split(string_split(
        |     regexp_replace(url, '^[a-z]+://[^/]+', ''), '?')[1], '/'))
        |     - 1 AS BIGINT) AS depth
        |  FROM pages)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(count(DISTINCT content_hash) AS BIGINT) AS n_distinct,
        | max(depth) AS max_depth,
        | (count(*) >= 3 AND count(DISTINCT content_hash) * 2
        |   <= count(*)) AS is_trap
        |FROM s GROUP BY host ORDER BY host""".stripMargin,
    // the whole policy loop re-derived end to end: trap flags from the
    // q67 universe, anti-join, Hamilton apportionment of 499 over the
    // survivors, per-host keep-first cap, counts + rank boundary
    "q70_frontier_policy" ->
      """WITH tp AS (SELECT
        |   CASE WHEN doc_id % 20 < 3
        |     THEN md5('trap' || CAST(doc_id % 20 AS VARCHAR) || '_' ||
        |       CAST(doc_id % 2 AS VARCHAR))
        |     ELSE md5('u' || CAST(doc_id AS VARCHAR)) END
        |     AS content_hash,
        |   'h' || CAST(doc_id % 20 AS VARCHAR) || '.test' AS host
        |  FROM documents),
        | traps AS (SELECT host FROM tp GROUP BY host
        |  HAVING count(*) >= 3
        |   AND count(DISTINCT content_hash) * 2 <= count(*)),
        | ev AS (SELECT 'h' || CAST(user_id % 20 AS VARCHAR) || '.test'
        |   AS host, event_id AS url FROM events),
        | clean AS (SELECT ev.host, ev.url FROM ev
        |  ANTI JOIN traps USING (host)),
        | w AS (SELECT host, CAST(count(*) AS BIGINT) AS weight
        |  FROM clean GROUP BY host),
        | t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM w
        |  WHERE weight > 0),
        | b AS (SELECT host, weight,
        |   CASE WHEN weight > 0 THEN (499 * weight) // tot
        |     ELSE 0 END AS base,
        |   CASE WHEN weight > 0 THEN (499 * weight) % tot
        |     ELSE -1 END AS rem FROM w, t),
        | l AS (SELECT 499 - sum(base) AS lcnt FROM b),
        | r AS (SELECT *, row_number() OVER (ORDER BY rem DESC,
        |   host ASC) AS rk FROM b),
        | a AS (SELECT host, base + CASE WHEN weight > 0
        |   AND rk <= (SELECT lcnt FROM l) THEN 1 ELSE 0 END
        |   AS alloc FROM r),
        | f AS (SELECT clean.host, clean.url, row_number() OVER
        |   (PARTITION BY clean.host ORDER BY clean.url) AS urk, a.alloc
        |  FROM clean JOIN a ON clean.host = a.host)
        |SELECT host, CAST(count(*) AS BIGINT) AS n_kept,
        | max(url) AS max_url
        |FROM f WHERE urk <= alloc GROUP BY host ORDER BY host""".stripMargin,
    // the same integer estimator re-derived end to end: lag-based
    // change detection, span // (changes+1), clamp, next-fetch time
    "q60_recrawl_schedule" ->
      """WITH h AS (SELECT user_id AS url, epoch_us(ts) AS ts_us,
        |   event_type AS ch FROM events),
        | g AS (SELECT *, lag(ch) OVER (PARTITION BY url
        |   ORDER BY ts_us, ch) AS prev FROM h),
        | c AS (SELECT url, count(*) AS n_fetches,
        |   CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> ch
        |     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
        |   min(ts_us) AS first_us, max(ts_us) AS last_us
        |  FROM g GROUP BY url),
        | i AS (SELECT *, CASE WHEN n_fetches <= 1 THEN 604800000000
        |   ELSE greatest(3600000000, least(604800000000,
        |     (last_us - first_us) // (n_changes + 1))) END
        |   AS interval_us FROM c)
        |SELECT url, CAST(n_fetches AS BIGINT) AS n_fetches, n_changes,
        | CAST(first_us AS BIGINT) AS first_us,
        | CAST(last_us AS BIGINT) AS last_us,
        | CAST(interval_us AS BIGINT) AS interval_us,
        | CAST(last_us + interval_us AS BIGINT) AS next_fetch_us
        |FROM i ORDER BY url""".stripMargin,
    // MG: ordinal 12 → 5 + (12*7+3)%9 = 11 municipalities, dropdown
    // value (12+11)*100000 + 97*i; enumeration order year, month,
    // municipality with the P5 future guard (now = 2024-06)
    "q29_municipality_expansion" ->
      """SELECT 'mds_saldo' AS site, CAST(y AS INT) AS year,
        | CAST(m AS INT) AS month, 'MG' AS uf,
        | concat('MUN MG ', lpad(CAST(i AS VARCHAR), 3, '0'))
        |   AS municipality,
        | CAST((12+11)*100000 + 97*i AS VARCHAR) AS mun_value,
        | row_number() OVER (ORDER BY y, m, i) - 1 AS seed_seq
        |FROM generate_series(2023, 2024) t(y)
        |CROSS JOIN generate_series(1, 12) u(m)
        |CROSS JOIN generate_series(1, 5 + (12*7+3)%9) v(i)
        |WHERE y < 2024 OR m <= 6
        |ORDER BY seed_seq""".stripMargin,
    // the spine: full MG municipality dim × {2011-01, 2011-10}; seq
    // numbering starts at 1 and is contiguous per municipality
    // session; the first artifact name is
    // MG-MUN_MG_<iii>-<mm>-2011-RES-001 (CrawlJob imageId format)
    "q46_municipality_crawl_spine" ->
      """SELECT 'mds_saldo' AS site, CAST(2011 AS INT) AS year,
        | CAST(m AS INT) AS month, 'MG' AS uf,
        | concat('MUN MG ', lpad(CAST(i AS VARCHAR), 3, '0'))
        |   AS municipality,
        | CAST(1 AS BIGINT) AS first_seq,
        | true AS contiguous,
        | concat('MG-MUN_MG_', lpad(CAST(i AS VARCHAR), 3, '0'), '-',
        |   lpad(CAST(m AS VARCHAR), 2, '0'), '-2011-RES-001')
        |   AS first_image_id
        |FROM (VALUES (1), (10)) t(m)
        |CROSS JOIN generate_series(1, 5 + (12*7+3)%9) v(i)
        |ORDER BY month, municipality""".stripMargin
  )
}
