package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.CrawlJob
import graft.model._

/** Crawl-native queries for the driver contract. These exercise the
  * frontier → dedup → politeness → fetch → validate pipeline on the
  * deterministic synthetic web (FIXTURES.md §3) and therefore take no
  * input tables; the `sfDir` argument is ignored. No DuckDB oracle is
  * possible (the semantics are the crawl engine itself), so the driver
  * records rows-only checks; exact-match correctness is enforced by
  * CrawlParitySpec against the reference simulator in `sbt test`.
  */
object CrawlQueries {

  /** Demo crawl config: all three reference sites, first half of 2024. */
  val demoConfig: CrawlConfig = CrawlConfig(
    sites = Seq("portal_saude_mg", "mds_parcelas", "mds_saldo"),
    years = YearSelector.Single(2024),
    months = MonthSelector.All,
    nowYear = 2024, nowMonth = 6,
    maxPages = 4)

  // one crawl per JVM, shared across the query entries
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, CrawlJob.CrawlResult]()

  def demoResult(spark: SparkSession): CrawlJob.CrawlResult =
    cache.computeIfAbsent("demo", _ => CrawlJob.run(spark, demoConfig))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ordered crawl log — the crawl-order witness (O1 + politeness)
    "crawl_log" -> ((s: SparkSession, _: String) => {
      demoResult(s).log.toDF()
        .orderBy(col("site"), col("host"), col("vtimeMs"), col("seq"))
    }),

    // fetched image records (payload metadata; bytes kept as length)
    "crawl_images" -> ((s: SparkSession, _: String) => {
      demoResult(s).images.toDF()
        .select(col("image_id"), col("site"), col("year"), col("month"),
          col("w"), col("h"), col("fmt"), col("caption"), col("phash"),
          length(col("bytes")).cast("long").as("n_bytes"),
          col("attempts"), col("vtimeMs"))
        .orderBy(col("site"), col("year"), col("month"), col("image_id"))
    }),

    // the URL-seen set (hashes of durably-fetched canonical URLs)
    "crawl_seen" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      CrawlJob.seenFrom(demoResult(s).log).toDF("urlHash").orderBy("urlHash")
    }),

    // post-dedup, robots-filtered, numbered frontier
    "crawl_frontier" -> ((s: SparkSession, _: String) => {
      demoResult(s).frontier.toDF()
        .select(col("site"), col("year"), col("month"), col("seq"),
          col("imageId"), col("url"), col("urlHash"), col("host"))
        .orderBy(col("site"), col("year"), col("month"), col("seq"))
    }),

    // per-period run metrics (A1/A2)
    "crawl_metrics" -> ((s: SparkSession, _: String) => {
      val r = demoResult(s)
      CrawlJob.metrics(r.log, r.images)
    }),

    // K5 error-detail table + O4 first-3 display truncation
    // (portal_saude_mg.py:563-573 error collection, :663-665 shows the
    // first 3 errors per run)
    "crawl_errors" -> ((s: SparkSession, _: String) => {
      val log = demoResult(s).log.toDF()
      log.filter(col("status").isin(CrawlStatus.Error, CrawlStatus.Corrupt))
        .groupBy(col("site"), col("year"), col("month"))
        .agg(count(lit(1)).as("n_errors"),
          count(when(col("errorKind") === "max_retries", 1))
            .as("n_max_retries"),
          count(when(col("errorKind") === "validation", 1))
            .as("n_validation"),
          // flattened to ONE display string (" | "-joined): the driver
          // value-compare hashes scalar columns; an ARRAY<STRING> here
          // crashed its pandas sort in round 2
          concat_ws(" | ",
            slice(array_sort(collect_list(struct(col("seq"),
              col("errorDetail")))), 1, 3).getField("errorDetail"))
            .as("first_errors"))
        .orderBy(col("site"), col("year"), col("month"))
    }),

    // D2 at scale through the driver: two resumable runs against one
    // committed table — run 2 probes the PERSISTED partition-aligned
    // Bloom (BloomSeen.write/probe) + exact join and must spend zero
    // budget re-fetching (all durable URLs come back `skipped`)
    "crawl_resume" -> ((s: SparkSession, _: String) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-resume").toString
      val cfg = demoConfig.copy(sites = Seq("portal_saude_mg"),
        months = MonthSelector.Multiple(Seq(1, 2, 3)))
      val (r1, _) = CrawlJob.runResumable(s, cfg, dir, "run-1")
      r1.log.count()
      val (r2, _) = CrawlJob.runResumable(s, cfg, dir, "run-2")
      val out = r2.log.toDF()
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("attempts")).cast("long").as("attempts"))
        .orderBy(col("status"))
      // materialize the (tiny) aggregate, then release BOTH runs'
      // cached datasets — this entry must leave no storage pinned in a
      // long-lived battery/verify JVM
      val rows = out.collect().toSeq
      r1.unpersist(); r2.unpersist()
      s.createDataFrame(
        s.sparkContext.parallelize(rows, 1), out.schema)
    }),

    // S11 host health: probe fields + per-host crawl health aggregates
    // over a config with a planted sick host and the quarantine rule
    // armed (mds_saldo.py:249-294, portal_saude_mg.py:730-747)
    "crawl_host_health" -> ((s: SparkSession, _: String) => {
      val r = cache.computeIfAbsent("health",
        _ => CrawlJob.run(s, healthConfig))
      CrawlJob.hostHealth(r.log)
    })
  )

  /** Health/quarantine demo: one healthy reference site + one planted
    * sick host; 3 consecutive failures quarantine the domain 60 s. */
  val healthConfig: CrawlConfig = CrawlConfig(
    sites = Seq("portal_saude_mg", "sick-portal"),
    years = YearSelector.Single(2024),
    months = MonthSelector.Multiple(Seq(1, 2)),
    nowYear = 2024, nowMonth = 6, maxPages = 3,
    budget = PolitenessBudget(quarantineAfter = 3, quarantineMs = 60000))
}
