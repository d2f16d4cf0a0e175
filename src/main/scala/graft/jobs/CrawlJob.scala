package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.fetch.SyntheticWeb
import graft.frontier.SeedExpansion
import graft.model._
import graft.politeness.HostScheduler
import graft.url.{Hashing, UrlCanon}

/** Batch crawl: the Spark-native re-expression of the reference's
  * sequential crawl kernel (SURVEY §3.1 "Spark shape of A").
  *
  * Dataflow:
  * {{{
  * seeds (Dataset[PeriodSeed], ordered G1-G3)
  *   → flatMap harvest (S3/S4/G5; listing pagination + link project)
  *   → P1 filter (non-empty title/url)
  *   → canonicalize + xxhash64 + host (url module)
  *   → keep-first dedup per period (D1; ranking window over urlHash)
  *   → robots filter (broadcast rules)
  *   → O1 numbering + imageId (ranking window per period)
  *   → speculative per-period success counts → early-stop pruning
  *     (driver feedback loop, SURVEY §4 row 3)
  *   → repartition by (site, host) + sortWithinPartitions
  *     (secondary-sort pattern: politeness domains co-located,
  *      NO per-group materialization)
  *   → per-domain politeness schedule + fetch (HostScheduler)
  *   → crawl log + image records
  * }}}
  *
  * Scale notes:
  *  - per-period windows are bounded (≤ maxPages·12 links) so the
  *    ranking windows never see unbounded partitions; parallelism is
  *    across periods and domains;
  *  - the speculative count phase touches only (urlHash → status),
  *    never payload bytes — column pruning keeps the fetch out of it;
  *  - the per-domain sequential loop IS the politeness constraint;
  *    throughput scales with the number of distinct domains, and
  *    hot-host skew is bounded by the budget, not by CPU;
  *  - resume (D2) probes the committed seen-set BEFORE fetching, so a
  *    restarted crawl spends zero budget on already-fetched URLs.
  */
object CrawlJob {

  final case class CrawlResult(
      seeds: Seq[PeriodSeed],
      prunedSeeds: Seq[PeriodSeed],
      frontier: Dataset[ScheduledEntry],
      log: Dataset[CrawlLogEntry],
      images: Dataset[ImageRecord])

  /** Harvest all periods' listing pages into the raw frontier. */
  def harvest(spark: SparkSession, cfg: CrawlConfig,
      seeds: Seq[PeriodSeed]): Dataset[FrontierEntry] = {
    import spark.implicits._
    val maxPages = cfg.maxPages
    val webSeed = cfg.webSeed
    spark.createDataset(seeds)
      .repartition(math.max(1, math.min(seeds.size, 64)))
      .flatMap { s =>
        SyntheticWeb.harvestPeriod(s.site, s.year, s.month, maxPages, webSeed)
          .map { case (k, p, j, url, title) =>
            FrontierEntry(s.site, s.year, s.month, s.seedSeq, p, j, k.toLong,
              url, Hashing.xxh64(url), UrlCanon.host(url), title)
          }
      }
  }

  /** P1 filter → D1 keep-first dedup → robots → O1 numbering. */
  def buildFrontier(spark: SparkSession,
      raw: Dataset[FrontierEntry]): Dataset[ScheduledEntry] = {
    import spark.implicits._
    val robotsUdf = udf((host: String, url: String) =>
      SyntheticWeb.disallowed(host, url))
    val dedupW = Window.partitionBy($"site", $"year", $"month", $"urlHash")
      .orderBy($"discoverySeq")
    val numW = Window.partitionBy($"site", $"year", $"month")
      .orderBy($"discoverySeq")
    raw
      // P1: both href and title non-empty (portal_saude_mg.py:404)
      .filter(length(trim($"title")) > 0 && $"url".startsWith("http"))
      .withColumn("rn", row_number().over(dedupW))
      .filter($"rn" === 1)
      .filter(!robotsUdf($"host", $"url"))
      .withColumn("seq", row_number().over(numW))
      .withColumn("imageId",
        format_string("%02d-%d-RES-%03d", $"month", $"year", $"seq"))
      .select($"site", $"year", $"month", $"seedSeq", $"discoverySeq",
        $"seq", $"imageId", $"url", $"urlHash", $"host", $"title")
      .as[ScheduledEntry]
  }

  /** Speculative per-period successful-download counts (cheap: status
    * is a pure function of urlHash; no payloads materialized). */
  def periodCounts(spark: SparkSession, frontier: Dataset[ScheduledEntry],
      maxRetries: Int): Map[(String, Int, Int), Long] = {
    import spark.implicits._
    val statusUdf = udf((h: Long) => HostScheduler.terminalStatus(h, maxRetries))
    frontier
      .groupBy($"site", $"year", $"month")
      .agg(count(when(statusUdf($"urlHash") === CrawlStatus.Success, 1))
        .as("files"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
      .toMap
  }

  /** Politeness-scheduled fetch over (site, host) domains.
    * Secondary-sort pattern: hash-repartition on the domain key, sort
    * within partitions, then stream domain runs — constant memory per
    * task regardless of domain size. Emits byte-free log rows;
    * payloads materialize in [[graft.fetch.PayloadStage]]. */
  def scheduleAndFetch(spark: SparkSession, frontier: Dataset[ScheduledEntry],
      budget: PolitenessBudget,
      seen: Set[Long] = Set.empty,
      strictPerHost: Boolean = false): Dataset[CrawlLogEntry] = {
    import spark.implicits._
    val seenBc = spark.sparkContext.broadcast(seen)
    val numPartitions = spark.sessionState.conf.numShufflePartitions
    // domain key: (site, host) in reference-compat mode, host alone in
    // strict web-polite mode (sites sharing a host share one budget)
    def domainOf(e: ScheduledEntry): (String, String) =
      (if (strictPerHost) "" else e.site, e.host)
    val partKeys =
      if (strictPerHost) Seq($"host") else Seq($"site", $"host")
    frontier
      .repartition(numPartitions, partKeys: _*)
      .sortWithinPartitions(
        (partKeys :+ $"seedSeq") :+ $"discoverySeq": _*)
      .mapPartitions { it =>
        // consecutive runs of one domain key = one politeness timeline
        new Iterator[Iterator[CrawlLogEntry]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[CrawlLogEntry] = {
            val key = domainOf(buf.head)
            val domain = new Iterator[ScheduledEntry] {
              def hasNext: Boolean =
                buf.hasNext && domainOf(buf.head) == key
              def next(): ScheduledEntry = buf.next()
            }
            HostScheduler.run(domain, budget, seenBc.value.contains)
          }
        }.flatten
      }
  }

  /** Payload materialization over the crawl log (see PayloadStage). */
  def materializeImages(log: Dataset[CrawlLogEntry]): Dataset[ImageRecord] = {
    import log.sparkSession.implicits._
    log.flatMap(graft.fetch.PayloadStage.imageFor(_))
  }

  /** Skip-if-exists flags at scale (D2): a Bloom prefilter splits the
    * frontier so only might-contain candidates pay the shuffle of the
    * exact join against the committed seen table; Bloom "no" answers
    * are exact (no false negatives) and never join. The final flag is
    * always exact — a false positive must not suppress a fetch. */
  def flagSeen(frontier: Dataset[ScheduledEntry],
      seenTable: Dataset[Long],
      bloom: Option[graft.seen.BloomSeen.PartitionedBloom])
      : Dataset[(ScheduledEntry, Boolean)] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    bloom match {
      case None =>
        frontier.joinWith(seenTable.toDF("sh"),
            frontier("urlHash") === col("sh"), "left_outer")
          .map { case (e, r) => (e, r != null) }
      case Some(b) =>
        val probe = graft.seen.BloomSeen.probeColumn(spark, b, $"urlHash")
        val flagged = frontier.withColumn("maybe", probe)
        val definiteNew = flagged.filter(!$"maybe").drop("maybe")
          .as[ScheduledEntry].map(e => (e, false))
        val candidates = flagged.filter($"maybe").drop("maybe")
          .as[ScheduledEntry]
        val confirmed = candidates.joinWith(seenTable.toDF("sh"),
            candidates("urlHash") === col("sh"), "left_outer")
          .map { case (e, r) => (e, r != null) }
        definiteNew.union(confirmed)
      }
  }

  /** scheduleAndFetch over pre-flagged entries (production path). */
  def scheduleAndFetchFlagged(
      flagged: Dataset[(ScheduledEntry, Boolean)],
      budget: PolitenessBudget,
      strictPerHost: Boolean = false): Dataset[CrawlLogEntry] = {
    val spark = flagged.sparkSession
    import spark.implicits._
    val numPartitions = spark.sessionState.conf.numShufflePartitions
    def domainOf(e: ScheduledEntry): (String, String) =
      (if (strictPerHost) "" else e.site, e.host)
    val partKeys =
      if (strictPerHost) Seq(col("_1.host"))
      else Seq(col("_1.site"), col("_1.host"))
    flagged
      .repartition(numPartitions, partKeys: _*)
      .sortWithinPartitions(
        (partKeys :+ col("_1.seedSeq")) :+ col("_1.discoverySeq"): _*)
      .mapPartitions { it =>
        new Iterator[Iterator[CrawlLogEntry]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[CrawlLogEntry] = {
            val key = domainOf(buf.head._1)
            val domain = new Iterator[(ScheduledEntry, Boolean)] {
              def hasNext: Boolean =
                buf.hasNext && domainOf(buf.head._1) == key
              def next(): (ScheduledEntry, Boolean) = buf.next()
            }
            HostScheduler.runFlagged(domain, budget)
          }
        }.flatten
      }
  }

  /** Production resume loop: read the committed seen set from the
    * table, Bloom-prefilter + exact-join the skip flags, crawl, commit
    * a new snapshot with lineage. */
  def runResumable(spark: SparkSession, cfg: CrawlConfig, tableDir: String,
      runId: String): (CrawlResult, graft.table.TableIO.Snapshot) = {
    import spark.implicits._
    val seenTable = graft.table.TableIO.readSeen(spark, tableDir).cache()
    val seenCount = seenTable.count()
    val bloom =
      if (seenCount == 0) None
      else Some(graft.seen.BloomSeen.build(seenTable,
        parts = math.max(1, spark.sessionState.conf.numShufflePartitions / 2),
        expectedKeys = math.max(seenCount, 1024L), fpp = 0.01))

    val seeds = SeedExpansion.expand(cfg)
    val raw = harvest(spark, cfg, seeds)
    val frontier = buildFrontier(spark, raw).cache()
    val (pruned, surviving) = pruneIfActive(spark, cfg, seeds, frontier)
    val flagged = flagSeen(surviving, seenTable, bloom)
    val log = scheduleAndFetchFlagged(flagged, cfg.budget,
      cfg.strictPerHost).cache()
    val result = CrawlResult(seeds, pruned, surviving, log,
      materializeImages(log))
    val snap = graft.table.TableIO.commit(spark, tableDir, result.images,
      seenFrom(result.log).except(seenTable), runId,
      pruned.map(p => s"${p.site}/${p.year}/${p.month}"))
    (result, snap)
  }

  /** Full batch crawl. `seen` carries the committed URL-seen set for
    * resume (skip-if-exists, D2).
    *
    * `cacheLog = true` persists the (byte-free) crawl log so `log`
    * and `images` consumers share one scheduled fetch. Payload bytes
    * are NEVER cached or shuffled — `images` regenerates them from
    * the log via PayloadStage. */
  def run(spark: SparkSession, cfg: CrawlConfig,
      seen: Set[Long] = Set.empty,
      cacheLog: Boolean = true): CrawlResult = {
    import spark.implicits._
    val seeds = SeedExpansion.expand(cfg)
    val raw = harvest(spark, cfg, seeds)
    val frontier = buildFrontier(spark, raw).cache()
    val (pruned, surviving) = pruneIfActive(spark, cfg, seeds, frontier)
    val log0 = scheduleAndFetch(spark, surviving, cfg.budget, seen,
      cfg.strictPerHost)
    val log = if (cacheLog) log0.cache() else log0
    CrawlResult(seeds, pruned, surviving, log, materializeImages(log))
  }

  /** The early-stop feedback pass (speculative per-period counts +
    * prune) runs ONLY when an `All` selector makes the stop rules
    * live — with explicit year/month lists the reference never stops
    * early, and the extra frontier pass would be a wasted full scan
    * at 10^10-URL scale. */
  private def pruneIfActive(spark: SparkSession, cfg: CrawlConfig,
      seeds: Seq[PeriodSeed], frontier: Dataset[ScheduledEntry])
      : (Seq[PeriodSeed], Dataset[ScheduledEntry]) = {
    val allYearsMode = cfg.years == YearSelector.All
    val allMonthsMode = cfg.months == MonthSelector.All
    if (!allYearsMode && !allMonthsMode) (seeds, frontier)
    else {
      val counts = periodCounts(spark, frontier, cfg.budget.maxRetries)
      val pruned = SeedExpansion.prune(seeds, counts, allYearsMode,
        allMonthsMode)
      val prunedKeys = pruned.map(p => (p.site, p.year, p.month)).toSet
      val prunedBc = spark.sparkContext.broadcast(prunedKeys)
      (pruned, frontier.filter(e =>
        prunedBc.value.contains((e.site, e.year, e.month))))
    }
  }

  /** The URL-seen set this crawl contributes: URLs with a durable
    * artifact (success now, or skipped-because-already-present). */
  def seenFrom(log: Dataset[CrawlLogEntry]): Dataset[Long] = {
    import log.sparkSession.implicits._
    log.filter(l => l.status == CrawlStatus.Success ||
        l.status == CrawlStatus.Skipped)
      .map(_.urlHash).distinct()
  }

  /** Run-metrics aggregates (A1/A2: portal_saude_mg.py:115-117,
    * :642-678): per-period file counts, bytes, error mix, duration and
    * downloads/min in virtual time. */
  def metrics(log: Dataset[CrawlLogEntry],
      images: Dataset[ImageRecord]): DataFrame = {
    import log.sparkSession.implicits._
    val sizes = images.select($"site", $"year", $"month",
      length($"bytes").cast("long").as("sz"))
      .groupBy($"site", $"year", $"month")
      .agg(sum($"sz").as("bytes_total"))
    log.groupBy($"site", $"year", $"month")
      .agg(
        count(when($"status" === CrawlStatus.Success, 1)).as("files"),
        count(when($"status" === CrawlStatus.NoData, 1)).as("no_data"),
        count(when($"status" === CrawlStatus.Error, 1)).as("errors"),
        count(when($"status" === CrawlStatus.Corrupt, 1)).as("corrupt"),
        count(when($"status" === CrawlStatus.Skipped, 1)).as("skipped"),
        sum($"attempts").cast("long").as("requests"),
        max($"vtimeMs").as("duration_ms"))
      .join(sizes, Seq("site", "year", "month"), "left_outer")
      .withColumn("bytes_total", coalesce($"bytes_total", lit(0L)))
      .withColumn("downloads_per_min",
        round($"files" * 60000.0 / greatest($"duration_ms", lit(1L)), 2))
      .orderBy($"site", $"year", $"month")
  }
}
