package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CrawlJob
import graft.model._

/** The core correctness gate (BASELINE.md "crawl-order exact-match"):
  * the distributed crawl must equal the sequential reference-semantics
  * simulator on (a) the ordered crawl log including virtual fetch
  * times, (b) the final URL-seen set, (c) image records — at different
  * parallelism levels and shuffle-partition settings.
  */
class CrawlParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = CrawlConfig(
    sites = Seq("portal_saude_mg", "mds_parcelas", "mds_saldo"),
    years = YearSelector.Range(2023, 2024),
    months = MonthSelector.All,
    nowYear = 2024, nowMonth = 6,
    maxPages = 4)

  // order by (site, host, vtimeMs, period, seq) is total per domain
  private def canonLog(l: Seq[CrawlLogEntry]) =
    l.sortBy(e => (e.site, e.host, e.vtimeMs, e.year, e.month, e.seq))
      .map(e => (e.site, e.year, e.month, e.seq, e.imageId, e.url, e.urlHash,
        e.host, e.vtimeMs, e.attempts, e.status,
        e.errorKind, e.errorDetail))

  /** K5/O4 content pin, independent of the shared fetch code path:
    * re-derive the expected error strings from the OTHER log fields
    * (status, url, attempts) and require an exact match per row. */
  private def assertErrorColumns(l: Seq[CrawlLogEntry]): Unit =
    l.foreach { e =>
      val expected = e.status match {
        case CrawlStatus.Error => ("max_retries",
          s"Download failed for ${e.url}: gave up after ${e.attempts} attempts")
        case CrawlStatus.Corrupt => ("validation",
          s"Download failed for ${e.url}: payload failed size/magic check")
        case CrawlStatus.NoData => ("no_data", "Nenhum registro encontrado")
        case _ => ("", "")
      }
      assert((e.errorKind, e.errorDetail) === expected,
        s"error columns for ${e.url} (status=${e.status})")
    }

  test("distributed crawl equals reference simulator exactly") {
    val sim = ReferenceSimulator.crawl(cfg)
    val got = CrawlJob.run(spark, cfg)
    val gotLog = got.log.collect().toSeq

    assert(gotLog.size === sim.log.size, "crawl-log row count")
    assert(canonLog(gotLog) === canonLog(sim.log), "ordered crawl log")
    // K5/O4: error-detail columns carry the reference's message shapes
    assertErrorColumns(gotLog)
    assert(gotLog.exists(_.status == CrawlStatus.Error) ||
      gotLog.exists(_.status == CrawlStatus.Corrupt),
      "config should produce at least one error row or the pin is vacuous")

    // URL-seen set exact equality
    val gotSeen = CrawlJob.seenFrom(got.log).collect().toSet
    val simSeen = sim.log.filter(e => e.status == CrawlStatus.Success)
      .map(_.urlHash).toSet
    assert(gotSeen === simSeen, "URL-seen set")

    // pruned period set equality
    assert(got.prunedSeeds.map(p => (p.site, p.year, p.month)) ===
      sim.crawledPeriods.map(p => (p.site, p.year, p.month)))

    // image records: metadata + payload fingerprints
    val gotImg = got.images.collect()
      .map(i => (i.image_id, i.site, i.year, i.month, i.w, i.h, i.fmt,
        i.caption, i.phash, i.bytes.length))
      .sortBy(t => (t._2, t._3, t._4, t._1))
    val simImg = sim.images
      .map(i => (i.image_id, i.site, i.year, i.month, i.w, i.h, i.fmt,
        i.caption, i.phash, i.bytes.length))
      .sortBy(t => (t._2, t._3, t._4, t._1))
    assert(gotImg.toSeq === simImg)
    assert(gotImg.nonEmpty, "crawl produced images")
  }

  test("parity holds across shuffle-partition settings (partition invariance)") {
    val sim = ReferenceSimulator.crawl(cfg)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq("2", "17")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        val got = CrawlJob.run(spark, cfg)
        assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log),
          s"crawl log differs at shuffle.partitions=$p")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("resume: committed seen set is skipped, zero budget spent") {
    val first = CrawlJob.run(spark, cfg)
    val seen = CrawlJob.seenFrom(first.log).collect().toSet
    val second = CrawlJob.run(spark, cfg, seen)
    val sim2 = ReferenceSimulator.crawl(cfg, seen)
    assert(canonLog(second.log.collect().toSeq) === canonLog(sim2.log))
    // every previously-successful URL is now skipped
    val statuses = second.log.collect()
      .filter(e => seen.contains(e.urlHash)).map(_.status).toSet
    assert(statuses === Set(CrawlStatus.Skipped))
    // skipped fetches consume no attempts
    assert(second.log.collect().filter(_.status == CrawlStatus.Skipped)
      .forall(_.attempts == 0))
    // and no images are re-materialized for skipped URLs
    assert(second.images.count() === 0)
  }

  test("early-stop: all-months mode stops a year at its first empty month") {
    val cfgAll = cfg.copy(sites = Seq("portal_saude_mg"),
      years = YearSelector.Range(2020, 2024), months = MonthSelector.All)
    val sim = ReferenceSimulator.crawl(cfgAll)
    val got = CrawlJob.run(spark, cfgAll)
    assert(got.prunedSeeds.map(p => (p.year, p.month)) ===
      sim.crawledPeriods.map(p => (p.year, p.month)))
    // the rule actually fired somewhere (otherwise the test is vacuous)
    assert(got.prunedSeeds.size < got.seeds.size,
      "expected at least one pruned period in 2020-2024; tune webSeed")
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log))
  }

  test("strict per-host mode: shared-host sites share one budget; parity holds") {
    val strictCfg = cfg.copy(strictPerHost = true)
    val sim = ReferenceSimulator.crawl(strictCfg)
    val got = CrawlJob.run(spark, strictCfg)
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log),
      "strict-mode crawl log differs from simulator")
    // the rule actually bites: the two MDS sites share
    // aplicacoes.mds.gov.br, so their merged timeline must differ from
    // reference-compat mode where each site has its own budget
    val compat = CrawlJob.run(spark, cfg)
    def mdsTimes(l: Seq[CrawlLogEntry]) = l
      .filter(e => e.host == "aplicacoes.mds.gov.br" &&
        e.status != CrawlStatus.Skipped)
      .map(e => (e.url, e.vtimeMs)).toMap
    val strictT = mdsTimes(got.log.collect().toSeq)
    val compatT = mdsTimes(compat.log.collect().toSeq)
    assert(strictT.keySet === compatT.keySet)
    assert(strictT != compatT,
      "strict mode should reschedule the shared-host sites")
    // and within the shared host, attempts are globally serialized:
    // consecutive post-burst starts respect the crawl delay
    val starts = got.log.collect()
      .filter(e => e.host == "aplicacoes.mds.gov.br" &&
        e.status != CrawlStatus.Skipped)
      .map(_.vtimeMs).sorted
    val gaps = starts.drop(strictCfg.budget.burst).sliding(2)
      .filter(_.length == 2).map(p => p(1) - p(0))
    assert(gaps.forall(_ >= 0), "shared-host timeline must be ordered")
  }

  test("municipality enumeration (ALL_<UF>): distributed crawl equals simulator") {
    // site-3 crawl shape: year×month×municipality, dropdown order,
    // lowercase UF input normalized (P10), placeholder options
    // filtered (P2)
    val munCfg = CrawlConfig(
      sites = Seq("mds_saldo"),
      years = YearSelector.Single(2024),
      months = MonthSelector.Multiple(Seq(1, 2)),
      nowYear = 2024, nowMonth = 6, maxPages = 3,
      uf = "mg", municipality = Some(MunicipalitySelector.All))
    val sim = ReferenceSimulator.crawl(munCfg)
    val got = CrawlJob.run(spark, munCfg)
    val gotLog = got.log.collect().toSeq
    assert(canonLog(gotLog) === canonLog(sim.log), "municipality crawl log")
    // municipality lineage present and imageIds municipality-prefixed
    assert(gotLog.forall(e => e.uf == "MG" && e.municipality.nonEmpty))
    assert(gotLog.forall(e => e.imageId.startsWith(
      s"MG-${e.municipality.replace(' ', '_')}-")))
    // every municipality of the dropdown got its own seed per month
    val nMun = graft.fetch.SyntheticWeb.municipalities("MG").size
    assert(got.seeds.size === 2 * nMun)
    assert(got.seeds.map(_.municipality).distinct.size === nMun)
    // seeds enumerate municipality innermost, in dropdown order
    val munOrder = graft.fetch.SyntheticWeb.municipalities("MG").map(_._1)
    assert(got.seeds.sortBy(_.seedSeq).map(_.municipality) ===
      Seq.fill(2)(munOrder).flatten)
    // URL-seen parity
    assert(CrawlJob.seenFrom(got.log).collect().toSet ===
      sim.log.filter(_.status == CrawlStatus.Success).map(_.urlHash).toSet)
  }

  test("municipality single-select + UF validation (P10) + placeholder filter (P2)") {
    val one = graft.fetch.SyntheticWeb.municipalities("SP")(2)
    val cfg1 = CrawlConfig(sites = Seq("mds_parcelas"),
      years = YearSelector.Single(2023), months = MonthSelector.Single(3),
      nowYear = 2024, nowMonth = 6, maxPages = 3,
      uf = " sp ", municipality = Some(MunicipalitySelector.Single(one._1)))
    val sim = ReferenceSimulator.crawl(cfg1)
    val got = CrawlJob.run(spark, cfg1)
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log))
    assert(got.seeds.map(s => (s.uf, s.municipality, s.munValue)) ===
      Seq(("SP", one._1, one._2)))
    // P9 fallback matching (mds_saldo.py:588-601): case-INSENSITIVE
    // exact match resolves to the same dropdown option...
    val lowerCfg = cfg1.copy(
      municipality = Some(MunicipalitySelector.Single(one._1.toLowerCase)))
    assert(graft.frontier.SeedExpansion.expand(lowerCfg)
      .map(s => (s.municipality, s.munValue)) === Seq((one._1, one._2)))
    // ...and the resolved crawl is byte-identical to the canonical one
    val gotLower = CrawlJob.run(spark, lowerCfg)
    assert(canonLog(gotLower.log.collect().toSeq) === canonLog(sim.log),
      "lowercase municipality input must resolve to the same crawl")
    // P9: no exact match -> FIRST option CONTAINING the text, in
    // dropdown order (partial + ambiguous-prefix cases)
    val partCfg = cfg1.copy(
      municipality = Some(MunicipalitySelector.Single("sp 003")))
    assert(graft.frontier.SeedExpansion.expand(partCfg)
      .map(s => (s.municipality, s.munValue)) === Seq((one._1, one._2)))
    val ambCfg = cfg1.copy(
      municipality = Some(MunicipalitySelector.Single("MUN SP 00")))
    assert(graft.frontier.SeedExpansion.expand(ambCfg)
      .map(_.municipality) === Seq("MUN SP 001"),
      "ambiguous partial must resolve to the first containing option")
    // P10: invalid UFs are rejected like the reference's input check
    for (bad <- Seq("XX", "M", "MGG", ""))
      assertThrows[IllegalArgumentException] {
        graft.frontier.SeedExpansion.expand(cfg1.copy(uf = bad))
      }
    // unknown municipality name is rejected
    assertThrows[IllegalArgumentException] {
      graft.frontier.SeedExpansion.expand(cfg1.copy(
        municipality = Some(MunicipalitySelector.Single("NÃO EXISTE"))))
    }
    // P2: the raw dropdown has placeholder/empty-value options that
    // the scan filters out, position-independently
    val raw = graft.fetch.SyntheticWeb.municipalityOptions("SP")
    val kept = graft.fetch.SyntheticWeb.municipalities("SP")
    assert(raw.exists(_._2.isEmpty) && raw.exists(_._1 == "-- Selecione --"))
    assert(raw.count(_._2.isEmpty) === 2) // header + mid-list noise
    assert(kept.forall(o => o._2.nonEmpty && o._1 != "-- Selecione --"))
    assert(kept.size === raw.size - 2)
  }

  test("sick host: quarantine pauses the domain, health probe flags it; parity holds") {
    val sickCfg = graft.queries.CrawlQueries.healthConfig
    val sim = ReferenceSimulator.crawl(sickCfg)
    val got = CrawlJob.run(spark, sickCfg)
    val gotLog = got.log.collect().toSeq
    assert(canonLog(gotLog) === canonLog(sim.log), "sick-host crawl log")

    // every sick-host URL exhausts retries → error; healthy site unaffected
    val sick = gotLog.filter(_.host.startsWith("sick-"))
    assert(sick.nonEmpty)
    assert(sick.forall(_.status == CrawlStatus.Error))
    assert(sick.forall(_.attempts == sickCfg.budget.maxRetries))
    // K5: exhausted-retry rows carry the max_retries kind + the
    // reference's "Download failed for {url}: ..." message
    assertErrorColumns(gotLog)
    assert(sick.forall(e => e.errorKind == "max_retries" &&
      e.errorDetail ==
        s"Download failed for ${e.url}: gave up after ${e.attempts} attempts"))
    // quarantine fired: after each 3rd consecutive failure the next
    // start waits >= quarantineMs past the previous entry's timeline
    val starts = sick.sortBy(_.vtimeMs).map(_.vtimeMs)
    val gaps = starts.sliding(2).filter(_.length == 2).map(p => p(1) - p(0))
      .toSeq
    assert(gaps.count(_ >= sickCfg.budget.quarantineMs) >=
      sick.size / 3 - 1, s"expected quarantine gaps, got $gaps")

    // health table: probe flags the sick host, aggregates expose the
    // failure rate and the quarantine gap evidence
    val health = CrawlJob.hostHealth(got.log).collect()
      .map(r => r.getAs[String]("host") ->
        (r.getAs[Boolean]("healthy"), r.getAs[Double]("error_rate"),
          r.getAs[Long]("max_gap_ms"))).toMap
    val (sickHealthy, sickErrRate, sickGap) = health("sick-portal.gov.br")
    assert(!sickHealthy && sickErrRate == 1.0 &&
      sickGap >= sickCfg.budget.quarantineMs)
    assert(health.filterNot(_._1.startsWith("sick-")).values
      .forall(_._1 == true))
  }

  test("municipality x all-months: early-stop judges the MONTH total across municipalities") {
    val cfgAll = CrawlConfig(
      sites = Seq("mds_saldo"),
      years = YearSelector.Single(2023),
      months = MonthSelector.All,
      nowYear = 2024, nowMonth = 6, maxPages = 3,
      uf = "MG", municipality = Some(MunicipalitySelector.All))
    val sim = ReferenceSimulator.crawl(cfgAll)
    val got = CrawlJob.run(spark, cfgAll)
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log))
    assert(got.prunedSeeds.map(p => (p.year, p.month, p.municipality)) ===
      sim.crawledPeriods.map(p => (p.year, p.month, p.municipality)))
    // a month either keeps ALL its municipality seeds or none — the
    // stop decision is per month, never mid-dropdown
    val nMun = graft.fetch.SyntheticWeb.municipalities("MG").size
    val perMonth = got.prunedSeeds.groupBy(p => (p.year, p.month))
      .values.map(_.size).toSet
    assert(perMonth === Set(nMun),
      s"months with partial municipality sets: $perMonth")
  }

  test("per-host crawl-delay override (robots Crawl-delay): parity + slower host timeline") {
    val slowHost = "aplicacoes.mds.gov.br"
    val cfgSlow = cfg.copy(hostBudgets = Map(
      slowHost -> cfg.budget.copy(crawlDelayMs = 5000, burst = 1)))
    val sim = ReferenceSimulator.crawl(cfgSlow)
    val got = CrawlJob.run(spark, cfgSlow)
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log),
      "host-budget crawl log differs from simulator")
    // the overridden host is actually slower than under the default
    // budget; other hosts are untouched
    val base = CrawlJob.run(spark, cfg)
    def maxT(l: Seq[CrawlLogEntry], host: String) =
      l.filter(_.host == host).map(_.vtimeMs).max
    val slowLog = got.log.collect().toSeq
    val baseLog = base.log.collect().toSeq
    assert(maxT(slowLog, slowHost) > maxT(baseLog, slowHost))
    assert(maxT(slowLog, "portal-antigo.saude.mg.gov.br") ===
      maxT(baseLog, "portal-antigo.saude.mg.gov.br"))
  }

  test("robots.txt Crawl-delay drives hostBudgets; parity holds with parsed budgets") {
    val slowHost = "aplicacoes.mds.gov.br"
    val robots = Map(slowHost ->
      "User-agent: datahoover\nDisallow: /\n\nUser-agent: *\nCrawl-delay: 5\n")
    val derived = graft.politeness.RobotsTxt
      .budgetOverrides(robots, cfg.budget)
    assert(derived === Map(slowHost ->
      cfg.budget.copy(crawlDelayMs = 5000, burst = 1)))
    val cfgRobots = cfg.copy(hostBudgets = derived)
    val sim = ReferenceSimulator.crawl(cfgRobots)
    val got = CrawlJob.run(spark, cfgRobots)
    assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log),
      "parsed-robots budget crawl differs from simulator")
  }

  test("parity holds on randomized configs (seeded, 5 draws)") {
    // feature interactions the fixed-config tests don't enumerate:
    // site subsets x selector shapes x maxPages x strictPerHost x
    // host-budget overrides. Seeded -> fully deterministic.
    val rnd = new scala.util.Random(0xC0FFEE)
    val allSites = Seq("portal_saude_mg", "mds_parcelas", "mds_saldo")
    for (i <- 1 to 5) {
      val sites = rnd.shuffle(allSites).take(1 + rnd.nextInt(3))
      val years = rnd.nextInt(3) match {
        case 0 => YearSelector.Single(2020 + rnd.nextInt(5))
        case 1 =>
          val a = 2019 + rnd.nextInt(4); YearSelector.Range(a, a + rnd.nextInt(3))
        case _ => YearSelector.Multiple(Seq(2021, 2023))
      }
      val months = rnd.nextInt(3) match {
        case 0 => MonthSelector.All
        case 1 => MonthSelector.Single(1 + rnd.nextInt(12))
        case _ =>
          val ms = (1 to 12).filter(_ => rnd.nextBoolean()).take(4)
          MonthSelector.Multiple(if (ms.isEmpty) Seq(3) else ms)
      }
      val rcfg = CrawlConfig(
        sites = sites, years = years, months = months,
        nowYear = 2024, nowMonth = 6,
        maxPages = 2 + rnd.nextInt(3),
        strictPerHost = rnd.nextBoolean(),
        hostBudgets =
          if (rnd.nextBoolean())
            Map("aplicacoes.mds.gov.br" ->
              PolitenessBudget(crawlDelayMs = 3000, burst = 2))
          else Map.empty)
      val sim = ReferenceSimulator.crawl(rcfg)
      val got = CrawlJob.run(spark, rcfg)
      assert(canonLog(got.log.collect().toSeq) === canonLog(sim.log),
        s"randomized config #$i diverged: $rcfg")
      assert(CrawlJob.seenFrom(got.log).collect().toSet ===
        sim.log.filter(_.status == CrawlStatus.Success).map(_.urlHash).toSet,
        s"randomized config #$i seen-set diverged")
    }
  }

  test("metrics aggregate matches the log") {
    val got = CrawlJob.run(spark, cfg)
    val m = CrawlJob.metrics(got.log, got.images)
    val totFiles = m.agg(org.apache.spark.sql.functions.sum("files"))
      .collect()(0).getLong(0)
    assert(totFiles === got.images.count())
  }
}
