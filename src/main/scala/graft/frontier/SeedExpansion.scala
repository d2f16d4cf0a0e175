package graft.frontier

import graft.model._

/** Seed-spec expansion into ordered `PeriodSeed`s (SURVEY §2.4 G1–G3).
  *
  * Reproduces the reference's enumeration orders exactly — ordering is
  * part of the crawl-order contract:
  *  - years: `single` → [y]; `range` → ascending a..b
  *    (mds_saldo.py:139-152); `multiple` → given order;
  *    `all` → current year DESCENDING to 2011 for portal_saude_mg
  *    (portal_saude_ui.py:1394-1396, 1512-1513) and 2011 ascending to
  *    current year for the MDS sites (mds_saldo.py:148-150)
  *  - months: 1..12 for `all` (13 sentinel — portal_saude_ui.py:574)
  *  - expansion: sites outer (terminal order, terminal.py:32-48),
  *    years middle, months inner (portal_saude_ui.py:1416-1452)
  *  - future-month guard (P5): months beyond the injected clock are
  *    never emitted for the current year (portal_saude_ui.py:1446-1448)
  */
object SeedExpansion {

  val FirstYear = 2011 // MDS "all years" lower bound (mds_saldo.py:148)

  def years(sel: YearSelector, site: String, nowYear: Int): Seq[Int] =
    sel match {
      case YearSelector.Single(y) => Seq(y)
      case YearSelector.Range(a, b) => a to b
      case YearSelector.Multiple(ys) => ys
      case YearSelector.All =>
        if (site == "portal_saude_mg") nowYear to FirstYear by -1
        else FirstYear to nowYear
    }

  def months(sel: MonthSelector): Seq[Int] = sel match {
    case MonthSelector.Single(m) => Seq(m)
    case MonthSelector.Multiple(ms) => ms
    case MonthSelector.All => 1 to 12
  }

  /** P10 UF validation (mds_saldo_ui.py:783-804): uppercase + trim,
    * exactly 2 chars, member of the reference's 27-state list. Returns
    * the normalized code; throws on invalid input like the reference's
    * input rejection. */
  def validateUf(uf: String): String = {
    // Locale.ROOT: the default locale's casing (e.g. Turkish dotted I)
    // must not change which UFs validate
    val u = uf.trim.toUpperCase(java.util.Locale.ROOT)
    require(u.length == 2, s"UF deve ter exatamente 2 caracteres: '$uf'")
    require(graft.fetch.SyntheticWeb.validStates.contains(u),
      s"UF '$u' não é válida")
    u
  }

  /** The municipality dimension of one config, in dropdown order
    * (S5 scan + P2 placeholder filter; `ALL_<UF>` semantics of
    * mds_saldo.py:320-356). `Seq(("",""))` when the config has no
    * municipality dimension. (name, dropdownValue). */
  def municipalityDim(cfg: CrawlConfig): Seq[(String, String)] =
    cfg.municipality match {
      case None => Seq(("", ""))
      case Some(sel) =>
        val uf = validateUf(cfg.uf)
        val all = graft.fetch.SyntheticWeb.municipalities(uf)
        sel match {
          case MunicipalitySelector.All => all
          case MunicipalitySelector.Single(name) =>
            // P9 fallback matching (mds_saldo.py:588-601,
            // mds_parcelas.py:358-376): first case-INSENSITIVE exact
            // match over the dropdown in order; failing that, the
            // first option CONTAINING the requested text
            // (case-insensitive); else reject like the reference's
            // "not found in dropdown" raise
            val req = name.toUpperCase(java.util.Locale.ROOT)
            all.find(_._1.toUpperCase(java.util.Locale.ROOT) == req)
              .orElse(
                all.find(_._1.toUpperCase(java.util.Locale.ROOT)
                  .contains(req)))
              .map(Seq(_))
              .getOrElse(throw new IllegalArgumentException(
                s"município '$name' não encontrado no estado $uf"))
        }
    }

  /** Fully-ordered seed list; `seedSeq` is the frozen enumeration
    * index (composite discoverySeq base, SURVEY G3/G4). Municipality
    * (when configured) is the innermost loop, enumerated per
    * (year, month) in dropdown order exactly like the reference's
    * re-navigate-per-municipality loop (mds_saldo.py:320-356). */
  def expand(cfg: CrawlConfig): Seq[PeriodSeed] = {
    val munDim = municipalityDim(cfg)
    val ufNorm = if (cfg.municipality.isEmpty) "" else validateUf(cfg.uf)
    var seq = -1L
    for {
      site <- cfg.sites
      y <- years(cfg.years, site, cfg.nowYear)
      m <- months(cfg.months)
      // P5 future guard: skip future years and future months of this year
      if y < cfg.nowYear || (y == cfg.nowYear && m <= cfg.nowMonth)
      (mn, mv) <- munDim
    } yield {
      seq += 1
      PeriodSeed(site, y, m, seq, ufNorm, mn, mv)
    }
  }

  /** Early-stop pruning over per-period download counts (the wave-
    * feedback rules, SURVEY §4 row 3):
    *  - empty month (0 files) ⇒ drop the REST of that site-year's
    *    months (portal_saude_ui.py:1582-1584)
    *  - in `all`-years mode, a gap of >3 consecutive fully-empty years
    *    ⇒ drop all later years for that site
    *    (portal_saude_ui.py:1548-1550)
    *
    * `fileCount` maps (site,year,month) → successful downloads; pure so
    * the Spark job and the simulator share one decision procedure.
    * Returns the surviving periods in seed order.
    */
  def prune(seeds: Seq[PeriodSeed], fileCount: Map[(String, Int, Int), Long],
      allYearsMode: Boolean, allMonthsMode: Boolean): Seq[PeriodSeed] = {
    val bySite = seeds.groupBy(_.site)
    val out = Seq.newBuilder[PeriodSeed]
    bySite.toSeq.sortBy(_._2.head.seedSeq).foreach { case (_, ss) =>
      // group periods by year preserving seed order
      val yearsInOrder = ss.map(_.year).distinct
      var emptyYearStreak = 0
      var yearsStopped = false
      yearsInOrder.foreach { y =>
        if (!yearsStopped) {
          val yearSeeds = ss.filter(_.year == y)
          var monthStopped = false
          var yearFiles = 0L
          // group by month: a month may hold several municipality
          // seeds; the stop decision is per MONTH on the month's total
          // (the reference sums across municipalities before judging)
          yearSeeds.map(_.month).distinct.foreach { m =>
            if (!monthStopped) {
              val seedsOfMonth = yearSeeds.filter(_.month == m)
              val n = fileCount.getOrElse(
                (seedsOfMonth.head.site, y, m), 0L)
              out ++= seedsOfMonth
              yearFiles += n
              // stop months at 1st empty (only in all-months mode)
              if (allMonthsMode && n == 0L) monthStopped = true
            }
          }
          if (allYearsMode) {
            if (yearFiles == 0L) emptyYearStreak += 1 else emptyYearStreak = 0
            if (emptyYearStreak > 3) yearsStopped = true
          }
        }
      }
    }
    out.result().sortBy(_.seedSeq)
  }
}
