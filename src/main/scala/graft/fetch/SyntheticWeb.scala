package graft.fetch

import graft.model._
import graft.url.{Hashing, UrlCanon}

/** Deterministic synthetic web: a pure function of URL hashes standing
  * in for the network (FIXTURES.md §3). Listing URLs yield pages of
  * links (with duplicates, relative hrefs, empty titles, and
  * robots-disallowed paths to exercise D1/P1/urljoin/robots); leaf
  * URLs yield image+caption payloads or the reference's
  * success/no_data/error trichotomy (mds_saldo.py:727-801) with
  * seeded probabilities, plus corrupt payloads (<1 KB / bad magic,
  * portal_saude_mg.py:546-556).
  *
  * Everything is keyed on xxh64 hashes, so any executor — and the
  * single-threaded reference simulator — observes the identical web
  * with zero coordination.
  */
object SyntheticWeb {

  /** site → physical host; all three reference sites live on two hosts
    * (reference: src/ui/terminal.py:32-48) — the hot-host skew the
    * north rule calls out. Unknown site names map to a long-tail of
    * synthetic gov-br hosts (one per site) for scale/skew benches. */
  val referenceSiteHost: Map[String, String] = Map(
    "portal_saude_mg" -> "portal-antigo.saude.mg.gov.br",
    "mds_parcelas" -> "aplicacoes.mds.gov.br",
    "mds_saldo" -> "aplicacoes.mds.gov.br")

  def siteHost(site: String): String =
    referenceSiteHost.getOrElse(site, s"$site.gov.br")

  private val referenceSitePath: Map[String, String] = Map(
    "portal_saude_mg" -> "/deliberacoes",
    "mds_parcelas" -> "/parcelas/consulta",
    "mds_saldo" -> "/saldo/consulta")

  private def sitePath(site: String): String =
    referenceSitePath.getOrElse(site, "/docs/consulta")

  /** Robots rules per host: path prefixes disallowed for our agent
    * (engine honors `respect_robots_txt: true`,
    * config/sites_config.json:213). */
  val robotsDisallow: Map[String, Seq[String]] = Map(
    "portal-antigo.saude.mg.gov.br" -> Seq("/private/", "/admin/"),
    // the `/*.tmp$` wildcard rule (RFC 9309 §2.2.3) matches no
    // synthetic link — it exercises the wildcard path through parse →
    // broadcast → codegen kernel end-to-end without changing any
    // fixture-pinned crawl content
    "aplicacoes.mds.gov.br" -> Seq("/private/", "/interno/", "/*.tmp$"))

  /** `Allow` carve-outs UNDER disallowed prefixes (RFC 9309 §2.2.2
    * longest-match precedence): `/private/liberado/` is crawlable even
    * though `/private/` is not — the rule shape real robots.txt files
    * use constantly (`Allow: /docs/public/` under `Disallow: /docs/`).
    * The synthetic web routes a slice of its private links here so
    * over-blocking (ignoring Allow) is a measured parity failure, not
    * a silent one. */
  val robotsAllow: Map[String, Seq[String]] = Map(
    "portal-antigo.saude.mg.gov.br" -> Seq("/private/liberado/"),
    "aplicacoes.mds.gov.br" -> Seq("/private/liberado/"))

  val robotsHosts: Seq[String] = robotsDisallow.keys.toSeq.sorted

  /** The robots.txt TEXT a host serves — the engine PARSES this
    * (graft.politeness.RobotsTxt) instead of reading the rule map
    * directly, like a production crawler would. Includes a foreign
    * bot's group and comments that a correct parser must skip. */
  def robotsTxt(host: String): String = {
    val sb = new StringBuilder
    sb.append("# robots.txt for ").append(host).append('\n')
    sb.append("User-agent: datahoover\nDisallow: /\n\n")
    sb.append("User-agent: *\n")
    robotsDisallow.getOrElse(host, Nil)
      .foreach(p => sb.append("Disallow: ").append(p).append('\n'))
    robotsAllow.getOrElse(host, Nil)
      .foreach(p => sb.append("Allow: ").append(p).append('\n'))
    sb.toString
  }

  /** Parsed rules per host — the single robots truth both the
    * simulator and the distributed filter derive from. */
  lazy val parsedRobots: Map[String, graft.politeness.RobotsTxt.Rules] =
    robotsHosts.map(h =>
      h -> graft.politeness.RobotsTxt.parse(robotsTxt(h))).toMap

  def disallowed(host: String, url: String): Boolean = {
    val path = {
      val i = url.indexOf("://")
      if (i < 0) url
      else {
        val rest = url.substring(i + 3)
        val s = rest.indexOf('/')
        if (s < 0) "/" else rest.substring(s)
      }
    }
    !parsedRobots.get(host).forall(_.permits(path))
  }

  /** The seed listing URL for one (site, year, month[, municipality])
    * form submission, with filter predicates pushed into query params
    * exactly like the reference's seed URL (portal_saude_mg.py:37:
    * by_year/by_month/by_format/ordering; the MDS form fields year/
    * month/uf/municipio — mds_saldo.py:318-328). */
  def seedUrl(site: String, year: Int, month: Int, uf: String = "",
      munValue: String = ""): String =
    s"https://${siteHost(site)}${sitePath(site)}" +
      s"?by_year=$year&by_month=$month&by_format=img&ordering=newest" +
      (if (uf.isEmpty) "" else s"&uf=$uf&municipio=$munValue")

  private def periodKey(site: String, year: Int, month: Int, webSeed: Long,
      uf: String = "", munValue: String = ""): Long =
    Hashing.mix(Hashing.xxh64(seedUrl(site, year, month, uf, munValue)),
      webSeed)

  // ---- municipality dropdown (S5/P2, mds_saldo.py:643-662) -----------

  /** Reference's 27 valid state codes (mds_saldo_ui.py:283-287). */
  val validStates: Seq[String] = Seq(
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA",
    "MT", "MS", "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN",
    "RS", "RO", "RR", "SC", "SP", "SE", "TO")

  /** Deterministic municipality count per UF. Pure integer arithmetic
    * on the UF's ordinal so a DuckDB oracle regenerates the identical
    * dimension (5–13 municipalities). */
  def municipalityCount(uf: String): Int = {
    val idx = validStates.indexOf(uf)
    require(idx >= 0, s"unknown UF: $uf")
    5 + (idx * 7 + 3) % 9
  }

  /** The RAW dropdown options in option order, INCLUDING the
    * placeholder rows a crawler must skip (mds_parcelas.py:424-428):
    * the "-- Selecione --" header with an empty value, plus one
    * empty-value noise option mid-list (so the filter is provably
    * value-based, not position-based). (displayText, optionValue). */
  def municipalityOptions(uf: String): Seq[(String, String)] = {
    val idx = validStates.indexOf(uf)
    require(idx >= 0, s"unknown UF: $uf")
    val n = municipalityCount(uf)
    val real = (1 to n).map(i =>
      (f"MUN $uf $i%03d", ((idx + 11) * 100000 + i * 97).toString))
    (("-- Selecione --", "") +: real.take(n / 2)) ++
      Seq(("(vazio)", "")) ++ real.drop(n / 2)
  }

  /** S5 dropdown scan with the P2 placeholder filter: keep options
    * with a non-empty value whose text is not the placeholder
    * (mds_saldo.py:651-656). Ordinal = dropdown order. */
  def municipalities(uf: String): Seq[(String, String)] =
    municipalityOptions(uf).filter { case (text, value) =>
      value.nonEmpty && text != "-- Selecione --"
    }

  /** Number of listing pages for a period (bounded pagination, S3:
    * the reference caps at 50 scrolls — portal_saude_mg.py:319).
    * ~1 in 6 periods is empty (drives the early-stop rules). */
  def pageCount(site: String, year: Int, month: Int, maxPages: Int,
      webSeed: Long, uf: String = "", munValue: String = ""): Int = {
    val k = periodKey(site, year, month, webSeed, uf, munValue)
    if (Hashing.draw(k, 11, 6) == 0) 0
    else 1 + Hashing.draw(k, 12, maxPages)
  }

  /** One raw harvested link: (href, title) as scraped before any
    * filtering (S4: portal_saude_mg.py:388-414). */
  final case class RawLink(href: String, title: String)

  /** Links on listing page `p` (1-based) of a period. Deterministic
    * mixture:
    *  - ~12%: duplicate of a link from an earlier page (keep-first
    *    dedup exercise, portal_saude_mg.py:416-423)
    *  - ~10%: empty title (dropped by P1, :404)
    *  - ~6%: path under `/private/` — ~4% robots-disallowed, ~2% in
    *    the Allow-carved `/private/liberado/` subtree (crawlable;
    *    exercises RFC 9309 Allow precedence end-to-end)
    *  - href shape varies: absolute / host-relative / path-relative /
    *    dot-relative (urljoin exercise, :509)
    */
  def pageLinks(site: String, year: Int, month: Int, p: Int, maxPages: Int,
      webSeed: Long, uf: String = "", munValue: String = ""): Seq[RawLink] = {
    val k = periodKey(site, year, month, webSeed, uf, munValue)
    val n = 4 + Hashing.draw(k, 100L + p, 8)
    val host = siteHost(site)
    // municipality form results live under a per-municipality path so
    // two municipalities' artifacts are distinct resources
    val munDir = if (munValue.isEmpty) "" else s"/mun-$munValue"
    (0 until n).map { j =>
      val r = Hashing.mix(k, p * 1000L + j)
      val dup = p > 1 && Hashing.draw(r, 1, 100) < 12
      val (srcP, srcJ) =
        if (dup) {
          val pp = 1 + Hashing.draw(r, 2, p - 1)
          val nn = 4 + Hashing.draw(k, 100L + pp, 8)
          (pp, Hashing.draw(r, 3, nn))
        } else (p, j)
      val docId = srcP * 100 + srcJ
      val rr = Hashing.mix(k, srcP * 1000L + srcJ)
      val priv = Hashing.draw(rr, 4, 100) < 6
      // a third of private links land in the Allow-carved
      // /private/liberado/ subtree — robots-crawlable despite the
      // /private/ disallow (longest-match precedence)
      val dir =
        if (!priv) "files"
        else if (Hashing.draw(rr, 12, 3) == 0) "private/liberado"
        else "private"
      val ext = Seq("png", "jpeg", "bmp")(Hashing.draw(rr, 5, 3))
      val path = f"/$dir$munDir/$year/$month%02d/res-$docId.$ext"
      val href = Hashing.draw(r, 6, 4) match {
        case 0 => s"https://$host$path"
        case 1 => path
        case 2 => path.substring(1) // relative to the listing dir
        case _ => s"../..$path" // climbs back to root from /x/consulta
      }
      val title =
        if (Hashing.draw(r, 7, 100) < 10) ""
        else f"Resolução SES nº $docId%d/$year - " +
          Seq("credenciamento", "repasse financeiro", "aquisição de equipamentos",
            "custeio", "emenda parlamentar")(Hashing.draw(rr, 8, 5))
      RawLink(href, title)
    }
  }

  /** Leaf fetch outcome classes, drawn from the canonical URL hash. */
  sealed trait Outcome
  case object Ok extends Outcome
  case object NoData extends Outcome
  /** Fails the first `failCount` attempts, then succeeds. */
  final case class Transient(failCount: Int) extends Outcome
  case object Corrupt extends Outcome

  def outcome(urlHash: Long): Outcome = {
    val u = Hashing.draw(urlHash, 7, 100)
    if (u < 78) Ok
    else if (u < 86) NoData
    else if (u < 93) Transient(1 + Hashing.draw(urlHash, 8, 3))
    else Corrupt
  }

  /** Host-aware outcome: hosts named `sick-*` model a crashed/
    * unresponsive site (every request fails through all retries) —
    * the planted-failure environment for the quarantine/recovery rule
    * (mds_saldo.py:249-294) and the health probe (S11). */
  def outcome(urlHash: Long, host: String): Outcome =
    if (host.startsWith("sick-")) Transient(Int.MaxValue)
    else outcome(urlHash)

  /** S11 site health probe (portal_saude_mg.py:730-747): (HTTP status,
    * response-time ms) of a host's root document; the reference calls
    * a site healthy when the status is 2xx and the response arrives
    * within its timeout. Deterministic per host. */
  def healthProbe(host: String): (Int, Long) =
    if (host.startsWith("sick-")) (503, 5000L)
    else (200, 80L + Hashing.draw(Hashing.xxh64(host), 31, 400))

  def healthy(host: String): Boolean = {
    val (code, rtMs) = healthProbe(host)
    code >= 200 && code < 300 && rtMs < 3000
  }

  /** Deterministic fetch latency in virtual ms (50–549). */
  def latencyMs(urlHash: Long, attempt: Int): Long =
    50L + Hashing.draw(urlHash, 9000L + attempt, 500)

  /** Payload metadata + pixels for a successful leaf. Dims are drawn
    * from {64,96,128,192} so every encoded format clears the 1 KiB
    * validity floor (P3). */
  final case class Payload(bytes: Array[Byte], w: Int, h: Int, fmt: String,
      caption: String, phash: Long)

  private val dims = Array(64, 96, 128, 192)
  private val captionObjects = Array(
    "aquisição de equipamentos hospitalares",
    "repasse fundo a fundo para atenção básica",
    "custeio de unidades de pronto atendimento",
    "construção de unidade básica de saúde",
    "aquisição de medicamentos do componente especializado")

  private val fmts = Array("png", "jpeg", "bmp")
  def fmtOf(urlHash: Long): String = fmts(Hashing.draw(urlHash, 20, 3))

  def payload(urlHash: Long, title: String): Payload = {
    val w = dims(Hashing.draw(urlHash, 21, dims.length))
    val h = dims(Hashing.draw(urlHash, 22, dims.length))
    val fmt = fmtOf(urlHash)
    val px = ImageCodec.synthPixels(urlHash, w, h)
    val bytes = ImageCodec.encode(px, w, h, fmt)
    // caption: link title, or the extraction-style sentinel when the
    // title is missing (pdf_data_to_table.py:249-259)
    val caption =
      if (title == null || title.isEmpty) "NÃO INFORMADO"
      else s"$title — ${captionObjects(Hashing.draw(urlHash, 23, captionObjects.length))}"
    Payload(bytes, w, h, fmt, caption, ImageCodec.phash(px))
  }

  /** A corrupt payload: either undersized or magic-mismatched
    * (portal_saude_mg.py:546-556). Deterministic per URL. */
  def corruptPayload(urlHash: Long): Payload = {
    val fmt = fmtOf(urlHash)
    val bytes =
      if (Hashing.draw(urlHash, 24, 2) == 0)
        Array.fill[Byte](Hashing.draw(urlHash, 25, 1000))(0x42) // < 1 KiB
      else {
        val b = new Array[Byte](2048) // right size, wrong magic
        var i = 0
        while (i < b.length) { b(i) = Hashing.mix(urlHash, i.toLong).toByte; i += 1 }
        // zero the magic region: random noise matches the 2-byte BMP
        // magic once per ~65k corrupt URLs
        b(0) = 0; b(1) = 0; b(2) = 0; b(3) = 0
        b
      }
    Payload(bytes, 0, 0, fmt, "", 0L)
  }

  /** Convenience: harvested, resolved, canonicalized links of a whole
    * period in harvest order (page-major) — shared by the Spark
    * flatMap (G5) and the simulator. Returns (pos-in-period, page,
    * posInPage, canonicalUrl, title) BEFORE the P1 filter/dedup. */
  def harvestPeriod(site: String, year: Int, month: Int, maxPages: Int,
      webSeed: Long, uf: String = "", munValue: String = "")
      : Seq[(Int, Int, Int, String, String)] = {
    val base = seedUrl(site, year, month, uf, munValue)
    val pages = pageCount(site, year, month, maxPages, webSeed, uf, munValue)
    var k = -1
    for {
      p <- 1 to pages
      (link, j) <- pageLinks(site, year, month, p, maxPages, webSeed,
        uf, munValue).zipWithIndex
    } yield {
      k += 1
      (k, p, j, UrlCanon.resolve(base, link.href), link.title)
    }
  }
}
