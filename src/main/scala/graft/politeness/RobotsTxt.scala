package graft.politeness

import graft.model.PolitenessBudget

/** robots.txt parser (RFC 9309 subset + the de-facto `Crawl-delay`
  * extension) — the politeness scheduler's rule SOURCE: the reference
  * honors `respect_robots_txt: true` (config/sites_config.json:213)
  * and hard-codes per-host pacing; here the per-host disallow table
  * and crawl-delay budget overrides are parsed from robots.txt text
  * exactly as a production crawler would receive them.
  *
  * Supported (documented subset):
  *  - group selection per RFC 9309 §2.2.1: all groups whose
  *    `User-agent` value's product token (the value truncated at the
  *    first `/` or whitespace, so `graft/1.0` matches `graft`)
  *    case-insensitively equals the crawler's token are merged; if
  *    none match, the `*` groups apply;
  *  - `Disallow` / `Allow` path prefixes with longest-match
  *    precedence, `Allow` winning length ties (RFC 9309 §2.2.2);
  *    an empty `Disallow:` value means unrestricted;
  *  - `Crawl-delay: <seconds>` (non-standard but ubiquitous) —
  *    surfaced so callers can turn it into a [[PolitenessBudget]]
  *    override per host;
  *  - comments (`#`), blank-line group separation, case-insensitive
  *    directive names, CR/LF endings;
  *  - `*`/`$` wildcards in rule paths (RFC 9309 §2.2.3): `*` spans
  *    any character run, a trailing `$` anchors the rule to the path
  *    end; specificity is the raw pattern length (wildcards counted),
  *    like Google's open-source matcher.
  */
object RobotsTxt {

  /** Scalar §2.2.3 rule match on UTF-8 bytes — independent of (and
    * parity-pinned against, RobotsExpressionSpec) the distributed
    * codegen kernel [[graft.functions.RobotsExpressions.ruleMatches]]. */
  private[graft] def ruleMatches(pathS: String, patS: String): Boolean =
    matchBytes(
      pathS.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      patS.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def matchBytes(path: Array[Byte], pat: Array[Byte]): Boolean = {
    val sn = path.length
    val anchored = pat.nonEmpty && pat(pat.length - 1) == '$'
    val pEnd = if (anchored) pat.length - 1 else pat.length
    var s = 0; var p = 0; var starP = -1; var starS = 0
    while (true) {
      if (p == pEnd) {
        if (!anchored || s == sn) return true
        if (starP < 0) return false
        starS += 1; if (starS > sn) return false
        p = starP + 1; s = starS
      } else if (pat(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (s < sn && pat(p) == path(s)) {
        p += 1; s += 1
      } else if (starP >= 0) {
        starS += 1; if (starS > sn) return false
        p = starP + 1; s = starS
      } else return false
    }
    false // unreachable
  }

  final case class Rules(
      allows: Seq[String],
      disallows: Seq[String],
      crawlDelaySec: Option[Double]) {

    // patterns pre-encoded once per Rules instance: the simulator
    // calls permits per URL, and re-encoding every pattern (plus the
    // path, per rule) on each call was O(rules) allocations per URL
    private lazy val allowPats: Seq[Array[Byte]] =
      allows.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    private lazy val disPats: Seq[Array[Byte]] =
      disallows.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    /** RFC 9309 §2.2.2 precedence: the most specific (longest raw
      * pattern, in bytes) matching rule decides; `Allow` wins a
      * length tie; no matching rule → allowed. */
    def permits(path: String): Boolean = {
      val pb = path.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var d = -1
      disPats.foreach(p =>
        if (p.length > d && matchBytes(pb, p)) d = p.length)
      var a = -1
      allowPats.foreach(p =>
        if (p.length > a && matchBytes(pb, p)) a = p.length)
      a >= d
    }
  }

  object Rules {
    val permitAll: Rules = Rules(Nil, Nil, None)
  }

  private final case class Group(agents: Seq[String], allows: Seq[String],
      disallows: Seq[String], crawlDelay: Option[Double])

  /** `Sitemap:` directive URLs, in file order (sitemaps.org robots
    * extension; GROUP-INDEPENDENT per the spec — a sitemap line
    * applies to every crawler regardless of the User-agent group it
    * sits in). Feed to [[graft.sources.SitemapSource]]: robots.txt
    * is how a polite crawler DISCOVERS a host's sitemap in the first
    * place. Case-insensitive directive name, comments and CR/LF
    * handled as in [[parse]]; empty values dropped. */
  def sitemapUrls(text: String): Seq[String] =
    text.split("\r?\n").toSeq.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i <= 0) None
      else {
        val key = line.substring(0, i).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(i + 1).trim
        if (key == "sitemap" && value.nonEmpty) Some(value) else None
      }
    }

  /** Parse `text` and return the merged rules that apply to
    * `userAgent` (product token, matched case-insensitively; falls
    * back to the `*` groups). */
  def parse(text: String, userAgent: String = "graft"): Rules = {
    // callers may pass a full product string ("graft/1.0"); match on
    // the bare token
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
      .takeWhile(c => c != '/' && !c.isWhitespace)
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = Vector.empty[String]
    var allows = Vector.empty[String]
    var disallows = Vector.empty[String]
    var delay: Option[Double] = None
    var inRules = false // false while collecting consecutive UA lines

    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents, allows, disallows, delay)
      agents = Vector.empty; allows = Vector.empty
      disallows = Vector.empty; delay = None; inRules = false
    }

    text.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              // a UA line after rule lines starts a NEW group; several
              // consecutive UA lines share one group (RFC 9309 §2.2.1)
              if (inRules) flush()
              agents :+= value.toLowerCase(java.util.Locale.ROOT)
            case "disallow" =>
              inRules = true
              if (value.nonEmpty) disallows :+= value
            case "allow" =>
              inRules = true
              if (value.nonEmpty) allows :+= value
            case "crawl-delay" =>
              inRules = true
              delay = value.toDoubleOption.orElse(delay)
            case _ => inRules = true // unknown directive: part of group
          }
        }
      }
    }
    flush()

    // RFC 9309 §2.2.1 product-token matching: the UA line's value is
    // truncated at the first '/' or whitespace (version/comment tail)
    // and compared case-insensitively to the crawler token — so
    // `User-agent: graft/1.0` selects the graft group instead of
    // silently falling back to `*`.
    def token(agent: String): String =
      agent.takeWhile(c => c != '/' && !c.isWhitespace)
    val matching = groups.filter(_.agents.exists(a => token(a) == ua)) match {
      case m if m.nonEmpty => m
      case _ => groups.filter(_.agents.contains("*"))
    }
    if (matching.isEmpty) Rules.permitAll
    else Rules(
      matching.flatMap(_.allows).toSeq,
      matching.flatMap(_.disallows).toSeq,
      // several matching groups setting Crawl-delay: honor the MAX
      // (most conservative) instead of first-wins
      matching.flatMap(_.crawlDelay).maxOption)
  }

  /** Per-host budget overrides from parsed robots texts: hosts whose
    * robots.txt sets `Crawl-delay` get `base` with that inter-request
    * delay (and burst 1 — a crawl-delay host expects strict pacing).
    * Feed the result into `CrawlConfig.hostBudgets`. */
  def budgetOverrides(robotsByHost: Map[String, String],
      base: PolitenessBudget,
      userAgent: String = "graft"): Map[String, PolitenessBudget] =
    robotsByHost.flatMap { case (host, text) =>
      parse(text, userAgent).crawlDelaySec.map(d =>
        host -> base.copy(crawlDelayMs = (d * 1000).toLong, burst = 1))
    }
}
