package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.PolitenessBudget
import graft.politeness.RobotsTxt

/** RFC 9309-subset robots.txt parser: group selection, precedence,
  * crawl-delay extraction, and the round-trip through the synthetic
  * web's served texts. */
class RobotsTxtSpec extends AnyFunSuite {

  test("group selection: exact UA match beats *, foreign groups ignored") {
    val text =
      """# comment line
        |User-agent: datahoover
        |Disallow: /
        |
        |User-agent: graft
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /everything/
        |""".stripMargin
    val r = RobotsTxt.parse(text, "graft")
    assert(r.disallows === Seq("/private/"))
    assert(r.permits("/public/x"))
    assert(!r.permits("/private/x"))
    // unknown agent falls back to '*'
    val star = RobotsTxt.parse(text, "otherbot")
    assert(star.disallows === Seq("/everything/"))
    // UA matching is case-insensitive
    assert(RobotsTxt.parse(text, "GRAFT").disallows === Seq("/private/"))
  }

  test("consecutive UA lines share one group; groups for same UA merge") {
    val text =
      """User-agent: graft
        |User-agent: graft-image
        |Disallow: /a/
        |
        |User-agent: graft
        |Disallow: /b/
        |""".stripMargin
    assert(RobotsTxt.parse(text, "graft").disallows === Seq("/a/", "/b/"))
    assert(RobotsTxt.parse(text, "graft-image").disallows === Seq("/a/"))
  }

  test("longest-match precedence, Allow wins length ties, empty Disallow = allow all") {
    val text =
      """User-agent: *
        |Disallow: /docs/
        |Allow: /docs/public/
        |""".stripMargin
    val r = RobotsTxt.parse(text)
    assert(!r.permits("/docs/secret.pdf"))
    assert(r.permits("/docs/public/report.pdf"))
    assert(r.permits("/other/"))
    // tie: Allow and Disallow same prefix -> allowed
    val tie = RobotsTxt.parse(
      "User-agent: *\nDisallow: /x/\nAllow: /x/\n")
    assert(tie.permits("/x/y"))
    // empty Disallow value is unrestricted
    val empty = RobotsTxt.parse("User-agent: *\nDisallow:\n")
    assert(empty.disallows.isEmpty && empty.permits("/anything"))
  }

  test("crawl-delay parsed; CRLF + inline comments + case-insensitive keys") {
    val text =
      "USER-AGENT: *\r\nDISALLOW: /admin/ # keep out\r\nCrawl-Delay: 2.5\r\n"
    val r = RobotsTxt.parse(text)
    assert(r.disallows === Seq("/admin/"))
    assert(r.crawlDelaySec === Some(2.5))
    // no robots at all -> permit everything
    assert(RobotsTxt.parse("").permits("/anything"))
  }

  test("budgetOverrides: Crawl-delay becomes a strict per-host budget") {
    val base = PolitenessBudget()
    val robots = Map(
      "slow.gov.br" -> "User-agent: *\nCrawl-delay: 5\n",
      "normal.gov.br" -> "User-agent: *\nDisallow: /x/\n")
    val out = RobotsTxt.budgetOverrides(robots, base)
    assert(out === Map(
      "slow.gov.br" -> base.copy(crawlDelayMs = 5000, burst = 1)))
  }

  test("round-trip: parsing the synthetic web's served robots.txt equals its rule maps") {
    graft.fetch.SyntheticWeb.robotsHosts.foreach { h =>
      val parsed = RobotsTxt.parse(graft.fetch.SyntheticWeb.robotsTxt(h))
      assert(parsed.disallows ===
        graft.fetch.SyntheticWeb.robotsDisallow(h), s"host $h")
      assert(parsed.allows ===
        graft.fetch.SyntheticWeb.robotsAllow(h), s"host $h")
      // the carve-out is live: liberado permitted under /private/
      assert(!parsed.permits("/private/x.png"))
      assert(parsed.permits("/private/liberado/x.png"))
    }
  }

  test("RFC 9309 product-token UA matching: versioned tokens select the group") {
    val text =
      """User-agent: graft/1.0
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /star/
        |""".stripMargin
    // the served group's token is versioned; our bare token matches it
    assert(RobotsTxt.parse(text, "graft").disallows === Seq("/a/"))
    // and a versioned crawler token matches a bare served group
    val bare = "User-agent: graft\nDisallow: /b/\n"
    assert(RobotsTxt.parse(bare, "graft/2.1 (+https://x)").disallows ===
      Seq("/b/"))
  }

  test("RFC 9309 §2.2.3 wildcards: '*' spans runs, trailing '$' anchors, specificity is raw length") {
    val r = RobotsTxt.parse(
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /docs/*/draft/
        |Allow: /docs/*/draft/public*
        |Disallow: /a*b$
        |""".stripMargin)
    // '$' anchors: only paths ENDING in .pdf are blocked
    assert(!r.permits("/x/report.pdf"))
    assert(r.permits("/x/report.pdf.html"))
    assert(r.permits("/x/report.pdfx"))
    // '*' spans any run including '/'
    assert(!r.permits("/docs/2024/draft/secret"))
    assert(!r.permits("/docs/a/b/draft/secret"))
    assert(r.permits("/docs/2024/final/x"))
    // longer raw pattern (Allow carve-out with wildcard) wins
    assert(r.permits("/docs/2024/draft/public-report"))
    // multiple stars with anchor, backtracking required
    assert(!r.permits("/aXXbYYb"))
    assert(r.permits("/aXXbYYbZ"))
    // '*' alone matches everything
    val all = RobotsTxt.parse("User-agent: *\nDisallow: *\n")
    assert(!all.permits("/anything"))
    // scalar and kernel agree on tricky anchored-backtrack shapes
    Seq(("/p/x", "/p*$"), ("/p/", "/p/*x$"), ("/ab", "/a$"), ("", "$"),
        ("/q", "*"), ("/q", "**$")).foreach { case (path, pat) =>
      assert(RobotsTxt.ruleMatches(path, pat) ===
        graft.functions.RobotsExpressions.ruleMatches(
          org.apache.spark.unsafe.types.UTF8String.fromString(path),
          org.apache.spark.unsafe.types.UTF8String.fromString(pat)),
        s"path=$path pat=$pat")
    }
  }

  test("several matching groups with Crawl-delay: the max (most conservative) wins") {
    val text =
      """User-agent: graft
        |Crawl-delay: 2
        |
        |User-agent: graft
        |Crawl-delay: 7
        |
        |User-agent: graft
        |Crawl-delay: 4
        |""".stripMargin
    assert(RobotsTxt.parse(text, "graft").crawlDelaySec === Some(7.0))
  }

  test("Sitemap: directives collected group-independently, in order; comments/case/empties handled") {
    val text =
      """User-agent: other
        |Disallow: /private
        |Sitemap: https://a.example/sitemap1.xml
        |
        |User-agent: graft
        |sitemap: https://a.example/sitemap2.xml  # trailing comment
        |Sitemap:
        |Allow: /
        |""".stripMargin
    assert(RobotsTxt.sitemapUrls(text) === Seq(
      "https://a.example/sitemap1.xml",
      "https://a.example/sitemap2.xml"))
    assert(RobotsTxt.sitemapUrls("User-agent: *\nDisallow:") === Nil)
  }
}
