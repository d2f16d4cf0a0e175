package graft.url

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** URL canonicalization + relative-href resolution.
  *
  * The reference dedups on raw href strings after a single
  * `urljoin(base, href)` absolutization
  * (reference: src/modules/sites/portal_saude_mg.py:509-510, dedup
  * :416-423). At 10^10-frontier scale the seen-set must key on a
  * canonical form or trivially-equal URLs double-fetch; this implements
  * the standard RFC 3986 §6 normalizations:
  *   - scheme + host lowercased, default port stripped (:80/:443)
  *   - fragment dropped
  *   - dot-segments removed from the path
  *   - percent-encodings of unreserved characters decoded; remaining
  *     escapes uppercased
  *   - query parameters sorted by (key, value) — stable
  *   - empty path → "/"
  *
  * Pure Scala (no java.net.URL — its equals does DNS I/O) so the same
  * code runs in Catalyst UDFs, the synthetic fetcher, and the
  * reference simulator.
  */
object UrlCanon {

  private val Unreserved =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "-._~").toSet

  /** Split "scheme://authority/path?query#frag" without regex
    * backtracking; tolerant of missing parts. */
  private def splitUrl(u: String): (String, String, String, String) = {
    val noFrag = { val i = u.indexOf('#'); if (i >= 0) u.substring(0, i) else u }
    val si = noFrag.indexOf("://")
    if (si < 0) return ("", "", noFrag, "")
    val scheme = noFrag.substring(0, si)
    val rest = noFrag.substring(si + 3)
    val pathStart = rest.indexOf('/')
    val (auth, pathQ) =
      if (pathStart < 0) {
        val qi = rest.indexOf('?')
        if (qi < 0) (rest, "") else (rest.substring(0, qi), rest.substring(qi))
      } else (rest.substring(0, pathStart), rest.substring(pathStart))
    val qi = pathQ.indexOf('?')
    val (path, query) =
      if (qi < 0) (pathQ, "") else (pathQ.substring(0, qi), pathQ.substring(qi + 1))
    (scheme, auth, path, query)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[url] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => // drop
        case ".." => if (out.nonEmpty && out.last != "") out.remove(out.length - 1)
        case s => out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    val prefix = if (path.startsWith("/") && !joined.startsWith("/")) "/" else ""
    val suffix =
      if ((path.endsWith("/.") || path.endsWith("/..")) && !joined.endsWith("/")) "/"
      else ""
    prefix + joined + suffix
  }

  /** Decode %XX of unreserved chars, uppercase remaining escapes. */
  private[url] def normalizePercent(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (Unreserved.contains(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Canonical form; returns the input untouched when it has no
    * "://" (defensive — non-http hrefs are filtered upstream). */
  def canonicalize(url: String): String = {
    val (scheme0, auth0, path0, query) = splitUrl(url.trim)
    if (scheme0.isEmpty) return url.trim
    val scheme = scheme0.toLowerCase
    var auth = auth0.toLowerCase
    if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
    if (scheme == "https" && auth.endsWith(":443")) auth = auth.dropRight(4)
    val path =
      normalizePercent(removeDotSegments(if (path0.isEmpty) "/" else path0))
    val q =
      if (query.isEmpty) ""
      else {
        val parts = query.split("&", -1).filter(_.nonEmpty)
          .map(normalizePercent).sorted
        if (parts.isEmpty) "" else parts.mkString("?", "&", "")
      }
    s"$scheme://$auth$path$q"
  }

  /** Host of a canonical/raw URL ("" when unparseable) — the
    * politeness-scheduler key. */
  def host(url: String): String = {
    val (_, auth, _, _) = splitUrl(url)
    val h = auth.toLowerCase
    val ci = h.lastIndexOf(':')
    if (ci > 0 && h.substring(ci + 1).forall(_.isDigit)) h.substring(0, ci)
    else h
  }

  /** Resolve a possibly-relative href against a base URL — the
    * `urljoin` the reference applies per harvested link
    * (portal_saude_mg.py:509). RFC 3986 §5.2 merge semantics. */
  def resolve(base: String, href: String): String = {
    val h = href.trim
    if (h.isEmpty) return canonicalize(base)
    if (h.contains("://")) return canonicalize(h)
    val (scheme, auth, basePath, _) = splitUrl(base)
    if (h.startsWith("//")) return canonicalize(s"$scheme:$h")
    if (h.startsWith("/")) return canonicalize(s"$scheme://$auth$h")
    // relative path: merge with base path minus its last segment
    val dir = {
      val i = basePath.lastIndexOf('/')
      if (i < 0) "/" else basePath.substring(0, i + 1)
    }
    canonicalize(s"$scheme://$auth$dir$h")
  }

  // ---- Catalyst surface (Scala UDFs; promoted to codegen Expressions
  //      only if profiling shows them hot — SURVEY §7.4)

  val canonicalizeUdf = udf((u: String) => if (u == null) null else canonicalize(u))
  val hostUdf = udf((u: String) => if (u == null) null else host(u))
  val resolveUdf = udf((b: String, h: String) =>
    if (b == null) null else resolve(b, if (h == null) "" else h))

  def canonical_url(c: Column): Column = canonicalizeUdf(c)
  def url_host(c: Column): Column = hostUdf(c)
  def url_resolve(base: Column, href: Column): Column = resolveUdf(base, href)

  /** Register SQL-facing names. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("canonical_url",
      (u: String) => if (u == null) null else canonicalize(u))
    spark.udf.register("url_host",
      (u: String) => if (u == null) null else host(u))
    spark.udf.register("url_resolve", (b: String, h: String) =>
      if (b == null) null else resolve(b, if (h == null) "" else h))
  }
}
