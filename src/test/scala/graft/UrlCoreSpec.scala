package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fetch.{ImageCodec, SyntheticWeb}
import graft.url.{Hashing, UrlCanon}

/** Unit tests for the pure url/hash/codec core. */
class UrlCoreSpec extends AnyFunSuite {

  // ---- Hashing: bit-parity with Spark's built-in xxhash64(seed=42)
  test("pure xxh64 equals Spark's xxhash64 column function") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = Seq("", "a", "abc", "1234567", "12345678", "123456789",
      "https://portal-antigo.saude.mg.gov.br/deliberacoes?by_year=2024",
      "Resolução SES nº 1234/2024 — repasse", "x" * 31, "y" * 32, "z" * 100)
    val got = samples.toDF("s").select(xxhash64($"s")).collect().map(_.getLong(0))
    val want = samples.map(Hashing.xxh64)
    assert(got.toSeq === want)
  }

  // ---- UrlCanon table-driven cases
  test("canonicalize: scheme/host case, default ports, fragments, query sort") {
    val cases = Seq(
      "HTTP://Example.COM:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "https://example.com:8443/a" -> "https://example.com:8443/a",
      "https://example.com" -> "https://example.com/",
      "https://example.com/a#frag" -> "https://example.com/a",
      "https://example.com/a?b=2&a=1" -> "https://example.com/a?a=1&b=2",
      "https://example.com/a?" -> "https://example.com/a",
      "https://example.com/a/./b/../c" -> "https://example.com/a/c",
      "https://example.com/%7Euser/%41%2Fx" -> "https://example.com/~user/A%2Fx",
      "https://example.com/%7euser" -> "https://example.com/~user")
    cases.foreach { case (in, want) =>
      assert(UrlCanon.canonicalize(in) === want, s"input: $in")
    }
  }

  test("canonicalize is idempotent (generated inputs)") {
    val rng = new scala.util.Random(42)
    val samples = Seq("https://Example.com:443/a/../b?z=1&a=2#f") ++
      (1 to 200).map { _ =>
        val s = rng.alphanumeric.take(1 + rng.nextInt(10)).mkString
        rng.nextInt(3) match {
          case 0 => s"https://host.gov.br/x/$s?q=$s&b=${rng.nextInt(9)}"
          case 1 => s"HTTP://H$s.COM:80/p%41th/../$s"
          case _ => s"https://$s.ORG:443/%7e$s/./x#frag-$s"
        }
      }
    samples.foreach { u =>
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) === once, s"input: $u")
    }
  }

  test("resolve: absolute, host-relative, path-relative, dot-segments") {
    val base = "https://aplicacoes.mds.gov.br/parcelas/consulta?by_year=2024"
    assert(UrlCanon.resolve(base, "https://x.org/a") === "https://x.org/a")
    assert(UrlCanon.resolve(base, "/files/a.png") ===
      "https://aplicacoes.mds.gov.br/files/a.png")
    assert(UrlCanon.resolve(base, "files/a.png") ===
      "https://aplicacoes.mds.gov.br/parcelas/files/a.png")
    assert(UrlCanon.resolve(base, "../../files/a.png") ===
      "https://aplicacoes.mds.gov.br/files/a.png")
    assert(UrlCanon.resolve(base, "//cdn.gov.br/a") === "https://cdn.gov.br/a")
    assert(UrlCanon.resolve(base, "") === UrlCanon.canonicalize(base))
  }

  test("host extraction") {
    assert(UrlCanon.host("https://A.B.Gov.BR:8443/x?q=1") === "a.b.gov.br")
    assert(UrlCanon.host("http://h/x") === "h")
  }

  // ---- ImageCodec: the input_hint per-row invariant
  test("payload invariant: lossless bit-exact, lossy PSNR ≥ 40 dB, magic valid") {
    for (key <- Seq(1L, -77L, 123456789L); fmt <- Seq("png", "bmp", "jpeg")) {
      val (w, h) = (96, 64)
      val px = ImageCodec.synthPixels(key, w, h)
      val enc = ImageCodec.encode(px, w, h, fmt)
      assert(ImageCodec.validMagic(enc, fmt), s"$fmt magic/size")
      val (dw, dh, dec) = ImageCodec.decode(enc)
      assert((dw, dh) === ((w, h)))
      val p = ImageCodec.psnr(px, dec)
      if (fmt == "jpeg") assert(p >= 40.0, s"jpeg psnr=$p")
      else assert(p.isPosInfinity, s"$fmt should be lossless, psnr=$p")
    }
  }

  test("corrupt payloads fail validation") {
    for (k <- Seq(3L, 4L, 99L)) {
      val p = SyntheticWeb.corruptPayload(k)
      assert(!ImageCodec.validMagic(p.bytes, p.fmt))
    }
  }

  // ---- SyntheticWeb determinism
  test("synthetic web is a pure function (same inputs, same links)") {
    val month = (1 to 12).find(m =>
      SyntheticWeb.harvestPeriod("portal_saude_mg", 2024, m, 5, 42L).nonEmpty)
      .getOrElse(fail("all 12 periods empty — webSeed pathological"))
    val a = SyntheticWeb.harvestPeriod("portal_saude_mg", 2024, month, 5, 42L)
    val b = SyntheticWeb.harvestPeriod("portal_saude_mg", 2024, month, 5, 42L)
    assert(a === b)
    assert(a.nonEmpty)
    // across a year of periods, duplicate canonical URLs occur within at
    // least one period (keep-first-dedup exercise)
    val anyDup = (1 to 12).exists { m =>
      val urls = SyntheticWeb.harvestPeriod("portal_saude_mg", 2024, m, 5, 42L)
        .map(_._4)
      urls.distinct.size < urls.size
    }
    assert(anyDup, "expected duplicate links in some period")
  }
}
