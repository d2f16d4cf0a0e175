package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ParagraphDedup

/** Paragraph-level exact dedup (ops/ParagraphDedup.scala): keep-first
  * across documents AND positions, reassembly order, all-duplicate
  * docs, and the separator contract. */
class ParagraphDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    ParagraphDedup.paragraphDedup(rows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
  }

  test("a repeated boilerplate paragraph survives only its first occurrence") {
    val out = run(
      (1L, "intro one\n\nCOOKIE BANNER\n\nbody one"),
      (2L, "COOKIE BANNER\n\nbody two"),
      (3L, "body three\n\nCOOKIE BANNER"))
    assert(out(1L) === (("intro one\n\nCOOKIE BANNER\n\nbody one", 3L, 3L)))
    assert(out(2L) === (("body two", 2L, 1L)))
    assert(out(3L) === (("body three", 2L, 1L)))
  }

  test("within-doc repeats dedup too; keep-first is by (id, position)") {
    val out = run((5L, "x\n\ny\n\nx\n\ny\n\nz"))
    assert(out(5L) === (("x\n\ny\n\nz", 5L, 3L)))
  }

  test("a fully-duplicate document reassembles to the empty string but stays present") {
    val out = run(
      (1L, "a\n\nb"),
      (2L, "a\n\nb"))
    assert(out(1L) === (("a\n\nb", 2L, 2L)))
    assert(out(2L) === (("", 2L, 0L)))
  }

  private def runBoiler(pct: Int, minDocs: Int,
      rows: (Long, String, String)*) = {
    val sess = spark
    import sess.implicits._
    ParagraphDedup.hostBoilerplateClean(
        rows.toSeq.toDF("doc_id", "text", "host"),
        "doc_id", "text", "host", pct, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
  }

  test("host boilerplate: a paragraph on every doc of a host drops in ALL occurrences; cross-host copies survive") {
    val out = runBoiler(50, 2,
      (1L, "intro one\n\nNAVBAR\n\nbody one", "a.com"),
      (2L, "NAVBAR\n\nbody two", "a.com"),
      (3L, "body three\n\nNAVBAR", "b.com"),
      (4L, "body four", "b.com"))
    // NAVBAR is on 2/2 of a.com → template there, every copy dropped
    assert(out(1L) === (("intro one\n\nbody one", 3L, 2L)))
    assert(out(2L) === (("body two", 2L, 1L)))
    // on b.com it appears ONCE — a single copy is content, not
    // template, regardless of a.com's verdict (per-host scoping)
    assert(out(3L) === (("body three\n\nNAVBAR", 2L, 2L)))
    assert(out(4L) === (("body four", 1L, 1L)))
  }

  test("host boilerplate: integer threshold boundary — n_with*100 >= n_host*pct") {
    // 1 of 3 docs = 33% < 50% → kept everywhere
    val kept = runBoiler(50, 2,
      (1L, "FOOTER\n\nx", "h"), (2L, "y", "h"), (3L, "z", "h"))
    assert(kept(1L) === (("FOOTER\n\nx", 2L, 2L)))
    // 2 of 3 docs = 66% >= 50% → dropped
    val drop = runBoiler(50, 2,
      (1L, "FOOTER\n\nx", "h"), (2L, "FOOTER\n\ny", "h"), (3L, "z", "h"))
    assert(drop(1L) === (("x", 2L, 1L)))
    assert(drop(2L) === (("y", 2L, 1L)))
  }

  test("host boilerplate: minHostDocs shields small hosts; 100% on a singleton host keeps everything") {
    val out = runBoiler(50, 2, (9L, "only\n\ndoc", "tiny.com"))
    assert(out(9L) === (("only\n\ndoc", 2L, 2L)))
  }

  test("host boilerplate: verdicts and counts are exact and repartition-independent") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1L, "NAV\n\na", "h"), (2L, "NAV\n\nb", "h"), (3L, "c", "h"))
      .toDF("doc_id", "text", "host")
    val occ = ParagraphDedup.hostBoilerplateOccurrences(
        df, "doc_id", "text", "host")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toSet
    val occ7 = ParagraphDedup.hostBoilerplateOccurrences(
        df.repartition(7), "doc_id", "text", "host")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toSet
    assert(occ === occ7)
    assert(occ === Set(
      (1L, "h", 0, "NAV", 3L, 2L, true), (1L, "h", 1, "a", 3L, 1L, false),
      (2L, "h", 0, "NAV", 3L, 2L, true), (2L, "h", 1, "b", 3L, 1L, false),
      (3L, "h", 0, "c", 3L, 1L, false)))
  }

  test("occurrence counts and flags are exact") {
    val sess = spark
    import sess.implicits._
    val occ = ParagraphDedup.paragraphOccurrences(
        Seq((1L, "p\n\nq"), (2L, "q\n\np")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(occ === Set(
      (1L, 0, "p", 2L, true), (1L, 1, "q", 2L, true),
      (2L, 0, "q", 2L, false), (2L, 1, "p", 2L, false)))
  }
}
