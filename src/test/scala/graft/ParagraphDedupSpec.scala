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
