package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.SubstringDedup

/** Exact substring dedup (ops/SubstringDedup.scala): window offsets,
  * occurrence counting, keep-first ranking, interval merge, and the
  * string surgery — all against hand-computed ground truth. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("windowSpansScala: offsets cover exactly the w-token runs") {
    val t = "aa bb cc dd"
    assert(SubstringDedup.windowSpansScala(t, 2).toSeq ===
      Seq((0, 5), (3, 8), (6, 11)))
    assert(SubstringDedup.windowSpansScala(t, 4).toSeq === Seq((0, 11)))
    assert(SubstringDedup.windowSpansScala(t, 5).isEmpty)
    assert(SubstringDedup.windowSpansScala("  aa   bb ", 2).toSeq ===
      Seq((2, 9)))
    assert(SubstringDedup.windowSpansScala("", 2).isEmpty)
  }

  private def docsOf(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("duplicateWindows: cross-doc duplicate counted, keep-first by (id, start)") {
    // docs 1 and 2 share the 3-token phrase; doc 3 is clean
    val docs = docsOf(
      (1L, "alpha beta gamma delta"),
      (2L, "xx alpha beta gamma yy"),
      (3L, "nothing shared here at all"))
    val rows = SubstringDedup.duplicateWindows(docs, "doc_id", "text", w = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).toSet
    // "alpha beta gamma" at doc1 [0,16) and doc2 [3,19); w=3 windows of
    // doc1: [0,16) [6,22); doc2: [0,13) [3,19) [9,22) — only the shared
    // phrase duplicates
    assert(rows === Set(
      (1L, 0, 16, 2L, true),
      (2L, 3, 19, 2L, false)))
  }

  test("duplicateSpans: a long shared region merges to one maximal span; keeper doc has none") {
    val shared = "one two three four five six"
    val docs = docsOf(
      (1L, s"prefix-a $shared"),
      (2L, s"$shared suffix-b"))
    // w=3 → 4 duplicated windows per doc over the 6-token region,
    // overlapping → one merged span in doc 2 (doc 1 keeps: lower id)
    val spans = SubstringDedup.duplicateSpans(docs, "doc_id", "text", w = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans === Set((2L, 0, shared.length)))
  }

  test("within-doc repetition dedups too; cleaned text drops every non-first occurrence") {
    val docs = docsOf(
      (7L, "spam ham spam ham spam ham eggs"))
    // tokens at 0,5,9,14,18,23,27; w=2 windows: "spam ham"x3 at
    // [0,8) [9,17) [18,26); "ham spam"x2 at [5,13) [14,22);
    // "ham eggs" unique. Non-kept: [9,17) [18,26) [14,22) → merged [9,26)
    val spans = SubstringDedup.duplicateSpans(docs, "doc_id", "text", w = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans === Set((7L, 9, 26)))
    val cleaned = SubstringDedup.removeDuplicateSpans(
        docs, "doc_id", "text", w = 2)
      .select("doc_id", "clean_text", "n_cut_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(cleaned === Set((7L, "spam ham  eggs", 17)))
  }

  test("clean docs pass through removeDuplicateSpans untouched") {
    val docs = docsOf(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"))
    val out = SubstringDedup.removeDuplicateSpans(
        docs, "doc_id", "text", w = 2)
      .select("doc_id", "clean_text", "n_cut_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out === Set(
      (1L, "alpha beta gamma delta", 0),
      (2L, "epsilon zeta eta theta", 0)))
  }

  test("planted paragraph across docs: every non-keeper emits exactly the paragraph span") {
    val sess = spark
    import sess.implicits._
    val para = "kilo lima mike november oscar papa quebec romeo sierra tango"
    val base = (0 until 6).map(i =>
      (i.toLong, s"document body number $i with its own distinct words w$i"))
    val planted = base.map { case (id, t) =>
      if (id < 4) (id, s"$t $para") else (id, t)
    }
    val docs = planted.toDF("doc_id", "text")
    val spans = SubstringDedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val expected = (1 until 4).map { i =>
      val off = base(i)._2.length + 1
      (i.toLong, off, off + para.length)
    }.toSet
    assert(spans === expected)
  }
}
