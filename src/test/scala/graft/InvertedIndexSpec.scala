package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.InvertedIndex

/** Inverted-index build (ops/InvertedIndex.scala): exact postings on
  * a tiny corpus, dictionary counters vs the capped sample, and the
  * lowest-id determinism of the sample. */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def dicts(cap: Int, rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    InvertedIndex.dictionary(rows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", cap)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
  }

  test("postings are exact: one row per (term, doc), tf and first position") {
    val sess = spark
    import sess.implicits._
    val p = InvertedIndex.postings(
        Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(p === Set(("a", 1L, 2L, 0L), ("b", 1L, 1L, 1L),
      ("b", 2L, 1L, 0L), ("c", 2L, 1L, 1L)))
  }

  test("dictionary counts every posting; the sample is capped") {
    val docsRows = (0L until 20L).map(i => (i, "x filler" + i))
    val out = dicts(5, docsRows: _*)
    assert(out("x") === ((20L, 20L, "0,1,2,3,4")))
  }

  test("the sample is the LOWEST doc ids, not arrival order") {
    val out = dicts(2, (9L, "t"), (3L, "t"), (5L, "t"))
    assert(out("t") === ((3L, 3L, "3,5")))
  }

  test("tf_total sums in-document frequencies across the corpus") {
    val out = dicts(10, (1L, "w w w"), (2L, "w"))
    assert(out("w") === ((2L, 4L, "1,2")))
  }

  test("phrase top-k: consecutive positions only, every occurrence counted, count-desc/doc-asc rank") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, "x table hash y table hash"), // 2 matches
      (2L, "table y hash"), // not consecutive → 0
      (3L, "table hash"), // 1 match
      (4L, "hash table") // wrong order → 0
    ).toDF("doc_id", "text")
    val r = InvertedIndex
      .phraseTopK(docs, "doc_id", "text", Seq("table", "hash"), 10)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1, 1L, 2L), (2, 3L, 1L)))
  }

  test("phrase top-k: a repeated phrase term matches overlapping occurrences") {
    val sess = spark
    import sess.implicits._
    // "a a a" contains "a a" at starts 0 and 1 — each offset filters
    // independently, so repeats need no special casing
    val docs = Seq((9L, "a a a")).toDF("doc_id", "text")
    val r = InvertedIndex
      .phraseTopK(docs, "doc_id", "text", Seq("a", "a"), 5)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1, 9L, 2L)))
  }
}
