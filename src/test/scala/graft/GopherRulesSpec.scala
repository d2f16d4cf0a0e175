package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.ops.TextOps

/** Gopher quality rules (TextOps.gopherQualityRules): each planted
  * probe from the oracle gate trips exactly the failure mode it was
  * built for, and the zero-/edge-word documents behave per the
  * documented guards. */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: (Long, String)*): Map[Long, Row] = {
    val sess = spark
    import sess.implicits._
    TextOps.gopherQualityRules(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def rule(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("the oracle's planted probes trip exactly their named rules") {
    val out = run(graft.queries.OpsQueries.gopherPlanted: _*)
    val good = out(9000001L)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stop", "keep")
      .foreach(n => assert(rule(good, n), s"good doc fails $n"))
    assert(!rule(out(9000002L), "r_word_count"))
    assert(!rule(out(9000003L), "r_symbol_ratio"))
    assert(!rule(out(9000004L), "r_bullet"))
    assert(!rule(out(9000005L), "r_ellipsis"))
    assert(!rule(out(9000006L), "r_alpha"))
    assert(!rule(out(9000007L), "r_mean_word_len"))
    out.values.filter(_.getLong(0) != 9000001L)
      .foreach(r => assert(!rule(r, "keep")))
  }

  test("counts are exact on a hand-computed document") {
    val r = run(1L ->
      "- the list...\nof # and ## items…\nwith that be to")(1L)
    assert(r.getLong(r.fieldIndex("n_words")) === 12L)
    assert(r.getLong(r.fieldIndex("n_lines")) === 3L)
    assert(r.getLong(r.fieldIndex("n_bullet_lines")) === 1L)
    // line 1 ends "..." and line 2 ends the one-char ellipsis
    assert(r.getLong(r.fieldIndex("n_ellipsis_lines")) === 2L)
    // '#'x3 + '...'x1 + '…'x1
    assert(r.getLong(r.fieldIndex("n_symbols")) === 5L)
    // the, of, and, with, that, be, to — 7 distinct stop words
    assert(r.getLong(r.fieldIndex("n_stop_words")) === 7L)
  }

  test("whitespace-only and empty docs count zero words and fail the ratio rules") {
    val out = run(1L -> "", 2L -> "   \n  ")
    out.values.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_words")) === 0L)
      assert(!rule(r, "r_mean_word_len"))
      assert(!rule(r, "r_symbol_ratio"))
      assert(!rule(r, "r_alpha"))
      assert(!rule(r, "keep"))
    }
  }
}
