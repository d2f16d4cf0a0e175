package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.RecrawlSchedule

/** Recrawl scheduling (frontier/RecrawlSchedule.scala): the integer
  * Cho-style estimator on hand-computed histories — change counting,
  * span division, both clamps, and the single-fetch default. */
class RecrawlScheduleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val MinUs = 3600L * 1000000
  private val MaxUs = 7L * 24 * 3600 * 1000000

  private def run(rows: (Long, Long, String)*) = {
    val sess = spark
    import sess.implicits._
    RecrawlSchedule.schedule(rows.toSeq.toDF("url", "ts_us", "ch"),
        "url", "ts_us", "ch")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))).toMap
  }

  test("a page that changed every fetch refetches at its observed cadence") {
    val day = 24L * 3600 * 1000000
    // 3 fetches a day apart, every fetch a new hash: span 2d, 2
    // changes -> interval 2d/3 (within clamps)
    val out = run((1L, 0L, "a"), (1L, day, "b"), (1L, 2 * day, "c"))
    val (n, chg, interval, next) = out(1L)
    assert((n, chg) === ((3L, 2L)))
    assert(interval === 2 * day / 3)
    assert(next === 2 * day + 2 * day / 3)
  }

  test("a never-changing page backs off: interval = full span, clamped to max") {
    val day = 24L * 3600 * 1000000
    val out = run((2L, 0L, "same"), (2L, 10 * day, "same"))
    assert(out(2L) === ((2L, 0L, MaxUs, 10 * day + MaxUs)))
  }

  test("a rapidly-polled page clamps to the minimum interval") {
    // fetches 1s apart, all changed: raw interval < 1h -> min clamp
    val out = run((3L, 0L, "x"), (3L, 1000000L, "y"),
      (3L, 2000000L, "z"))
    assert(out(3L) === ((3L, 2L, MinUs, 2000000L + MinUs)))
  }

  test("single-fetch urls get the max interval (no evidence yet)") {
    val out = run((4L, 5000000L, "only"))
    assert(out(4L) === ((1L, 0L, MaxUs, 5000000L + MaxUs)))
  }

  test("one url-key exchange feeds both the lag window and the rollup") {
    val sess = spark
    import sess.implicits._
    val p = RecrawlSchedule.schedule(
        Seq((1L, 0L, "a"), (1L, 5L, "b")).toDF("url", "ts_us", "ch"),
        "url", "ts_us", "ch")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val ex = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") ||
        l.trim.startsWith("Arguments: hashpartitioning")).toSeq
    assert(ex.size <= 1, s"expected <=1 hash exchange:\n$p")
  }
}
