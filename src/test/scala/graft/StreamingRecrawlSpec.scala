package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RecrawlStream
import graft.streaming.RecrawlStream.{FetchEvent, ScheduleUpdate}

/** Streaming recrawl scheduling (streaming/RecrawlStream.scala):
  * cross-batch state accumulation, per-batch emission of only touched
  * URLs, and exact parity of the final schedules with the batch
  * estimator over the same full history. */
class StreamingRecrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val day = 24L * 3600 * 1000000

  private def memStream() = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    MemoryStream[FetchEvent](
      org.apache.spark.sql.Encoders.product[FetchEvent], spark)
  }

  test("schedules accumulate across micro-batches and match the batch estimator") {
    val sess = spark
    import sess.implicits._
    val batches = Seq(
      Seq(FetchEvent("a", 0L, "x"), FetchEvent("b", 0L, "p")),
      Seq(FetchEvent("a", day, "y"), FetchEvent("c", 5L, "q")),
      Seq(FetchEvent("a", 2 * day, "z"), FetchEvent("b", 10 * day, "p")))
    val in = memStream()
    val q = RecrawlStream.scheduleUpdates(in.toDS())
      .writeStream.format("memory").queryName("recrawl_updates")
      .outputMode("append").start()
    val perBatch = try {
      batches.map { b =>
        in.addData(b)
        q.processAllAvailable()
        spark.table("recrawl_updates").as[ScheduleUpdate].collect().toSeq
      }
    } finally q.stop()
    // batch 1 emitted updates for a+b only; batch 2 added a+c; the
    // cumulative table grows by exactly the touched-url count
    assert(perBatch(0).map(_.url).sorted === Seq("a", "b"))
    assert(perBatch(1).size - perBatch(0).size === 2)
    assert(perBatch(2).size - perBatch(1).size === 2)
    // the LAST update per url must equal the batch estimator over the
    // union of all three micro-batches
    val finalByUrl = perBatch(2).zipWithIndex
      .groupBy(_._1.url).map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    val history = batches.flatten
      .map(e => (e.url, e.tsUs, e.hash)).toDF("url", "ts_us", "ch")
    val want = graft.frontier.RecrawlSchedule
      .schedule(history, "url", "ts_us", "ch")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(finalByUrl.keySet === want.keySet)
    finalByUrl.foreach { case (u, s) =>
      assert((s.nFetches, s.nChanges, s.firstUs, s.lastUs,
        s.intervalUs, s.nextFetchUs) === want(u),
        s"url $u: streaming ${s} vs batch ${want(u)}")
    }
  }

  test("a change across a batch boundary counts: the state keeps the last hash") {
    // drive the handler directly through the GroupState shim below
    var st: Option[RecrawlStream.UrlFetchState] = None
    val out1 = applyHandler(st, Seq(FetchEvent("u", 0L, "h1")))
    st = out1._2
    val out2 = applyHandler(st, Seq(FetchEvent("u", day, "h2")))
    val upd = out2._1.head
    assert(upd.nChanges === 1L, "cross-batch hash diff must count as a change")
    assert(upd.nFetches === 2L)
    assert(upd.intervalUs === day / 2)
  }

  /** Minimal GroupState shim so handleUrl is testable without a
    * streaming query. */
  private def applyHandler(prev: Option[RecrawlStream.UrlFetchState],
      events: Seq[FetchEvent])
      : (Seq[ScheduleUpdate], Option[RecrawlStream.UrlFetchState]) = {
    var updated: Option[RecrawlStream.UrlFetchState] = prev
    val gs = new org.apache.spark.sql.streaming.GroupState[
        RecrawlStream.UrlFetchState] {
      def exists: Boolean = updated.isDefined
      def get: RecrawlStream.UrlFetchState = updated.get
      def getOption: Option[RecrawlStream.UrlFetchState] = updated
      def update(s: RecrawlStream.UrlFetchState): Unit =
        updated = Some(s)
      def remove(): Unit = updated = None
      def hasTimedOut: Boolean = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    val out = RecrawlStream.handleUrl(3600L * 1000000,
      7L * 24 * 3600 * 1000000)("u", events.iterator, gs).toSeq
    (out, updated)
  }
}
