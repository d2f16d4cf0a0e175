package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CrawlJob
import graft.model._
import graft.streaming.StreamingCrawl

/** Streaming fetch loop: per-domain state continuity across
  * micro-batches, checkpointed kill-restart, batch parity. */
class StreamingCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val cfg = CrawlConfig(sites = Seq("portal_saude_mg", "mds_parcelas"),
    years = YearSelector.Single(2024), months = MonthSelector.Multiple(Seq(1, 2, 3, 4)),
    nowYear = 2024, nowMonth = 6, maxPages = 3)

  test("two frontier waves through checkpointed streaming equal one batch run") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream").toString
    val frontierDir = s"$base/frontier"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"
    Files.createDirectories(java.nio.file.Paths.get(frontierDir))

    // batch reference: full crawl (no early-stop interference: explicit
    // month list → no pruning mode active)
    val batch = CrawlJob.run(spark, cfg)
    val entries = batch.frontier.collect()
      .sortBy(e => (e.site, e.seedSeq, e.discoverySeq))

    // wave 1 = months 1-2, wave 2 = months 3-4 (per-domain order kept:
    // seedSeq is sites-outer so each site's wave-1 seqs precede wave-2)
    val (w1, w2) = entries.partition(_.month <= 2)
    def writeWave(w: Seq[ScheduledEntry], name: String): Unit = {
      val stage = s"$base/stage-$name"
      spark.createDataset(w).repartition(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath,
        java.nio.file.Paths.get(frontierDir, s"$name.parquet"))
    }
    writeWave(w1.toSeq, "wave1")
    val q1 = StreamingCrawl.start(spark, frontierDir, outDir, ckDir,
      cfg.budget)
    q1.processAllAvailable()
    q1.stop()

    // "kill" happened: restart from the same checkpoint over a source
    // now containing wave 2 as well
    writeWave(w2.toSeq, "wave2")
    val q2 = StreamingCrawl.start(spark, frontierDir, outDir, ckDir,
      cfg.budget)
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
    val gotLog = got.select("site", "year", "month", "seq", "imageId", "url",
      "urlHash", "host", "vtimeMs", "attempts", "status")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5), r.getLong(6), r.getString(7),
        r.getLong(8), r.getInt(9), r.getString(10)))
      .sortBy(t => (t._1, t._8, t._9, t._2, t._3, t._4))
    val wantLog = batch.log.collect()
      .map(l => (l.site, l.year, l.month, l.seq, l.imageId, l.url, l.urlHash,
        l.host, l.vtimeMs, l.attempts, l.status))
      .sortBy(t => (t._1, t._8, t._9, t._2, t._3, t._4))
    assert(gotLog.length === wantLog.length)
    assert(gotLog.toSeq === wantLog.toSeq,
      "streaming outcomes differ from batch crawl")
    // payloads for successes
    val nImg = got.filter("status = 'success'").count()
    assert(nImg === batch.images.count())
  }
}
