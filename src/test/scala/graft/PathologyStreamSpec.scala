package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PathologyStream
import graft.streaming.PathologyStream.{PageEvent, TrapUpdate}

/** Streaming trap detection (streaming/PathologyStream.scala):
  * cross-batch KMV accumulation, exact distinct counts below k,
  * sound (never-raised) flags under saturation, and parity of the
  * final per-host rows with the batch trapHosts aggregation. */
class PathologyStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def memStream() = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    MemoryStream[PageEvent](
      org.apache.spark.sql.Encoders.product[PageEvent], spark)
  }

  private def run(batches: Seq[Seq[PageEvent]], k: Int,
      minUrls: Long = 5L, dupFactor: Long = 4L): Seq[Seq[TrapUpdate]] = {
    val sess = spark
    import sess.implicits._
    val in = memStream()
    val name = s"trap_updates_${System.nanoTime()}"
    val q = PathologyStream.trapUpdates(in.toDS(), k, minUrls, dupFactor)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.map { b =>
        in.addData(b)
        q.processAllAvailable()
        spark.table(name).as[TrapUpdate].collect().toSeq
      }
    } finally q.stop()
  }

  test("trap state accumulates across micro-batches and matches batch trapHosts") {
    val sess = spark
    import sess.implicits._
    // trap.test repeats one content across 6 urls; ok.test is diverse
    val batches = Seq(
      (0 until 3).map(i => PageEvent("trap.test", "same", i.toLong)) ++
        (0 until 3).map(i => PageEvent("ok.test", s"c$i", 1L)),
      (3 until 6).map(i => PageEvent("trap.test", "same", i.toLong)) ++
        (3 until 6).map(i => PageEvent("ok.test", s"c$i", 1L)))
    val perBatch = run(batches, k = 64)
    // batch 1: trap.test has 3 urls < minUrls → not yet flagged
    val b1 = perBatch(0).map(u => u.host -> u).toMap
    assert(!b1("trap.test").isTrap && !b1("ok.test").isTrap)
    assert(b1("trap.test").nDistinctMin == 1L)
    // batch 2: cumulative 6 urls, 1 distinct → flagged; ok.test never
    val last = perBatch(1).zipWithIndex
      .groupBy(_._1.host).map { case (h, rs) => h -> rs.maxBy(_._2)._1 }
    assert(last("trap.test").isTrap)
    assert(last("trap.test").nUrls == 6L &&
      last("trap.test").nDistinctMin == 1L &&
      last("trap.test").maxDepth == 5L)
    assert(!last("ok.test").isTrap &&
      last("ok.test").nDistinctMin == 6L)
    // parity with the batch aggregation over the union of all batches
    val urls = batches.flatten.zipWithIndex.map { case (e, i) =>
      (s"http://${e.host}${"/x" * e.depth.toInt}/p$i", e.contentHash)
    }.toDF("url", "content_hash")
    val want = graft.frontier.DustDetect.trapHosts(urls, 5L, 4L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    last.foreach { case (h, u) =>
      assert((u.nUrls, u.nDistinctMin, u.isTrap) == want(h),
        s"host $h streaming ${(u.nUrls, u.nDistinctMin, u.isTrap)} " +
          s"!= batch ${want(h)}")
    }
  }

  test("saturation bounds state and never raises the flag on an uncertain count") {
    // 12 distinct contents through a k=4 sketch: the state holds 4
    // minima, the count reports >=4 saturated, and isTrap stays false
    // even though 4 * dupFactor <= nUrls would arithmetically 'flag'
    val batches = Seq((0 until 12).map(i =>
      PageEvent("big.test", s"c$i", 1L)))
    val u = run(batches, k = 4, minUrls = 5L, dupFactor = 4L)
      .last.last
    assert(u.saturated && u.nDistinctMin == 4L && u.nUrls == 12L)
    assert(!u.isTrap,
      "a saturated (lower-bound) count must never raise the trap flag")
  }

  test("kmv dedups repeats and keeps exact counts below k regardless of batch split") {
    val all = (0 until 10).map(i =>
      PageEvent("h.test", s"c${i % 5}", 1L))
    val oneShot = run(Seq(all), k = 64, dupFactor = 2L).last.last
    val split = run(all.grouped(3).toSeq, k = 64, dupFactor = 2L).last
      .zipWithIndex.maxBy(_._2)._1
    assert(oneShot.nDistinctMin == 5L && split.nDistinctMin == 5L)
    assert(oneShot.nUrls == 10L && split.nUrls == 10L)
    // 5 distinct over 10 urls clears 5·2 <= 10 exactly
    assert(oneShot.isTrap && split.isTrap)
  }
}
