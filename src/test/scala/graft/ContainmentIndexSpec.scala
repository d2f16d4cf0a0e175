package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{ContainmentIndex, DedupOps}

/** Lifecycle pins for the persisted containment index: the DuckDB
  * gate (`containment_index_parity`) proves probe == frozen-universe
  * recompute on real data; these pin the mechanics the gate can't
  * isolate — append/probe against BOTH corpus and earlier batches,
  * compact folding, deleteIds phantom-pair removal, replay
  * idempotence, and the frozen stop set actually pruning. */
class ContainmentIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft-contidx").toString

  private val longToks = (0 until 60).map(i => s"tok$i")

  test("build + probe: snippet batch pairs with its host, exact counts") {
    val corpus = Seq(
      (1L, longToks.mkString(" ")),
      (3L, (0 until 30).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = tmp()
    ContainmentIndex.build(corpus, "doc_id", "text", dir)
    val batch = Seq((10L, longToks.slice(20, 30).mkString(" ")))
      .toDF("doc_id", "text")
    val out = ContainmentIndex.probePairs(batch, "doc_id", "text", dir)
      .collect()
    assert(out.length === 1)
    val p = out.head
    assert(p.getLong(0) === 1L && p.getLong(1) === 10L)
    assert(p.getAs[Long]("shared") === 7L)
    assert(p.getAs[Long]("size_a") === 57L)
    assert(p.getAs[Long]("size_b") === 7L)
    assert(p.getAs[Long]("cont_x1000") === 1000L)
    // probe equals the batch op over corpus ∪ batch (no cap crossings
    // here, so frozen == unfrozen), restricted to batch pairs
    val ref = DedupOps.containmentPairs(corpus.unionByName(batch),
      "doc_id", "text").collect()
      .filter(r => r.getLong(0) == 10L || r.getLong(1) == 10L)
    assert(ref.map(_.toSeq).toSet === out.map(_.toSeq).toSet)
  }

  test("append: later batches pair against corpus AND earlier batches; replay is idempotent") {
    val corpus = Seq((1L, longToks.mkString(" "))).toDF("doc_id", "text")
    val dir = tmp()
    ContainmentIndex.build(corpus, "doc_id", "text", dir)
    val b1 = Seq((10L, longToks.slice(0, 12).mkString(" ")))
      .toDF("doc_id", "text")
    val m1 = ContainmentIndex.append(b1, "doc_id", "text", dir, "run-1")
    assert(m1.docs === 2L)
    // replaying the same runId is a no-op
    val m1b = ContainmentIndex.append(b1, "doc_id", "text", dir, "run-1")
    assert(m1b.docs === 2L && m1b.deltas === m1.deltas)
    // a second batch overlapping BOTH doc 1 and batch-1 doc 10
    val b2 = Seq((20L, longToks.slice(2, 10).mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = ContainmentIndex.probePairs(b2, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 20L), (10L, 20L)))
  }

  test("compact folds deltas; deleteIds removes phantom pairs") {
    val corpus = Seq((1L, longToks.mkString(" "))).toDF("doc_id", "text")
    val dir = tmp()
    ContainmentIndex.build(corpus, "doc_id", "text", dir)
    ContainmentIndex.append(
      Seq((10L, longToks.slice(0, 12).mkString(" ")))
        .toDF("doc_id", "text"), "doc_id", "text", dir)
    val b2 = Seq((20L, longToks.slice(2, 10).mkString(" ")))
      .toDF("doc_id", "text")
    val before = ContainmentIndex.probePairs(b2, "doc_id", "text", dir)
      .collect().map(_.toSeq).toSet
    val mc = ContainmentIndex.compact(dir)
    assert(mc.deltas.size === 1)
    val after = ContainmentIndex.probePairs(b2, "doc_id", "text", dir)
      .collect().map(_.toSeq).toSet
    assert(after === before, "compact must not change probe results")
    // delete doc 10: its pair disappears, doc 1's stays
    ContainmentIndex.deleteIds(Seq(10L).toDF("id"), dir)
    val post = ContainmentIndex.probePairs(b2, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(post === Set((1L, 20L)))
  }

  test("streaming sink: cross-batch snippet pairs, replay idempotence, bounded deltas") {
    val root = tmp()
    val (idx, pp) = (s"$root/idx", s"$root/pairs")
    ContainmentIndex.init(idx)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark)
    val q = in.toDF().toDF("id", "text")
      .writeStream
      .foreachBatch(graft.streaming.StreamingCrawl.containmentIndexBatch(
        idx, pp, "c", compactEvery = 2) _)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    val host = longToks.mkString(" ")
    val other = (100 until 140).map(i => s"z$i").mkString(" ")
    try {
      in.addData((1L, host), (2L, other)) // batch 0
      q.processAllAvailable()
      in.addData((10L, (200 until 230).map(i => s"y$i").mkString(" ")))
      q.processAllAvailable() // batch 1: unrelated
      in.addData((20L, longToks.slice(20, 30).mkString(" ")))
      q.processAllAvailable() // batch 2: snippet of batch-0 doc 1
    } finally q.stop()
    val p2 = spark.read.parquet(s"$pp/batch-2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 === Set((1L, 20L)), s"batch-2 pairs: $p2")
    // at-least-once replay of batch 2 is a no-op on the index
    val mBefore = ContainmentIndex.readMeta(idx).get
    graft.streaming.StreamingCrawl.containmentIndexBatch(
      idx, pp, "c", compactEvery = 2)(
      Seq((20L, longToks.slice(20, 30).mkString(" ")))
        .toDF("id", "text"), 2L)
    assert(ContainmentIndex.readMeta(idx).get === mBefore)
    // compactEvery = 2 keeps the delta chain bounded
    assert(mBefore.deltas.size <= 2, s"deltas: ${mBefore.deltas}")
  }

  test("dfGuard: grams that crossed the cap AFTER build cannot fan the joins out") {
    // the shared gram's df is 40 at build (under the 64 cap → not
    // frozen) but 70 once the batch arrives — without the guard every
    // batch doc pairs every corpus doc through it
    val corpus = (0 until 40)
      .map(i => (i.toLong, s"aa bb cc dd u$i v$i w$i"))
      .toDF("doc_id", "text")
    val dir = tmp()
    ContainmentIndex.build(corpus, "doc_id", "text", dir, minSize = 1)
    val batch = (0 until 30).map(i => (100L + i, "aa bb cc dd"))
      .toDF("doc_id", "text")
    val unguarded = ContainmentIndex.probePairs(batch, "doc_id",
      "text", dir).count()
    assert(unguarded > 1000L, s"unguarded fan-out expected: $unguarded")
    val guarded = ContainmentIndex.probePairs(batch, "doc_id", "text",
      dir, dfGuard = true).collect()
    assert(guarded.isEmpty, s"guard must exclude the crossing " +
      s"gram from pairing: ${guarded.length}")
  }

  test("frozen stop set prunes: a gram over the cap at build never pairs") {
    // 70 corpus docs share one gram → df 70 > 64 → frozen stop
    val corpus = (0 until 70)
      .map(i => (i.toLong, s"aa bb cc dd uniq$i"))
      .toDF("doc_id", "text")
    val dir = tmp()
    ContainmentIndex.build(corpus, "doc_id", "text", dir,
      minSize = 1)
    val batch = Seq((100L, "aa bb cc dd")).toDF("doc_id", "text")
    val out = ContainmentIndex.probePairs(batch, "doc_id", "text", dir)
      .collect()
    assert(out.isEmpty,
      s"stop gram must not pair the batch with 70 docs: ${out.toSeq}")
  }
}
