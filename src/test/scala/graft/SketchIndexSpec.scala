package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, MultimodalOps, SketchIndex}

/** The persisted 64-bit-sketch index must equal hammingPairs64
  * exactly: probe(batch) over the indexed corpus-so-far emits the
  * same (id_a, id_b, hamming) rows the batch recompute emits among
  * pairs touching ≥1 batch id — across sequential appends, with the
  * broadcast probe plan, and through the image (decode-once) wrapper. */
class SketchIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic sketches with planted near-pairs: base sketches
    * are splitmix draws; ids in [flip lane] get a copy of an earlier
    * sketch with `bits` random bits flipped. */
  private def sketches(n: Int, offset: Long = 0L) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i + offset, graft.url.Hashing.mix(0xABCL + i))
    }.toDF("id", "sim")
  }

  private def flipped(src: org.apache.spark.sql.DataFrame, take: Int,
      idOffset: Long, bits: Int) = {
    import spark.implicits._
    src.orderBy("id").limit(take).collect().map { r =>
      var s = r.getLong(1)
      (0 until bits).foreach { b =>
        s ^= 1L << (java.lang.Math.floorMod(
          graft.url.Hashing.mix(r.getLong(0) * 31 + b), 64L)).toInt
      }
      (r.getLong(0) + idOffset, s)
    }.toSeq.toDF("id", "sim")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("incremental sketch probe == hammingPairs64 across two appends; replay guarded") {
    val dir = Files.createTempDirectory("graft-sk-idx").toString
    val corpus = sketches(400)
    val batch1 = flipped(corpus, 12, 1000000L, bits = 2) // within dist 4
    val batch2 = flipped(batch1, 5, 1000000L, bits = 1)  // dups of batch1
      .unionByName(sketches(50, offset = 3000000L))
    SketchIndex.init(dir, maxDist = 4)
    SketchIndex.append(corpus, "id", "sim", dir)

    def restrict(full: org.apache.spark.sql.DataFrame, ids: Set[Long]) =
      pairSet(full).filter(p => ids.contains(p._1) || ids.contains(p._2))

    val inc1 = pairSet(SketchIndex.probePairs(batch1, "id", "sim", dir))
    val ids1 = batch1.collect().map(_.getLong(0)).toSet
    val want1 = restrict(DedupOps.hammingPairs64(
      corpus.unionByName(batch1), "id", "sim", 4), ids1)
    assert(inc1 === want1)
    assert(inc1.size >= 12, "planted 2-bit flips must pair")

    SketchIndex.append(batch1, "id", "sim", dir, runId = "b1")
    val inc2 = pairSet(SketchIndex.probePairs(batch2, "id", "sim", dir))
    val ids2 = batch2.collect().map(_.getLong(0)).toSet
    val want2 = restrict(DedupOps.hammingPairs64(
      corpus.unionByName(batch1).unionByName(batch2), "id", "sim", 4),
      ids2)
    assert(inc2 === want2,
      s"only_inc=${inc2 -- want2} only_full=${want2 -- inc2}")
    // cross-batch dups (batch2 copies of batch1) were found
    assert(inc2.exists(p => p._1 >= 1000000L && p._1 < 2000000L &&
      p._2 >= 2000000L))

    // replayed append: no new delta, meta unchanged
    val m1 = SketchIndex.append(batch2, "id", "sim", dir, runId = "b2")
    val m2 = SketchIndex.append(batch2, "id", "sim", dir, runId = "b2")
    assert(m1 === m2 && m2.deltas.size === 3)
  }

  test("probe broadcasts the batch; index chunk rows never shuffle") {
    val dir = Files.createTempDirectory("graft-sk-idx-plan").toString
    SketchIndex.init(dir, maxDist = 4)
    SketchIndex.append(sketches(500), "id", "sim", dir)
    val probe = SketchIndex.probePairs(sketches(20, 900000L), "id",
      "sim", dir)
    val plan = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      s"batch side not broadcast:\n$plan")
    assert(plan.contains("Scan parquet"),
      s"index not read from parquet:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(chunkKey"),
      s"index shuffled on chunkKey:\n$plan")
    // determinism belongs to callers: the library probe must not bake
    // a global sort of the pair set into the plan
    assert(!plan.contains("Exchange rangepartitioning"),
      s"probe plan contains a global sort:\n$plan")
    assert(!plan.contains("Sort ["),
      s"probe plan contains a sort:\n$plan")
  }

  test("maintenance: compact preserves probes, deleteIds stops phantom pairs") {
    val dir = Files.createTempDirectory("graft-sk-maint").toString
    val c1 = sketches(200)
    val c2 = sketches(200, offset = 500000L)
    SketchIndex.init(dir, maxDist = 4)
    SketchIndex.append(c1, "id", "sim", dir, runId = "a")
    SketchIndex.append(c2, "id", "sim", dir, runId = "b")
    val batch = flipped(c1, 10, 1000000L, bits = 2)
    val before = pairSet(SketchIndex.probePairs(batch, "id", "sim", dir))
    assert(before.nonEmpty)
    val mc = SketchIndex.compact(dir)
    assert(mc.deltas.size === 1 && mc.committedRunIds === Set("a", "b"))
    assert(pairSet(SketchIndex.probePairs(batch, "id", "sim", dir))
      === before)
    // delete the flip sources: their copies stop pairing with them
    val victims = c1.orderBy("id").limit(10).select("id")
    SketchIndex.deleteIds(victims, dir)
    val vIds = victims.collect().map(_.getLong(0)).toSet
    val after = pairSet(SketchIndex.probePairs(batch, "id", "sim", dir))
    assert(after.forall(p => !vIds.contains(p._1) && !vIds.contains(p._2)))
  }

  test("image wrapper: batch decoded once, pairs match imageNearDup restricted to the batch") {
    import spark.implicits._
    // tiny synthetic gray images: base gradient + per-image bias;
    // copies get ±1 pixel noise (dHash-stable)
    def img(key: Int, noise: Boolean): Array[Byte] = {
      val w = 24; val h = 24
      val px = new Array[Byte](w * h)
      var i = 0
      while (i < px.length) {
        val base = ((i % w) * 8 + (key % 7) * 3) % 256
        val n = if (noise)
          (java.lang.Math.floorMod(
            graft.url.Hashing.mix(key * 131L + i), 3L) - 1).toInt
        else 0
        px(i) = math.max(0, math.min(255, base + n)).toByte
        i += 1
      }
      graft.fetch.ImageCodec.encode(px, w, h, "png")
    }
    val corpus = (0 until 12)
      .map(k => (s"img-$k", img(k, noise = false)))
      .toDF("image_id", "bytes")
    val batch = (0 until 5)
      .map(k => (s"new-$k", img(k, noise = true)))
      .toDF("image_id", "bytes")
    val dir = Files.createTempDirectory("graft-sk-idx-img").toString
    SketchIndex.init(dir, maxDist = 4)
    MultimodalOps.imageIndexAppend(corpus, "image_id", "bytes", dir)
    val got = MultimodalOps
      .imageIndexProbe(batch, "image_id", "bytes", dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    val bIds = (0 until 5).map(k => s"new-$k").toSet
    val want = MultimodalOps.imageNearDup(corpus.unionByName(batch),
        "image_id", "bytes", maxDist = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .filter(p => bIds.contains(p._1) || bIds.contains(p._2)).toSet
    assert(got === want)
    assert((0 until 5).forall(k =>
      got.exists(p => p._2 == s"new-$k" || p._1 == s"new-$k")),
      s"every noised copy must pair with its original: $got")
  }
}
