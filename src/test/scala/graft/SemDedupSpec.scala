package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.SemDedup

/** SemDeDup (ops/SemDedup.scala): within-cluster cosine pairs and
  * keep-first survivors over a constructed embedding corpus whose
  * ground truth does not depend on where the quantizer puts its
  * centroids — duplicate groups are EXACT vector copies (identical
  * vectors get identical cell assignments under any centroid outcome),
  * and distinct groups are orthogonal (cosine 0 can never pass a
  * positive threshold even when two groups share a cell). */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 4 orthogonal base directions in R^8, 3 exact copies each (ids
  // g*10, g*10+1, g*10+2) plus 4 singletons on mixed directions
  private def corpus = {
    val sess = spark
    import sess.implicits._
    val groups = for {
      g <- 0 until 4
      c <- 0 until 3
    } yield {
      val v = Array.fill(8)(0f); v(g) = 1f + g * 0.25f
      (g * 10L + c, v.toSeq)
    }
    val singles = for (s <- 0 until 4) yield {
      val v = Array.fill(8)(0.1f * (s + 1)); v(4 + s) = 2f
      (100L + s, v.toSeq)
    }
    (groups ++ singles).toDF("id", "vec")
  }

  test("exact-copy groups pair up within their cell; orthogonal groups never pair") {
    val pairs = SemDedup.semanticPairs(corpus, "id", "vec",
      threshold = 0.999, nlist = 4, iters = 2).collect()
    val got = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      g <- 0 until 4
      a <- 0 until 3; b <- (a + 1) until 3
    } yield (g * 10L + a, g * 10L + b)).toSet
    assert(got === expected, s"pairs mismatch: got $got")
    // every emitted cosine is the exact-copy value 1.0
    pairs.foreach(r => assert(r.getDouble(3) === 1.0))
  }

  test("survivors keep exactly the lowest id per duplicate group plus all singletons") {
    val docs = corpus.select(col("id"), col("vec"))
    val surv = SemDedup.semanticDedup(docs, "id", corpus, "id", "vec",
        threshold = 0.999, nlist = 4, iters = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val expected = Set(0L, 10L, 20L, 30L, 100L, 101L, 102L, 103L)
    assert(surv === expected)
  }

  test("the pair plan joins on the cell key - no cartesian product") {
    val plan = SemDedup.semanticPairs(corpus, "id", "vec",
      threshold = 0.9, nlist = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semanticPairs planned a cartesian product:\n$plan")
  }

  test("incremental probe equals the frozen-core recompute on batch-touching pairs") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semidx-spec").toString
    val base = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    graft.ops.AnnIndex.build(base, dir, nlist = 4, iters = 2)
    // batch: one copy of group 0's vector, one copy of group 2's, and
    // a within-batch duplicate pair on group 3's direction
    val batch = base.filter($"cid".isin(0L, 20L))
      .withColumn("cid", $"cid" + 1000L)
      .unionByName(base.filter($"cid" === 30L)
        .withColumn("cid", $"cid" + 2000L))
      .unionByName(base.filter($"cid" === 30L)
        .withColumn("cid", $"cid" + 3000L))
    val probe = graft.ops.AnnIndex.probePairs(batch, dir,
        threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val frozen = graft.ops.AnnIndex.readCentroids(spark, dir)
    val full = SemDedup.semanticPairsFrozen(
        base.unionByName(batch), frozen, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchIds = Set(1000L, 1020L, 2030L, 3030L)
    val expected = full.filter(p =>
      batchIds(p._1) || batchIds(p._2))
    assert(probe === expected)
    // the planted copies are all found: cross pairs to every group
    // member, and the within-batch duplicate pair
    assert(probe.contains((0L, 1000L)) && probe.contains((20L, 1020L)))
    assert(probe.contains((2030L, 3030L)))
  }

  test("probe on an emptied index returns only within-batch pairs") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-semidx-empty").toString
    val base = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    graft.ops.AnnIndex.build(base, dir, nlist = 4, iters = 2)
    graft.ops.AnnIndex.deleteIds(base.select($"cid"), dir)
    val batch = base.filter($"cid".isin(0L, 1L, 10L))
      .withColumn("cid", $"cid" + 1000L)
    val probe = graft.ops.AnnIndex.probePairs(batch, dir,
        threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe === Set((1000L, 1001L)))
  }

  test("streaming semanticIndexBatch: cross-batch pairs found, replays never re-append, deltas bounded") {
    val sess = spark
    import sess.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-semidx-stream").toString
    val (idx, pp) = (s"$root/idx", s"$root/pairs")
    val base = corpus.select(col("id").as("cid"), col("vec").as("cv"))
    graft.ops.AnnIndex.build(base, idx, nlist = 4, iters = 2)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Seq[Float])](
      org.apache.spark.sql.Encoders.product[(Long, Seq[Float])], spark)
    val q = in.toDF().toDF("cid", "cv")
      .writeStream
      .foreachBatch(graft.streaming.StreamingCrawl.semanticIndexBatch(
        idx, pp, "s", threshold = 0.999, compactEvery = 3) _)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    try {
      // batch 0: copies of ids 0 and 20 — cross pairs vs the index
      in.addData((1000L, rows.find(_._1 == 0L).get._2),
        (1020L, rows.find(_._1 == 20L).get._2))
      q.processAllAvailable()
      // batches 1-4: copies of id 10 — each pairs with the index AND
      // with every EARLIER streamed copy (the index grew)
      (1 to 4).foreach { i =>
        in.addData((2000L + i, rows.find(_._1 == 10L).get._2))
        q.processAllAvailable()
      }
    } finally q.stop()
    val b0 = spark.read.parquet(s"$pp/batch-0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b0.contains((0L, 1000L)) && b0.contains((20L, 1020L)))
    // batch 4's copy pairs with the three earlier streamed copies too
    val b4 = spark.read.parquet(s"$pp/batch-4")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((2001L, 2004L), (2002L, 2004L), (2003L, 2004L))
      .subsetOf(b4), s"missing cross-batch streamed pairs: $b4")
    // compactEvery bounds the delta chain
    val m = graft.ops.AnnIndex.readMeta(idx).get
    assert(m.deltas.size <= 3, s"deltas unbounded: ${m.deltas}")
    // replay: identical pairs, no new delta, no doubled runId
    graft.streaming.StreamingCrawl.semanticIndexBatch(
      idx, pp, "s", threshold = 0.999)(
      Seq((2004L, rows.find(_._1 == 10L).get._2)).toDF("cid", "cv"), 4L)
    assert(graft.ops.AnnIndex.readMeta(idx).get === m)
    assert(spark.read.parquet(s"$pp/batch-4")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === b4)
  }

  test("threshold gates the pair set: nothing at a threshold above exact-copy cosine") {
    // cosine is rounded to 6 dp; exact copies score 1.0, so a
    // threshold just above 1 yields the empty set
    val n = SemDedup.semanticPairs(corpus, "id", "vec",
      threshold = 1.000001, nlist = 4).count()
    assert(n === 0L)
  }
}
