package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, AnnOps}

/** The persisted IVF index must score exactly like the per-call IVF
  * on the same frozen quantizer: build == ivfTopK verbatim; appends
  * decompose (one append vs two appends of the same vectors give
  * identical top-k); probes prune to the probed cells' partition
  * directories. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def queries = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))
  private def cands = emb.filter(col("vec_id") >= 3)
    .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("build + topK == ivfTopK exactly (same deterministic quantizer)") {
    val dir = Files.createTempDirectory("graft-ann-idx").toString
    val m = AnnIndex.build(cands, dir, nlist = 16, iters = 2)
    assert(m.nlist === 16 && m.deltas.size === 1)
    val got = rows(AnnIndex.topK(queries, dir, k = 5, nProbe = 4))
    val want = rows(AnnOps.ivfTopK(queries, cands, k = 5,
      nlist = 16, nProbe = 4, iters = 2))
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("appends decompose: one append vs two appends score identically; replay guarded") {
    val c1 = cands.filter(col("cid") % 2 === 0)
    val c2 = cands.filter(col("cid") % 2 =!= 0)
    val c2a = c2.filter(col("cid") % 4 === 1)
    val c2b = c2.filter(col("cid") % 4 === 3)

    val dirA = Files.createTempDirectory("graft-ann-a").toString
    AnnIndex.build(c1, dirA, nlist = 16, iters = 2)
    AnnIndex.append(c2, dirA)

    val dirB = Files.createTempDirectory("graft-ann-b").toString
    AnnIndex.build(c1, dirB, nlist = 16, iters = 2)
    AnnIndex.append(c2a, dirB, runId = "w1")
    AnnIndex.append(c2b, dirB, runId = "w2")
    // same c1 → same deterministic centroids → same assignments
    assert(rows(AnnIndex.topK(queries, dirA, 5)) ===
      rows(AnnIndex.topK(queries, dirB, 5)))
    // every appended vector is reachable: a query identical to an
    // appended vector must rank it first
    val probe = c2b.limit(1).select(col("cid").as("qid"),
      col("cv").as("qv"))
    val top = AnnIndex.topK(probe, dirB, 1).collect()(0)
    assert(top.getLong(1) === top.getLong(0),
      "an appended vector must be its own nearest neighbor")
    // replayed append: no new delta
    val before = AnnIndex.readMeta(dirB).get
    assert(AnnIndex.append(c2b, dirB, runId = "w2") === before)
    assert(AnnIndex.readMeta(dirB).get.deltas.size === 3)
  }

  test("maintenance: compact is score-identical; deleted vectors stop surfacing as neighbors") {
    val dir = Files.createTempDirectory("graft-ann-maint").toString
    val c1 = cands.filter(col("cid") % 2 === 0)
    val c2 = cands.filter(col("cid") % 2 =!= 0)
    AnnIndex.build(c1, dir, nlist = 16, iters = 2)
    AnnIndex.append(c2, dir, runId = "w")
    val before = rows(AnnIndex.topK(queries, dir, 5))
    val mc = AnnIndex.compact(dir)
    assert(mc.deltas.size === 1 && mc.committedRunIds === Set("w"))
    assert(rows(AnnIndex.topK(queries, dir, 5)) === before)
    // delete every current top-1: the new top-1 differs and none of
    // the deleted cids appear anywhere in the new top-5
    val top1 = before.filter(_._4 == 1L).map(_._2).toSet
    import spark.implicits._
    AnnIndex.deleteIds(top1.toSeq.toDF("cid"), dir)
    val after = rows(AnnIndex.topK(queries, dir, 5))
    assert(after.forall(r => !top1.contains(r._2)),
      "deleted vectors still surfacing as neighbors")
    assert(after.nonEmpty)
  }

  test("probe reads only the probed cells (static partition pruning in the plan)") {
    val dir = Files.createTempDirectory("graft-ann-prune").toString
    AnnIndex.build(cands, dir, nlist = 16, iters = 2)
    val tk = AnnIndex.topK(queries, dir, 5, nProbe = 4)
    val plan = tk.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [cl"),
      s"no partition filter on the index scan:\n$plan")
    // recall sanity at this operating point (floor, like OpsSpec)
    val brute = AnnOps.bruteTopK(queries, cands, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val hits = tk.select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(brute.contains)
    assert(hits.toDouble / brute.size >= 0.4,
      s"recall@5 collapsed: $hits/${brute.size}")
  }
}
