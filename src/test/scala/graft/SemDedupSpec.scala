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

  test("threshold gates the pair set: nothing at a threshold above exact-copy cosine") {
    // cosine is rounded to 6 dp; exact copies score 1.0, so a
    // threshold just above 1 yields the empty set
    val n = SemDedup.semanticPairs(corpus, "id", "vec",
      threshold = 1.000001, nlist = 4).count()
    assert(n === 0L)
  }
}
