package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Duplicate-cluster resolution: connectedComponents (alternating
  * large-star/small-star) checked against a driver-side union-find on
  * randomized graphs, long-chain convergence, and survivor selection
  * composed with a real near-dup pair family. */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference union-find over the same edges, driver-side. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id of the component
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  /** Run `body` with the distributed star loop forced (local-path
    * threshold 0), restoring the default after. */
  private def forceDistributed[T](body: => T): T = {
    spark.conf.set("spark.graft.dedup.cc.localThreshold", "0")
    try body
    finally spark.conf.unset("spark.graft.dedup.cc.localThreshold")
  }

  /** Deterministic sparse random graph over `n` nodes: a mix of
    * singletons, small trees, and one giant component. */
  private def randomEdges(n: Int): Seq[(Long, Long)] =
    (0 until (n * 7 / 10)).map { i =>
      val h = graft.url.Hashing.mix(i.toLong, 0xC1C1E5L)
      val a = java.lang.Long.remainderUnsigned(h, n.toLong)
      val b = java.lang.Long.remainderUnsigned(
        graft.url.Hashing.mix(h, 0xBEEFL), n.toLong)
      (a, b)
    }.filter(e => e._1 != e._2)

  test("connectedComponents (both paths) matches union-find on a random graph") {
    val n = 400
    val edges = randomEdges(n)
    val expected = unionFind(n, edges)
    val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val localGot = DedupOps
      .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val distGot = forceDistributed {
      DedupOps
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    }
    for ((name, got) <- Seq("local" -> localGot, "distributed" -> distGot)) {
      assert(got.keySet === touched, s"$name domain = nodes with >=1 edge")
      touched.foreach { v =>
        assert(got(v) === expected(v), s"$name: node $v component mismatch")
      }
    }
  }

  test("a 512-node chain converges to one component in O(log n) rounds") {
    val edges = (0L until 511L).map(i => (i, i + 1))
    val got = forceDistributed {
      DedupOps
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b",
          maxIter = 12) // 2 alternating rounds per iter: log-round bound
        .as[(Long, Long)].collect()
    }
    assert(got.length === 512)
    assert(got.forall(_._2 == 0L), "all chain nodes label to the head")
  }

  test("empty pair list yields an empty component map") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupOps.connectedComponents(empty, "id_a", "id_b").count() === 0L)
  }

  test("string ids resolve exactly in both paths (no silent long cast)") {
    // regression: cast("long") nulled string ids and dropped every
    // edge, turning survivor selection into a no-op for image_id keys
    val edges = Seq(("img-b", "img-a"), ("img-b", "img-c"),
      ("img-x", "img-y")).toDF("id_a", "id_b")
    val expected = Map("img-a" -> "img-a", "img-b" -> "img-a",
      "img-c" -> "img-a", "img-x" -> "img-x", "img-y" -> "img-x")
    val localGot = DedupOps.connectedComponents(edges, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    val distGot = forceDistributed {
      DedupOps.connectedComponents(edges, "id_a", "id_b")
        .as[(String, String)].collect().toMap
    }
    assert(localGot === expected)
    assert(distGot === expected)
    val docs = expected.keySet.toSeq.sorted.map(id => (id, s"payload-$id"))
      .toDF("image_id", "caption")
    val kept = DedupOps
      .dedupSurvivors(docs, "image_id", edges)
      .select("image_id").as[String].collect().toSet
    assert(kept === Set("img-a", "img-x"))
  }

  test("an exhausted star loop throws instead of mislabeling") {
    // a 64-node chain cannot converge in one round; truncating there
    // must be an error, not a silently wrong component map
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      forceDistributed {
        DedupOps.connectedComponents(edges, "id_a", "id_b", maxIter = 1)
          .count()
      }
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupSurvivors keeps cluster minima plus unpaired docs") {
    val docs = (0L until 10L).map(i => (i, s"doc$i")).toDF("id", "text")
    // clusters {0,1,2} (via chain 0-1, 1-2) and {5,7}; 3,4,6,8,9 unpaired
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 7L)).toDF("id_a", "id_b")
    val kept = DedupOps.dedupSurvivors(docs, "id", pairs)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 3L, 4L, 5L, 6L, 8L, 9L))
  }

  test("imageDedupSurvivors drops perceptual copies, keeps originals") {
    import graft.fetch.ImageCodec
    import graft.ops.MultimodalOps
    val w = 120; val h = 90
    val rows = (0 until 12).map { i =>
      val px = ImageCodec.synthPixels(i * 7919L + 13, w, h)
      (i.toLong, ImageCodec.encode(px, w, h, Seq("png", "jpeg")(i % 2)))
    }
    // two perceptual variants per original: ±2 noise re-encoded jpeg,
    // and a brightness shift — a CHAIN when the variants pair with the
    // original but not each other
    val variants = rows.take(6).flatMap { case (id, bytes) =>
      val (iw, ih, px) = ImageCodec.decode(bytes)
      val noisy = px.zipWithIndex.map { case (b, i) =>
        val n = java.lang.Math.floorMod(
          graft.url.Hashing.mix(id * 31L + i), 5L).toInt - 2
        math.max(0, math.min(255, (b & 0xff) + n)).toByte
      }
      val brighter = px.map(b => math.min(255, (b & 0xff) + 10).toByte)
      Seq((id + 1000000L, ImageCodec.encode(noisy, iw, ih, "jpeg")),
        (id + 2000000L, ImageCodec.encode(brighter, iw, ih, "png")))
    }
    val df = (rows ++ variants).toDF("rid", "bytes")
    val kept = MultimodalOps.imageDedupSurvivors(df, "rid", "bytes")
      .select("rid").as[Long].collect().toSet
    (0 until 6).foreach { i =>
      assert(kept.contains(i.toLong), s"original $i dropped")
      assert(!kept.contains(i + 1000000L) && !kept.contains(i + 2000000L),
        s"variant of $i survived")
    }
    (6 until 12).foreach(i =>
      assert(kept.contains(i.toLong), s"unpaired $i dropped"))
  }

  test("survivor selection is transitive over minhash near-dup pairs") {
    val sf = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    // plant a 3-hop chain per source doc: A ~ A' ~ A'' where each step
    // appends one token — A vs A'' may or may not pair directly, but
    // the CLUSTER must contain all three via transitivity
    val hop1 = base.orderBy("doc_id").limit(10)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .withColumn("text", concat(col("text"), lit(" copia uno")))
    val hop2 = base.orderBy("doc_id").limit(10)
      .withColumn("doc_id", col("doc_id") + lit(2000000L))
      .withColumn("text", concat(col("text"), lit(" copia uno copia dos")))
    val corpus = base.unionByName(hop1).unionByName(hop2)
    val pairs = DedupOps.minhashPairs(corpus, "doc_id", "text",
      threshold = 0.5)
    val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { i =>
      assert(comp.get(i + 1000000L).contains(comp(i)) &&
        comp.get(i + 2000000L).contains(comp(i)),
        s"planted chain for doc $i not in one cluster")
    }
    // and the survivor set keeps each chain's cluster root (a BASE doc
    // — the corpus has genuine near-dups among originals, so the root
    // may be an even lower base id) and drops every planted copy
    val kept = DedupOps.dedupSurvivors(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    (0L until 10L).foreach { i =>
      assert(kept.contains(comp(i)) && !kept.contains(i + 1000000L) &&
        !kept.contains(i + 2000000L), s"survivor wrong for chain $i")
    }
  }
}
