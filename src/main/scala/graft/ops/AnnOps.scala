package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.url.Hashing

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteTopK`: exact cosine top-k via broadcast crossJoin + ranking
  *    window — the correctness baseline (cost O(|Q|·n), fine when the
  *    query side is small and broadcastable);
  *  - `lshTopK`: random-hyperplane sign-bit buckets with multiprobe
  *    (flip each single bit) — the scale path: candidates shuffle only
  *    within matching buckets, cost O(n/2^b per probe·(b+1)).
  *
  * Hyperplanes are pseudo-random unit-free gaussians derived from
  * splitmix64 (Box–Muller), fixed seed → identical buckets on every
  * executor and cluster size.
  */
object AnnOps {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }

  /** Deterministic gaussian hyperplane component (Box–Muller over two
    * splitmix draws); `table` salts independent hash tables. */
  private def gauss(table: Int, plane: Int, dim: Int): Double = {
    val key = (table.toLong << 40) ^ (plane.toLong * 131071) ^ dim.toLong
    val u1 = ((Hashing.mix(key, 0xA11CE5L) >>> 11).toDouble + 1.0) /
      (1L << 53).toDouble
    val u2 = ((Hashing.mix(key, 0xB0B5L) >>> 11).toDouble + 1.0) /
      (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Hyperplane matrix for one hash table, materialized ONCE per
    * executor JVM (deterministic, so precomputation cannot change any
    * sketch): the sketch hot path is then a dense dot product instead
    * of tables·planes·dim Box–Muller transcendental evaluations per
    * row. Keyed by (table, planes, dim); a handful of entries total. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int),
      Array[Array[Double]]]()

  private[ops] def planeMatrix(table: Int, planes: Int,
      dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((table, planes, dim),
      { case (t, p, d) => Array.tabulate(p, d)((pp, dd) => gauss(t, pp, dd)) })

  /** Sign-bit sketch in hash table `table`: bit p = sign(v·h_p). */
  def signSketch(v: Array[Float], planes: Int, table: Int = 0): Long = {
    val m = planeMatrix(table, planes, v.length)
    var sketch = 0L
    var p = 0
    while (p < planes) {
      val row = m(p)
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * row(i); i += 1 }
      if (s > 0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }

  /** Table-tagged bucket key (table id in the high byte so buckets of
    * different tables never collide). */
  @inline private def bucketKey(table: Int, sketch: Long): Long =
    (table.toLong << 56) | sketch

  /** Dot/norm/cosine columns: the NATIVE codegen expression
    * ([[graft.functions.VecExpressions.FloatVecDot]] — higher-order
    * `zip_with`+`aggregate` would be CodegenFallback and break the
    * projection's whole-stage span). Norms are computed ONCE PER ROW on
    * each side of a top-k join, so the per-PAIR scoring work is a
    * single generated dot-product loop. Bit-equal to [[cosine]]. */
  private def normCol(x: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.functions.VecExpressions.vec_norm(x)

  private def cosineFromNorms(qv: org.apache.spark.sql.Column,
      cv: org.apache.spark.sql.Column, qn: org.apache.spark.sql.Column,
      cn: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VecExpressions.vec_cosine(qv, cv, qn, cn)

  /** Exact cosine top-k: for each query vector, the k nearest
    * candidates (ties broken by candidate id — fully deterministic). */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid".asc)
    candidates.withColumn("cnorm", normCol($"cv"))
      .crossJoin(broadcast(queries.withColumn("qnorm", normCol($"qv"))))
      .withColumn("cosine",
        round(cosineFromNorms($"qv", $"cv", $"qnorm", $"cnorm"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"qid", $"cid", $"cosine", $"rk")
      .orderBy($"qid", $"rk")
  }

  /** Elementwise vector-mean aggregator (the k-means update step):
    * partial sums merge map-side, so one refinement shuffles nlist ×
    * partitions tiny rows instead of n·dim exploded rows. */
  private final case class VecMean(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Float], (Array[Double], Long), Array[Double]] {
    def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    def reduce(b: (Array[Double], Long),
        v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Double], Long),
        b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(b: (Array[Double], Long)): Array[Double] =
      if (b._2 == 0) null else b._1.map(_ / b._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Nearest centroid index by cosine (ties → lowest index). */
  private def nearestCentroids(centroids: Array[Array[Double]],
      v: Array[Float], n: Int): Array[Int] = {
    val scored = centroids.indices.map { i =>
      val c = centroids(i)
      var dotCv = 0.0; var nc = 0.0; var j = 0
      while (j < c.length) { dotCv += c(j) * v(j); nc += c(j) * c(j); j += 1 }
      val d = math.sqrt(nc) * norm(v)
      (if (d == 0.0) -1.0 else dotCv / d, i)
    }
    scored.sortBy { case (cos, i) => (-cos, i) }.take(n).map(_._2).toArray
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer —
    * `nlist` seed centroids (the candidates with the lowest
    * xxh64(cid)) refined by `iters` spherical k-means iterations run
    * as Spark aggregations — partitions candidates into nlist lists; a
    * query scans only its `nProbe` nearest lists (expected scan
    * fraction nProbe/nlist), with exact cosine on the probed lists.
    *
    * Scale shape: the centroid table is MODEL state (nlist·dim
    * doubles ≪ data, like MLlib KMeans) and is the only thing
    * broadcast; candidate vectors are assigned map-side and shuffled
    * once per refinement on (cluster, pos) partial sums. Centroids
    * are quantized to 6 dp per iteration so assignments are bit-stable
    * under any partitioning/cluster size. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame =
    ivfTopKFrozen(queries, candidates,
      trainCentroids(candidates, nlist, iters), k, nProbe)

  /** [[ivfTopK]] over an ALREADY-TRAINED quantizer — the quantizer is
    * deterministic, so composing [[ivfModel]] + this is bit-identical
    * to [[ivfTopK]] while training exactly once; callers needing both
    * the candidate set and the ranking (the oracle gates) previously
    * paid the k-means job chain twice. */
  def ivfTopKFrozen(queries: DataFrame, candidates: DataFrame,
      centroids: Array[Array[Double]], k: Int,
      nProbe: Int = 4): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cands = candidates.withColumn("cl",
        assignCell(candidates, "cv", centroids))
      .withColumn("cnorm", normCol($"cv"))
    topKByCell(probedQueries(queries, centroids, nProbe), cands, k)
  }

  /** The trained coarse quantizer as a value (see [[ivfTopKFrozen]]). */
  def ivfModel(candidates: DataFrame, nlist: Int = 16,
      iters: Int = 2): Array[Array[Double]] =
    trainCentroids(candidates, nlist, iters)

  /** The (qid, cid) candidate set [[ivfTopK]] scores — every pair
    * sharing a probed cell. Deterministic (the quantizer is), so a
    * separate call agrees with the topK run; exposed so an external
    * oracle can re-rank the exact same candidate set and certify the
    * op's scoring/ranking end to end (OpsQueries `ann_ivf_top5`). */
  def ivfCandidates(queries: DataFrame, candidates: DataFrame,
      nlist: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame =
    ivfCandidatesFrozen(queries, candidates,
      trainCentroids(candidates, nlist, iters), nProbe)

  /** [[ivfCandidates]] over an already-trained quantizer (see
    * [[ivfTopKFrozen]] for why callers share one training). */
  def ivfCandidatesFrozen(queries: DataFrame, candidates: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int = 4): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cands = candidates.withColumn("cl",
      assignCell(candidates, "cv", centroids))
    cands.join(broadcast(probedQueries(queries, centroids, nProbe)
        .select($"qid", $"cl")), Seq("cl"))
      .select($"qid", $"cid").distinct()
  }

  /** The deterministic spherical-k-means coarse quantizer shared by
    * [[ivfTopK]] (per-call) and [[AnnIndex.build]] (persisted):
    * `nlist` seed centroids (the candidates with the lowest
    * xxh64(cid)) refined by `iters` iterations of Spark aggregations,
    * quantized to 6 dp per iteration so assignments are bit-stable
    * under any partitioning/cluster size. */
  private[ops] def trainCentroids(candidates: DataFrame, nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // the quantizer makes iters+2 passes over the candidates — cache
    // them once (vectors only; tiny next to the corpus they index)
    val cands0 = candidates
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def quantize(a: Array[Double]): Array[Double] =
      a.map(x => math.rint(x * 1e6) / 1e6)
    var centroids: Array[Array[Double]] = cands0
      .select($"cid", $"cv", xxhash64($"cid").as("h"))
      .orderBy($"h", $"cid").limit(nlist)
      .select($"cv").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map(quantize)
    require(centroids.nonEmpty, "empty candidate set")
    val dim = centroids(0).length
    val vecMean = udaf(VecMean(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assign = udf((v: Seq[Float]) =>
        nearestCentroids(bc.value, v.toArray, 1)(0))
      val means = cands0
        .select(assign($"cv").as("cl"), $"cv")
        .groupBy($"cl").agg(vecMean($"cv").as("m"))
        .collect()
      val next = centroids.map(_.clone) // empty clusters keep position
      means.foreach { r =>
        val m = r.getSeq[Double](1)
        if (m != null) next(r.getInt(0)) = m.toArray
      }
      centroids = next.map(quantize)
    }
    // quantizer built — the cache served its iters+1 passes; the
    // caller's probe plan reads the source once, so release it now
    // rather than leaving it pinned for the caller's lifetime
    cands0.unpersist(blocking = false)
    centroids
  }

  /** Assign a centroid index to each vector row (broadcast model). */
  private[ops] def assignCell(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    udf((v: Seq[Float]) => nearestCentroids(bc.value, v.toArray, 1)(0))
      .apply(col(vecCol))
  }

  /** Queries exploded to their nProbe nearest cells, with norms. */
  private[ops] def probedQueries(queries: DataFrame,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val probes = udf((v: Seq[Float]) =>
      nearestCentroids(bc.value, v.toArray, nProbe))
    queries.withColumn("cl", explode(probes($"qv")))
      .withColumn("qnorm", normCol($"qv"))
  }

  /** Shared IVF scoring tail: exact cosine of every (query, candidate)
    * pair sharing a probed cell, deterministic top-k per query. `qs`
    * carries (qid, qv, cl, qnorm); `cands` (cid, cv, cl, cnorm). */
  private[ops] def topKByCell(qs: DataFrame, cands: DataFrame,
      k: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid".asc)
    cands.join(broadcast(qs), Seq("cl"))
      .withColumn("cosine",
        round(cosineFromNorms($"qv", $"cv", $"qnorm", $"cnorm"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"qid", $"cid", $"cosine", $"rk")
      .orderBy($"qid", $"rk")
  }

  /** Multi-table LSH top-k: `tables` independent sign-bit sketches of
    * `planes` bits each; query probes its bucket plus every 1-bit flip
    * in each table; candidates from any probed bucket are ranked
    * exactly. Expected scan fraction ≈ tables·(1+planes)/2^planes;
    * recall ≈ 1-(1-p)^tables. Measured against bruteTopK in OpsSpec. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 6): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid".asc)
    lshCandidates(queries, candidates, planes, tables)
      .join(broadcast(queries.withColumn("qnorm", normCol($"qv"))),
        Seq("qid"))
      .join(candidates.withColumn("cnorm", normCol($"cv")), Seq("cid"))
      .withColumn("cosine",
        round(cosineFromNorms($"qv", $"cv", $"qnorm", $"cnorm"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"qid", $"cid", $"cosine", $"rk")
      .orderBy($"qid", $"rk")
  }

  /** The (qid, cid) candidate set [[lshTopK]] scores — ids sharing any
    * probed bucket (query bucket or 1-bit flip, any table). The
    * query side is small by contract (tables·(planes+1) probe rows per
    * query) — broadcast it so the big candidate table is never
    * shuffled: the bucket join streams candidates map-side, and only
    * the candidate-PAIR ids reach the distinct. Exposed for the same
    * external-oracle reason as [[ivfCandidates]]. */
  def lshCandidates(queries: DataFrame, candidates: DataFrame,
      planes: Int = 8, tables: Int = 6): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bucketsUdf = udf((v: Seq[Float]) => {
      val a = v.toArray
      (0 until tables).map(t => bucketKey(t, signSketch(a, planes, t))).toArray
    })
    val probesUdf = udf((v: Seq[Float]) => {
      val a = v.toArray
      (0 until tables).flatMap { t =>
        val s = signSketch(a, planes, t)
        (s +: (0 until planes).map(b => s ^ (1L << b)))
          .map(bucketKey(t, _))
      }.toArray
    })
    val cands = candidates
      .withColumn("bucket", explode(bucketsUdf($"cv")))
    val qs = queries.withColumn("bucket", explode(probesUdf($"qv")))
    cands.join(broadcast(qs.select($"qid", $"bucket")), Seq("bucket"))
      .select($"qid", $"cid").distinct()
  }
}
