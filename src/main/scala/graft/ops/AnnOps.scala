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

  /** Exact cosine top-k: for each query vector, the k nearest
    * candidates (ties broken by candidate id — fully deterministic). */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
      cosine(a.toArray, b.toArray))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid".asc)
    candidates.crossJoin(broadcast(queries))
      .withColumn("cosine", round(cosUdf($"qv", $"cv"), 6))
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
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
      cosine(a.toArray, b.toArray))
    val cands = candidates
      .withColumn("bucket", explode(bucketsUdf($"cv")))
    val qs = queries.withColumn("bucket", explode(probesUdf($"qv")))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"cid".asc)
    qs.join(cands, Seq("bucket"))
      .select($"qid", $"cid").distinct()
      .join(queries, Seq("qid")).join(candidates, Seq("cid"))
      .withColumn("cosine", round(cosUdf($"qv", $"cv"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"qid", $"cid", $"cosine", $"rk")
      .orderBy($"qid", $"rk")
  }
}
