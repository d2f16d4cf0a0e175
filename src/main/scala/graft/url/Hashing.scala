package graft.url

/** Pure-Scala XXH64 (the public xxHash 64-bit algorithm) + splitmix64.
  *
  * The engine keys everything on `xxhash64(canonical_url)` with
  * Spark's default seed 42 (north rule; Spark built-in `xxhash64`).
  * Executor-side code (synthetic fetcher, simulator, Bloom inserts)
  * needs the same hash outside Catalyst, so this is a from-scratch
  * implementation of the published algorithm; `HashingSpec` asserts
  * bit-equality with Spark's `xxhash64` column function.
  */
object Hashing {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** Seed Spark uses for the `xxhash64` SQL function. */
  val SparkSeed = 42L

  @inline private def rotl(x: Long, r: Int): Long =
    java.lang.Long.rotateLeft(x, r)

  @inline private def round(acc: Long, k: Long): Long =
    rotl(acc + k * P2, 31) * P1

  @inline private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  @inline private def read8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 | (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24 | (b(i + 4) & 0xffL) << 32 |
      (b(i + 5) & 0xffL) << 40 | (b(i + 6) & 0xffL) << 48 |
      (b(i + 7) & 0xffL) << 56

  @inline private def read4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | (b(i + 1) & 0xffL) << 8 | (b(i + 2) & 0xffL) << 16 |
      (b(i + 3) & 0xffL) << 24

  def xxh64(bytes: Array[Byte], seed: Long): Long =
    xxh64Range(bytes, 0, bytes.length, seed)

  /** xxh64 over `bytes[from, from+len)` — bit-equal to hashing a copy
    * of the range, without allocating one. The shingling hot path
    * hashes ~|text| overlapping windows per document; with this the
    * whole document is encoded ONCE and every window hash is
    * allocation-free (the substring+getBytes form allocated two
    * objects per window and bounded dedup throughput on the
    * allocator, not the ALU). */
  def xxh64Range(bytes: Array[Byte], from: Int, len: Int,
      seed: Long): Long = {
    val end = from + len
    var h: Long = 0L
    var i = from
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i <= end - 32) {
        v1 = round(v1, read8(bytes, i))
        v2 = round(v2, read8(bytes, i + 8))
        v3 = round(v3, read8(bytes, i + 16))
        v4 = round(v4, read8(bytes, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1); h = mergeRound(h, v2)
      h = mergeRound(h, v3); h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i <= end - 8) {
      h = rotl(h ^ round(0L, read8(bytes, i)), 27) * P1 + P4
      i += 8
    }
    if (i <= end - 4) {
      h = rotl(h ^ (read4(bytes, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((bytes(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** xxh64 of a string's UTF-8 bytes with Spark's seed — bit-equal to
    * `org.apache.spark.sql.functions.xxhash64(col)` on a StringType.
    */
  def xxh64(s: String): Long =
    xxh64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), SparkSeed)

  /** splitmix64 — the standard stateless PRNG mixer; used to derive
    * independent deterministic draws from (urlHash, salt) in the
    * synthetic web. */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def mix(x: Long, salt: Long): Long = mix(x ^ mix(salt))

  /** Non-negative bounded draw. */
  def draw(x: Long, salt: Long, bound: Int): Int =
    (((mix(x, salt) >>> 1) % bound).toInt)
}
