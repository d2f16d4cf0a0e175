package graft.seen

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.Dataset

import graft.url.Hashing

/** Partitioned cuckoo-filter URL-seen set — the deletable alternative
  * to [[BloomSeen]] the north rule names ("bloom/cuckoo-filter
  * URL-seen set"). Design from the public cuckoo-filter paper (Fan,
  * Andersen, Kaminsky, Mitzenmacher, CoNEXT 2014): buckets of 4
  * 16-bit fingerprints, partial-key cuckoo hashing (the alternate
  * bucket is `i XOR hash(fp)`, an involution when the bucket count is
  * a power of two), bounded eviction kicks on insert.
  *
  * Why it earns its place next to the Bloom filter:
  *
  *  - **Deletion.** `invalidatePeriods` re-opens a crawl period by
  *    evicting its urlHashes from the committed seen set; a Bloom
  *    filter cannot unlearn them, so the persisted sketch goes stale
  *    and must be rebuilt from all 10^10 keys. The cuckoo filter
  *    deletes exactly the dropped hashes — O(dropped), not O(total).
  *  - **Incremental growth.** Each resumable run's seen delta is
  *    INSERTED into the persisted filter files; the Bloom path
  *    rebuilds the full filter set from the whole seen table every
  *    run. At the design point that turns a per-run full-corpus scan
  *    into a per-run delta pass ([[graft.jobs.CrawlJob.runResumable]]).
  *  - **Lookup cost.** Two bucket reads per probe vs k scattered bit
  *    probes; ~16.8 bits/key at 4-slot/16-bit geometry for an FPP of
  *    ~1.2e-4 (2·b/2^f = 8/65536), far below the Bloom's 1% at
  *    9.6 bits/key — the exact confirm join behind the sketch sees
  *    ~80× fewer false candidates.
  *
  * Deletion caveat (inherent to cuckoo filters): deleting a key that
  * was never inserted can strip a colliding key's fingerprint and
  * create a false negative. Every delete site must prove insertion;
  * here the contract is structural — evicted hashes come from
  * committed partitions, and committed hashes are exactly what the
  * filter holds ([[graft.table.TableIO.invalidatePeriods]] only evicts
  * when the sketch covers the full committed seen set, else it drops
  * the sketch for rebuild). [[deleteFromDir]] additionally FAILS on
  * any miss rather than guessing.
  *
  * Distribution mirrors [[BloomSeen]]'s scale path: P independent
  * filters routed by `floorMod(urlHash, P)`, each built/updated/probed
  * by the one task that owns its shuffle group, persisted one file per
  * partition with tmp+ATOMIC_MOVE. The driver holds only [[CuckooMeta]].
  * Unlike Bloom bit-OR, cuckoo tables don't merge, so builds shuffle
  * keys to their owning task (`groupByKey`) instead of partial-agg —
  * the same data movement the Bloom UDAF's final merge pays.
  */
object CuckooSeen {

  val SlotsPerBucket = 4
  val BytesPerSlot = 2 // 16-bit fingerprints
  val BytesPerBucket: Int = SlotsPerBucket * BytesPerSlot
  val MaxKicks = 500
  /** Sizing load factor — 4-slot tables sustain ~95% occupancy (paper
    * §5); sizing at 84% plus power-of-two rounding leaves kick room. */
  val TargetLoad = 0.84

  private val FpSeed = 0xA24BAED4963EE407L
  private val IdxSeed = 0x9FB21C651E98DF25L
  private val AltSeed = 0x1C69B3F74AC4AE35L

  /** 16-bit fingerprint in [1, 65535] (0 marks an empty slot). */
  @inline def fingerprintOf(x: Long): Int = {
    val f = (Hashing.mix(x, FpSeed) & 0xFFFFL).toInt
    if (f == 0) 1 else f
  }

  @inline private def mask(filter: Array[Byte]): Int =
    filter.length / BytesPerBucket - 1

  @inline def primaryIndex(x: Long, filter: Array[Byte]): Int =
    (Hashing.mix(x, IdxSeed) & mask(filter)).toInt

  /** Partial-key alternate bucket: involutive for power-of-two bucket
    * counts, so either resident bucket recovers the other. */
  @inline def altIndex(i: Int, fp: Int, filter: Array[Byte]): Int =
    i ^ (Hashing.mix(fp.toLong, AltSeed) & mask(filter)).toInt

  @inline private def slotGet(filter: Array[Byte], bucket: Int,
      slot: Int): Int = {
    val o = bucket * BytesPerBucket + slot * BytesPerSlot
    ((filter(o) & 0xFF) << 8) | (filter(o + 1) & 0xFF)
  }

  @inline private def slotSet(filter: Array[Byte], bucket: Int,
      slot: Int, fp: Int): Unit = {
    val o = bucket * BytesPerBucket + slot * BytesPerSlot
    filter(o) = (fp >>> 8).toByte
    filter(o + 1) = fp.toByte
  }

  private def tryPlace(filter: Array[Byte], bucket: Int, fp: Int): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(filter, bucket, s) == 0) {
        slotSet(filter, bucket, s, fp); return true
      }
      s += 1
    }
    false
  }

  /** Insert `x`; false when the table is too full (caller must treat
    * the build as failed — a dropped insert would be a false negative,
    * which the seen-set contract forbids). Victim selection is a
    * deterministic splitmix draw over (kick, fp) — reproducible builds,
    * same spread as the paper's random choice. */
  def insert(filter: Array[Byte], x: Long): Boolean = {
    var fp = fingerprintOf(x)
    val i1 = primaryIndex(x, filter)
    if (tryPlace(filter, i1, fp)) return true
    if (tryPlace(filter, altIndex(i1, fp, filter), fp)) return true
    var i = if ((Hashing.mix(x, AltSeed) & 1L) == 0L) i1
            else altIndex(i1, fp, filter)
    var kick = 0
    while (kick < MaxKicks) {
      val victim = (Hashing.mix(kick.toLong * 0x10001L + fp, FpSeed)
        & (SlotsPerBucket - 1)).toInt
      val evicted = slotGet(filter, i, victim)
      slotSet(filter, i, victim, fp)
      fp = evicted
      i = altIndex(i, fp, filter)
      if (tryPlace(filter, i, fp)) return true
      kick += 1
    }
    false
  }

  def mightContain(filter: Array[Byte], x: Long): Boolean = {
    val fp = fingerprintOf(x)
    val i1 = primaryIndex(x, filter)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(filter, i1, s) == fp) return true
      s += 1
    }
    val i2 = altIndex(i1, fp, filter)
    s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(filter, i2, s) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one previously-INSERTED `x` (see the class-level caveat);
    * false when no matching fingerprint exists in either bucket —
    * callers treat that as sketch corruption, not a soft miss. */
  def delete(filter: Array[Byte], x: Long): Boolean = {
    val fp = fingerprintOf(x)
    val i1 = primaryIndex(x, filter)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(filter, i1, s) == fp) {
        slotSet(filter, i1, s, 0); return true
      }
      s += 1
    }
    val i2 = altIndex(i1, fp, filter)
    s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(filter, i2, s) == fp) {
        slotSet(filter, i2, s, 0); return true
      }
      s += 1
    }
    false
  }

  /** Buckets (power of two) sized for `expectedKeys` at [[TargetLoad]]. */
  def bucketsFor(expectedKeys: Long): Int = {
    val slots = math.max(SlotsPerBucket.toLong,
      math.ceil(expectedKeys / TargetLoad).toLong)
    val buckets = math.max(1L, (slots + SlotsPerBucket - 1) / SlotsPerBucket)
    // cap at 2^27 buckets = 1 GiB/partition filter (byte arrays are
    // Int-indexed; partition count, not filter size, absorbs growth)
    java.lang.Long.highestOneBit(math.min(buckets * 2 - 1, 1L << 27)).toInt
  }

  // ---- partition-aligned persisted filters (the 10^10-key path) -----

  /** Driver-side descriptor; `covered` lists the seen-delta dirs whose
    * hashes the filter holds (set equality against the table's current
    * seenDirs decides incremental-insert vs rebuild vs evict-safety —
    * [[graft.jobs.CrawlJob.runResumable]], `TableIO.invalidatePeriods`). */
  final case class CuckooMeta(parts: Int, bucketBytes: Int,
      covered: Seq[String] = Nil)

  private val metaMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** The sketch's location inside a crawl table's storage — the ONE
    * definition shared by CrawlJob (build/insert/probe) and TableIO
    * (compaction coverage handoff, invalidation eviction); a drifted
    * copy in either site would silently stop sketch maintenance and
    * force full rebuilds. */
  def sketchDir(tableDir: String): String = s"$tableDir/_cuckoo"

  private def filterFile(dir: String, part: Int) =
    Paths.get(dir, f"part-$part%05d.cuckoo")
  private def metaFile(dir: String) = Paths.get(dir, "meta.json")

  def readMeta(dir: String): Option[CuckooMeta] =
    if (!Files.exists(metaFile(dir))) None
    else Some(metaMapper.readValue(Files.readString(metaFile(dir)),
      classOf[CuckooMeta]))

  def writeMeta(dir: String, meta: CuckooMeta): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, ".meta.json.tmp")
    Files.writeString(tmp, metaMapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(meta))
    Files.move(tmp, metaFile(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def dropDir(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val listing = Files.list(root)
      try listing.forEach(p => Files.deleteIfExists(p))
      finally listing.close()
      Files.deleteIfExists(root)
    }
  }

  private def atomicWriteFilter(dir: String, part: Int,
      filter: Array[Byte]): Unit = {
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    val tmp = Paths.get(dir, f".part-$part%05d.cuckoo.$attempt%d.tmp")
    Files.write(tmp, filter)
    Files.move(tmp, filterFile(dir, part), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Route `hashes` to their owning partition task and apply `op` to
    * that partition's filter file (created empty when absent), then
    * atomically rewrite it. Returns the summed failure count — ANY
    * failure poisons the sketch (failed insert = table overfull;
    * failed delete = the key was never inserted), so callers throw.
    *
    * Routing is a COLUMN `pmod` repartition + native
    * `sortWithinPartitions` + `mapPartitions`, not a typed
    * `groupByKey`: the exchange stays whole-stage-codegen'd on 8-byte
    * rows, where groupByKey's lambda key forces per-element boxing
    * plus an object sort — measured 592 s vs 38 s for an 80M-key
    * build. The native key sort ALSO bounds memory: a task may own
    * several pmod groups (hash-of-group routing), and key order lets
    * it hold exactly ONE filter at a time, flushing on group switch —
    * an unsorted per-task map would pin 2-4 filters (~0.5 GiB each at
    * design sizes) simultaneously. Task retries are
    * safe-by-degradation: re-applied inserts waste slots (duplicate
    * fingerprints, no false negatives); re-applied deletes read the
    * already-written file, miss, and fail the update — callers rebuild
    * instead of trusting the sketch. */
  private def updateDir(hashes: Dataset[Long], dir: String,
      meta: CuckooMeta, op: String): Long = {
    val spark = hashes.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    Files.createDirectories(Paths.get(dir))
    val parts = meta.parts
    val bucketBytes = meta.bucketBytes
    val insertOp = op == "insert"
    val key = pmod(col("h"), lit(parts.toLong))
    hashes.toDF("h")
      .repartition(parts, key)
      .sortWithinPartitions(key)
      .as[Long]
      .mapPartitions { it =>
        var curPart = -1
        var filter: Array[Byte] = null
        var failed = 0L
        def flush(): Unit =
          if (filter != null) {
            atomicWriteFilter(dir, curPart, filter)
            filter = null
          }
        it.foreach { h =>
          val part = java.lang.Math.floorMod(h, parts)
          if (part != curPart) {
            flush()
            curPart = part
            val f = filterFile(dir, part)
            filter =
              if (Files.exists(f)) Files.readAllBytes(f)
              else new Array[Byte](bucketBytes)
          }
          if (insertOp) { if (!insert(filter, h)) failed += 1 }
          else { if (!delete(filter, h)) failed += 1 }
        }
        flush()
        Iterator.single(failed)
      }
      .reduce(_ + _)
  }

  /** Build P partition filters from scratch (drops any existing set
    * first — a half-replaced set would mix geometries). */
  def write(hashes: Dataset[Long], dir: String, parts: Int,
      expectedKeys: Long, covered: Seq[String] = Nil): CuckooMeta = {
    dropDir(dir)
    val perPart = math.max(1024L, expectedKeys / parts)
    val meta = CuckooMeta(parts,
      bucketsFor(perPart) * BytesPerBucket, covered)
    val failed =
      if (hashes.isEmpty) 0L else updateDir(hashes, dir, meta, "insert")
    require(failed == 0L, s"cuckoo build dropped $failed inserts — " +
      "table overfull; raise parts or expectedKeys")
    writeMeta(dir, meta)
    meta
  }

  /** Insert a seen DELTA into the persisted set (the per-run
    * incremental path). Throws when the filter can no longer absorb
    * the delta — callers fall back to a fresh [[write]]. */
  def insertIntoDir(hashes: Dataset[Long], dir: String,
      meta: CuckooMeta, nowCovered: Seq[String]): CuckooMeta = {
    val failed =
      if (hashes.isEmpty) 0L else updateDir(hashes, dir, meta, "insert")
    require(failed == 0L, s"cuckoo delta dropped $failed inserts — " +
      "filter overfull; rebuild with more capacity")
    val next = meta.copy(covered = nowCovered)
    writeMeta(dir, next)
    next
  }

  /** Evict previously-committed hashes (period invalidation). Throws
    * on any miss: a miss means the sketch never held the key, and
    * blind deletion could strip a colliding key's fingerprint. */
  def deleteFromDir(hashes: Dataset[Long], dir: String,
      meta: CuckooMeta, nowCovered: Seq[String]): CuckooMeta = {
    val failed =
      if (hashes.isEmpty) 0L else updateDir(hashes, dir, meta, "delete")
    require(failed == 0L, s"cuckoo evict missed $failed keys — sketch " +
      "does not cover the committed seen set; rebuild instead")
    val next = meta.copy(covered = nowCovered)
    writeMeta(dir, next)
    next
  }

  /** Partition-aligned probe — identical routing contract to
    * [[BloomSeen.probe]]: "false" is exact for inserted keys, "true"
    * must be confirmed by the exact join (FPP ~1.2e-4). Test/compat
    * surface; the production flag path uses [[probeAligned]]. */
  def probe[T](ds: Dataset[T], dir: String, meta: CuckooMeta)(
      hashOf: T => Long)(
      implicit enc: org.apache.spark.sql.Encoder[(T, Boolean)])
      : Dataset[(T, Boolean)] = {
    import ds.sparkSession.implicits.newIntEncoder
    val parts = meta.parts
    ds.groupByKey(e => java.lang.Math.floorMod(hashOf(e), parts))
      .flatMapGroups { (part: Int, it: Iterator[T]) =>
        val f = filterFile(dir, part)
        if (!Files.exists(f)) it.map(e => (e, false))
        else {
          val filter = Files.readAllBytes(f)
          it.map(e => (e, mightContain(filter, hashOf(e))))
        }
      }
  }

  /** Column-keyed aligned probe (the production shape): appends
    * `maybeSeen` to `df`, routing by a `pmod` column repartition so
    * the exchange stays whole-stage-codegen'd — the typed [[probe]]
    * sorts every partition by its lambda key, a cost the semantics
    * never needed (any row order within the owning task is fine). */
  def probeAligned(df: org.apache.spark.sql.DataFrame, hashCol: String,
      dir: String, meta: CuckooMeta): org.apache.spark.sql.DataFrame =
    SketchProbe.probeAligned(df, hashCol, meta.parts,
      part => filterFile(dir, part), mightContain)
}
