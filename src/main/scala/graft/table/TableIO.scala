package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ImageRecord

/** Iceberg-style table layer (SURVEY §7.1): partitioned Parquet data
  * plus versioned JSON snapshots with per-partition manifests and
  * lineage, committed via the reference's own atomic tmp+rename
  * pattern (portal_saude_mg.py:777-791) — write snapshot vN+1, then
  * atomically swap `version-hint.txt`.
  *
  * Layout:
  * {{{
  * <dir>/data/v<N>/site=S/year=Y/month=M/part-x.parquet  (per commit)
  * <dir>/seen/v<N>/part-x.parquet                       (urlHash delta)
  * <dir>/snapshots/v<N>.json                         (manifest + lineage)
  * <dir>/snapshots/runids.json              (cumulative runId sidecar)
  * <dir>/version-hint.txt                            (current version)
  * }}}
  *
  * A snapshot's `dataDirs` entries are either whole commit dirs
  * (`data/v00001`) or — after [[invalidatePeriods]] — partition
  * subpaths inside one (`data/v00001/site=S/year=Y/month=M`):
  * invalidation is a METADATA operation that drops partitions by
  * rewriting references, never by copying data files. Readers resolve
  * version-hint → snapshot → path list; data/seen directories not
  * referenced by the current snapshot (a crashed, uncommitted write)
  * are invisible — that is the resume guarantee: restart replays the
  * uncommitted wave only (K2/K4, SURVEY §2.1). No real Iceberg runtime
  * exists offline; the API is scoped to exactly what the north rule
  * needs (partitions, lineage, snapshots, resume) behind this one
  * object so a catalog could drop in.
  */
object TableIO {

  /** Per-partition manifest entry (rows + payload bytes). */
  final case class PartitionMeta(site: String, year: Int, month: Int,
      rows: Long, bytes: Long)

  /** Lineage of one commit: which run, which parent snapshot, which
    * crawl periods contributed, row counts. */
  final case class Lineage(runId: String, parentVersion: Int,
      periods: Seq[String], note: String)

  /** `runIds`: legacy cumulative index (snapshots written before the
    * `runids.json` sidecar existed embedded the full list in every
    * snapshot — O(commits²) bytes over a stream's life); new snapshots
    * leave it empty and the sidecar carries the index. `cumulative`:
    * whether `partitions` describes the WHOLE table (compaction /
    * invalidation snapshots) or only this commit's delta. */
  final case class Snapshot(version: Int, dataDirs: Seq[String],
      seenDirs: Seq[String], partitions: Seq[PartitionMeta],
      totalRows: Long, lineage: Lineage, runIds: Seq[String] = Nil,
      cumulative: Boolean = false)

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private def hintPath(dir: String): Path = Paths.get(dir, "version-hint.txt")

  def currentVersion(dir: String): Option[Int] = {
    val p = hintPath(dir)
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  def readSnapshot(dir: String, version: Int): Snapshot = {
    val p = Paths.get(dir, "snapshots", f"v$version%05d.json")
    // NoSuchFileException (an IOException), NOT require/IAE: the
    // expired-chain fallbacks (cumulativePartitionMeta, recordRunId's
    // heal path) catch IOException — an IAE here would turn their
    // documented degrade-to-scan behavior into a crash
    if (!Files.exists(p))
      throw new java.nio.file.NoSuchFileException(p.toString, null,
        s"snapshot v$version does not exist (never committed, or " +
          "expired by TableIO.expire)")
    mapper.readValue(Files.readString(p), classOf[Snapshot])
  }

  def currentSnapshot(dir: String): Option[Snapshot] =
    currentVersion(dir).map(readSnapshot(dir, _))

  /** Atomic write: tmp file in the same directory, then ATOMIC_MOVE. */
  private def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- cumulative runId sidecar ------------------------------------

  private def runIdsPath(dir: String): Path =
    Paths.get(dir, "snapshots", "runids.json")

  private def readRunIdsSidecar(dir: String): Option[Seq[String]] =
    if (!Files.exists(runIdsPath(dir))) None
    else Some(mapper.readValue(Files.readString(runIdsPath(dir)),
      classOf[Array[String]]).toSeq)

  /** Append `runId` to the cumulative sidecar (called AFTER the hint
    * swap, so the sidecar never lists an uncommitted run). Crashes in
    * the window between hint swap and sidecar write lose ids — healed
    * here by rebuilding from the snapshot chain whenever the sidecar
    * is shorter than the parent version, and masked on the read side
    * by [[committedRunIds]] always unioning the current snapshot's
    * lineage id. */
  private def recordRunId(dir: String, parent: Option[Snapshot],
      runId: String): Unit = {
    val prior = readRunIdsSidecar(dir)
      .getOrElse(parent.map(chainRunIds(dir, _)).getOrElse(Nil))
    val healed = parent match {
      // every committed version appended exactly one id, so a sidecar
      // SHORTER than the parent version lost ids to crashes in the
      // hint-swap→sidecar window — possibly more than one (two
      // consecutive crashed commits lose the middle id forever if only
      // the immediate parent is re-added). Rebuild from the snapshot
      // chain while it still exists; after an expire() pruned the
      // chain, fall back to re-adding the parent id (best effort).
      case Some(p) if prior.size < p.version =>
        try (1 to p.version).map(readSnapshot(dir, _).lineage.runId)
        catch {
          case _: java.io.IOException =>
            if (prior.contains(p.lineage.runId)) prior
            else prior :+ p.lineage.runId
        }
      case Some(p) if !prior.contains(p.lineage.runId) =>
        prior :+ p.lineage.runId
      case _ => prior
    }
    atomicWrite(runIdsPath(dir),
      mapper.writeValueAsString(healed :+ runId))
  }

  /** Cumulative run ids of `snap` WITHOUT the sidecar: its embedded
    * legacy `runIds` index when present, else a linear chain walk. */
  private def chainRunIds(dir: String, snap: Snapshot): Seq[String] =
    if (snap.runIds != null && snap.runIds.nonEmpty) snap.runIds
    else (1 to snap.version).map(readSnapshot(dir, _).lineage.runId)

  /** runIds of every committed snapshot in the chain — the idempotence
    * check for replayed streaming micro-batches (a replayed
    * foreachBatch must not double-commit). ONE sidecar read per call;
    * legacy tables without the sidecar fall back to the embedded index
    * or the linear walk. */
  def committedRunIds(dir: String): Set[String] =
    currentSnapshot(dir) match {
      case None => Set.empty
      case Some(s) => readRunIdsSidecar(dir) match {
        // `+ s.lineage.runId` covers the crash window where the hint
        // swapped but the sidecar append did not land
        case Some(ids) => ids.toSet + s.lineage.runId
        case None => chainRunIds(dir, s).toSet
      }
    }

  // ---- partition-path helpers --------------------------------------

  /** The commit-dir root of a dataDirs entry: `data/v00001` for both
    * `data/v00001` and `data/v00001/site=S/year=Y/month=M`. Used as
    * `basePath` so partition columns survive subpath reads. */
  private def dataRoot(entry: String): String =
    entry.split('/').take(2).mkString("/")

  private def kv(seg: String): Option[(String, String)] = {
    val i = seg.indexOf('=')
    if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
  }

  /** Leaf partition dirs under one dataDirs entry, as
    * (table-relative path, (site, year, month)). The entry itself may
    * already carry some partition levels (a subpath from a previous
    * invalidation). Pure directory listing — no file reads. */
  private def leafPartitions(dir: String, entry: String)
      : Seq[(String, (String, Int, Int))] = {
    def walk(p: Path, rel: String, have: Map[String, String])
        : Seq[(String, Map[String, String])] =
      if (have.contains("site") && have.contains("year") &&
          have.contains("month")) Seq(rel -> have)
      else if (!Files.isDirectory(p)) Nil
      else {
        val ls = Files.list(p)
        val children = try ls.iterator().asScala.toVector finally ls.close()
        children.filter(Files.isDirectory(_)).flatMap { c =>
          kv(c.getFileName.toString) match {
            case Some((k, v)) =>
              walk(c, s"$rel/${c.getFileName}", have + (k -> v))
            case None => Nil
          }
        }
      }
    val entryHave = entry.split('/').flatMap(kv(_)).toMap
    walk(Paths.get(dir, entry), entry, entryHave).map { case (rel, m) =>
      rel -> ((m("site"), m("year").toInt, m("month").toInt))
    }
  }

  /** Cumulative per-partition meta of `snap`, reconstructed from
    * snapshot METADATA only: walk back to the nearest cumulative
    * snapshot (compaction/invalidation) and sum the commit deltas on
    * top of it — no data scan. Returns None when the walk needs an
    * expired snapshot file (callers fall back to a scan). */
  private def cumulativePartitionMeta(dir: String, snap: Snapshot)
      : Option[Map[(String, Int, Int), (Long, Long)]] = {
    def isCum(s: Snapshot) = s.cumulative ||
      s.lineage.runId.startsWith("compact-") ||
      s.lineage.runId.startsWith("invalidate-")
    try {
      var chain = List(snap)
      while (!isCum(chain.head) && chain.head.lineage.parentVersion > 0)
        chain ::= readSnapshot(dir, chain.head.lineage.parentVersion)
      // chain is oldest-first; head is cumulative or the chain start
      val acc = scala.collection.mutable.Map
        .empty[(String, Int, Int), (Long, Long)]
      chain.foreach { s =>
        if (isCum(s)) acc.clear()
        s.partitions.foreach { p =>
          val k = (p.site, p.year, p.month)
          val (r, b) = acc.getOrElse(k, (0L, 0L))
          acc(k) = (r + p.rows, b + p.bytes)
        }
      }
      Some(acc.toMap)
    } catch { case _: java.io.IOException => None }
  }

  private def scanPartitionMeta(spark: SparkSession, df: DataFrame)
      : Seq[PartitionMeta] = {
    import spark.implicits._
    df.groupBy($"site", $"year", $"month")
      .agg(count(lit(1)).as("rows"),
        sum(length($"bytes")).cast("long").as("bytes"))
      .collect()
      .map(r => PartitionMeta(r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(p => (p.site, p.year, p.month))
      .toSeq
  }

  /** Commit one crawl wave: data + seen delta + snapshot + hint swap.
    * Data is laid out `PARTITIONED BY (site, year, month)` — the
    * reference's `<site>/<ano>/<mes>/` directory contract (§1.2,
    * portal_saude_mg.py:206-219). The seen delta MUST be disjoint from
    * the committed seen set (CrawlJob.newSeenFrom guarantees it) so
    * [[readSeen]] needs no dedup shuffle. */
  def commit(spark: SparkSession, dir: String, images: Dataset[ImageRecord],
      seenDelta: Dataset[Long], runId: String,
      periods: Seq[String], note: String = ""): Snapshot = {
    // reserved namespace: cumulativePartitionMeta's legacy fallback
    // treats these prefixes as compaction/invalidation markers, so a
    // DELTA commit named e.g. "invalidate-retry-1" would corrupt
    // reconstructed partition metadata on tables written before the
    // explicit `cumulative` flag existed
    require(!runId.startsWith("compact-") &&
      !runId.startsWith("invalidate-") && !runId.startsWith("rollback-"),
      s"runId '$runId' uses a reserved maintenance prefix " +
        "(compact-/invalidate-/rollback-)")
    val parent = currentSnapshot(dir)
    val version = parent.map(_.version).getOrElse(0) + 1
    val dataDirName = f"data/v$version%05d"
    val seenDirName = f"seen/v$version%05d"

    // empty deltas add no directories (a schema-less parquet dir would
    // poison later reads)
    val hasImages = !images.isEmpty
    val hasSeen = !seenDelta.isEmpty
    if (hasImages)
      images.write.mode(SaveMode.Overwrite)
        .partitionBy("site", "year", "month")
        .parquet(s"$dir/$dataDirName")
    if (hasSeen)
      seenDelta.toDF("urlHash").write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/$seenDirName")

    val parts =
      if (!hasImages) Seq.empty[PartitionMeta]
      else scanPartitionMeta(spark, spark.read.parquet(s"$dir/$dataDirName"))
    val snap = Snapshot(
      version,
      parent.map(_.dataDirs).getOrElse(Nil) ++
        (if (hasImages) Seq(dataDirName) else Nil),
      parent.map(_.seenDirs).getOrElse(Nil) ++
        (if (hasSeen) Seq(seenDirName) else Nil),
      parts,
      parent.map(_.totalRows).getOrElse(0L) + parts.map(_.rows).sum,
      Lineage(runId, parent.map(_.version).getOrElse(0), periods, note))
    atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
    atomicWrite(hintPath(dir), version.toString)
    recordRunId(dir, parent, runId)
    snap
  }

  /** Compact the snapshot chain: rewrite every committed data/seen
    * dir into ONE dir each and commit a snapshot referencing only
    * those. A long-running streaming crawl appends one dataDir per
    * micro-batch commit, so without compaction [[readImages]] plans
    * O(versions) unions — this is the manifest-rewrite a real table
    * format (e.g. Iceberg's rewrite_data_files) runs on a schedule.
    * Older version dirs stay on disk for snapshot time travel; replay
    * idempotence travels in the runids.json sidecar. No-op (None) on
    * an empty/uninitialized table. */
  def compact(spark: SparkSession, dir: String,
      note: String = "compaction"): Option[Snapshot] =
    currentSnapshot(dir).map { parent =>
      val version = parent.version + 1
      val dataDirName = f"data/v$version%05d"
      val seenDirName = f"seen/v$version%05d"
      val hasImages = parent.dataDirs.nonEmpty
      val hasSeen = parent.seenDirs.nonEmpty
      if (hasImages)
        readImages(spark, dir).write.mode(SaveMode.Overwrite)
          .partitionBy("site", "year", "month")
          .parquet(s"$dir/$dataDirName")
      if (hasSeen)
        // distinct here (NOT in readSeen): new-format deltas are
        // disjoint by construction, but tables whose streaming commits
        // predate the Success-only delta may hold overlapping deltas —
        // one compaction migrates them; the hot read path stays
        // shuffle-free
        readSeen(spark, dir).distinct().toDF("urlHash")
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$dir/$seenDirName")
      // cumulative per-partition meta recomputed from the compacted
      // data (a regular commit's `partitions` covers its delta only)
      val parts =
        if (!hasImages) Seq.empty[PartitionMeta]
        else scanPartitionMeta(spark,
          spark.read.parquet(s"$dir/$dataDirName"))
      val runId = f"compact-v$version%05d"
      val snap = Snapshot(
        version,
        if (hasImages) Seq(dataDirName) else Nil,
        if (hasSeen) Seq(seenDirName) else Nil,
        parts,
        parent.totalRows,
        Lineage(runId, parent.version, Nil,
          s"$note: ${parent.dataDirs.size} data dirs, " +
            s"${parent.seenDirs.size} seen dirs -> 1 each"),
        cumulative = true)
      atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
      atomicWrite(hintPath(dir), version.toString)
      recordRunId(dir, Some(parent), runId)
      // the compacted seen dir holds the same key SET (distinct of the
      // union), so a cuckoo sketch covering the parent's dirs stays
      // valid — only its coverage list must follow the rewrite; a
      // partially-covering sketch would mis-skip the delta, drop it
      locally {
        val sk = graft.seen.CuckooSeen.sketchDir(dir)
        graft.seen.CuckooSeen.readMeta(sk).foreach { m =>
          if (m.covered.toSet == parent.seenDirs.toSet)
            graft.seen.CuckooSeen.writeMeta(sk,
              m.copy(covered = if (hasSeen) Seq(seenDirName) else Nil))
          else graft.seen.CuckooSeen.dropDir(sk)
        }
      }
      snap
    }

  /** Re-open periods for refetch (the reference's revised-data
    * workflow: a government portal republishes a month, the crawler
    * must re-download it — file deletion in the reference, a seen-set
    * eviction here). METADATA-LEVEL: since data is laid out
    * `site=/year=/month=`, dropping a period means rewriting snapshot
    * REFERENCES — entries of untouched commit dirs are kept verbatim,
    * entries mixing kept+dropped periods are replaced by their kept
    * partition subpaths. NO image data file is copied or rewritten
    * (Iceberg's metadata-only `DROP PARTITION` analog; at the 100 TB
    * design point the previous full-table rewrite turned "re-crawl one
    * month" into a full-corpus copy). Only the seen set — 8-byte
    * hashes — is rewritten, and its eviction scan reads ONLY the
    * dropped partitions' files. The next resumable run refetches
    * exactly those periods and skips everything else. No-op (None) on
    * an empty table. */
  def invalidatePeriods(spark: SparkSession, dir: String,
      periods: Set[(String, Int, Int)]): Option[Snapshot] =
    currentSnapshot(dir).map { parent =>
      import spark.implicits._
      val version = parent.version + 1
      val seenDirName = f"seen/v$version%05d"

      // classify every referenced leaf partition (directory listing
      // only); an entry with no dropped leaves survives verbatim
      val perEntry = parent.dataDirs.map(e => e -> leafPartitions(dir, e))
      val keptDataDirs = perEntry.flatMap { case (e, leaves) =>
        val (drop, keep) = leaves.partition(l => periods.contains(l._2))
        if (drop.isEmpty) Seq(e) else keep.map(_._1)
      }
      val droppedLeaves = perEntry.flatMap(_._2)
        .filter(l => periods.contains(l._2))

      // seen eviction: anti-join against the urlHashes of ONLY the
      // dropped partitions (their files are read directly — pruning by
      // construction, no UDF, no full-image scan)
      val seenDirs =
        if (droppedLeaves.isEmpty || parent.seenDirs.isEmpty)
          parent.seenDirs
        else {
          val droppedHashes = spark.read
            .parquet(droppedLeaves.map(l => s"$dir/${l._1}"): _*)
            .select($"urlHash").toDF("dh")
          val newSeen = readSeen(spark, dir).toDF("urlHash")
            .join(droppedHashes, col("urlHash") === col("dh"), "left_anti")
          val dirs =
            if (newSeen.isEmpty) Nil
            else {
              newSeen.write.mode(SaveMode.Overwrite)
                .parquet(s"$dir/$seenDirName")
              Seq(seenDirName)
            }
          evictFromCuckoo(spark, dir, parent.seenDirs,
            droppedHashes.select(col("dh")).as[Long], dirs)
          dirs
        }

      // kept partition meta from snapshot metadata (no data scan);
      // scan fallback only when the chain walk hits expired snapshots
      val droppedKeys = droppedLeaves.map(_._2).toSet
      val parts = cumulativePartitionMeta(dir, parent) match {
        case Some(cum) =>
          cum.view.filterKeys(k => !droppedKeys.contains(k) &&
              !periods.contains(k))
            .map { case ((s, y, m), (r, b)) => PartitionMeta(s, y, m, r, b) }
            .toSeq.sortBy(p => (p.site, p.year, p.month))
        case None if keptDataDirs.nonEmpty =>
          scanPartitionMeta(spark, readFrom(spark, dir, keptDataDirs))
        case None => Nil
      }
      val runId = f"invalidate-v$version%05d"
      val snap = Snapshot(
        version,
        keptDataDirs,
        seenDirs,
        parts,
        parts.map(_.rows).sum,
        Lineage(runId, parent.version,
          periods.toSeq.sorted.map(p => s"${p._1}/${p._2}/${p._3}"),
          s"re-opened ${periods.size} periods for refetch " +
            s"(metadata-only: ${droppedLeaves.size} partition refs " +
            "dropped, 0 data files rewritten)"),
        cumulative = true)
      atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
      atomicWrite(hintPath(dir), version.toString)
      recordRunId(dir, Some(parent), runId)
      snap
    }

  /** Roll the table back to snapshot `toVersion` (Iceberg's
    * `rollback_to_snapshot` analog): commit a NEW cumulative snapshot
    * whose data and seen references are exactly the target's.
    * REFERENCE-ONLY — no data file is copied or rewritten; the
    * rolled-back commits' dirs stay on disk (time travel to them keeps
    * working) until [[expire]] reclaims them. Two bounded READS can
    * still occur: (a) maintaining the cuckoo seen sketch in place
    * reads the ROLLED-BACK seen-delta parquet (hash columns only —
    * O(dropped keys), the rows being evicted); (b) when the cumulative
    * partition-meta chain hits an expired snapshot, the fallback
    * rescans partition meta from the target's data dirs — O(target
    * data) and only on an already-expired chain. Neither rewrites
    * anything. The URL-seen set reverts
    * with the references, so the next resumable run REFETCHES
    * everything the rolled-back runs fetched — that is the operator
    * story for "a bad run landed, undo it": the refetch happens under
    * new runIds via the reverted seen set. The runids.json sidecar
    * deliberately KEEPS the rolled-back ids (it is append-only):
    * streaming replay idempotence must survive an operator rollback —
    * a crash-replayed micro-batch must not silently re-commit data the
    * operator just removed. The persisted cuckoo seen sketch is
    * maintained IN PLACE whenever its coverage list is a subset of the
    * committed seen dirs (delete exactly the rolled-back covered
    * deltas' hashes — O(dropped), the eviction a Bloom filter cannot
    * do); coverage a rewrite invalidated drops the sketch for rebuild
    * on the next run.
    *
    * Throws (NoSuchFileException / IllegalArgumentException) when the
    * target snapshot or a dir it references was expired. None when
    * `toVersion` is already current. Single-writer contract, like
    * commit/compact. */
  def rollback(spark: SparkSession, dir: String,
      toVersion: Int): Option[Snapshot] =
    currentSnapshot(dir).filter(_.version != toVersion).map { parent =>
      import spark.implicits._
      val target = readSnapshot(dir, toVersion)
      val missing = (target.dataDirs ++ target.seenDirs)
        .filterNot(e => Files.exists(Paths.get(dir, e)))
      require(missing.isEmpty,
        s"cannot roll back to v$toVersion: expire() reclaimed " +
          s"'${missing.head}' (and ${missing.size - 1} more)")
      val version = parent.version + 1

      // cuckoo sketch: seen deltas align 1:1 with seen dirs and are
      // pairwise disjoint, so the sketch survives a rollback IN PLACE
      // when its coverage is a sane subset of the committed dirs —
      // delete exactly the hashes of covered dirs the rollback
      // un-references (dirs the sketch never inserted need no delete),
      // hand coverage to the covered∩target intersection, and let the
      // next run's delta-insert fill in target dirs it never covered.
      // Coverage outside the committed set (a rewrite happened under
      // the sketch) cannot be proven consistent: drop for rebuild.
      locally {
        val C = graft.seen.CuckooSeen
        val sk = C.sketchDir(dir)
        C.readMeta(sk).foreach { m =>
          if (m.covered.toSet.subsetOf(parent.seenDirs.toSet)) {
            val deleteDirs = m.covered.filterNot(target.seenDirs.toSet)
            if (deleteDirs.nonEmpty) {
              val dropped = spark.read
                .parquet(deleteDirs.map(d => s"$dir/$d"): _*)
                .select($"urlHash").as[Long].distinct()
              val kept = m.covered.filter(target.seenDirs.toSet)
              try C.deleteFromDir(dropped, sk, m, kept)
              catch { case _: Exception => C.dropDir(sk) }
            }
          } else C.dropDir(sk)
        }
      }

      // cumulative per-partition meta of the TARGET, from snapshot
      // metadata only; scan fallback when the walk hits expired chain
      val parts = cumulativePartitionMeta(dir, target) match {
        case Some(cum) => cum
          .map { case ((s, y, m), (r, b)) => PartitionMeta(s, y, m, r, b) }
          .toSeq.sortBy(p => (p.site, p.year, p.month))
        case None if target.dataDirs.nonEmpty =>
          scanPartitionMeta(spark, readFrom(spark, dir, target.dataDirs))
        case None => Nil
      }
      val runId = f"rollback-v$version%05d"
      val snap = Snapshot(
        version,
        target.dataDirs,
        target.seenDirs,
        parts,
        parts.map(_.rows).sum,
        Lineage(runId, parent.version, Nil,
          s"rollback to v$toVersion (metadata-only: references " +
            s"reverted, 0 data files rewritten; " +
            s"${parent.dataDirs.size - target.dataDirs.size} data dir " +
            "refs dropped)"),
        cumulative = true)
      atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
      atomicWrite(hintPath(dir), version.toString)
      recordRunId(dir, Some(parent), runId)
      snap
    }

  /** Keep the persisted cuckoo URL-seen sketch (CrawlJob
    * `cfg.seenSketch = "cuckoo"`) consistent across a seen-set
    * eviction: when the sketch provably covers the full committed set
    * (coverage == the parent snapshot's seen dirs), delete exactly the
    * dropped hashes — the O(dropped) maintenance a Bloom filter cannot
    * do — and hand coverage to the rewritten dir; any doubt (stale
    * coverage, a delete miss) drops the sketch so the next resumable
    * run rebuilds instead of trusting a possibly-corrupt filter. */
  private def evictFromCuckoo(spark: SparkSession, dir: String,
      parentSeenDirs: Seq[String], dropped: Dataset[Long],
      newCovered: Seq[String]): Unit = {
    val C = graft.seen.CuckooSeen
    val sketchDir = C.sketchDir(dir)
    C.readMeta(sketchDir).foreach { m =>
      if (m.covered.toSet == parentSeenDirs.toSet) {
        // distinct: a URL may appear in several dropped image rows,
        // but its hash was inserted into the sketch exactly once
        try C.deleteFromDir(dropped.distinct(), sketchDir, m, newCovered)
        catch { case _: Exception => C.dropDir(sketchDir) }
      } else C.dropDir(sketchDir)
    }
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRec) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Expire everything the CURRENT snapshot does not reference: data/
    * seen dirs of superseded versions (reclaimable after [[compact]]
    * rewrote them), partition dirs dropped by [[invalidatePeriods]],
    * orphaned dirs of crashed uncommitted writes, and old snapshot
    * files. The Iceberg `expire_snapshots` analog — time travel to
    * expired versions is gone, but replay idempotence survives in the
    * runids.json sidecar. Reference-aware down the tree: a commit dir
    * referenced only through partition subpaths keeps exactly those
    * subpaths. Single-writer contract, like commit/compact. */
  def expire(dir: String): Unit =
    currentSnapshot(dir).foreach { cur =>
      val keep = (cur.dataDirs ++ cur.seenDirs).toSet
      // make sure the sidecar index exists BEFORE deleting the chain
      // it would otherwise be derived from
      if (readRunIdsSidecar(dir).isEmpty)
        atomicWrite(runIdsPath(dir),
          mapper.writeValueAsString(chainRunIds(dir, cur)))
      // rel is kept outright when an entry covers it (equals it or is
      // an ancestor of it); partially kept when some entry lives
      // below it (recurse); otherwise deleted
      def sweep(p: Path, rel: String): Unit =
        if (!keep.exists(e => e == rel || rel.startsWith(e + "/"))) {
          if (keep.exists(_.startsWith(rel + "/"))) {
            val ls = Files.list(p)
            val children = try ls.iterator().asScala.toVector
              finally ls.close()
            children.foreach(c => sweep(c, s"$rel/${c.getFileName}"))
          } else deleteRec(p)
        }
      for (root <- Seq("data", "seen")) {
        val rp = Paths.get(dir, root)
        if (Files.exists(rp)) {
          val ls = Files.list(rp)
          try ls.forEach { child =>
            sweep(child, s"$root/${child.getFileName}")
          } finally ls.close()
        }
      }
      for (v <- 1 until cur.version)
        Files.deleteIfExists(Paths.get(dir, "snapshots", f"v$v%05d.json"))
    }

  /** Read a set of dataDirs entries (whole commit dirs or partition
    * subpaths): one scan per commit root with `basePath` pinned to the
    * root so partition columns survive subpath reads. */
  private def readFrom(spark: SparkSession, dir: String,
      entries: Seq[String]): DataFrame =
    entries.groupBy(dataRoot).toSeq.sortBy(_._1)
      .map { case (root, es) =>
        spark.read.option("basePath", s"$dir/$root")
          .parquet(es.map(e => s"$dir/$e"): _*)
      }
      .reduce(_.unionByName(_))

  /** Read the committed image table (union of all referenced data
    * entries; orphaned uncommitted dirs are never touched). */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    currentSnapshot(dir) match {
      case Some(s) if s.dataDirs.nonEmpty => readFrom(spark, dir, s.dataDirs)
      case _ => spark.emptyDataFrame
    }

  /** Time-travel read (Iceberg's `VERSION AS OF`): the image table
    * exactly as snapshot `version` referenced it. Works for any
    * not-yet-expired version — commits, compactions and invalidations
    * all leave superseded data dirs on disk until [[expire]] reclaims
    * them, and invalidation drops partitions by reference, so the
    * dropped rows remain readable through older snapshots. Throws
    * (with the expire hint) when the snapshot json is gone. */
  def readImagesAt(spark: SparkSession, dir: String,
      version: Int): DataFrame = {
    val s = readSnapshot(dir, version)
    if (s.dataDirs.nonEmpty) readFrom(spark, dir, s.dataDirs)
    else spark.emptyDataFrame
  }

  /** Time-travel read of the URL-seen set as of snapshot `version` —
    * what a resume launched at that version would have skipped. */
  def readSeenAt(spark: SparkSession, dir: String,
      version: Int): Dataset[Long] = {
    import spark.implicits._
    val s = readSnapshot(dir, version)
    if (s.seenDirs.nonEmpty)
      spark.read.parquet(s.seenDirs.map(d => s"$dir/$d"): _*)
        .select($"urlHash").as[Long]
    else spark.emptyDataset[Long]
  }

  /** Read the committed URL-seen set. No dedup shuffle: committed
    * deltas are pairwise disjoint by construction — each delta holds
    * only that run's Success hashes, which the exact skip-flag join
    * proves absent from every earlier delta (CrawlJob.newSeenFrom,
    * StreamingCrawl.commitOutcomesBatch), and compact/invalidate
    * rewrite to a single dir. At the 10^10-key design point the old
    * unconditional `distinct()` was a full-table shuffle on every
    * resumable run.
    *
    * MIGRATION: tables whose streaming commits predate the
    * Success-only delta may hold OVERLAPPING deltas; duplicate seen
    * rows multiply frontier rows through the left_outer confirm join
    * (duplicated Skipped log rows, inflated metrics). Run [[compact]]
    * once on such a table before resuming against it — its seen
    * rewrite applies the migrating `distinct()`. */
  def readSeen(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    currentSnapshot(dir) match {
      case Some(s) if s.seenDirs.nonEmpty =>
        spark.read.parquet(s.seenDirs.map(d => s"$dir/$d"): _*)
          .select($"urlHash").as[Long]
      case _ => spark.emptyDataset[Long]
    }
  }
}
