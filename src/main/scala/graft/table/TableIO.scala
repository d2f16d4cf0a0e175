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
  * <dir>/version-hint.txt                            (current version)
  * }}}
  *
  * A reader resolves version-hint → snapshot → file list; data/seen
  * directories not referenced by the current snapshot (a crashed,
  * uncommitted write) are invisible — that is the resume guarantee:
  * restart replays the uncommitted wave only (K2/K4, SURVEY §2.1).
  * No real Iceberg runtime exists offline; the API is scoped to
  * exactly what the north rule needs (partitions, lineage, snapshots,
  * resume) behind this one object so a catalog could drop in.
  */
object TableIO {

  /** Per-partition manifest entry. */
  final case class PartitionMeta(site: String, year: Int, month: Int,
      rows: Long, bytes: Long)

  /** Lineage of one commit: which run, which parent snapshot, which
    * crawl periods contributed, row counts. */
  final case class Lineage(runId: String, parentVersion: Int,
      periods: Seq[String], note: String)

  /** `runIds` is the CUMULATIVE set of committed run ids — carried
    * forward in every snapshot so idempotence checks read one file
    * instead of walking the whole chain (null when reading snapshots
    * written before this field existed; see [[chainRunIds]]). */
  final case class Snapshot(version: Int, dataDirs: Seq[String],
      seenDirs: Seq[String], partitions: Seq[PartitionMeta],
      totalRows: Long, lineage: Lineage, runIds: Seq[String] = Nil)

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

  def readSnapshot(dir: String, version: Int): Snapshot =
    mapper.readValue(
      Files.readString(Paths.get(dir, "snapshots", f"v$version%05d.json")),
      classOf[Snapshot])

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

  /** Commit one crawl wave: data + seen delta + snapshot + hint swap.
    * Data is laid out `PARTITIONED BY (site, year, month)` — the
    * reference's `<site>/<ano>/<mes>/` directory contract (§1.2,
    * portal_saude_mg.py:206-219). */
  def commit(spark: SparkSession, dir: String, images: Dataset[ImageRecord],
      seenDelta: Dataset[Long], runId: String,
      periods: Seq[String], note: String = ""): Snapshot = {
    import spark.implicits._
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
      else spark.read.parquet(s"$dir/$dataDirName")
        .groupBy($"site", $"year", $"month")
        .agg(count(lit(1)).as("rows"),
          sum(length($"bytes")).cast("long").as("bytes"))
        .collect()
        .map(r => PartitionMeta(r.getString(0), r.getInt(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(p => (p.site, p.year, p.month))
        .toSeq
    val snap = Snapshot(
      version,
      parent.map(_.dataDirs).getOrElse(Nil) ++
        (if (hasImages) Seq(dataDirName) else Nil),
      parent.map(_.seenDirs).getOrElse(Nil) ++
        (if (hasSeen) Seq(seenDirName) else Nil),
      parts,
      parent.map(_.totalRows).getOrElse(0L) + parts.map(_.rows).sum,
      Lineage(runId, parent.map(_.version).getOrElse(0), periods, note),
      runIds = parent.map(chainRunIds(dir, _)).getOrElse(Nil) :+ runId)
    atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
    atomicWrite(hintPath(dir), version.toString)
    snap
  }

  /** Cumulative run ids of `snap`: its own `runIds` index when
    * present, else (legacy snapshots written before the index) a
    * linear walk of the chain. */
  private def chainRunIds(dir: String, snap: Snapshot): Seq[String] =
    if (snap.runIds != null && snap.runIds.nonEmpty) snap.runIds
    else (1 to snap.version).map(readSnapshot(dir, _).lineage.runId)

  /** runIds of every committed snapshot in the chain — the idempotence
    * check for replayed streaming micro-batches (a replayed
    * foreachBatch must not double-commit). ONE snapshot read per call
    * (the cumulative index travels in each snapshot); legacy chains
    * without the index fall back to the linear walk. */
  def committedRunIds(dir: String): Set[String] =
    currentSnapshot(dir) match {
      case None => Set.empty
      case Some(s) => chainRunIds(dir, s).toSet
    }

  /** Compact the snapshot chain: rewrite every committed data/seen
    * dir into ONE dir each and commit a snapshot referencing only
    * those. A long-running streaming crawl appends one dataDir per
    * micro-batch commit, so without compaction [[readImages]] plans
    * O(versions) unions and the chain walk is O(versions²) over a
    * stream's life — this is the manifest-rewrite a real table format
    * (e.g. Iceberg's rewrite_data_files) runs on a schedule. Older
    * version dirs stay on disk for snapshot time travel; the
    * cumulative `runIds` index is preserved, so replay idempotence
    * survives even if old snapshot FILES are expired. No-op (None) on
    * an empty/uninitialized table. */
  def compact(spark: SparkSession, dir: String,
      note: String = "compaction"): Option[Snapshot] =
    currentSnapshot(dir).map { parent =>
      import spark.implicits._
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
        readSeen(spark, dir).toDF("urlHash").write.mode(SaveMode.Overwrite)
          .parquet(s"$dir/$seenDirName")
      // cumulative per-partition meta recomputed from the compacted
      // data (a regular commit's `partitions` covers its delta only)
      val parts =
        if (!hasImages) Seq.empty[PartitionMeta]
        else spark.read.parquet(s"$dir/$dataDirName")
          .groupBy($"site", $"year", $"month")
          .agg(count(lit(1)).as("rows"),
            sum(length($"bytes")).cast("long").as("bytes"))
          .collect()
          .map(r => PartitionMeta(r.getString(0), r.getInt(1), r.getInt(2),
            r.getLong(3), r.getLong(4)))
          .sortBy(p => (p.site, p.year, p.month))
          .toSeq
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
        runIds = chainRunIds(dir, parent) :+ runId)
      atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
      atomicWrite(hintPath(dir), version.toString)
      snap
    }

  /** Re-open periods for refetch (the reference's revised-data
    * workflow: a government portal republishes a month, the crawler
    * must re-download it — file deletion in the reference, a seen-set
    * eviction here). Commits a compaction-style snapshot whose data
    * EXCLUDES the given (site, year, month) partitions and whose seen
    * set excludes those partitions' urlHashes, so the next resumable
    * run refetches exactly those periods and skips everything else.
    * No-op (None) on an empty table. */
  def invalidatePeriods(spark: SparkSession, dir: String,
      periods: Set[(String, Int, Int)]): Option[Snapshot] =
    currentSnapshot(dir).map { parent =>
      import spark.implicits._
      val version = parent.version + 1
      val dataDirName = f"data/v$version%05d"
      val seenDirName = f"seen/v$version%05d"
      val all = readImages(spark, dir)
      val dropped = spark.sparkContext.broadcast(periods)
      val keepPred = (site: String, y: Int, m: Int) =>
        !dropped.value.contains((site, y, m))
      val keepUdf = udf(keepPred)
      val kept = all.filter(keepUdf($"site", $"year", $"month"))
      val droppedHashes = all
        .filter(!keepUdf($"site", $"year", $"month"))
        .select($"urlHash".as[Long])
      val hasImages = parent.dataDirs.nonEmpty && !kept.isEmpty
      if (hasImages)
        kept.write.mode(SaveMode.Overwrite)
          .partitionBy("site", "year", "month")
          .parquet(s"$dir/$dataDirName")
      val newSeen = readSeen(spark, dir).toDF("urlHash")
        .join(droppedHashes.toDF("dh"), col("urlHash") === col("dh"),
          "left_anti")
      val hasSeen = parent.seenDirs.nonEmpty && !newSeen.isEmpty
      if (hasSeen)
        newSeen.write.mode(SaveMode.Overwrite)
          .parquet(s"$dir/$seenDirName")
      val parts =
        if (!hasImages) Seq.empty[PartitionMeta]
        else spark.read.parquet(s"$dir/$dataDirName")
          .groupBy($"site", $"year", $"month")
          .agg(count(lit(1)).as("rows"),
            sum(length($"bytes")).cast("long").as("bytes"))
          .collect()
          .map(r => PartitionMeta(r.getString(0), r.getInt(1), r.getInt(2),
            r.getLong(3), r.getLong(4)))
          .sortBy(p => (p.site, p.year, p.month))
          .toSeq
      val runId = f"invalidate-v$version%05d"
      val snap = Snapshot(
        version,
        if (hasImages) Seq(dataDirName) else Nil,
        if (hasSeen) Seq(seenDirName) else Nil,
        parts,
        parts.map(_.rows).sum,
        Lineage(runId, parent.version,
          periods.toSeq.sorted.map(p => s"${p._1}/${p._2}/${p._3}"),
          s"re-opened ${periods.size} periods for refetch"),
        runIds = chainRunIds(dir, parent) :+ runId)
      atomicWrite(Paths.get(dir, "snapshots", f"v$version%05d.json"),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
      atomicWrite(hintPath(dir), version.toString)
      snap
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
    * rewrote them), orphaned dirs of crashed uncommitted writes, and
    * old snapshot files. The Iceberg `expire_snapshots` analog — time
    * travel to expired versions is gone, but replay idempotence
    * survives because the cumulative runIds index travels in the
    * latest snapshot (proven in TableIOSpec). Single-writer contract,
    * like commit/compact. */
  def expire(dir: String): Unit =
    currentSnapshot(dir).foreach { cur =>
      val keep = (cur.dataDirs ++ cur.seenDirs).toSet
      for (root <- Seq("data", "seen")) {
        val rp = Paths.get(dir, root)
        if (Files.exists(rp)) {
          val ls = Files.list(rp)
          try ls.forEach { child =>
            if (!keep.contains(s"$root/${child.getFileName}"))
              deleteRec(child)
          } finally ls.close()
        }
      }
      // make sure the surviving snapshot carries the runIds index
      // BEFORE deleting the chain it would otherwise be derived from
      // (legacy chains written before the index existed)
      if (cur.runIds == null || cur.runIds.isEmpty) {
        val withIds = cur.copy(runIds = chainRunIds(dir, cur))
        atomicWrite(Paths.get(dir, "snapshots", f"v${cur.version}%05d.json"),
          mapper.writerWithDefaultPrettyPrinter().writeValueAsString(withIds))
      }
      for (v <- 1 until cur.version)
        Files.deleteIfExists(Paths.get(dir, "snapshots", f"v$v%05d.json"))
    }

  /** Read the committed image table (union of all committed data dirs;
    * orphaned uncommitted dirs are never touched). */
  def readImages(spark: SparkSession, dir: String): DataFrame =
    currentSnapshot(dir) match {
      case Some(s) if s.dataDirs.nonEmpty =>
        // one read per commit dir (each has its own partition-discovery
        // root), then a metadata-only unionByName
        s.dataDirs.map(d => spark.read.parquet(s"$dir/$d"))
          .reduce(_.unionByName(_))
      case _ => spark.emptyDataFrame
    }

  /** Read the committed URL-seen set. */
  def readSeen(spark: SparkSession, dir: String): Dataset[Long] = {
    import spark.implicits._
    currentSnapshot(dir) match {
      case Some(s) if s.seenDirs.nonEmpty =>
        spark.read.parquet(s.seenDirs.map(d => s"$dir/$d"): _*)
          .select($"urlHash").as[Long].distinct()
      case _ => spark.emptyDataset[Long]
    }
  }
}
