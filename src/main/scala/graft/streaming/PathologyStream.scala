package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.url.Hashing

/** Streaming form of [[graft.frontier.DustDetect.trapHosts]]: fetched
  * pages arrive as a stream and per-host trap statistics accumulate in
  * `flatMapGroupsWithState`, so the frontier can starve a trap host
  * WHILE the crawl runs instead of discovering it in the next batch
  * audit. The batch form's `count(distinct content_hash)` is replaced
  * by a KMV sketch (Bar-Yossef et al. 2002, "Counting Distinct
  * Elements in a Data Stream"): the `k` smallest xxhash64 values of
  * the content hashes seen — EXACT while a host has fewer than `k`
  * distinct contents (the set simply isn't full), a lower bound after.
  * Trap flagging stays sound under saturation: a saturated sketch
  * proves ≥ `k` distinct contents, so the flag is only raised while
  * the count is exact — pick `k` above `budget/dupFactor` for the
  * per-host fetch budget and saturation can never hide a real trap
  * (a host fetch-capped at B URLs with ≥ k > B/dupFactor distinct
  * contents fails the trap inequality outright).
  *
  * Scale shape: state is O(live hosts) × (two counters + ≤ k longs —
  * 8 KiB at the default k=1024); the shuffle is the groupByKey on
  * host any per-key stateful op pays, carrying (host, 8-byte content
  * key, depth) only — payloads and URLs never enter the state store. */
object PathologyStream {

  /** One fetched page: host, the content digest (any stable string
    * form), and the URL's path depth (as
    * [[graft.frontier.DustDetect.trapHosts]] derives it). */
  case class PageEvent(host: String, contentHash: String, depth: Long)

  /** Per-host accumulator: URL count, max depth, and the KMV sketch —
    * the `k` smallest xxhash64(contentHash) values, sorted ascending.
    * `kmv.length < k` ⇒ `kmv.length` IS the exact distinct count. */
  case class HostTrapState(nUrls: Long, maxDepth: Long, kmv: Seq[Long])

  /** A refreshed per-host trap row. `nDistinctMin` is exact when
    * `saturated` is false, a lower bound (= k) when true; `isTrap` is
    * raised only on exact counts — see the saturation note above. */
  case class TrapUpdate(host: String, nUrls: Long, nDistinctMin: Long,
      maxDepth: Long, saturated: Boolean, isTrap: Boolean)

  /** The stateful handler, exposed for direct unit testing. */
  def handleHost(k: Int, minUrls: Long, dupFactor: Long)(
      host: String, events: Iterator[PageEvent],
      state: GroupState[HostTrapState]): Iterator[TrapUpdate] = {
    val batch = events.toSeq
    if (batch.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(HostTrapState(0L, 0L, Nil))
    var set = prev.kmv.toVector
    batch.foreach { e =>
      val h = Hashing.xxh64(e.contentHash)
      // insert-if-small keeps the k minima; Vector search is fine at
      // k ≤ a few thousand (one state update per host per micro-batch)
      if (!set.contains(h)) {
        if (set.length < k) set = (set :+ h).sorted
        else if (h < set.last) set = (set.init :+ h).sorted
      }
    }
    val s = HostTrapState(prev.nUrls + batch.length,
      math.max(prev.maxDepth, batch.map(_.depth).max), set)
    state.update(s)
    val saturated = s.kmv.length >= k
    val nDistinct = s.kmv.length.toLong
    Iterator.single(TrapUpdate(host, s.nUrls, nDistinct, s.maxDepth,
      saturated,
      !saturated && s.nUrls >= minUrls &&
        nDistinct * dupFactor <= s.nUrls))
  }

  /** Wire a fetched-page stream into per-host trap updates: append
    * mode, one update per touched host per micro-batch, state bounded
    * by live hosts × k. */
  def trapUpdates(pages: Dataset[PageEvent], k: Int = 1024,
      minUrls: Long = 5L, dupFactor: Long = 4L): Dataset[TrapUpdate] = {
    val spark = pages.sparkSession
    import spark.implicits._
    require(k >= 1 && minUrls >= 1 && dupFactor >= 1)
    pages
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handleHost(k, minUrls, dupFactor))
  }
}
