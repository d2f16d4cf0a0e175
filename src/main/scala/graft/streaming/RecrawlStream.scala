package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.frontier.RecrawlSchedule]]: fetch
  * outcomes arrive as a stream, per-URL change-rate state accumulates
  * in `flatMapGroupsWithState`, and every micro-batch emits the
  * refreshed schedule for exactly the URLs it touched. This is how
  * the estimator actually runs in a live crawler — the batch form
  * recomputes every URL's schedule from the full history each time;
  * here a URL's state is five fields regardless of how many times it
  * was ever fetched, and URLs with no new fetches cost nothing.
  *
  * Ordering contract: within a micro-batch, fetches are applied in
  * `(tsUs, hash)` order (matching the batch lag window's ordering);
  * ACROSS micro-batches each URL's fetches must arrive time-ordered —
  * true of a crawler emitting outcomes as it fetches. With an
  * out-of-order source, feed through a watermarked sort upstream.
  *
  * Scale shape: state is O(live URLs) × 5 fields — no history rows
  * retained; the shuffle is the groupByKey on url that any per-key
  * stateful op pays, carrying (url, ts, 16-byte hash) only. */
object RecrawlStream {

  /** One observed fetch: the url key, fetch time (epoch micros), and
    * the fetched content's hash. */
  case class FetchEvent(url: String, tsUs: Long, hash: String)

  /** Per-URL accumulator: fetch count, change count, first/last fetch
    * times, and the last content hash (what the next fetch diffs
    * against). */
  case class UrlFetchState(n: Long, changes: Long, firstUs: Long,
      lastUs: Long, lastHash: String)

  /** A refreshed schedule row — identical semantics to the batch
    * [[graft.frontier.RecrawlSchedule.schedule]] columns. */
  case class ScheduleUpdate(url: String, nFetches: Long, nChanges: Long,
      firstUs: Long, lastUs: Long, intervalUs: Long, nextFetchUs: Long)

  private def toUpdate(url: String, s: UrlFetchState,
      minIntervalUs: Long, maxIntervalUs: Long): ScheduleUpdate = {
    val interval =
      if (s.n <= 1) maxIntervalUs
      else math.max(minIntervalUs, math.min(maxIntervalUs,
        (s.lastUs - s.firstUs) / (s.changes + 1)))
    ScheduleUpdate(url, s.n, s.changes, s.firstUs, s.lastUs,
      interval, s.lastUs + interval)
  }

  /** The stateful handler, exposed for direct unit testing. */
  def handleUrl(minIntervalUs: Long, maxIntervalUs: Long)(
      url: String, events: Iterator[FetchEvent],
      state: GroupState[UrlFetchState]): Iterator[ScheduleUpdate] = {
    val sorted = events.toSeq.sortBy(e => (e.tsUs, e.hash))
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.orNull
    sorted.foreach { e =>
      s =
        if (s == null) UrlFetchState(1L, 0L, e.tsUs, e.tsUs, e.hash)
        else UrlFetchState(s.n + 1,
          s.changes + (if (s.lastHash != e.hash) 1L else 0L),
          s.firstUs, e.tsUs, e.hash)
    }
    state.update(s)
    Iterator.single(toUpdate(url, s, minIntervalUs, maxIntervalUs))
  }

  /** Wire a fetch-event stream into per-URL schedule updates: append
    * mode, one update per touched URL per micro-batch, state bounded
    * by the live-URL count. */
  def scheduleUpdates(events: Dataset[FetchEvent],
      minIntervalUs: Long = 3600L * 1000000,
      maxIntervalUs: Long = 7L * 24 * 3600 * 1000000)
      : Dataset[ScheduleUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(minIntervalUs > 0 && maxIntervalUs >= minIntervalUs,
      s"bad clamp [$minIntervalUs, $maxIntervalUs]")
    events
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handleUrl(minIntervalUs, maxIntervalUs))
  }
}
