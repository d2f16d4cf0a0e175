package graft.fetch

import graft.model._

/** Payload materialization + validation (P3), decoupled from the
  * politeness/ordering stage: the scheduler's log rows are byte-free,
  * and image bytes are (re)generated here only for consumers that
  * actually read them — so payloads never ride through the dedup or
  * scheduling shuffles, caches, or checkpoints. At 100 TB this is the
  * difference between shuffling ~100 bytes/URL of metadata and
  * shuffling the corpus itself.
  *
  * Deterministic: payload is a pure function of (urlHash, title), the
  * same function the synthetic web serves, so regeneration after the
  * schedule is exact. (A real crawler materializes payloads at fetch
  * time into the data sink — same dataflow position, same schema.)
  */
object PayloadStage {

  /** The validated image record for one crawl-log row, or None for
    * rows without a durable artifact. Corrupt fetches generate their
    * (invalid) bytes and are dropped by the size/magic filter — the
    * reference's download-then-validate order
    * (portal_saude_mg.py:523-561). */
  def imageFor(l: CrawlLogEntry): Option[ImageRecord] = l.status match {
    case CrawlStatus.Success =>
      val p = SyntheticWeb.payload(l.urlHash, l.title)
      if (!ImageCodec.validMagic(p.bytes, p.fmt))
        // cannot happen for well-formed payloads; fail loudly rather
        // than silently diverging from the simulator
        throw new IllegalStateException(s"invalid success payload: ${l.url}")
      Some(ImageRecord(l.imageId, p.bytes, p.w, p.h, p.fmt, p.caption,
        p.phash, l.site, l.year, l.month, l.url, l.urlHash, l.vtimeMs,
        l.attempts))
    case CrawlStatus.Corrupt =>
      val p = SyntheticWeb.corruptPayload(l.urlHash)
      if (ImageCodec.validMagic(p.bytes, p.fmt))
        throw new IllegalStateException(s"corrupt payload validated: ${l.url}")
      None // P3 filter drops it
    case _ => None
  }
}
