package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Freshness-driven recrawl scheduling (after Cho & Garcia-Molina,
  * "Effective Page Refresh Policies for Web Crawlers", TODS'03 — the
  * uniform change-rate estimator, realized in pure INTEGER arithmetic
  * so the schedule is bit-identical across engines and
  * partitionings): from a per-URL fetch history (url key, fetch time
  * in epoch micros, content hash), estimate the inter-change interval
  * as observed_span / (changes + 1) and schedule the next fetch that
  * far after the last one, clamped to [minIntervalUs, maxIntervalUs].
  * A page whose every fetch changed refetches at its observed fetch
  * cadence; a page that never changed backs off toward the max as its
  * history grows (span grows, changes stays zero). The reference
  * crawler's only freshness logic is skip-if-exists
  * (src/modules/sites/portal_saude_mg.py:453 — a file once downloaded
  * is never refreshed); this is the scheduler a 10^10-URL frontier
  * needs to spend its politeness budget where content actually moves.
  *
  * Scale shape: ONE urlHash exchange feeds both the change-detection
  * lag window and the per-URL aggregate (the groupBy reuses the
  * window's partitioning — plan-gated like sessionization). History
  * rows carry (key, ts, 16-byte hash): the content itself never
  * shuffles.
  */
object RecrawlSchedule {

  /** Per-URL schedule `(url, n_fetches, n_changes, first_us, last_us,
    * interval_us, next_fetch_us)`. `tsUsCol` must be epoch
    * microseconds (long); a change is a fetch whose content hash
    * differs from the PREVIOUS fetch of the same url. Single-fetch
    * urls get `maxIntervalUs` (no evidence yet — don't burn budget). */
  def schedule(history: DataFrame, urlCol: String, tsUsCol: String,
      hashCol: String, minIntervalUs: Long = 3600L * 1000000,
      maxIntervalUs: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    val spark = history.sparkSession
    import spark.implicits._
    require(minIntervalUs > 0 && maxIntervalUs >= minIntervalUs,
      s"bad clamp [$minIntervalUs, $maxIntervalUs]")
    history
      .select(col(urlCol).as("url"), col(tsUsCol).as("ts_us"),
        col(hashCol).as("ch"))
      .withColumn("prev", lag($"ch", 1).over(
        Window.partitionBy($"url").orderBy($"ts_us", $"ch")))
      .withColumn("chg",
        when($"prev".isNotNull && $"prev" =!= $"ch", 1L).otherwise(0L))
      .groupBy($"url")
      .agg(count(lit(1)).as("n_fetches"), sum($"chg").as("n_changes"),
        min($"ts_us").as("first_us"), max($"ts_us").as("last_us"))
      .withColumn("interval_us",
        when($"n_fetches" <= 1, lit(maxIntervalUs))
          .otherwise(greatest(lit(minIntervalUs),
            least(lit(maxIntervalUs),
              expr("(last_us - first_us) div (n_changes + 1)")))))
      .withColumn("next_fetch_us", $"last_us" + $"interval_us")
  }
}
