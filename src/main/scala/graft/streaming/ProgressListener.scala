package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming progress → metrics (SURVEY §2.10 "progress callbacks"):
  * the Spark-native replacement for the reference's per-step
  * progress_callback plumbing (mds_saldo.py:330-346,
  * portal_saude_mg.py progress hooks) — a [[StreamingQueryListener]]
  * records one row per micro-batch (rows in, processing rate, batch
  * duration) and exposes them as a DataFrame for the metrics table. */
/** One micro-batch's progress row (top-level so Spark can derive an
  * Encoder without an outer scope). */
final case class BatchProgress(queryId: String, batchId: Long,
    numInputRows: Long, processedRowsPerSecond: Double,
    batchDurationMs: Long)

final class CrawlProgressListener extends StreamingQueryListener {

  private val batches = new ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    batches.add(BatchProgress(p.id.toString, p.batchId, p.numInputRows,
      if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      p.durationMs.values.stream.mapToLong(_.longValue).sum))
  }

  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Recorded per-batch progress as a metrics DataFrame. */
  def toDF(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    batches.iterator.asScala.toSeq.toDF()
  }
}

object CrawlProgressListener {
  /** Register a fresh listener on the session; caller removes it with
    * `spark.streams.removeListener` when done. */
  def attach(spark: SparkSession): CrawlProgressListener = {
    val l = new CrawlProgressListener
    spark.streams.addListener(l)
    l
  }
}
