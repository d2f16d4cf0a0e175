package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S8: CSV scan with the reference's dialect-fallback cascade
  * (mds_parcelas.py:564-572, mds_saldo.py:852-892): Latin-1 encoding,
  * a skipped preamble line, `;` separator first, then `,`, then a
  * sniffed separator — finally degrading to a raw-line count frame.
  *
  * Files are the reference's per-download report artifacts (small,
  * many), so decoding runs distributed via `binaryFile` +
  * per-partition charset decode — one of the rare justified
  * imperative-per-partition spots: Spark's text source cannot decode
  * ISO-8859-1 and its CSV reader cannot skip preamble lines.
  */
object CsvDialect {

  private val Charset = java.nio.charset.Charset.forName("ISO-8859-1")

  /** Decoded, preamble-stripped lines of every file under `path`. */
  def latin1Lines(spark: SparkSession, path: String,
      skipLines: Int): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(bytes =>
        new String(bytes, Charset).split("\r?\n", -1).iterator
          .drop(skipLines).filter(_.nonEmpty))
  }

  /** Pick the separator: first candidate splitting the header into >1
    * column; else the most frequent non-alphanumeric header char. */
  private[sources] def sniffSep(header: String,
      candidates: Seq[String]): Option[String] = {
    candidates.find(s => header.split(java.util.regex.Pattern.quote(s), -1)
      .length > 1)
      .orElse {
        val counts = header.filter(c => !c.isLetterOrDigit && c != ' '
          && c != '"').groupBy(identity).view.mapValues(_.length)
        counts.toSeq.sortBy { case (c, n) => (-n, c) }.headOption
          .map(_._1.toString)
      }
  }

  /** The cascade: returns a parsed DataFrame with header-derived
    * column names, or — when no separator is found — a single-column
    * `line` frame (the reference's raw non-empty-line-count fallback).
    */
  def read(spark: SparkSession, path: String, skipLines: Int = 1,
      candidates: Seq[String] = Seq(";", ",")): DataFrame = {
    // cache only for the duration of this call: the sniff (head) and
    // the csv reader's header scan share one decode, then the cache is
    // released — callers' downstream actions re-read the (small)
    // source files instead of pinning decoded lines for the JVM life
    val lines = latin1Lines(spark, path, skipLines).cache()
    try {
      val header = lines.head(1).headOption.getOrElse("")
      sniffSep(header, candidates) match {
        case Some(sep) =>
          spark.read
            .option("sep", sep)
            .option("header", "true")
            .option("inferSchema", "false")
            .csv(lines)
        case None => lines.toDF("line")
      }
    } finally lines.unpersist(blocking = false)
  }

  /** A7: per-source record count (post-header). */
  def recordCount(spark: SparkSession, path: String,
      skipLines: Int = 1): Long = {
    val df = read(spark, path, skipLines)
    df.count()
  }
}
