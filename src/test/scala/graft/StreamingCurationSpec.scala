package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** The curation operators are declarative Column/DataFrame transforms,
  * so the stateless stages (C4 line cleaning, PII redaction, token
  * gate, stratified sampling) run UNCHANGED over a Structured
  * Streaming source — same code, `readStream` instead of `read`. This
  * spec pins that: the streamed output across two micro-batches equals
  * the batch run on the same rows, row for row. (The stateful stages —
  * cross-batch dedup and the index-probe sink — have their own specs
  * in StreamingCrawlSpec; this one covers the map-side family.)
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stateless curation stages stream unchanged: two micro-batches equal the batch run") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val docs = (0L until 60L).map { i =>
      (i, if (i % 2 == 0) "en" else "zh", s"s${i % 3}",
        s"Document $i carries enough words to survive the gate always." +
          "\nno terminal punctuation so this line drops" +
          s"\nCall +1-555-0${100 + i} right now today!")
    }

    def curate(df: DataFrame): DataFrame =
      df.select($"doc_id", $"lang", $"source",
          TextOps.piiRedact(TextOps.c4CleanLines($"text")).as("text"))
        .filter(size(split($"text", " ")) >= 5)
        .transform(d =>
          TextOps.sampleStratified(d, Map("en" -> 0.7, "zh" -> 0.4)))
        .select($"doc_id", $"lang", $"text")

    val ms = MemoryStream[(Long, String, String, String)]
    val q = curate(ms.toDF.toDF("doc_id", "lang", "source", "text"))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    ms.addData(docs.take(30): _*); q.processAllAvailable()
    ms.addData(docs.drop(30): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("curated")
      .as[(Long, String, String)].collect().toSet
    val want = curate(docs.toDF("doc_id", "lang", "source", "text"))
      .as[(Long, String, String)].collect().toSet
    assert(got === want)
    // the pipeline did real work: PII gone, sampling dropped rows
    assert(want.nonEmpty && want.size < docs.size)
    assert(want.forall(_._3.contains("[PHONE]")))
    assert(want.forall(!_._3.contains("+1-555")))
  }

  test("dust canonicalization streams unchanged: stream-static broadcast join per micro-batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // mined rules are a STATIC table; the frontier is the stream —
    // applyParamRules' broadcast join is exactly the stream-static
    // join Structured Streaming executes per micro-batch, so frontier
    // canonicalization needs no stateful operator at all
    val rules = Seq(("a.test", "sid")).toDF("host", "param")
    val urls = Seq(
      "http://a.test/p?sid=1", "http://a.test/p?sid=2&x=1",
      "http://b.test/q?sid=3", "http://a.test/bare")
    val ms = MemoryStream[String]
    val q = graft.frontier.DustDetect
      .applyParamRules(ms.toDF.toDF("url"), rules)
      .select($"url", $"canonical")
      .writeStream.format("memory").queryName("canon")
      .outputMode("append").start()
    ms.addData(urls.take(2): _*); q.processAllAvailable()
    ms.addData(urls.drop(2): _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("canon")
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "http://a.test/p?sid=1" -> "http://a.test/p",
      "http://a.test/p?sid=2&x=1" -> "http://a.test/p?x=1",
      "http://b.test/q?sid=3" -> "http://b.test/q?sid=3",
      "http://a.test/bare" -> "http://a.test/bare"))
  }
}
