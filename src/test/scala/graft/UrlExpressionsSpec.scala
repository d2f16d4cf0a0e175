package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.UrlExpressions
import graft.url.UrlCanon

/** The codegen Expressions must agree with the pure-Scala url module
  * and stay inside whole-stage codegen. */
class UrlExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val urls = Seq(
    "HTTP://Example.COM:80/a/../b?z=1&a=2#f",
    "https://aplicacoes.mds.gov.br/parcelas/consulta?by_year=2024",
    "https://h.gov.br/%7Euser/%41",
    null)

  test("expression results equal UrlCanon (interpreted + codegen)") {
    import spark.implicits._
    val df = urls.toDF("u")
      .select($"u", UrlExpressions.canonical_url($"u").as("c"),
        UrlExpressions.url_host($"u").as("h"))
    val got = df.collect().map(r => (r.getString(1), r.getString(2)))
    val want = urls.map {
      case null => (null, null)
      case u => (UrlCanon.canonicalize(u), UrlCanon.host(u))
    }
    assert(got.toSeq === want)
  }

  test("SQL registration + stays in WholeStageCodegen") {
    UrlExpressions.register(spark)
    // parquet-backed input so the projection can't constant-fold away
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("concat('https://Example.COM/x?b=', source) AS u")
      .createOrReplaceTempView("urls_t")
    val df = spark.sql(
      "SELECT canonical_url(u) AS c, url_host(u) AS h FROM urls_t")
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getString(1) == "example.com"))
    assert(rows.forall(_.getString(0).startsWith("https://example.com/x?b=")))
    // "*(n)" marks operators fused into WholeStageCodegen stage n
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("canonical_url") && l.trim.startsWith("*(")),
      s"expression fell out of codegen:\n$plan")
    // and not wrapped in a ScalaUDF (the thing we graduated from)
    assert(!plan.contains("ScalaUDF"), "expected native expression, got UDF")
  }

  test("GraftExtensions injects the functions at session construction") {
    // spark.sql.extensions is a STATIC conf (read from the
    // SparkContext at launch, i.e. spark-submit --conf); in-process we
    // exercise the same class through builder.withExtensions on an
    // isolated session over the shared context
    val sc = spark.sparkContext
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master(sc.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT canonical_url('HTTP://Ex.COM:80/a/../b#f') AS c," +
          " url_host('https://A.B.GOV.BR/x') AS h").collect()(0)
      assert(r.getString(0) === "http://ex.com/b")
      assert(r.getString(1) === "a.b.gov.br")
      // wrong arity fails analysis with the function named — never a
      // NoSuchElementException or a silently dropped argument
      val e = intercept[Exception] {
        s2.sql("SELECT canonical_url('a', 'b')").collect()
      }
      assert(e.getMessage.contains("canonical_url"), e.getMessage)
      val e0 = intercept[Exception] {
        s2.sql("SELECT url_host()").collect()
      }
      assert(e0.getMessage.contains("url_host"), e0.getMessage)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }
}
