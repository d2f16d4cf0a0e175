package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.UrlExpressions

/** Session-extension entry point: ship the engine's native Catalyst
  * expressions to ANY Spark app via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — without code
  * changes, the standard deployment shape for a Spark-native library
  * (the per-session `UrlExpressions.register` covers programmatic
  * use). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[UrlExpressions.type].getName, name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("canonical_url"),
      info("canonical_url",
        "canonical_url(url) - canonicalized URL (scheme/host case, " +
          "default ports, fragments, query sort)"),
      (exprs: Seq[Expression]) => UrlExpressions.CanonicalizeUrl(exprs.head)))
    ext.injectFunction((FunctionIdentifier("url_host"),
      info("url_host", "url_host(url) - lowercased host of the URL"),
      (exprs: Seq[Expression]) => UrlExpressions.UrlHost(exprs.head)))
  }
}
