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

  private def unary(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    // arity-checked: a malformed SQL call must fail analysis with the
    // function named, not NoSuchElementException / a silently dropped
    // second argument
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${exprs.length}")
    build(exprs.head)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("canonical_url"),
      info("canonical_url",
        "canonical_url(url) - canonicalized URL (scheme/host case, " +
          "default ports, fragments, query sort)"),
      unary("canonical_url")(UrlExpressions.CanonicalizeUrl(_))))
    ext.injectFunction((FunctionIdentifier("url_host"),
      info("url_host", "url_host(url) - lowercased host of the URL"),
      unary("url_host")(UrlExpressions.UrlHost(_))))
    ext.injectFunction((FunctionIdentifier("vec_dot_f32"),
      info("vec_dot_f32",
        "vec_dot_f32(a, b) - dot product of two float arrays " +
          "(double accumulation, codegen)"),
      { exprs =>
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"vec_dot_f32 requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.VecExpressions.FloatVecDot(exprs(0), exprs(1))
      }))
  }
}
