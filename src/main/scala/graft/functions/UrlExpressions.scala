package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.url.UrlCanon

/** Native Catalyst expressions for the URL hot path (SURVEY §7.4:
  * "Scala UDF first; Expression with codegen if hot"). Unlike a Scala
  * UDF these stay inside whole-stage codegen — no
  * encode/decode-to-external-String round trip per row, no closure
  * dispatch — and are null-intolerant so Catalyst can reason about
  * null propagation.
  */
object UrlExpressions {

  /** Codegen-reachable helpers (static, UTF8String → UTF8String). */
  def canon(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.canonicalize(u.toString))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.host(u.toString))

  abstract class UrlUnary extends UnaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = StringType
    protected def helperName: String
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.UrlExpressions.$helperName($c)")
  }

  case class CanonicalizeUrl(child: Expression) extends UrlUnary {
    override protected def nullSafeEval(u: Any): Any =
      canon(u.asInstanceOf[UTF8String])
    override protected def helperName: String = "canon"
    override protected def withNewChildInternal(c: Expression)
        : CanonicalizeUrl = copy(c)
    override def prettyName: String = "canonical_url"
  }

  case class UrlHost(child: Expression) extends UrlUnary {
    override protected def nullSafeEval(u: Any): Any =
      host(u.asInstanceOf[UTF8String])
    override protected def helperName: String = "host"
    override protected def withNewChildInternal(c: Expression): UrlHost =
      copy(c)
    override def prettyName: String = "url_host"
  }

  def canonical_url(c: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(c)))
  def url_host(c: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(c)))

  private def one(name: String, exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${exprs.length}")
    exprs.head
  }

  /** SQL surface: `SELECT canonical_url(u), url_host(u)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_url",
      exprs => CanonicalizeUrl(one("canonical_url", exprs)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_host", exprs => UrlHost(one("url_host", exprs)), "scala_udf")
  }
}
