package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression realizing RFC 9309 §2.2.2 rule
  * precedence — longest matching prefix decides, `Allow` wins length
  * ties — against a per-host rule ARRAY carried on a broadcast
  * dimension row (rules arrive as a table at million-host scale, per
  * [[graft.jobs.CrawlJob.buildFrontier]]).
  *
  * Why an Expression and not `aggregate`/`filter` higher-order
  * functions: those are CodegenFallback in Spark 4 and break the
  * whole-stage-codegen span of the projection containing them
  * (measured for the ANN path, BENCH.md §0a — same mechanics here).
  * The generated code calls one static kernel that loops over the
  * unsafe struct array with no boxing and no lambda dispatch, exactly
  * the [[VecExpressions.FloatVecDot]] pattern.
  *
  * Semantics are pinned to [[graft.politeness.RobotsTxt.Rules.permits]]
  * by a randomized-agreement spec (RobotsExpressionSpec).
  */
object RobotsExpressions {

  /** RFC 9309 §2.2.3 rule match, allocation-free over UTF8String
    * bytes: `*` spans any byte run, a trailing `$` anchors the rule to
    * the path END; otherwise a rule matches as a prefix-glob. The
    * iterative single-star-backtrack loop is the classic glob matcher
    * (Kernighan/Pike); byte-level matching is exact for UTF-8 because
    * the metacharacters are ASCII and UTF-8 is self-synchronizing. */
  def ruleMatches(path: UTF8String, pat: UTF8String): Boolean = {
    val pn = pat.numBytes()
    val sn = path.numBytes()
    val anchored = pn > 0 && pat.getByte(pn - 1) == '$'
    val pEnd = if (anchored) pn - 1 else pn
    var s = 0; var p = 0; var starP = -1; var starS = 0
    while (true) {
      if (p == pEnd) {
        // pattern consumed: a prefix-glob match unless `$` demands the
        // path also be consumed — then push the last `*` one byte on
        if (!anchored || s == sn) return true
        if (starP < 0) return false
        starS += 1; if (starS > sn) return false
        p = starP + 1; s = starS
      } else if (pat.getByte(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (s < sn && pat.getByte(p) == path.getByte(s)) {
        p += 1; s += 1
      } else if (starP >= 0) {
        starS += 1; if (starS > sn) return false
        p = starP + 1; s = starS
      } else return false
    }
    false // unreachable
  }

  /** Codegen-reachable static kernel. `rules` rows are
    * (pattern: string, allow: boolean); most-specific (longest raw
    * pattern, wildcards counted) match decides, Allow wins ties, no
    * matching rule → permitted — the same specificity order Google's
    * open-source matcher uses, agreed byte-for-byte with
    * [[graft.politeness.RobotsTxt.Rules.permits]]. */
  def permits(path: UTF8String, rules: ArrayData): Boolean = {
    var bestAllow = -1
    var bestDis = -1
    val n = rules.numElements()
    var i = 0
    while (i < n) {
      val r = rules.getStruct(i, 2)
      val pattern = r.getUTF8String(0)
      if (ruleMatches(path, pattern)) {
        val len = pattern.numBytes()
        if (r.getBoolean(1)) { if (len > bestAllow) bestAllow = len }
        else if (len > bestDis) bestDis = len
      }
      i += 1
    }
    bestAllow >= bestDis
  }

  case class RobotsPermits(left: Expression, right: Expression)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult = {
      val rulesOk = right.dataType match {
        case ArrayType(s: StructType, _) if s.length == 2 =>
          s.fields(0).dataType == StringType &&
            s.fields(1).dataType == BooleanType
        case _ => false
      }
      if (left.dataType == StringType && rulesOk)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<struct<string,boolean>>), " +
          s"got ${left.dataType.simpleString} and " +
          right.dataType.simpleString)
    }
    override protected def nullSafeEval(p: Any, r: Any): Any =
      permits(p.asInstanceOf[UTF8String], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (p, r) =>
        s"graft.functions.RobotsExpressions.permits($p, $r)")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): RobotsPermits = copy(l, r)
    override def prettyName: String = "robots_permits"
  }

  /** Column API. Standard null-intolerant semantics: null path or null
    * rules (host without a robots row after an outer join) → null —
    * callers `coalesce` to the open-web default `true`. */
  def robots_permits(path: Column, rules: Column): Column =
    ColumnBridge.column(RobotsPermits(
      ColumnBridge.expression(path), ColumnBridge.expression(rules)))
}
