package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, sqrt, when}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * Spark's higher-order array functions (`zip_with` + `aggregate`)
  * are CodegenFallback: every evaluation walks interpreted lambda
  * nodes and binds lambda variables per element, and their presence
  * BREAKS the whole-stage-codegen span of the projection that contains
  * them. For ANN scoring — one dot product per candidate PAIR — that
  * interpreter overhead is the hot path, so the dot product is a real
  * `Expression` with `doGenCode`: generated code calls one static
  * helper that loops over the two unsafe float arrays with no boxing,
  * no lambda dispatch, and keeps the surrounding projection inside
  * whole-stage codegen.
  *
  * Accumulation is the same ascending sequential double fold as
  * [[graft.ops.AnnOps.dot]] — bit-identical results.
  */
object VecExpressions {

  /** Codegen-reachable static kernel over catalyst ArrayData. */
  def dotF32(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType): Boolean = t match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.VecExpressions.dotF32($a, $b)")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): FloatVecDot = copy(l, r)
    override def prettyName: String = "vec_dot_f32"
  }

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** IEEE norm of a float vector (sqrt of the codegen dot). */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** Cosine from precomputed per-side norms (see AnnOps scoring). */
  def vec_cosine(qv: Column, cv: Column, qn: Column, cn: Column): Column = {
    val d = qn * cn
    when(d === 0.0, lit(0.0)).otherwise(vec_dot(qv, cv) / d)
  }
}
