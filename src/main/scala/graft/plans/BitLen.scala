package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Bin, Expression, Length, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, NullType}

/** Native Catalyst expression: the BIT LENGTH of a long, defined to be
  * exactly `length(bin(x))` — the repo-wide floored-log₂ quantization
  * idiom (surprisal, KL/JS/PSI drift, mutual information, Naive Bayes,
  * held-out cross-entropy, decayed scores… all build on it):
  *
  *   x > 0 → 64 − numberOfLeadingZeros(x)   (⌊log₂x⌋ + 1)
  *   x = 0 → 1                               ("0" has length 1)
  *   x < 0 → 64                              (two's-complement string)
  *
  * The built-in spelling materializes a binary STRING per row (up to 64
  * bytes through the UTF8String allocator) only to take its length;
  * this expression is two branch-free-ish instructions inside
  * whole-stage codegen. [[BitLenRewrite]] rewrites every
  * `length(bin(x))` in every query plan to it, so call sites keep the
  * portable spelling (which the DuckDB oracles share) and silently get
  * the tight form — the same contract as [[QDotRewrite]].
  */
case class BitLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitlen requires bigint, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitlen"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x == 0L) 1
    else if (x < 0L) 64
    else 64 - java.lang.Long.numberOfLeadingZeros(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ($c == 0L) ? 1 :
         |  (($c < 0L) ? 64 : 64 - java.lang.Long.numberOfLeadingZeros($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: `length(bin(x))` → [[BitLen]] for bigint `x`.
  *
  * Semantics are identical by construction for every long (positive,
  * zero, negative, NULL — see the [[BitLen]] table, which mirrors
  * `Long.toBinaryString`); the rewrite only drops the per-row binary
  * string the built-in pair materializes. Queries keep the portable
  * `length(bin(x))` spelling that the DuckDB oracle re-derives, so the
  * cross-engine contract is untouched.
  */
object BitLenRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Length(Bin(child)) if child.dataType == LongType =>
        logDebug(s"rewriting length(bin(x)) to bitlen: ${child.sql}")
        BitLen(child)
    }
}
