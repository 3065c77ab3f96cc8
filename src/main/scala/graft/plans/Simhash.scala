package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a string as a 64-char bit
  * string, delegating to [[graft.functions.Text.simhashBits]] (one MD5 per
  * token — the same recipe the SQL oracle re-derives with `md5()`).
  *
  * Replaces the Scala UDF that previously wrapped the function in the
  * SimHash dedup path ([[graft.etl.Similarity.withSimhash]], q28): a UDF
  * pays the catalyst-converter boundary (UTF8String→String→UTF8String plus
  * null boxing) through reflection per row, and — worse — is opaque to the
  * optimizer, which pessimistically blocks filter/projection pushdown
  * through it. The expression stays inside whole-stage codegen via a
  * static call; the MD5 work itself is unchanged (that cost is the
  * operator, not overhead).
  */
case class Simhash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires string, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      graft.functions.Text.simhashBits(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.Text.simhashBits($c.toString()));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
