package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Conversion helper shared by interpreted and codegen paths, delegating
  * the semantics to [[graft.functions.Text.wsTokens]]. */
object WsTokensKernel {
  def eval(s: UTF8String): ArrayData = {
    val t = graft.functions.Text.wsTokens(s.toString)
    val out = new Array[Any](t.length)
    var i = 0
    while (i < t.length) { out(i) = UTF8String.fromString(t(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: whitespace tokens of a string as
  * array&lt;string&gt; — the corpus-wide tokenization contract
  * (`[ \t\n\r]+` separators, empties dropped) that feeds the whole
  * vocabulary/token family (χ² q130, feature hashing q116, vocab
  * q117/q72, PMI q118, decontamination q119, surprisal q136, BPE q120,
  * chunking q65, quality stats q31 …).
  *
  * Replaces `filter(split(text, "[ \t\n\r]+"), t => t <> '')`: the split
  * compiles a regex and the filter lambda runs through the interpreted
  * expression machinery per token. The expression is one static call
  * inside whole-stage codegen; the kernel is a single character scan.
  * Tokenization runs before the first shuffle of every one of those
  * operators, so its per-row cost is the term a 100 TB corpus multiplies.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(v: Any): Any =
    WsTokensKernel.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WsTokensKernel.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
