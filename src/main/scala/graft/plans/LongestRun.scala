package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: length of the longest run of equal adjacent
  * elements in an `array<string>` (0 for an empty array; a null element
  * breaks runs and never matches). On a SORTED array this is the maximum
  * multiplicity of any value — the top-bigram count of the repetition
  * quality gate ([[graft.etl.Corpus.repetitionStatsCols]]).
  *
  * Exists for the same reason as [[QDot]]: the `aggregate` higher-order
  * fold it replaces is CodegenFallback, paying interpreted lambda dispatch
  * plus a struct allocation per element, per document — and the corpus
  * curation gate runs this over every document in a 100 TB corpus. The
  * generated loop keeps the whole filter inside whole-stage codegen.
  */
case class LongestRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"longest_run requires array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "longest_run"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = 0L
    var run = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) { prev = null; run = 0L }
      else {
        val cur = a.getUTF8String(i)
        run = if (prev != null && cur.equals(prev)) run + 1L else 1L
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val u = classOf[UTF8String].getName
      s"""
         |${ev.value} = 0L;
         |long $run = 0L;
         |$u $prev = null;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { $prev = null; $run = 0L; continue; }
         |  $u $cur = $a.getUTF8String($i);
         |  $run = ($prev != null && $cur.equals($prev)) ? $run + 1L : 1L;
         |  if ($run > ${ev.value}) ${ev.value} = $run;
         |  $prev = $cur;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
