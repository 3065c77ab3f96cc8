package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[LangHits]]: one pass over the single-space-split tokens
  * of a string, counting case-insensitive marker-word hits for every
  * language profile in [[graft.functions.Text.langProfiles]] order.
  *
  * Tokenization contract matches the q30 langid spelling exactly —
  * `filter(split(text, ' '), t ≠ '')` then `lower` — NOT the `[ \t\n\r]`
  * ws_tokens class, because that is what the q30/q426 oracles mirror. */
object LangHitsKernel {
  private val profiles: Array[java.util.HashSet[String]] =
    graft.functions.Text.langProfiles.map { case (_, set) =>
      val h = new java.util.HashSet[String](set.size * 2)
      set.foreach(h.add)
      h
    }.toArray

  val nLangs: Int = profiles.length

  def eval(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val counts = new Array[Int](profiles.length)
    var start = 0
    val len = str.length
    var i = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) {
          // default-locale toLowerCase ON PURPOSE: the kernel replaces a
          // HOF spelling built on Spark's lower(), which has the same
          // default-locale semantics — parity with the portable spelling
          // is the contract here, not JVM-locale independence. (Under
          // tr_TR 'I'→'ı' both paths shift identically; the oracle
          // harness runs on a ROOT-locale JVM where both match DuckDB.)
          // Do NOT "fix" to Locale.ROOT one-sidedly.
          val tok = str.substring(start, i).toLowerCase
          var p = 0
          while (p < profiles.length) {
            if (profiles(p).contains(tok)) counts(p) += 1
            p += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(Integer.valueOf(_): Any))
  }
}

/** Native Catalyst expression: `lang_hits(text)` — marker-word hit
  * counts for all language profiles in one token scan, as array&lt;int&gt;
  * in [[graft.functions.Text.langProfiles]] order (de, en, es, fr, nl).
  *
  * Replaces five per-language `size(filter(toks, t → t IN (…)))` HOFs:
  * besides being CodegenFallback, the shared `toks` alias gets INLINED
  * by Catalyst into each of the five filters, so the split+lower chain
  * executes five times per row. This expression tokenizes once and
  * tests each token against all profiles — the scan cost a 100 TB
  * language-ID pass actually pays. */
case class LangHits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_hits requires string, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_hits"

  override protected def nullSafeEval(v: Any): Any =
    LangHitsKernel.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LangHitsKernel.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
