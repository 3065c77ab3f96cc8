package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing kernel shared by interpreted and codegen paths.
  * Semantics are EXACTLY [[graft.functions.Text.winnow]] (the spec pins
  * parity): k-char-gram rolling hashes (base 257 mod 2³¹−1 over UTF-16
  * units), per-window-of-`window` minima, distinct in first-occurrence
  * order; a text shorter than k is its own single gram, ≤ window grams
  * yield one global minimum, the empty string yields an empty array.
  * Unlike the Seq-based original (iterator sliding, boxed Vector,
  * per-gram String allocation) this runs on the raw char array with one
  * primitive gram buffer — the per-document cost every fingerprint row
  * of a 100 TB corpus pays. */
object WinnowKernel {
  private val Mod = (1L << 31) - 1

  def eval(s: UTF8String, k: Int, window: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val g = if (n < k) 1 else n - k + 1
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h = 0L
      val end = math.min(i + k, n)
      var j = i
      while (j < end) { h = (h * 257 + str.charAt(j)) % Mod; j += 1 }
      grams(i) = h
      i += 1
    }
    if (g <= window) {
      var m = grams(0)
      i = 1
      while (i < g) { if (grams(i) < m) m = grams(i); i += 1 }
      return new GenericArrayData(Array[Any](m))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val lastStart = g - window
    i = 0
    while (i <= lastStart) {
      var m = grams(i)
      var j = i + 1
      while (j < i + window) { if (grams(j) < m) m = grams(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next().longValue(); idx += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression `winnow_fps(text, k, window)` — winnowing
  * document fingerprints as array&lt;long&gt;, the candidate-generation
  * primitive of the local-overlap detector (q53, q362). Replaces the one
  * Scala UDF that sat in a fingerprinting hot path: a UDF boxes the row,
  * round-trips String ⇄ UTF8String, and is opaque to the optimizer; this
  * is a static kernel call inside whole-stage codegen, same policy as
  * [[WordShingles]]. */
case class Winnow(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType if k >= 1 && window >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType | NullType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps k and window must be >= 1, got k=$k window=$window")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(v: Any): Any =
    WinnowKernel.eval(v.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowKernel.eval($c, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
