package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[DistinctNgrams]]: the number of DISTINCT character
  * n-grams of a string, n ≤ 4.
  *
  * Fast path (no astral codepoints): each n-gram packs into one long
  * (n × 16-bit UTF-16 units — exact, not a hash, so two grams collide
  * iff they are equal), the packed array sorts in place, and distinct
  * counting is one linear pass. Zero boxing, one `long[m]` allocation.
  *
  * A string containing surrogate pairs falls back to an exact
  * `HashSet[String]` over codepoint-indexed substrings, so semantics
  * stay identical to `size(array_distinct(transform(sequence(1,
  * length(s) − n + 1), i → substring(s, i, n))))` for EVERY input —
  * Spark's `substring`/`length` count codepoints, and so does the
  * DuckDB oracle.
  */
object DistinctNgramsKernel {
  def eval(s: UTF8String, n: Int): Long = {
    val str = s.toString
    // astral codepoints make UTF-16 unit indexing diverge from
    // codepoint indexing — take the exact slow path
    var hasAstral = false
    var k = 0
    while (k < str.length && !hasAstral) {
      if (Character.isHighSurrogate(str.charAt(k))) hasAstral = true
      k += 1
    }
    if (hasAstral) evalExact(str, n)
    else {
      val m = str.length - n + 1
      if (m <= 0) 0L
      else {
        val arr = new Array[Long](m)
        val mask = if (n >= 4) -1L else (1L << (16 * n)) - 1
        var h = 0L
        var i = 0
        while (i < str.length) {
          h = ((h << 16) | str.charAt(i)) & mask
          if (i >= n - 1) arr(i - n + 1) = h
          i += 1
        }
        java.util.Arrays.sort(arr)
        var d = 1L
        var j = 1
        while (j < m) {
          if (arr(j) != arr(j - 1)) d += 1
          j += 1
        }
        d
      }
    }
  }

  private def evalExact(str: String, n: Int): Long = {
    val cps = str.codePoints().toArray
    val m = cps.length - n + 1
    if (m <= 0) 0L
    else {
      val set = new java.util.HashSet[String](m * 2)
      var i = 0
      while (i < m) {
        set.add(new String(cps, i, n))
        i += 1
      }
      set.size.toLong
    }
  }
}

/** Native Catalyst expression: `distinct_ngrams(text, n)` — the distinct
  * character-n-gram count behind the compressibility proxy (q429): a
  * low distinct/total ratio is the cheap "gzip would crush this"
  * signal that screens template junk before tokenization.
  *
  * Replaces `size(array_distinct(transform(sequence(…), i →
  * substring(text, i, n))))`: the HOF chain is CodegenFallback and
  * allocates one UTF8String per gram plus an array-distinct hash per
  * row; this expression is one static call inside whole-stage codegen
  * and its kernel allocates a single `long[]` (grams pack exactly into
  * longs for n ≤ 4 — no hashing, no collisions). `n` must be a
  * foldable integer in 1..4.
  */
case class DistinctNgrams(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1 && n <= 4, s"distinct_ngrams supports n in 1..4, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_ngrams requires string, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "distinct_ngrams"

  override protected def nullSafeEval(v: Any): Any =
    DistinctNgramsKernel.eval(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DistinctNgramsKernel.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
