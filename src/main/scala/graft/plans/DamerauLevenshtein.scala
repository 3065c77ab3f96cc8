package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FULL Damerau–Levenshtein distance (Lowrance–Wagner: a transposed pair
  * may be edited again later), matching the reference engines —
  * distinguishable from the cheaper optimal-string-alignment variant by
  * dl("CA","AB C"-like cases: dl("CA","ABC") = 2, OSA gives 3. All-integer
  * by nature, so cross-engine exactness is free (unlike the float
  * similarity family). O(l1·l2) time and matrix memory — the right tool
  * for linkage keys (names, titles), not megabyte documents; the doc-scale
  * tools are the shingle/MinHash family. */
object DamerauLevenshteinKernel {
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    val w = l2 + 2
    // d is (l1+2) x (l2+2), flattened; logical index [i][j] over -1..l1 x
    // -1..l2 maps to ((i+1) * w + (j+1))
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= l2) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * w + (j + 1)) =
          math.min(math.min(subst, insert), math.min(delete, transp))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + (l2 + 1))
  }
}

/** `damerau_levenshtein(a, b)` → full DL edit distance as an int — the
  * typo-realistic companion to Spark's built-in `levenshtein` (adjacent
  * transposition, the single most common human typo, costs 1 instead of
  * 2). Whole-stage codegen via one static kernel call; registered by
  * [[GraftExtensions]]. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) =
      t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"damerau_levenshtein requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshteinKernel.distance(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DamerauLevenshteinKernel.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
