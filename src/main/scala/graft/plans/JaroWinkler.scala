package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact-rational Jaro–Winkler kernel.
  *
  * Jaro similarity is a RATIONAL number — with m matches,
  * t = ⌊half-transpositions / 2⌋ and lengths l1, l2:
  *   jaro = (m/l1 + m/l2 + (m − t)/m) / 3
  *        = (m²(l1+l2) + (m−t)·l1·l2) / (3·m·l1·l2)
  * and the Winkler prefix bonus (weight 1/10, prefix capped at 4,
  * applied when jaro ≥ 0.7) keeps it rational:
  *   jw = (10·jnum + L·(jden − jnum)) / (10·jden).
  * The kernel therefore never touches a double: it returns
  * round_half_up(jw · 10⁶) from pure integer arithmetic, so the result
  * is bit-stable across engines and layouts — the float version's
  * floor/round boundary flips (0.7·10⁶ floors to 699999 in IEEE) can't
  * happen. Long arithmetic is exact for strings up to ~2000 chars
  * (jwnum·2·10⁶ < 2⁶³); longer inputs take a BigInt fallback.
  *
  * Matching semantics mirror the standard: window ⌊max(l1,l2)/2⌋ − 1
  * (≥ 0 — equal-position-only for the degenerate window), both-empty
  * and m = 0 score 0, operating on UTF-16 code units (identical to
  * codepoints on the BMP). Two conventions were pinned EMPIRICALLY
  * against the reference float implementations (15k-pair diff run,
  * dev.JwCompare): the transposition count is FLOORED (t = ⌊ht/2⌋,
  * the rapidfuzz/DuckDB rule — the classic half-value variant differs
  * on odd ht), and the prefix-boost threshold is ≥ 0.7, because a
  * float implementation's strict `> 0.7` is noise at the boundary
  * (the three-fraction sum for an exactly-0.7 rational rounds to
  * 0.70000000000000004 and takes the boost anyway). */
object JaroWinklerKernel {
  private val Scale = 1000000L

  def similarityX1M(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0L
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val matchedB = new Array[Boolean](l2)
    val ma = new Array[Char](math.min(l1, l2))
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedB(j) = true
          ma(m) = a.charAt(i)
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // half-transpositions: matched chars of b in b-order vs ma
    var ht = 0
    var k = 0
    var j2 = 0
    while (j2 < l2) {
      if (matchedB(j2)) {
        if (b.charAt(j2) != ma(k)) ht += 1
        k += 1
      }
      j2 += 1
    }
    var prefix = 0
    val maxPref = math.min(4, math.min(l1, l2))
    while (prefix < maxPref && a.charAt(prefix) == b.charAt(prefix)) prefix += 1

    val mL = m.toLong
    val t = ht / 2 // FLOORED full-transposition count (the rapidfuzz /
                   // DuckDB convention; the classic half-value variant
                   // differs on odd ht — verified empirically)
    if (l1.toLong * l2 * mL <= 1500000000L) {
      val jnum = mL * mL * (l1 + l2) + (mL - t) * l1 * l2
      val jden = 3 * mL * l1 * l2
      val (n, d) =
        if (10 * jnum >= 7 * jden)
          (10 * jnum + prefix * (jden - jnum), 10 * jden)
        else (jnum, jden)
      (2 * n * Scale + d) / (2 * d)
    } else {
      // exactness for pathological lengths; never the hot path
      val jnum = BigInt(mL) * mL * (l1 + l2) + BigInt(mL - t) * l1 * l2
      val jden = BigInt(3) * mL * l1 * l2
      val (n, d) =
        if (jnum * 10 >= jden * 7) (jnum * 10 + jden * prefix - jnum * prefix,
          jden * 10)
        else (jnum, jden)
      ((n * 2 * Scale + d) / (d * 2)).toLong
    }
  }
}

/** `jaro_winkler(a, b)` → round(similarity · 10⁶) as a long — the
  * record-linkage scorer Spark lacks natively (only Levenshtein ships),
  * as a whole-stage-codegen expression with exact integer output (see
  * [[JaroWinklerKernel]] for why integers and not a double). Registered
  * by [[GraftExtensions]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) =
      t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.similarityX1M(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinklerKernel.similarityX1M($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
