package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Native Catalyst expression: integer dot product of two quantized
  * `array<bigint>` vectors. Matches the aggregate/zip_with formulation it
  * replaced, including its null semantics: a length mismatch or any null
  * element yields NULL (zip_with pads the shorter side with nulls, null
  * products poison the running sum) — a ragged or holey vector surfaces as
  * NULL instead of a plausible-looking truncated score.
  *
  * Exists because Spark's higher-order functions (`aggregate`, `zip_with`)
  * are CodegenFallback — every ANN scoring row pays interpreted per-element
  * lambda dispatch. This is the hottest inner loop of the similarity-search
  * path (corpus × queries dot products; at 100 TB, billions of rows), so it
  * gets the same treatment as [[HammingDistance]]: a tight generated loop
  * inside whole-stage codegen, no UDF or lambda boundary.
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) | NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
