package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, NullType, ShortType}

/** Static Hilbert-curve arithmetic shared by interpreted eval, generated
  * code, and tests. Kept in a plain object so codegen can call it through
  * the Scala static forwarder (same pattern as
  * [[graft.functions.Text.simhashBits]] for [[Simhash]]). */
object Hilbert {
  /** xy → distance along the order-`order` Hilbert curve (the classic
    * per-bit rotate-and-accumulate walk, MSB down): coordinates are
    * reduced mod 2^order; the result covers 0 until 4^order. */
  def xy2d(xIn: Long, yIn: Long, order: Int): Long = {
    val n = 1L << order
    var x = ((xIn % n) + n) % n
    var y = ((yIn % n) + n) % n
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native Catalyst expression: distance along the order-`order` Hilbert
  * space-filling curve of two integer coordinates (each reduced
  * mod 2^order) — the Z-order sibling ([[graft.etl.Layout.zValue]]) with
  * strictly better locality: consecutive Hilbert cells are always
  * edge-adjacent, so a range of curve values maps to a tighter bounding
  * box and parquet min/max pruning cuts deeper on both dimensions.
  *
  * A Column-expression formulation needs `order` chained
  * rotate-conditional stages whose tree GROWS ~4× per stage after
  * Catalyst's projection collapse (each stage references the previous x
  * and y twice) — at order 8 that is a ~65k-node expression. The native
  * expression is one static call inside whole-stage codegen, the same
  * treatment as [[QDot]].
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType | NullType => true
      case _ => false
    }
    if (!(order >= 1 && order <= 31))
      TypeCheckResult.TypeCheckFailure(
        s"hilbert order must be in [1, 31], got $order")
    else if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert requires integral (x, y), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert"

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Hilbert.xy2d(asLong(l), asLong(r), order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.Hilbert.xy2d((long) $x, (long) $y, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
