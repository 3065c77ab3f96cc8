package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 32 sha-lane MinHash permutation values of
  * a shingle as `array<long>` — element i (d = i div 8, j = i mod 8) is the
  * unsigned big-endian 32-bit word at bytes [4j, 4j+4) of
  * sha256(utf8(d + ":" + shingle)).
  *
  * Value-identical to the SQL recipe the estimator audits (q442/q450/q472)
  * used inline —
  * `CAST(conv(substring(sha2(concat('d:', s), 256), 1 + 8*j, 8), 16, 10) AS
  * BIGINT)` — because hex chars [8j, 8j+8) of a digest ARE bytes [4j, 4j+4)
  * big-endian, so the DuckDB oracle (which re-derives lanes from `sha256`'s
  * hex form) is unchanged. What the built-in spelling paid per (shingle, d)
  * and this removes: a `MessageDigest.getInstance` provider walk inside
  * `DigestUtils.sha256Hex`, a 64-char hex encode + String→UTF8String copy,
  * one UTF8String concat per digest, and per lane a substring slice plus a
  * `conv` radix parse (8 more allocations each). Here: one thread-local
  * digest, four raw-byte digests, 32 integer reads.
  */
case class ShaLanes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sha_lanes requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sha_lanes"

  override protected def nullSafeEval(v: Any): Any =
    ShaLanes.lanes(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShaLanes.lanes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShaLanes {
  private val shaLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }
  // the four digest domain-separation prefixes "0:" .. "3:" as bytes
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(4)(d => s"$d:".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  def lanes(s: UTF8String): ArrayData = {
    val md = shaLocal.get()
    val sBytes = s.getBytes
    val out = new Array[Long](32)
    var d = 0
    while (d < 4) {
      md.reset()
      md.update(prefixes(d))
      md.update(sBytes)
      val dig = md.digest()
      var j = 0
      while (j < 8) {
        val o = 4 * j
        out(d * 8 + j) =
          ((dig(o) & 0xffL) << 24) | ((dig(o + 1) & 0xffL) << 16) |
            ((dig(o + 2) & 0xffL) << 8) | (dig(o + 3) & 0xffL)
        j += 1
      }
      d += 1
    }
    new GenericArrayData(out)
  }
}
