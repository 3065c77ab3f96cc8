package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketch as a native `TypedImperativeAggregate` —
  * the idiomatic Spark shape for a mergeable sketch: each task folds its
  * partition into a 2^p-byte buffer (partial aggregation), buffers meet
  * in a register-wise max (order-independent, so the result is
  * deterministic under ANY partitioning), and only 2^p bytes per group
  * ever cross the shuffle. Contrast `Sketches.hllRegisters`, which
  * derives the same registers declaratively via a groupBy(bucket) — that
  * shuffles one row per OCCUPIED BUCKET per map partition, this shuffles
  * one fixed-size blob per group.
  *
  * The hash/rho pipeline is bit-identical to `Sketches.hllHashed` /
  * `regsFromHashed` (Knuth multiply, xorshift mix, second multiplier
  * < 2^31 so the product can't overflow a long for any 32-bit h): NULL
  * and negative keys are skipped, rho = rMax − bitlength(h div 2^p),
  * rMax = 33 − p. Output: dense `array<int>` of 2^p register values
  * (0 = empty bucket) — callers posexplode and estimate with the
  * standard harmonic formula (see q168/q190).
  */
case class HllRegsAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(child.dataType == LongType,
    s"hll_regs key must be LongType (the builder casts), got ${child.dataType}")
  require(p >= 4 && p <= 16, s"hll_regs p must be in [4,16], got $p")
  private val m = 1 << p
  private val rMax = (32 - p) + 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      if (k >= 0) {
        // 31-bit key fold, in lockstep with Sketches.hllHashed: the raw
        // multiply wraps (silently, in JVM arithmetic) past k ≈ 3.4e9
        // and can go NEGATIVE, corrupting the register index — and the
        // SQL twin throws under ANSI at the same point
        val h0 = ((k % 2147483648L) * 2654435761L) % 4294967296L
        val h1 = h0 ^ (h0 / 65536)
        val h2 = (h1 * 2146121005L) % 4294967296L
        val h = h2 ^ (h2 / 8192)
        val bucket = (h % m).toInt
        val rest = h / m
        val rho = (if (rest == 0) rMax
          else rMax - (64 - java.lang.Long.numberOfLeadingZeros(rest))).toByte
        if (rho > buf(bucket)) buf(bucket) = rho
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_regs"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegsAgg =
    copy(child = newChild)
}
