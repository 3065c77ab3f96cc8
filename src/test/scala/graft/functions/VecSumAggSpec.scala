package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class VecSumAggSpec extends AnyFunSuite {

  private val agg = VecSumAgg()

  test("reduce sums element-wise from the empty buffer") {
    val buf = Seq(Seq(1L, 2L, 3L), Seq(10L, 20L, 30L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq(11L, 22L, 33L))
  }

  test("merge is symmetric in the empty buffer — an empty partition's " +
      "zero buffer merged on EITHER side is the identity, never a " +
      "fake dims-mismatch throw") {
    val full = agg.reduce(agg.zero, Seq(4L, 5L))
    assert(agg.merge(agg.zero, full).toSeq == Seq(4L, 5L))
    assert(agg.merge(full, agg.zero).toSeq == Seq(4L, 5L))
    assert(agg.merge(agg.zero, agg.zero).isEmpty)
  }

  test("merge of two non-empty partials sums; mixed dims still throw") {
    val a = agg.reduce(agg.zero, Seq(1L, 2L))
    val b = agg.reduce(agg.zero, Seq(10L, 20L))
    assert(agg.merge(a, b).toSeq == Seq(11L, 22L))
    val bad = agg.reduce(agg.zero, Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      agg.merge(agg.reduce(agg.zero, Seq(1L, 2L)), bad)
    }
  }
}
