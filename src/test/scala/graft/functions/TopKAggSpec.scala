package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {

  private val agg = TopKAgg(3)

  test("reduce keeps sorted desc, capped at k") {
    val buf = Seq(5L, 9L, 1L, 7L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(buf == Vector(9L, 7L, 5L))
  }

  test("merge of partial buffers equals global top-k") {
    val left = Seq(10L, 2L, 8L).foldLeft(agg.zero)(agg.reduce)
    val right = Seq(9L, 11L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(left, right) == Vector(11L, 10L, 9L))
    assert(agg.merge(right, left) == Vector(11L, 10L, 9L))
  }

  test("duplicates and short groups") {
    assert(Seq(4L, 4L, 4L, 4L).foldLeft(agg.zero)(agg.reduce) == Vector(4L, 4L, 4L))
    assert(Seq(2L).foldLeft(agg.zero)(agg.reduce) == Vector(2L))
    assert(agg.merge(agg.zero, agg.zero) == Vector.empty)
  }
}
