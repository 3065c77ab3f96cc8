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

  private val rows = TopKRowsAgg(3)

  test("rows: (sortKey desc, tiebreak asc) ordering with cap") {
    val buf = Seq((5L, 9L), (9L, 2L), (9L, 1L), (5L, 3L), (7L, 4L))
      .foldLeft(rows.zero)(rows.reduce)
    assert(buf == Vector((9L, 1L), (9L, 2L), (7L, 4L)))
  }

  test("rows: merge order-independent and equals global top-k") {
    val xs = Seq((3L, 1L), (8L, 7L), (8L, 2L), (1L, 1L))
    val ys = Seq((9L, 5L), (8L, 4L), (2L, 2L))
    val a = xs.foldLeft(rows.zero)(rows.reduce)
    val b = ys.foldLeft(rows.zero)(rows.reduce)
    val want = (xs ++ ys).sortBy { case (k, t) => (-k, t) }.take(3)
    assert(rows.merge(a, b) == want)
    assert(rows.merge(b, a) == want)
  }

  test("rows: tie on both fields is kept as duplicate, not dropped") {
    val buf = Seq((4L, 4L), (4L, 4L), (4L, 4L), (4L, 4L))
      .foldLeft(rows.zero)(rows.reduce)
    assert(buf == Vector((4L, 4L), (4L, 4L), (4L, 4L)))
  }

  private val bottom = BottomKRowsAgg(3)

  test("bottom: keeps k smallest by (key asc, tiebreak asc), payload rides") {
    val buf = Seq((50L, 1L, 500L), (10L, 2L, 100L), (90L, 3L, 900L),
        (10L, 1L, 101L), (30L, 4L, 300L))
      .foldLeft(bottom.zero)(bottom.reduce)
    assert(buf == Vector((10L, 1L, 101L), (10L, 2L, 100L), (30L, 4L, 300L)))
  }

  test("bottom: merge order-independent and equals global bottom-k — " +
      "the sketch's re-aggregability across shards") {
    val xs = Seq((7L, 1L, 70L), (2L, 2L, 20L), (9L, 3L, 90L))
    val ys = Seq((1L, 4L, 10L), (8L, 5L, 80L), (3L, 6L, 30L))
    val a = xs.foldLeft(bottom.zero)(bottom.reduce)
    val b = ys.foldLeft(bottom.zero)(bottom.reduce)
    val want = (xs ++ ys).sortBy { case (k, t, _) => (k, t) }.take(3)
    assert(bottom.merge(a, b) == want)
    assert(bottom.merge(b, a) == want)
    assert(bottom.merge(bottom.zero, a) == a.sortBy(x => (x._1, x._2)))
  }
}
