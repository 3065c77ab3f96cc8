package graft.etl

import graft.SparkSpec

/** Grid proximity join: exact pair set incl. cross-cell neighbors,
  * negative coordinates, and the inclusive radius boundary. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("gridProximityJoin finds exactly the in-radius pairs") {
    // r=10 (cells 10x10): (1,2) same-cell pair at dist2 81; (1,6) crosses
    // the y=10 cell boundary exactly AT the radius (100 <= 100 inclusive);
    // (2,6) at dist2 181 is out; (3) is far away; (4,5) coincide in the
    // negative-coordinate cell (floor-div cell math must not round toward
    // zero there)
    val pts = Seq(
      (1L, 0L, 0L), (2L, 9L, 0L), (6L, 0L, 10L),
      (3L, 500L, 500L),
      (4L, -15L, -15L), (5L, -15L, -15L)).toDF("id", "x", "y")
    val got = Geo.gridProximityJoin(pts, "id", "x", "y", 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 81L), (1L, 6L, 100L), (4L, 5L, 0L)))
  }
}
