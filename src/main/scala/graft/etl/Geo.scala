package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial proximity over integer micro-degree coordinates — the
  * grid-bucket join that replaces "distance between every pair" with
  * "distance inside 3×3 neighboring cells", the only shape that survives
  * a planetary point set.
  *
  * Coordinates are LONGS in micro-degrees (exactness convention: no
  * float trig anywhere; distance is squared planar micro-degrees, the
  * right screen for radii far below a degree — callers needing meters
  * apply the cos(lat) correction downstream). Cell side = the query
  * radius, so any pair within the radius shares a cell or touches a
  * neighboring one; the 9-cell membership is exploded on ONE side only,
  * keeping the join an equi-join on cell id. */
object Geo {

  /** All point pairs within `radiusMicroDeg` (planar), as
    * (id_a < id_b, dist2). One explode (×9) + one equi-join on the cell
    * key + the exact distance filter; fan-out per cell is bounded by
    * local density, never by the global point count. */
  def gridProximityJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radiusMicroDeg: Long): DataFrame = {
    val r = radiusMicroDeg
    val base = points.select(col(idCol).as("id"),
      col(xCol).as("x"), col(yCol).as("y"))
    // floor-div cell coords (negative-safe: pmod-adjusted floor)
    def cellOf(c: String) =
      expr(s"CAST(IF($c >= 0, $c div $r, (($c + 1) div $r) - 1) AS BIGINT)")
    val cells = base
      .withColumn("_cx", cellOf("x")).withColumn("_cy", cellOf("y"))
    // left side explodes into its 3x3 neighborhood; right side stays put
    val probe = cells
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        (col("_cx") + col("_dx")).as("_cx"),
        (col("_cy") + col("_dy")).as("_cy"))
    probe.join(cells.select(col("id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("_cx"), col("_cy")), Seq("_cx", "_cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r * r)
      // a pair can share several neighbor cells — dedupe on the pair key
      .select(col("id_a"), col("id_b"), col("dist2")).distinct()
  }
}
