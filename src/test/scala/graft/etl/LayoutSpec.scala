package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def mortonModel(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("zValue matches the bit-by-bit Morton model, dims reduced mod 2^16") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(_ =>
      (rnd.nextLong().abs % 1000000L, rnd.nextLong().abs % 1000000L))
    val out = rows.toDF("x", "y")
      .select($"x", $"y", Layout.zValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) =>
      assert(z == mortonModel(x % 65536, y % 65536), s"($x, $y)")
    }
  }

  test("zorderBy: disjoint sorted partition ranges over the z key") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 5000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).toDF("x", "y")
    val parts = Layout.zorderBy(df, $"x", $"y", numFiles = 8)
      .select(spark_partition_id().as("pid"), $"_zval")
      .as[(Int, Long)].collect().groupBy(_._1)
      .map { case (pid, rows) => (pid, rows.map(_._2).toSeq) }
      .toSeq.sortBy(_._1)
    parts.foreach { case (pid, zs) =>
      assert(zs == zs.sorted, s"partition $pid not sorted")
    }
    // range partitioning: each partition's max ≤ the next one's min
    parts.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
  }
}
