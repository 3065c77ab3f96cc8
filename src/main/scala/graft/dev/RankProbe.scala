package graft.dev

import graft.Sessions
import org.apache.spark.sql.functions._

/** Probe for Layout.globalRank consistency: ranks must be a permutation
  * of 1..n (the two-branch recompute of the range exchange is the
  * suspect — pid/count correspondence between the offsets branch and
  * the main branch). */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"))
    val n = li.count()
    for (trial <- 1 to 3) {
      val r = graft.etl.Layout.globalRank(li,
        Seq(col("l_orderkey"), col("l_linenumber")), "rk")
      val s = r.agg(count(lit(1)).as("cnt"),
        countDistinct(col("rk")).as("d"),
        min(col("rk")).as("mn"), max(col("rk")).as("mx")).head()
      println(s"trial $trial: n=$n cnt=${s.getLong(0)} distinct=${s.getLong(1)} " +
        s"min=${s.getLong(2)} max=${s.getLong(3)}")
    }
    spark.stop()
  }
}
