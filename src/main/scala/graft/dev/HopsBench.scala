package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.etl.Graph

/** A/B for shortestPaths' hopsPerRound on the q240 lattice. */
object HopsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(hops: Int): (Long, Double) = {
      val keys = Tables.orders(spark, sfDir)
        .filter($"o_orderkey" >= 1).select($"o_orderkey".as("id"))
      val present = keys.select($"id".as("dst"))
      val e = keys.select($"id".as("src"), ($"id" + 1).as("dst"))
        .union(keys.select($"id".as("src"), ($"id" * 2).as("dst")))
        .join(present, Seq("dst"), "left_semi")
        .withColumn("w", lit(1L))
      val seeds = Seq(1L).toDF("node")
      val t0 = System.nanoTime()
      val n = Graph.shortestPaths(seeds, e, "node", "src", "dst", "w",
        hopsPerRound = hops).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    run(4) // warmup
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    Seq(1, 2, 3, 2, 1).foreach { h =>
      val (n, s) = run(h)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      println(f"RESULT hops=$h%-3d time=$s%.2f s rows=$n")
    }
    spark.stop()
  }
}
