package graft

import org.apache.spark.sql.functions._

/** dev: same-box A/B of q161's interval-overlap bucket width. Intervals
  * span 60–960 s (event_id % 900 + 60); the width trades explode fan-out
  * (≤ len/width + 1 bucket rows per interval) against per-(key, bucket)
  * candidate density (all a-rows × b-rows sharing a bucket get the exact
  * predicate applied). Round-10 verdict item 3 asks whether the 1000 s
  * width has a shaveable constant. Args: sfDir [reps] [widths_sec_csv]. */
object Q161AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val widths = (if (args.length > 2) args(2) else "125,250,500,1000,2000")
      .split(",").map(_.trim.toLong)
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def side(t: String) = graft.Tables.events(spark, sfDir)
      .filter($"event_type" === t)
      .select($"user_id",
        unix_micros($"ts").as("s_us"),
        (unix_micros($"ts") + (($"event_id" % 900) + 60) * 1000000L)
          .as("e_us"))
    def q(widthSec: Long) = {
      val joined = graft.etl.TimeJoins.intervalOverlapJoin(
        side("error"), side("click"), "user_id", "s_us", "e_us",
        bucketWidthUs = widthSec * 1000000L)
      joined.groupBy($"user_id")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least($"e_us", $"b_e_us") - greatest($"s_us", $"b_s_us"))
            .cast("long").as("overlap_us"))
        .orderBy($"user_id")
    }
    widths.foreach { w =>
      q(w).queryExecution.toRdd.count(); release() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = q(w).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        release(); (t, n)
      }
      println(f"Q161AB width=${w}s min=${ts.map(_._1).min}%.2f " +
        f"rows=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
