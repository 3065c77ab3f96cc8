package graft

/** dev: time one named query — args: sfDir name [reps]. Warmup + reps. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"QBENCH $name min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
