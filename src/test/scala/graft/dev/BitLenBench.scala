package graft.dev

/** Dev micro-bench: `length(bin(x))` (binary-string materialization) vs
  * the codegen [[graft.plans.BitLen]] expression the BitLenRewrite rule
  * substitutes. Run: sbt "Test/runMain graft.dev.BitLenBench"
  */
object BitLenBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8)
    val df = spark.range(1, 100_000_001)
      .selectExpr("id * 2654435761L % 1000000007L AS x").cache()
    df.count()

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-32s $s%.2f s")
      s
    }

    // warm up both paths
    df.selectExpr("sum(length(bin(x)))").collect()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.BitLenRewrite")
    df.selectExpr("sum(length(bin(x)))").collect()
    spark.conf.unset("spark.sql.optimizer.excludedRules")

    val rewritten = time("length(bin(x)) + BitLenRewrite") {
      df.selectExpr("sum(length(bin(x)))").collect()
    }
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.BitLenRewrite")
    val builtin = time("length(bin(x)) built-in pair") {
      df.selectExpr("sum(length(bin(x)))").collect()
    }
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    println(f"speedup: builtin/rewritten = ${builtin / rewritten}%.1f×")
    spark.stop()
  }
}
