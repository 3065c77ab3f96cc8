package graft.dev

import org.apache.spark.sql.functions._

/** Dev micro-bench: interpreted HOF dot product vs the codegen qdot
  * expression (and vs the QDotRewrite rule firing on the HOF formulation).
  * Run: sbt "Test/runMain graft.dev.QDotBench"
  */
object QDotBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8)
    val df = spark.range(1, 2_000_001).selectExpr(
      "transform(sequence(1L, 64L), j -> id * j % 127 - 63) AS a",
      "transform(sequence(1L, 64L), j -> id + j % 31 - 15) AS b")
      .cache()
    df.count()

    val hofExpr =
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $s%.2f s")
      s
    }

    // warm up both paths once
    df.selectExpr(s"$hofExpr AS d").agg(sum("d")).collect()
    df.select(call_function("qdot", col("a"), col("b")).as("d")).agg(sum("d")).collect()

    val native = time("qdot (codegen)") {
      df.select(call_function("qdot", col("a"), col("b")).as("d")).agg(sum("d")).collect()
    }
    val rewritten = time("HOF + QDotRewrite") {
      df.selectExpr(s"$hofExpr AS d").agg(sum("d")).collect()
    }
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.QDotRewrite")
    val hof = time("HOF interpreted") {
      df.selectExpr(s"$hofExpr AS d").agg(sum("d")).collect()
    }
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    println(f"speedup: interpreted/native = ${hof / native}%.1f×, " +
      f"interpreted/rewritten = ${hof / rewritten}%.1f×")
    spark.stop()
  }
}
