package graft.dev

import org.apache.spark.sql.functions._

import graft.Sessions

/** Micro-bench for LevThresholdRewrite: `lev(a,b) <= 2` (rewritten to the
  * banded threshold form by the rule) vs an opaque formulation the rule
  * cannot match (`lev(a,b) + 0 <= 2`, full DP). Same data, same result. */
object LevBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Sessions.local(32)
    import spark.implicits._
    // the realistic fuzzy-match shape: most candidate pairs are NOT
    // matches (distance far above k) and lengths vary, so the threshold
    // form's length-difference bailout and banded DP both engage
    val df = spark.range(n).select(
      repeat(sha2(($"id" % 5001).cast("string"), 256), 8).as("a"),
      concat(repeat(sha2(($"id" % 5003 + 1000000).cast("string"), 256), 8),
        substring(sha2($"id".cast("string"), 256), lit(1),
          ($"id" % 17).cast("int")))
        .as("b"))
      .localCheckpoint()
    println("optimized: " + df.filter(levenshtein($"a", $"b") <= 2)
      .queryExecution.optimizedPlan.toString.linesIterator
      .find(_.contains("levenshtein")).getOrElse("??"))
    def time(label: String, c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val cnt = df.filter(c).count()
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$cnt)")
      cnt
    }
    df.select(avg(length($"a")), avg(length($"b"))).show()
    time("warmup", levenshtein($"a", $"b") <= 2)
    time("warmup2", greatest(levenshtein($"a", $"b"), lit(0)) <= 2)
    val r1 = time("rewritten", levenshtein($"a", $"b") <= 2)
    val r2 = time("full-dp", greatest(levenshtein($"a", $"b"), lit(0)) <= 2)
    val r1b = time("rewritten2", levenshtein($"a", $"b") <= 2)
    val r2b = time("full-dp2", greatest(levenshtein($"a", $"b"), lit(0)) <= 2)
    assert(r1 == r2 && r1b == r2b, "rewrite changed the result")

    spark.stop()
  }
}
