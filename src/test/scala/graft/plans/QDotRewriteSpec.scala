package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The HOF dot-product pattern must be rewritten to [[QDot]] (and only that
  * pattern): plan-level assertions plus value parity against the
  * un-rewritten interpreted path. */
class QDotRewriteSpec extends SparkSpec {

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // spark.range, not a local Seq: ConvertToLocalRelation would eagerly
  // evaluate a projection over LocalRelation and leave no plan to inspect
  private lazy val df = spark.range(1, 41).selectExpr(
    "transform(sequence(1L, 8L), j -> id * j % 13 - 6) AS a",
    "transform(sequence(1L, 8L), j -> id + j % 7 - 3) AS b")

  private val hofSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  test("the dot-product HOF pattern becomes qdot in the optimized plan") {
    val out = df.selectExpr(s"$hofSql AS d")
    val p = optimized(out)
    assert(p.contains("qdot"), s"rewrite did not fire:\n$p")
    assert(!p.contains("aggregate("), s"HOF survived the rewrite:\n$p")

    // operand order inside the lambdas must not matter (both ops commute)
    val swapped = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> y * x), 0L, (acc, v) -> v + acc) AS d")
    assert(optimized(swapped).contains("qdot"))
  }

  test("rewritten plan returns the same values as the un-rewritten HOF") {
    val native = df.selectExpr(s"$hofSql AS d").collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.QDotRewrite")
    val hof =
      try df.selectExpr(s"$hofSql AS d").collect().map(_.getLong(0)).toSeq
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(native == hof)
  }

  test("near-miss patterns are left alone") {
    // subtraction combine, non-zero seed, non-multiply zip, int arrays
    val misses = Seq(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc - v)",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v)",
      "aggregate(zip_with(a, b, (x, y) -> x * x), 0L, (acc, v) -> acc + v)")
    misses.foreach { e =>
      val p = optimized(df.selectExpr(s"$e AS d"))
      assert(!p.contains("qdot"), s"rewrite wrongly fired for $e:\n$p")
    }
    val ints = df.selectExpr(
      "transform(a, x -> CAST(x AS INT)) AS ai",
      "transform(b, x -> CAST(x AS INT)) AS bi")
      .selectExpr(
        "aggregate(zip_with(ai, bi, (x, y) -> x * y), 0, (acc, v) -> acc + v) AS d")
    assert(!optimized(ints).contains("qdot"))
  }
}
