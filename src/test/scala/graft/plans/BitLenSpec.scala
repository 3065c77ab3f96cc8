package graft.plans

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** [[BitLen]] must equal `length(bin(x))` for EVERY long (that identity
  * is the whole rewrite contract), and [[BitLenRewrite]] must replace
  * the built-in pair in optimized plans. */
class BitLenSpec extends SparkSpec {

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("bitlen(x) == length(bin(x)) on edges and random longs") {
    val edges = Seq(0L, 1L, 2L, 3L, 7L, 8L, 63L, 64L, Long.MaxValue,
      -1L, -64L, Long.MinValue)
    val rnd = new scala.util.Random(7)
    val xs = edges ++ (1 to 500).map(_ => rnd.nextLong())
    import spark.implicits._
    val out = xs.toDF("x")
      .selectExpr("x", "bitlen(x) AS bl", "length(bin(x)) AS lb")
      .collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), s"x=${r.getLong(0)}"))
  }

  test("bitlen of NULL is NULL") {
    val r = spark.sql("SELECT bitlen(CAST(NULL AS BIGINT))").collect().head
    assert(r.isNullAt(0))
  }

  test("length(bin(x)) is rewritten to bitlen in the optimized plan") {
    // spark.range so ConvertToLocalRelation leaves a plan to inspect
    val df = spark.range(1, 100).selectExpr("length(bin(id * 3)) AS bl")
    val p = optimized(df)
    assert(p.contains("bitlen"), s"rewrite did not fire:\n$p")
    assert(!p.contains("bin("), s"bin survived the rewrite:\n$p")
  }

  test("rewritten plan returns the same values as the built-in pair") {
    val df = spark.range(0, 1000)
      .selectExpr("length(bin(id * id + 1)) AS bl")
    val native = df.collect().map(_.getInt(0)).toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.BitLenRewrite")
    val builtin =
      try df.collect().map(_.getInt(0)).toSeq
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert(native == builtin)
  }
}
