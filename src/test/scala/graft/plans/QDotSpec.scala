package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** QDot must agree with the interpreted higher-order-function formulation
  * under both codegen and interpreted eval, and honor zip_with's min-length
  * and null semantics. */
class QDotSpec extends SparkSpec {

  test("qdot via SQL function registry (GraftExtensions)") {
    val r = spark.sql(
      "SELECT qdot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect().head.getLong(0)
    assert(r == 4 + 10 + 18)
    // zip_with parity: a length mismatch or null element yields NULL, never
    // a plausible-looking truncated score
    assert(spark.sql("SELECT qdot(array(2L), array(3L, 9L))")
      .collect().head.isNullAt(0))
    assert(spark.sql("SELECT qdot(array(1L, NULL), array(3L, 9L))")
      .collect().head.isNullAt(0))
    assert(spark.sql("SELECT qdot(NULL, array(1L))").collect().head.isNullAt(0))
    assert(spark.sql(
      "SELECT qdot(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))")
      .collect().head.getLong(0) == 0)
  }

  test("codegen and interpreted paths match the HOF formulation") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      ((1 to 16).map(j => (i * j % 13 - 6).toLong),
       (1 to 16).map(j => (i + j % 7 - 3).toLong))
    }.toDF("a", "b")
    // exclude the QDotRewrite optimizer rule so the HOF baseline really is
    // the interpreted ArrayAggregate/ZipWith path, not a rewritten qdot
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.QDotRewrite")
    val hof =
      try df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, x) => acc + x)
          .as("d")).collect().map(_.getLong(0)).toSeq
      finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    val native = df.select(call_function("qdot", $"a", $"b").as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(call_function("qdot", $"a", $"b").as("d"))
        .collect().map(_.getLong(0)).toSeq
      assert(interp == hof)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("type check rejects non-array input") {
    val e = intercept[Exception](spark.sql("SELECT qdot(1, 2)").collect())
    assert(e.getMessage.toLowerCase.contains("qdot") ||
      e.getMessage.toLowerCase.contains("array"))
  }
}
