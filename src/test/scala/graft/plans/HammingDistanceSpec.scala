package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom Expression must behave identically under interpreted eval and
  * whole-stage codegen, match the JVM reference impl, and be reachable from
  * SQL via the injected registry entry. */
class HammingDistanceSpec extends SparkSpec {

  test("hamming via SQL function registry (GraftExtensions)") {
    val r = spark.sql("SELECT hamming('10101', '10011') AS d").collect().head.getInt(0)
    assert(r == 2)
    assert(spark.sql("SELECT hamming('abc', 'abc')").collect().head.getInt(0) == 0)
    assert(spark.sql("SELECT hamming('abc', 'abcd')").collect().head.getInt(0) == 1)
    assert(spark.sql("SELECT hamming(NULL, 'x')").collect().head.isNullAt(0))
  }

  test("codegen path matches interpreted and the JVM reference") {
    import spark.implicits._
    val df = (1 to 100).map(i =>
      (graft.functions.Text.simhashBits(s"doc number $i"),
       graft.functions.Text.simhashBits(s"doc number ${i + 1}"))).toDF("a", "b")
    val viaExpr = df.withColumn("d", call_function("hamming", $"a", $"b"))
      .select("d").collect().map(_.getInt(0)).toSeq
    val expected = df.collect()
      .map(r => graft.functions.Text.hamming(r.getString(0), r.getString(1))).toSeq
    assert(viaExpr == expected)
    // force interpreted path too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.withColumn("d", call_function("hamming", $"a", $"b"))
        .select("d").collect().map(_.getInt(0)).toSeq
      assert(interp == expected)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("type check rejects non-string input") {
    val e = intercept[Exception](spark.sql("SELECT hamming(1, 2)").collect())
    assert(e.getMessage.toLowerCase.contains("hamming") ||
      e.getMessage.toLowerCase.contains("string"))
  }
}
