package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SpTokens]] vs the `filter(split(s, ' '), t ≠ '')` spelling it
  * replaces — identical token arrays including multi-space runs,
  * leading/trailing spaces, tabs (NOT separators here), and empties. */
class SpTokensSpec extends SparkSpec {
  import spark.implicits._

  test("matches the split+filter spelling on every edge shape") {
    val rows = Seq("a b c", "  a  b  ", "", " ", "a", "a\tb c",
      "many  internal   runs", "trail ", " lead")
    val df = rows.toDF("s")
    val out = df.select(
      call_function("sp_tokens", $"s").as("fast"),
      filter(split($"s", " "), t => t =!= "").as("slow")).collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r)
    }
  }

  test("SpTokensRewrite: the portable SQL spelling optimizes to sp_tokens") {
    val df = spark.range(5)
      .selectExpr("concat('a b ', id) AS s")
      .selectExpr("filter(split(s, ' '), t -> t <> '') AS toks")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("sp_tokens("), opt)
    assert(df.selectExpr("size(toks)").collect().forall(_.getInt(0) == 3))
  }

  test("SpTokensRewrite leaves other separators and predicates alone") {
    val df1 = spark.range(2)
      .selectExpr("filter(split(concat('a,b', id), ','), t -> t <> '') AS x")
    assert(!df1.queryExecution.optimizedPlan.toString.contains("sp_tokens("))
    val df2 = spark.range(2)
      .selectExpr("filter(split(concat('a b', id), ' '), t -> t <> 'a') AS x")
    assert(!df2.queryExecution.optimizedPlan.toString.contains("sp_tokens("))
  }
}
