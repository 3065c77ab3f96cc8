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
}
