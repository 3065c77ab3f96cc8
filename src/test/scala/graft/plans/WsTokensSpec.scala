package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The ws_tokens Expression must agree with the JVM kernel and with the
  * regex-split + filter chain it replaced — including mixed-whitespace
  * runs, leading/trailing separators, and unicode spaces that are NOT in
  * the separator class (the cross-engine tokenization contract). */
class WsTokensSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq("a b c", "a\tb\nc\rd", "  leading", "trailing  ",
    "\t\n\r ", "", "one", "a  \t\n b", "nb space stays", "x y")

  test("parity with the replaced regex-split + filter chain") {
    val hof = filter(split($"t", "[ \t\n\r]+"), x => x =!= "")
    val rows = texts.toDF("t")
      .select($"t", call_function("ws_tokens", $"t").as("a"), hof.as("b"))
      .as[(String, Seq[String], Seq[String])].collect()
    rows.foreach { case (t, a, b) => assert(a == b, s"for <${t.take(20)}>") }
  }

  test("parity with the JVM kernel; unicode space is one token") {
    val got = texts.toDF("t")
      .select($"t", call_function("ws_tokens", $"t").as("a"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach { t =>
      assert(got(t) == graft.functions.Text.wsTokens(t).toSeq)
    }
    assert(got("nb space stays") == Seq("nb space", "stays"))
  }

  test("null in, null out") {
    val r = spark.sql("SELECT ws_tokens(CAST(NULL AS STRING)) AS v")
      .collect().head
    assert(r.isNullAt(0))
  }
}
