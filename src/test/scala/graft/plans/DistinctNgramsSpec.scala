package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DistinctNgrams]] vs the portable HOF spelling it replaces —
  * identical on every input class, including the astral-codepoint
  * fallback path and the sub-n short strings. */
class DistinctNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def hof(n: Int) = expr(
    s"CAST(size(array_distinct(transform(sequence(1, length(s) - ${n - 1})," +
      s" i -> substring(s, i, $n)))) AS BIGINT)")

  test("matches the HOF spelling on ascii, repeats, and random text") {
    val rnd = new scala.util.Random(7)
    val rows = Seq("aaaa", "aaaaa", "abcd", "abcdabcd", "abab",
      "the quick brown fox jumps over the lazy dog") ++
      (1 to 50).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString)
    val df = rows.toDF("s").filter(length($"s") >= 4)
    val out = df.select(
      call_function("distinct_ngrams", $"s", lit(4)).as("fast"),
      hof(4).as("slow")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("n = 2 packing mask and short-string zero") {
    val df = Seq("abcab", "xy", "aa").toDF("s")
    val out = df.select($"s",
      call_function("distinct_ngrams", $"s", lit(2)).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abcab": ab, bc, ca, ab -> 3 distinct; "xy": 1; "aa": 1
    assert(out == Map("abcab" -> 3L, "xy" -> 1L, "aa" -> 1L))
  }

  test("astral codepoints take the exact fallback and still match " +
    "codepoint substring semantics") {
    // U+1F600 is a surrogate pair in UTF-16; codepoint-wise the string
    // has 5 codepoints -> 2 distinct 4-grams
    val s = "a😀b😀a"
    val df = Seq(s).toDF("s")
    val fast = df.select(
      call_function("distinct_ngrams", $"s", lit(4))).head().getLong(0)
    val slow = df.select(hof(4)).head().getLong(0)
    assert(fast == slow)
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    val df = spark.range(10)
      .select(concat(lit("abcdefgh"), $"id".cast("string")).as("s"))
      .select(call_function("distinct_ngrams", $"s", lit(4)).as("d"))
    // "*(n)" marks a WholeStageCodegen stage in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [distinct_ngrams("), plan)
    // "abcdefghK" has 6 distinct 4-grams for every single-digit K
    assert(df.agg(sum($"d")).head().getLong(0) == 60L)
  }
}
