package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Full (Lowrance–Wagner) Damerau–Levenshtein: the CA→ABC=2 case that
  * separates it from optimal string alignment, truth values, codegen ≡
  * interpreted, SQL registry. */
class DamerauLevenshteinSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinKernel.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("truth values including the full-DL (non-OSA) case") {
    assert(dl("CA", "ABC") == 2) // OSA would say 3 — full DL edits after
                                 // the transposition
    assert(dl("ab", "ba") == 1)
    assert(dl("teh", "the") == 1)
    assert(dl("kitten", "sitting") == 3)
    assert(dl("", "") == 0)
    assert(dl("abc", "") == 3)
    assert(dl("", "abc") == 3)
    assert(dl("same", "same") == 0)
    assert(dl("a cat", "an act") == 2) // insert + transposition
  }

  test("never exceeds plain Levenshtein, and symmetric") {
    import spark.implicits._
    val pairs = for {
      a <- Seq("red widget", "hot plate", "blue gear", "abcd")
      b <- Seq("red wigdet", "hot palte", "gear blue", "abdc")
    } yield (a, b)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
        call_function("damerau_levenshtein", $"a", $"b").as("dl"),
        levenshtein($"a", $"b").as("lev"),
        call_function("damerau_levenshtein", $"b", $"a").as("dlr"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) <= r.getInt(1), "DL must lower-bound Levenshtein")
      assert(r.getInt(0) == r.getInt(2), "DL must be symmetric")
    }
  }

  test("SQL registry, nulls, codegen ≡ interpreted") {
    assert(spark.sql("SELECT damerau_levenshtein('CA', 'ABC')")
      .collect().head.getInt(0) == 2)
    assert(spark.sql("SELECT damerau_levenshtein(NULL, 'x')")
      .collect().head.isNullAt(0))
    import spark.implicits._
    val df = (1 to 40).map(i => (s"item nr $i", s"item rn ${i + 1}"))
      .toDF("a", "b")
    val expected = df.collect()
      .map(r => dl(r.getString(0), r.getString(1))).toSeq
    def run() = df.select(call_function("damerau_levenshtein", $"a", $"b"))
      .collect().map(_.getInt(0)).toSeq
    assert(run() == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
