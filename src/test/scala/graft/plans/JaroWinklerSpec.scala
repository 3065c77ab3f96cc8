package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Exact-integer Jaro–Winkler: textbook truth values, the two pinned
  * conventions (floored transpositions, ≥0.7 boost threshold), codegen ≡
  * interpreted, and SQL registry reachability. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Long =
    JaroWinklerKernel.similarityX1M(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook truth values at x1e6") {
    assert(jw("martha", "marhta") == 961111) // 173/180
    assert(jw("dwayne", "duane") == 840000)
    assert(jw("dixon", "dicksonx") == 813333)
    assert(jw("abc", "abc") == 1000000)
    assert(jw("abc", "xyz") == 0)
    assert(jw("", "") == 0L) // the reference float impls score both-empty 0
    assert(jw("a", "") == 0L)
    assert(jw("ab", "ba") == 0L) // window 0: equal-position matches only
    assert(jw("CRATE", "TRACE") == 733333)
  }

  test("pinned conventions: floored transpositions and >=0.7 boost") {
    // 'red widget'/'large gear': m=5, ht=3 -> floored t=1 gives jaro 0.6
    // (the half-value convention would give 0.5667)
    assert(jw("red widget", "large gear") == 600000)
    // 'hot plate'/'hot widget': jaro is EXACTLY 0.7 -> boost applies
    // under the >= rule with prefix 4 ('hot ' incl. the space):
    // 0.7 + 4*0.1*0.3 = 0.82
    assert(jw("hot plate", "hot widget") == 820000)
  }

  test("prefix bonus caps at 4 chars") {
    // m=9, t=0, l=10: jaro = 28/30; prefix 9 must still count as 4
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") == 960000)
  }

  test("SQL registry + null handling + codegen ≡ interpreted") {
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .collect().head.getLong(0) == 961111)
    assert(spark.sql("SELECT jaro_winkler(NULL, 'x')")
      .collect().head.isNullAt(0))
    import spark.implicits._
    val df = (1 to 50).map(i => (s"name number $i", s"name numero ${i + 3}"))
      .toDF("a", "b")
    val expected = df.collect()
      .map(r => jw(r.getString(0), r.getString(1))).toSeq
    def run() = df.select(call_function("jaro_winkler", $"a", $"b"))
      .collect().map(_.getLong(0)).toSeq
    assert(run() == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == expected)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
