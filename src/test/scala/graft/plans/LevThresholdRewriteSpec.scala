package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LevThresholdRewrite: every rewritten comparison form must produce the
  * identical row set as the un-rewritten predicate (pinned via a
  * `greatest(·, 0)` wrapper the rule cannot match), the rewrite must
  * actually fire in the optimized plan, and NULLs must behave the same. */
class LevThresholdRewriteSpec extends SparkSpec {

  import spark.implicits._

  // parquet-backed so the optimizer cannot fold the filter into a
  // LocalRelation (which would hide whether the rewrite fired)
  private lazy val df = {
    val tmp = java.nio.file.Files.createTempDirectory("levspec").toString
    Seq(
      ("abc", "abc"), ("abc", "abd"), ("abc", "abde"), ("abc", "xbde"),
      ("abc", "wxyz"), ("kitten", "sitting"), ("", ""), ("", "abc"),
      (null, "abc"), ("abc", null), (null, null)
    ).toDF("a", "b").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
  }

  private def rows(c: org.apache.spark.sql.Column): Seq[(String, String)] =
    df.filter(c).collect()
      .map(r => (String.valueOf(r.getString(0)), String.valueOf(r.getString(1))))
      .toSeq.sorted

  test("rewrite fires: optimized plan carries the threshold") {
    val p = df.filter(levenshtein($"a", $"b") <= 2)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("levenshtein(a#") && p.contains("Some(2)"),
      s"threshold form missing from:\n$p")
  }

  test("all six comparison forms keep the exact row set") {
    val lev = levenshtein($"a", $"b")
    // least(lev, 2^20) == lev for every real distance here and survives
    // Catalyst simplification; on NULL input least yields 2^20 (least
    // SKIPS nulls) which a k<2^20 filter drops — the same drop a NULL
    // distance produces, so the FILTER row sets are identical. (greatest
    // with 0 would NOT work: it turns NULL into 0 and wrongly PASSES
    // the <= k filter — the first draft of this spec caught that.)
    val ref = least(lev, lit(1 << 20))
    for (k <- 0 to 4) {
      assert(rows(lev <= k) == rows(ref <= k), s"<= $k")
      assert(rows(lev < k) == rows(ref < k), s"< $k")
      assert(rows(lev === k) == rows(ref === k), s"= $k")
      assert(rows(lit(k) >= lev) == rows(lit(k) >= ref), s"$k >=")
      assert(rows(lit(k) > lev) == rows(lit(k) > ref), s"$k >")
      assert(rows(lit(k) === lev) == rows(lit(k) === ref), s"$k =")
    }
  }

  test("unbounded comparisons are left alone") {
    // > and >= against the distance can't use the cheap form; the rule
    // must not touch them (a wrong rewrite here would flip truth values)
    val p = df.filter(levenshtein($"a", $"b") > 2)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("levenshtein") && !p.contains("Some("), p)
    // pinned expected set (a least/greatest control maps NULL the wrong
    // way for the > direction): distances — ""/abc 3, abc/xbde 3,
    // abc/wxyz 4, kitten/sitting 3; NULL pairs drop
    assert(rows(levenshtein($"a", $"b") > 2) == Seq(
      ("", "abc"), ("abc", "wxyz"), ("abc", "xbde"), ("kitten", "sitting")))
  }
}
