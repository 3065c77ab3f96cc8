package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** fuzzyBestMatch semantics: block confinement, the maxDist bar, and the
  * (dist, −jw, id) tiebreak chain. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("best match per left row: distance first, jaro tiebreak, id last") {
    val left = Seq((1L, "blk", "red gaer"), (2L, "blk", "zzzzzz"),
      (3L, "other", "red gear")).toDF("id", "blk", "name")
    val right = Seq(
      (10L, "blk", "red gear"),  // dist 2 from 'red gaer' (swap = 2 subs)
      (11L, "blk", "red bear"),  // dist 3
      (12L, "blk", "ged raer"),  // dist 2, worse prefix (lower jw)
      (13L, "blk", "red gaer")   // dist 0 — exact
    ).toDF("id", "blk", "name")
    val out = Linkage.fuzzyBestMatch(left, right, "blk", "id", "name",
        "id", "name", maxDist = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // left 1: exact candidate 13 wins outright at dist 0
    assert(out(1L) == (13L, 0))
    // left 2: nothing within 3 edits -> absent
    assert(!out.contains(2L))
    // left 3: its name exists on the right but in ANOTHER block -> absent
    assert(!out.contains(3L))
  }

  test("jaro-winkler breaks exact distance ties toward the shared prefix") {
    val left = Seq((1L, "b", "abcdef")).toDF("id", "blk", "name")
    // both at levenshtein distance 1; 'abcdex' shares the longer prefix
    // so its jw is higher and must win despite the larger id
    val right = Seq((20L, "b", "xbcdef"), (21L, "b", "abcdex"))
      .toDF("id", "blk", "name")
    val r = Linkage.fuzzyBestMatch(left, right, "blk", "id", "name",
        "id", "name", maxDist = 2).collect().head
    assert(r.getLong(1) == 21L, s"expected prefix-similar winner, got $r")
  }

  test("blockingAudit: reduction and completeness from a hand-built scheme") {
    val left = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("lid", "blk")
    val right = Seq((10L, "A"), (11L, "B"), (12L, "B"), (13L, "D"))
      .toDF("rid", "blk")
    // truth: 1-10 co-located (A/A), 3-13 SPLIT by the blocks (B vs D),
    // 4-10 split (C vs A)
    val truth = Seq((1L, 10L), (3L, 13L), (4L, 10L)).toDF("lid", "rid")
    val r = Linkage.blockingAudit(left, right, "blk", "lid", "rid", truth)
      .collect().head
    // candidates: A 2x1=2, B 1x2=2, C/D no counterpart -> 4 of 16 pairs
    assert(r.getAs[Long]("n_candidates") == 4L)
    assert(r.getAs[Long]("n_all_pairs") == 16L)
    assert(r.getAs[Long]("reduction_bp") == 7500L)
    assert(r.getAs[Long]("n_truth") == 3L)
    assert(r.getAs[Long]("n_colocated") == 1L)
    assert(r.getAs[Long]("completeness_bp") == 3333L)
  }

  test("blockKeyProfile: exact pair volumes, skew share, null keys excluded") {
    val df = Seq(("A", "x"), ("A", "y"), ("A", "x"), ("B", "x"),
      (null, "x")).toDF("brand", "word")
    val out = Linkage.blockKeyProfile(df, Seq(
        "brand" -> col("brand"), "word" -> col("word")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // brand: A=3, B=1 (null excluded): pairs 3, top share 3/4
    assert(out("brand") == (4L, 2L, 3L, 3L, 7500L))
    // word: x=4, y=1: pairs 6, top share 4/5
    assert(out("word") == (5L, 2L, 4L, 6L, 8000L))
  }

  test("sortedNeighborhoodPairs: exact window pairs incl. bucket crossings") {
    val df = ('a' to 'j').zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toString, s"x$i") }
      .toDF("id", "k", "extra")
    val got = Linkage.sortedNeighborhoodPairs(df, "id", Seq("k"), w = 3,
        carry = Seq("extra"))
      .select(col("a_id"), col("b_id"), col("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ranks are 1..10 in id order; w=3 → gaps 1 and 2, 9 + 8 pairs,
    // including every bucket-boundary crossing (3|4, 6|7, 9|10)
    val want = (1L to 9L).map(i => (i, i + 1, 1L)).toSet ++
      (1L to 8L).map(i => (i, i + 2, 2L)).toSet
    assert(got == want)
    // carry columns ride along under a_/b_ prefixes
    val cols = Linkage.sortedNeighborhoodPairs(df, "id", Seq("k"), w = 3,
      carry = Seq("extra")).columns.toSet
    assert(cols == Set("a_id", "a_extra", "b_id", "b_extra", "gap"))
  }

  test("sortedNeighborhoodPairs plan: bucketed equi-join, no cartesian") {
    val df = ('a' to 'j').zipWithIndex
      .map { case (c, i) => (i.toLong + 1L, c.toString) }.toDF("id", "k")
    val plan = Linkage.sortedNeighborhoodPairs(df, "id", Seq("k"), w = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("plan: block equi-join (no cartesian), thresholded lev, partial agg") {
    val left = Seq((1L, "b", "abc")).toDF("id", "blk", "name")
    val p = Linkage.fuzzyBestMatch(left, left, "blk", "id", "name",
        "id", "name", maxDist = 2)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("Some(2)"),
      s"bounded levenshtein must take the threshold form:\n$p")
    assert(!p.contains("Cartesian"))
  }

  test("fellegiSunter: exact m/u rates and floored-log weights") {
    import spark.implicits._
    // 4 matches: field agrees 3/4 (m = 750000); 8 non-matches: agrees 2/8
    // (u = 250000). bitlen(750000)=20, bitlen(250000)=18 → +200 cb;
    // complements 250000/750000 → -200 cb.
    val pairs = ((1 to 4).map(i => (true, i <= 3)) ++
      (1 to 8).map(i => (false, i <= 2))).toDF("m", "f_agree")
    val r = Linkage.fellegiSunter(pairs, $"m", Seq("f_agree"))
      .collect().head
    assert(r.getAs[Long]("n_match") == 4L && r.getAs[Long]("n_unmatch") == 8L)
    assert(r.getAs[Long]("m_ppm") == 750000L)
    assert(r.getAs[Long]("u_ppm") == 250000L)
    assert(r.getAs[Long]("agree_w_cb") == 200L)
    assert(r.getAs[Long]("disagree_w_cb") == -200L)
  }
}
