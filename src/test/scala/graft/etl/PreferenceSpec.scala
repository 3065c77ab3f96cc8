package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed truth tables for the preference-data and inference-log
  * operators. These are the independent-computation pins (the
  * EvalQueriesSpec convention): the DuckDB oracles for q483–q488 share
  * the queries' arithmetic, so only fixtures with hand-derived expected
  * values can catch a formula echoed wrong on both sides. */
class PreferenceSpec extends SparkSpec {

  test("dpoPairs: min-id tiebreaks on both extremes; flat groups drop") {
    import spark.implicits._
    val df = Seq(
      // group 1: max=9 at ids 11,13 (min id 11); min=2 at id 12
      (1L, 11L, 9L), (1L, 12L, 2L), (1L, 13L, 9L),
      // group 2: all equal — no strict margin, no pair
      (2L, 21L, 5L), (2L, 22L, 5L),
      // group 3: min=1 at ids 32,33 (min id 32); max=4 at id 31
      (3L, 31L, 4L), (3L, 32L, 1L), (3L, 33L, 1L))
      .toDF("g", "id", "s")
    val got = Preference.dpoPairs(df, "g", "id", "s")
      .collect().map(r => (r.getAs[Long]("g"),
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("cmax"), r.getAs[Long]("cmin")))).toMap
    assert(got == Map(1L -> (11L, 12L, 9L, 2L), 3L -> (31L, 32L, 4L, 1L)))
  }

  test("majorityLabel: majority wins, ties break to the min label") {
    import spark.implicits._
    val df = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),          // item 1: b wins 2-1
      (2L, "c"), (2L, "a"), (2L, "c"), (2L, "a"), // item 2: 2-2 tie -> a
      (3L, "z"))                                  // item 3: singleton
      .toDF("item", "label")
    val got = Preference.majorityLabel(df, "item", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("gold"), r.getAs[Long]("n_votes"))).toMap
    assert(got == Map(1L -> ("b", 2L), 2L -> ("a", 2L), 3L -> ("z", 1L)))
  }

  test("majorityEdges: rock-paper-scissors panel yields the 3-cycle") {
    import spark.implicits._
    // 3 voters; each pair decided 2-1: a beats b, b beats c, c beats a
    val df = Seq(
      (1L, "a", 3L), (1L, "b", 2L), (1L, "c", 1L), // g1: a>b, b>c, a>c
      (2L, "a", 1L), (2L, "b", 3L), (2L, "c", 2L), // g2: b>a, b>c, c>a
      (3L, "a", 2L), (3L, "b", 1L), (3L, "c", 3L)) // g3: a>b, c>b, c>a
      .toDF("g", "l", "s")
    val got = Preference.majorityEdges(df, "g", "l", "s")
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[Long]("wins_src"), r.getAs[Long]("wins_dst"))).toSet
    assert(got == Set(("a", "b", 2L, 1L), ("b", "c", 2L, 1L),
      ("c", "a", 2L, 1L)))
  }

  test("majorityEdges: an exactly-split pair yields no edge") {
    import spark.implicits._
    val df = Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "a", 1L), (2L, "b", 2L))
      .toDF("g", "l", "s")
    assert(Preference.majorityEdges(df, "g", "l", "s").count() == 0)
  }

  test("prefixHitRate: horizon boundary, cross-bucket, and same-ts hits") {
    import spark.implicits._
    val df = Seq(
      ("p", 0L, 1L),     // first occurrence: miss
      ("p", 50L, 2L),    // delta 50 <= 100: hit (same bucket 0)
      ("p", 150L, 3L),   // delta 100 from id=2, exactly H: hit (prev bucket)
      ("p", 260L, 4L),   // delta 110 > 100: miss (prev-bucket max 150 < 160)
      ("q", 260L, 5L),   // other prefix, first: miss
      ("q", 260L, 6L))   // same ts, larger id: delta 0 hit
      .toDF("pfx", "us", "id")
    val got = Inference.prefixHitRate(df, col("pfx"), "us", "id", 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("hit"))
      .toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> true))
  }

  test("windowPacking: hand-computed waves, utilization, padding waste") {
    import spark.implicits._
    val df = Seq(
      ("A", 0L, 5L), ("A", 10L, 7L),  // window 0: n=2 tok=12 mx=7 waves=2
      ("A", 150L, 3L),                // window 1: n=1 tok=3 waves=1
      ("B", 5L, 10L),                 // window 0: n=1 tok=10 waves=1
      ("Z", 5L, 0L))                  // all-zero tokens: 0 waves, 0 util
      .toDF("k", "us", "tok")
    val got = Inference.windowPacking(df, "k", "us", "tok",
        windowUs = 100L, capacity = 10L)
      .collect().map(r => r.getAs[String]("k") -> (
        r.getAs[Long]("n_batches"), r.getAs[Long]("n_requests"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("waves"),
        r.getAs[Long]("util_bp"), r.getAs[Long]("pad_waste_bp"))).toMap
    // A: util = 15*10000/(3*10) = 5000; padded = 2*7+1*3 = 17,
    //    waste = (17-15)*10000/17 = 1176
    assert(got("A") == (2L, 3L, 15L, 3L, 5000L, 1176L))
    // B: util = 10*10000/(1*10) = 10000; padded = 10, waste 0
    assert(got("B") == (1L, 1L, 10L, 1L, 10000L, 0L))
    // Z: zero tokens -> zero waves; util and waste are 0, never div-0
    assert(got("Z") == (1L, 1L, 0L, 0L, 0L, 0L))
  }

  test("fifoReplay: hand-computed Lindley waits — busy, idle-gap, re-busy") {
    import spark.implicits._
    // one server: arr 0 (s=10) runs 0-10; arr 5 waits 5, runs 10-20;
    // arr 30 finds it idle; arr 31 waits 4 behind the 5-unit job
    val df = Seq(
      ("x", 0L, 1L, 10L), ("x", 5L, 2L, 10L),
      ("x", 30L, 3L, 5L), ("x", 31L, 4L, 1L),
      ("y", 7L, 5L, 3L)) // other key: independent server, no wait
      .toDF("k", "us", "id", "s_us")
    val got = Inference.fifoReplay(df, Seq("k"), "us", "id", "s_us")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("c_us"), r.getAs[Long]("wait_us"))).toMap
    assert(got == Map(1L -> (10L, 0L), 2L -> (20L, 5L),
      3L -> (35L, 0L), 4L -> (36L, 4L), 5L -> (10L, 0L)), got)
  }

  test("q489 run-length fixture: first-draft rejection, all-accepted, middle") {
    // pins the `coalesce(min(k WHERE rejected) - 1, max(k))` spelling the
    // oracle echoes: reject-at-1 -> 0, all-accepted -> n, reject-at-4 -> 3
    import spark.implicits._
    val d = Seq(
      (1L, 1L, false), (1L, 2L, true),                  // len 0
      (2L, 1L, true), (2L, 2L, true), (2L, 3L, true),   // len 3 (all acc)
      (3L, 1L, true), (3L, 2L, true), (3L, 3L, true), (3L, 4L, false))
      .toDF("u", "k", "acc")                            // len 3
    val got = d.groupBy($"u")
      .agg(coalesce(min(when(!$"acc", $"k")) - 1L, max($"k")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 3L, 3L -> 3L))
  }

  test("btResiduals: a 2-arm tournament fits exactly (residual 0); the " +
      "RPS 3-cycle reads the maximal half-win-per-game residual") {
    import spark.implicits._
    // a beats b 3 of 4: BT converges to s_a=1.5e6, s_b=5e5 after one MM
    // step, so e_a = 4*1.5e6*1000/2e6 = 3000 milli-wins = observed
    val twoArm = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"))
      .toDF("w", "l")
    val got2 = Stats.btResiduals(twoArm, "w", "l", iters = 2)
      .collect().map(r => r.getAs[String]("item") -> (
        r.getAs[Long]("games"), r.getAs[Long]("wins"),
        r.getAs[Long]("exp_milli"), r.getAs[Long]("resid_milli"),
        r.getAs[Long]("resid_bp"))).toMap
    assert(got2 == Map("a" -> (4L, 3L, 3000L, 0L, 0L),
      "b" -> (4L, 1L, 1000L, 0L, 0L)), got2)
    // rock-paper-scissors: strengths stay uniform (1e6 each), every pair
    // expects half a win (500 milli), every observed is 0 or 1 -> each
    // arm accumulates |1000-500| + |0-500| = 1000 milli over 2 games
    val rps = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("w", "l")
    val got3 = Stats.btResiduals(rps, "w", "l", iters = 2)
      .collect().map(r => r.getAs[String]("item") -> (
        r.getAs[Long]("games"), r.getAs[Long]("exp_milli"),
        r.getAs[Long]("resid_milli"), r.getAs[Long]("resid_bp"))).toMap
    assert(got3 == Map("a" -> (2L, 1000L, 1000L, 5000L),
      "b" -> (2L, 1000L, 1000L, 5000L),
      "c" -> (2L, 1000L, 1000L, 5000L)), got3)
  }

  test("krippendorffAlpha: hand-computed nominal panel, perfect panel, " +
      "negative-alpha floor convention, and degenerate LOO rows drop") {
    import spark.implicits._
    // classic 2-rater nominal panel: i1 (a,a), i2 (a,b), i3/i4 (b,b)
    // Do = 1/4; De = (64-34)/56 = 15/28; alpha = 8/15 = 533333 ppm floored
    val panel = Seq(
      (1L, 0L, "a"), (1L, 1L, "a"),
      (2L, 0L, "a"), (2L, 1L, "b"),
      (3L, 0L, "b"), (3L, 1L, "b"),
      (4L, 0L, "b"), (4L, 1L, "b")).toDF("item", "ann", "label")
    val got = Preference.krippendorffAlpha(panel, "item", "ann", "label",
        exclGrid = Seq(-1L, 0L, 1L))
      .collect().map(r => r.getAs[Long]("excl") -> (
        r.getAs[Long]("n_items"), r.getAs[Long]("n_ratings"),
        r.getAs[Long]("do_ppm"), r.getAs[Long]("de_ppm"),
        r.getAs[Long]("alpha_ppm"))).toMap
    assert(got == Map(-1L -> (4L, 8L, 250000L, 535714L, 533333L)), got)
    // excluding either of the only two annotators leaves no pairable
    // item: the LOO rows legitimately vanish instead of emitting junk

    // perfect agreement across two labels: Do = 0, alpha = 1.0 exactly
    val perfect = Seq((1L, 0L, "a"), (1L, 1L, "a"),
      (2L, 0L, "b"), (2L, 1L, "b")).toDF("item", "ann", "label")
    val p = Preference.krippendorffAlpha(perfect, "item", "ann", "label")
      .collect().head
    assert(p.getAs[Long]("do_ppm") == 0L &&
      p.getAs[Long]("alpha_ppm") == 1000000L)

    // systematic disagreement: both raters always differ on a 2-label
    // panel -> Do = 1; De = (16-8)/12 = 2/3; alpha = 1 - 3/2 = -1/2,
    // floored via the negated-positive convention: -(333334*1e6//666666)
    val anti = Seq((1L, 0L, "a"), (1L, 1L, "b"),
      (2L, 0L, "b"), (2L, 1L, "a")).toDF("item", "ann", "label")
    val n = Preference.krippendorffAlpha(anti, "item", "ann", "label")
      .collect().head
    assert(n.getAs[Long]("do_ppm") == 1000000L &&
      n.getAs[Long]("de_ppm") == 666666L &&
      n.getAs[Long]("alpha_ppm") == -(333334L * 1000000L / 666666L),
      n.toString)
  }

  test("rejectionYield: hand-computed keep rate, draws-per-keep, token cost") {
    import spark.implicits._
    val df = Seq(("A", 5L, 10L), ("A", 15L, 10L), ("A", 25L, 10L))
      .toDF("arm", "c", "k")
    val got = Preference.rejectionYield(df, "arm", "c", "k",
        taus = Seq(10L, 20L))
      .collect().map(r => r.getAs[Long]("tau") -> (
        r.getAs[Long]("n_kept"), r.getAs[Long]("keep_bp"),
        r.getAs[Long]("draws_per_keep_milli"),
        r.getAs[Long]("tokens_per_keep"))).toMap
    // tau=10: keeps {15,25}; 3 draws / 2 kept = 1500 milli; 30 tok / 2
    assert(got == Map(10L -> (2L, 6666L, 1500L, 15L),
      20L -> (1L, 3333L, 3000L, 30L)), got)
  }

  test("teacherConfidence: confidence quartiles separate agreement") {
    import spark.implicits._
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), // gold a, share 3/4
      (2L, "a"), (2L, "b"))                       // tie -> gold a, share 1/2
      .toDF("item", "label")
    val got = Preference.teacherConfidence(df, "item", "label")
      .collect().map(r => r.getAs[Long]("conf_bucket") -> (
        r.getAs[Long]("n_items"), r.getAs[Long]("n_ratings"),
        r.getAs[Long]("agree_bp"))).toMap
    assert(got == Map(3L -> (1L, 4L, 7500L), 2L -> (1L, 2L, 5000L)), got)
  }

  test("selfConsistency: majority share, unanimity, early-stop agreement") {
    import spark.implicits._
    val df = Seq(
      // p1: x x y x y — k=1 unanimous x; k=3 2-1 x; k=5 3-2 x
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"), (1L, 4L, "x"),
      (1L, 5L, "y"),
      // p2: unanimous y at every k
      (2L, 1L, "y"), (2L, 2L, "y"), (2L, 3L, "y"), (2L, 4L, "y"),
      (2L, 5L, "y"),
      // p3: only 2 samples — must be excluded from the panel entirely
      (3L, 1L, "z"), (3L, 2L, "z"))
      .toDF("p", "seq", "label")
    val got = Preference.selfConsistency(df, "p", "label",
        Seq(col("seq")), ks = Seq(1L, 3L, 5L))
      .collect().map(r => r.getAs[Long]("k") -> (
        r.getAs[Long]("n_prompts"), r.getAs[Long]("mean_major_share_bp"),
        r.getAs[Long]("unanimous_bp"), r.getAs[Long]("match_full_bp")))
      .toMap
    assert(got == Map(
      1L -> (2L, 10000L, 10000L, 10000L),
      3L -> (2L, 8333L, 5000L, 10000L),
      5L -> (2L, 8000L, 5000L, 10000L)), got)
  }

  test("q484 fixture: the 3-cycle tournament reads violation_bp = 10000") {
    // independent pin of the triangle arithmetic: with exactly the RPS
    // edges a->b->c->a, und has 3 edges, 1 triangle, and the rotation
    // join counts the directed cycle 3 times -> n_cyclic = 1
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val und = edges.select(least($"src", $"dst").as("a"),
      greatest($"src", $"dst").as("b"))
    val tri = und.as("e1")
      .join(und.as("e2"), col("e2.a") === col("e1.b"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    val cycRot = edges.as("d1")
      .join(edges.as("d2"), col("d2.src") === col("d1.dst"))
      .join(edges.as("d3"),
        col("d3.src") === col("d2.dst") && col("d3.dst") === col("d1.src"))
      .count()
    assert(tri == 1L && cycRot == 3L)
  }
}
