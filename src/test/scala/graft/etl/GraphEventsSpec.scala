package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the graph-motif and event-sequence
  * operators (q101–q108 run the same code against the DuckDB oracle; these
  * pin the semantics on graphs/sequences small enough to verify by eye,
  * including edge cases the synthetic tables don't hit). */
class GraphEventsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ triangles

  test("triangleCounts: K4 minus one edge, duplicate/reversed input edges") {
    // K4 on {1,2,3,4} without edge (3,4): triangles {1,2,3} and {1,2,4};
    // node 1,2 in both, 3,4 in one. Dups and reversals must not change it.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (1L, 4L), (4L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("triangleCounts: triangle-free graph yields zero rows per node") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)))
  }

  test("triangleCounts: self-loops are dropped") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .agg(sum($"triangles")).as[Long].head()
    assert(got == 3L) // one triangle, counted at each of its 3 nodes
  }

  // ----------------------------------------------------------------- BFS

  test("kCore: tail peels, stable core survives, cascade propagates") {
    // triangle {1,2,3} + pendant 3-4 + chain 4-5: k=2 round 1 drops 5
    // (deg 1); round 2 drops 4 (deg fell to 1); the triangle is stable
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = Graph.kCore(e, "s", "d", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("linkPrediction: wedge pairs scored, existing edges excluded") {
    // path 1-2-3 + 3-4: non-adjacent pairs with a shared neighbor are
    // (1,3) via 2, (2,4) via 3; deg = {1:1, 2:2, 3:2, 4:1} →
    // jaccard(1,3) = 1*10000 div (1+2-1) = 5000; edge (2,3) itself and
    // the no-common-neighbor pair (1,4) never appear
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.linkPrediction(e, "src", "dst")
      .orderBy($"a", $"b").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L, 5000L), (2L, 4L, 1L, 5000L)))
  }

  test("linkPrediction: triangle has no predictions, square predicts diagonals") {
    // triangle 1-2-3: every 2-path closes → empty; square 5-6-7-8-5:
    // diagonals (5,7) and (6,8) each share BOTH opposite corners →
    // cn=2, jaccard = 2*10000 div (2+2-2) = 10000
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L)).toDF("src", "dst")
    val got = Graph.linkPrediction(e, "src", "dst")
      .orderBy($"a", $"b").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 7L, 2L, 10000L), (6L, 8L, 2L, 10000L)))
  }

  test("khopDistances: path graph distances, maxHops cutoff, unreached absent") {
    // 1-2-3-4-5 path, seed 1, maxHops 2 → 4 and 5 not emitted
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.khopDistances(seeds, edges, "node", "src", "dst", 2)
      .orderBy($"node").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0), (2L, 1), (3L, 2)))
  }

  test("khopDistances: min distance over multiple seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("node")
    val got = Graph.khopDistances(seeds, edges, "node", "src", "dst", 5)
      .orderBy($"node").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 0), (2L, 1), (3L, 1), (4L, 0)))
  }

  // ----------------------------------------------------------- sequences

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros($"us")).drop("us")

  test("transitionCounts: lag pairs per user, first event excluded") {
    val df = ev((1L, "a", 10L), (1L, "b", 20L), (1L, "a", 30L),
      (2L, "b", 5L), (2L, "a", 15L))
    val got = Events.transitionCounts(df, "user_id", "event_type", "ts")
      .orderBy($"prev_type", $"curr_type")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 1L), ("b", "a", 2L)))
  }

  test("funnelFurthest: ordering is strict, window binds to step-0 time") {
    val steps = Seq("v", "c", "p")
    val df = ev(
      // user 1: full funnel in order
      (1L, "v", 100L), (1L, "c", 200L), (1L, "p", 300L),
      // user 2: click BEFORE first view → funnel stalls at view
      (2L, "c", 100L), (2L, "v", 200L), (2L, "p", 300L),
      // user 3: purchase outside window (v at 100, window 500 → limit 600)
      (3L, "v", 100L), (3L, "c", 200L), (3L, "p", 700L),
      // user 4: no view at all
      (4L, "c", 100L), (4L, "p", 200L))
    val got = Events.funnelFurthest(df, "user_id", "event_type", "ts", steps, 500L)
      .orderBy($"user").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 3), (2L, 1), (3L, 2), (4L, 0)))
  }

  test("funnelFurthest: equal timestamp does not complete the next step") {
    // strict '>' : click at exactly the view time must not count
    val df = ev((1L, "v", 100L), (1L, "c", 100L), (1L, "c", 150L))
    val got = Events.funnelFurthest(df, "user_id", "event_type", "ts",
      Seq("v", "c"), 1000L).as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2))) // the 150 click completes it, not the 100 one
  }

  test("retentionCohorts: users fall into week offsets from their first day") {
    val day = 86400000000L
    val df = ev(
      (1L, "x", 0L), (1L, "x", 8 * day), // cohort day0, active week 0 and 1
      (2L, "x", day), (2L, "x", day + 1000L), // same-day dup collapses
      (3L, "x", 0L), (3L, "x", 20 * day))
    val got = Events.retentionCohorts(df, "user_id", "ts")
      .orderBy($"cohort_day", $"week_offset")
      .select($"week_offset", $"users").as[(Int, Long)].collect().toSeq
    // day0 cohort: users 1,3 at offset 0; user1 at offset 1; user3 at offset 2
    // day1 cohort: user 2 at offset 0
    assert(got == Seq((0, 2L), (1, 1L), (2, 1L), (0, 1L)))
  }

  // ----------------------------------------------------------- intervals

  test("maxConcurrent: half-open intervals — touching endpoints don't overlap") {
    val iv = Seq(
      ("g", 0L, 10L), ("g", 10L, 20L), // touching: never concurrent
      ("g", 5L, 12L), // overlaps both
      ("h", 0L, 100L), ("h", 1L, 99L), ("h", 2L, 98L)).toDF("g", "s", "e")
    val got = Events.maxConcurrent(iv, "g", "s", "e")
      .orderBy($"g").as[(String, Long)].collect().toSeq
    assert(got == Seq(("g", 2L), ("h", 3L)))
  }

  test("mergeIntervals: islands split on gaps, touching intervals merge") {
    val iv = Seq(
      ("g", 0L, 10L), ("g", 5L, 15L), ("g", 15L, 20L), // one island 0-20
      ("g", 30L, 40L), // gap → second island
      ("h", 0L, 5L)).toDF("g", "s", "e")
    val got = Events.mergeIntervals(iv, "g", "s", "e")
      .orderBy($"g", $"island")
      .select($"g", $"island_start", $"island_end", $"n_intervals")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 0L, 20L, 3L), ("g", 30L, 40L, 1L), ("h", 0L, 5L, 1L)))
  }

  test("mergeIntervals: contained interval does not shrink the island") {
    // (0,100) then (10,20): prevMaxEnd must be the MAX end seen, not the last
    val iv = Seq(("g", 0L, 100L), ("g", 10L, 20L), ("g", 50L, 120L))
      .toDF("g", "s", "e")
    val got = Events.mergeIntervals(iv, "g", "s", "e")
      .select($"island_start", $"island_end", $"n_intervals")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 120L, 3L)))
  }

  // ----------------------------------------------------------- scd2 / attribution

  test("scd2History: chained validity, open latest, ties broken by id") {
    // user u: versions at t=10,20,20,40 (tie at 20 broken by id 2<3);
    // user v: single version → immediately current
    val df = Seq(
      (1L, "u", "a", 10L), (3L, "u", "c", 20L), (2L, "u", "b", 20L),
      (4L, "u", "d", 40L), (5L, "v", "x", 7L))
      .toDF("id", "k", "t", "us")
    val got = Events.scd2History(df, "k", "id", "us")
      .orderBy($"id")
      .select($"id", $"valid_from_us", $"valid_to_us", $"is_current")
      .as[(Long, Long, Option[Long], Int)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, Some(20L), 0), (2L, 20L, Some(20L), 0),
      (3L, 20L, Some(40L), 0), (4L, 40L, None, 1), (5L, 7L, None, 1)))
  }

  test("firstTouchAttribution: session break re-anchors the first touch") {
    // user u: [view@0, purchase@5] then gap>10 → [search@100, purchase@105];
    // user v: purchase opens its own session → credited to itself
    val df = Seq(
      (1L, "u", "view", 0L), (2L, "u", "purchase", 5L),
      (3L, "u", "search", 100L), (4L, "u", "purchase", 105L),
      (5L, "v", "purchase", 50L))
      .toDF("id", "user", "t", "us")
    val got = Events.firstTouchAttribution(df, "user", "id", "t", "us",
        gapUs = 10L, creditType = "purchase")
      .orderBy($"first_touch")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("purchase", 1L), ("search", 1L), ("view", 1L)))
  }

  // ------------------------------------------------------------- skyline

  test("skyline2D: dominance with ties and duplicates") {
    val df = Seq(
      (1L, 10L, 5L), // frontier
      (2L, 10L, 7L), // dominated: same x, larger y
      (3L, 5L, 9L), // frontier
      (4L, 20L, 4L), // frontier
      (5L, 20L, 4L), // duplicate of 4 → both kept
      (6L, 21L, 4L), // dominated by 4 (x larger, y equal)
      (7L, 6L, 9L)) // dominated by 3 (y equal, x larger)
      .toDF("id", "x", "y")
    val got = Analytics.skyline2D(df, "x", "y")
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq.map(_._1)
    assert(got == Seq(1L, 3L, 4L, 5L))
  }

  // ----------------------------------------------------------- life table

  test("lifeTable: converters at their offset, non-converters censored at horizon") {
    val day = 86400000000L
    // u1 signs day 0, buys day 2; u2 signs day 1, never buys; u3 signs
    // day 1, "buys" BEFORE signup → unobserved; the day-4 click sets the
    // horizon, so u2 and u3 are censored at offset 3; u9 never signs up
    // and is excluded entirely
    val df = Seq(
      (1L, "signup", 0L), (1L, "purchase", 2 * day),
      (2L, "signup", day),
      (3L, "signup", day), (3L, "purchase", 0L),
      (9L, "click", 4 * day))
      .toDF("user_id", "event_type", "us")
    val got = Events.lifeTable(df, "user_id", "event_type", "us",
        "signup", "purchase")
      .orderBy($"day_k")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // day 2: u1 converts (3 at risk); day 3: u2,u3 censored
    assert(got == Seq((2L, 3L, 1L, 0L), (3L, 2L, 0L, 2L)))
  }

  // --------------------------------------------------------- snapshotDiff

  test("snapshotDiff: added/removed/changed/unchanged truth table") {
    val a = Seq((1L, "x", 2L), (2L, "y", 3L), (3L, "z", 1L), (5L, null, 1L))
      .toDF("k", "t", "n")
    val b = Seq((1L, "x", 2L), (2L, "y", 9L), (4L, "w", 1L), (5L, null, 1L))
      .toDF("k", "t", "n")
    val got = Events.snapshotDiff(a, b, "k", Seq("t", "n"))
      .orderBy($"k")
      .select($"k", $"change_type", $"old_t", $"new_t", $"old_n", $"new_n")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added"), (5L, "unchanged")),
      "null-safe compare: (null, null) is unchanged, value-vs-null changed")
  }

  // --------------------------------------------------- assortativity

  test("degreeAssortativityBp: star graph is perfectly disassortative") {
    // S3: center degree 3, leaves degree 1 → r = −1 → sign −1, r² 10000
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Graph.degreeAssortativityBp(e, "src", "dst")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((6L, -1L, Some(10000L))))
  }

  test("degreeAssortativityBp: regular graph has no degree variance -> NULL") {
    // triangle: every degree 2; duplicate + self-loop edges are dropped
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 0L), (2L, 2L))
      .toDF("src", "dst")
    val got = Graph.degreeAssortativityBp(e, "src", "dst")
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((6L, 0L, None)))
  }

  // --------------------------------------------------- modularity

  test("modularityPpm: hand graph with positive, larger, and negative contributions") {
    // m=7: A={1,2,3} triangle + B={4,5} edge + bridges 3-4, 5-1, 1-8.
    // degrees 1:4 2:2 3:3 4:2 5:2 8:1; den = 4m² = 196.
    // A: (28·3−81)·1e6/196 = 15306.12 → 15306
    // B: (28·1−16)·1e6/196 = 61224.49 → 61224
    // C={8}: (0−1)·1e6/196 → −5102 (trunc toward zero, NOT floor −5103 —
    // the signed-div cross-engine trap this operator routes around)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (3L, 4L),
      (5L, 1L), (1L, 8L)).toDF("src", "dst")
    val cm = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (8L, "C")).toDF("node", "comm")
    val got = Graph.modularityPpm(e, "src", "dst", cm, "node", "comm")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("A", 3L, 9L, 7L, 15306L), ("B", 1L, 4L, 7L, 61224L),
      ("C", 0L, 1L, 7L, -5102L)))
  }

  // --------------------------------------------------- activity streaks

  test("activeStreaks: islands fold to longest run, multi-event days dedup") {
    import org.apache.spark.sql.functions.timestamp_micros
    // u1 active days 0,1,2, 5,6 (two events on day 1) → total 5, streak 3
    // u2 single day → 1, 1
    val us = 86400000000L
    val df = Seq((1L, 0L), (1L, 1L), (1L, 1L), (1L, 2L), (1L, 5L),
      (1L, 6L), (2L, 9L))
      .map { case (u, d) => (u, d * us + 1000L) }.toDF("u", "m")
      .select($"u", timestamp_micros($"m").as("ts"))
    val got = Events.activeStreaks(df, "u", "ts")
      .orderBy($"u").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 3L), (2L, 1L, 1L)))
  }

  // -------------------------------------------- rolling audience overlap

  test("audienceOverlapByPeriod: consecutive-period Jaccard, zero-overlap kept") {
    // g: p1 {a,b}, p2 {b,c}, p3 {d} → (p1: inter 1 of 3 = 3333),
    // (p2: inter 0 of 3 = 0 — the churn cliff must still emit a row)
    val df = Seq(("g", 1L, "a"), ("g", 1L, "b"), ("g", 2L, "b"),
      ("g", 2L, "c"), ("g", 3L, "d")).toDF("t", "p", "u")
    val got = Events.audienceOverlapByPeriod(df, "t", "u", "p")
      .orderBy($"period")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 1L, 2L, 2L, 1L, 3333L),
      ("g", 2L, 2L, 1L, 0L, 0L)))
  }

  // ------------------------------------------------ growth accounting

  test("growthAccounting: new/retained/resurrected/churned telescoping") {
    // u1: 1,2,4 (gap churn at 3, tail churn at 5); u2: 1 only (churn 2);
    // u3: 5 (= gmax, never churns)
    val df = Seq(("u1", 1L), ("u1", 2L), ("u1", 4L), ("u2", 1L), ("u3", 5L))
      .toDF("u", "p")
    val got = Events.growthAccounting(df, "u", "p")
      .orderBy($"period")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 0L, 0L, 0L),
      (2L, 0L, 1L, 0L, 1L),
      (3L, 0L, 0L, 0L, 1L),
      (4L, 0L, 0L, 1L, 0L),
      (5L, 1L, 0L, 0L, 1L)))
  }

  // ------------------------------------------- clustering coefficient

  test("clusteringCoefficientBp: triangle + pendant truth table") {
    // triangle 0-1-2 plus pendant 2-3: cc(0) = cc(1) = 10000,
    // cc(2) = 20000 div 6 = 3333, cc(3) degree 1 -> NULL
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficientBp(e, "src", "dst")
      .orderBy($"node")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (0L, 1L, 2L, Some(10000L)), (1L, 1L, 2L, Some(10000L)),
      (2L, 1L, 3L, Some(3333L)), (3L, 0L, 1L, None)))
  }

  // ------------------------------------------------------- cohort LTV

  test("cohortLtvMatrix: first-period cohorts, per-cell users and cents") {
    val df = Seq(
      ("u1", 10L, 100L), ("u1", 11L, 200L),
      ("u2", 11L, 50L), ("u2", 11L, 70L), ("u2", 13L, 30L),
      ("u3", 10L, 5L), ("u3", 11L, 40L)).toDF("u", "period", "cents")
    val got = Events.cohortLtvMatrix(df, "u", "period", "cents")
      .orderBy($"cohort", $"age")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 0L, 2L, 105L),   // u1 100 + u3 5
      (10L, 1L, 2L, 240L),   // u1 200 + u3 40
      (11L, 0L, 1L, 120L),   // u2's two same-period orders fold
      (11L, 2L, 1L, 30L)))
  }
  test("cumulativeHazard: floored per-step hazards accumulate in day order") {
    val lt = Seq((0L, 10L, 2L, 1L), (1L, 7L, 1L, 0L), (2L, 6L, 3L, 3L))
      .toDF("day_k", "at_risk", "events", "censored")
    val out = Events.cumulativeHazard(lt).orderBy($"day_k").collect()
    // steps: 2e6/10 = 200000; 1e6/7 = 142857 (floor); 3e6/6 = 500000
    assert(out.map(_.getAs[Long]("h_step_micro")).toSeq ==
      Seq(200000L, 142857L, 500000L))
    assert(out.map(_.getAs[Long]("h_cum_micro")).toSeq ==
      Seq(200000L, 342857L, 842857L))
  }

  test("trailingDistinct: window reach, dedup within day, capped at max") {
    // user 1 active days 0,1; user 2 active day 0 (twice); user 3 day 9
    val df = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 0L), (3L, 9L))
      .toDF("u", "t")
    val out = Events.trailingDistinct(df, "u", "t", window = 3)
      .orderBy($"d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // day 0: dau 2, wau 2; day 1: dau 1 (u1), wau 2 (u1,u2)
    // day 2: dau 0, wau 2 (u1 day1, u2 day0); day 3: wau 1 (u1 day1)
    // days 4-8 empty (no coverage); day 9: u3; days 10+ capped at max=9
    assert(out.toSeq == Seq((0L, 2L, 2L), (1L, 1L, 2L), (2L, 0L, 2L),
      (3L, 0L, 1L), (9L, 1L, 1L)))
  }

  test("latenessAudit: nearest-rank percentiles and drop shares") {
    // delays (s): 0,10,20,...,90 -> p50 = rank 5 = 40s, p95 = rank 10 = 90s
    val df = (0L until 10L).map(i => ("g", i * 10000000L))
      .toDF("g", "delay_us")
    val out = Events.latenessAudit(df, "g", "delay_us", Seq(30L, 85L))
      .collect().head
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("p50_us") == 40000000L)
    assert(out.getAs[Long]("p95_us") == 90000000L)
    assert(out.getAs[Long]("max_us") == 90000000L)
    // > 30s: 40..90 -> 6 of 10 = 6000 bp; > 85s: only 90 -> 1000 bp
    assert(out.getAs[Long]("late_bp_30") == 6000L)
    assert(out.getAs[Long]("late_bp_85") == 1000L)
  }

  test("decayedSum: bit-shift halving per half-life, ancient floors to 0") {
    val df = Seq(("u", 0L, 100L), ("u", 7L, 100L), ("u", 15L, 100L),
      ("u", 300L, 100L)).toDF("k", "age", "c")
    val out = Events.decayedSum(df, "k", "age", "c", halflifeDays = 7L)
      .collect().head
    // 100 + 100/2 + 100/4 + (42 halvings -> capped 40 -> 0) = 175
    assert(out.getAs[Long]("n") == 4L)
    assert(out.getAs[Long]("decayed_c") == 175L)
    assert(out.getAs[Long]("raw_c") == 400L)
  }

  test("cdcApply: last op wins, terminal delete removes the key") {
    // key 1: U(10) then U(20) -> snapshot 20, n_ops 2
    // key 2: U(5) then D -> absent
    // key 3: D then U(7) -> resurrect to 7 (delete is not terminal)
    val log = Seq((1L, 1L, 10L, false, Some(10L)),
      (1L, 2L, 20L, false, Some(20L)),
      (2L, 3L, 10L, false, Some(5L)), (2L, 4L, 20L, true, None),
      (3L, 5L, 10L, true, None), (3L, 6L, 20L, false, Some(7L)))
      .toDF("k", "id", "us", "del", "v")
    val out = Events.cdcApply(log, "k", Seq("us", "id"), col("del"),
        Seq("v"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 20L, 2L), (3L, 7L, 2L)))
  }

  test("positionAttribution: 40/20/40 split conserves cents exactly") {
    import org.apache.spark.sql.functions.timestamp_micros
    val us = 1000000L
    // user 1: 3 clicks then a 101-cent purchase -> 40/20/40 of 101
    // user 2: purchase with no click in window -> unattributed
    val rows = Seq(
      (1L, 10L * us, 1L, "click", None: Option[Double]),
      (2L, 20L * us, 1L, "click", None),
      (3L, 30L * us, 1L, "click", None),
      (4L, 40L * us, 1L, "purchase", Some(1.01)),
      (5L, 50L * us, 2L, "purchase", Some(2.00)),
      // refund row: negative cents are excluded, never attributed
      (6L, 45L * us, 1L, "purchase", Some(-5.00)))
      .toDF("event_id", "_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"_us")).drop("_us")
    val out = Events.positionAttribution(rows, "purchase", "click",
        windowUs = 100L * us, bucketWidthUs = 50L * us)
      .orderBy($"pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // base: first/last 40 (40.4 floored), middle 20 (20.2 floored) -> 100;
    // 1 leftover cent goes to the largest remainder (all rem equal ->
    // earliest touch, the first click)
    assert(out.toSeq == Seq(
      ("first", 1L, 41L), ("last", 1L, 40L), ("middle", 1L, 20L),
      ("unattributed", 1L, 200L)))
    val total = out.filter(_._1 != "unattributed").map(_._3).sum
    assert(total == 101L)
  }

  test("burstDedup: gap chaining, first-event keep, per-key isolation") {
    import spark.implicits._
    // key A: events at 0, 5, 9, 100, 103 with gap 10 → bursts
    // {0,5,9} (5 chains to 0, 9 chains to 5) and {100,103}
    val e = Seq(
      ("A", 0L, 1L), ("A", 5L, 2L), ("A", 9L, 3L),
      ("A", 100L, 4L), ("A", 103L, 5L),
      ("B", 7L, 6L))
      .toDF("k", "ts_us", "event_id")
    val out = Events.burstDedup(e, Seq("k"), "ts_us", "event_id", gapUs = 10L)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("burst_id")) ->
        (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"),
         r.getAs[Long]("burst_n"))).toMap
    assert(out == Map(
      ("A", 1L) -> (0L, 1L, 3L),
      ("A", 2L) -> (100L, 4L, 2L),
      ("B", 1L) -> (7L, 6L, 1L)))
    // simultaneous events: tie broken by id, both in one burst
    val tied = Seq(("C", 50L, 9L), ("C", 50L, 8L)).toDF("k", "ts_us", "event_id")
    val t = Events.burstDedup(tied, Seq("k"), "ts_us", "event_id", 10L)
      .collect().head
    assert(t.getAs[Long]("event_id") == 8L && t.getAs[Long]("burst_n") == 2L)
  }

  test("horizonDedup: anchored re-admission — the streaming dedup contract, " +
    "and NOT burst/session semantics") {
    import spark.implicits._
    // the exact event set EventsStreamingSpec feeds dropDuplicatesWithinWatermark
    // (10-minute horizon): alpha@10:00/10:01/10:05/12:01, beta@10:02,
    // gamma@12:00, delta@12:00:30 — streaming keeps {1,3,5,6,7}
    val m = 60000000L // one minute in us
    val e = Seq(
      ("alpha", 0L * m, 1L), ("alpha", 1L * m, 2L), ("beta", 2L * m, 3L),
      ("alpha", 5L * m, 4L), ("gamma", 120L * m, 5L),
      ("delta", 120L * m + 30000000L, 7L), ("alpha", 121L * m, 6L))
      .toDF("k", "us", "event_id")
    val kept = Events.horizonDedup(e, "k", "us", "event_id", 10L * m)
      .select($"event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 6L, 7L), kept)

    // a slow drip 6 min apart: burst/session semantics would NEVER re-admit
    // (every gap < 10 min chains); anchored semantics re-admits at the
    // first row > 10 min after the last KEPT one — t=0 and t=12 min
    val drip = Seq(("d", 0L * m, 1L), ("d", 6L * m, 2L),
      ("d", 12L * m, 3L), ("d", 18L * m, 4L)).toDF("k", "us", "event_id")
    val dripKept = Events.horizonDedup(drip, "k", "us", "event_id", 10L * m)
      .select($"event_id").as[Long].collect().toSet
    assert(dripKept == Set(1L, 3L), dripKept)

    // tie at identical us: id order decides the anchor, the other drops
    val tied = Seq(("t", 5L, 9L), ("t", 5L, 8L)).toDF("k", "us", "event_id")
    val t = Events.horizonDedup(tied, "k", "us", "event_id", 10L)
      .select($"event_id").as[Long].collect().toSet
    assert(t == Set(8L), t)
  }

  test("horizonDedup: a synthetic hot key is pre-capped, with the overflow " +
    "counted in the side-output and cold keys untouched") {
    import spark.implicits._
    // hot key: 10 occurrences 1µs apart; cap 4 → only the first 4 enter
    // the fold (all within the 100µs horizon → one kept anchor, id 0);
    // occurrences 5..10 are IGNORED — not re-admitted even though a full
    // fold would also drop them here — and overflow_n reports 6
    val hot = (0L until 10L).map(i => ("h", i, i)) :+ (("c", 0L, 99L))
    val out = Events.horizonDedup(hot.toDF("k", "us", "event_id"),
        "k", "us", "event_id", 100L, maxOccurrences = 4)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("event_id"),
        r.getAs[Long]("overflow_n"))).toSet
    assert(out == Set(("h", 0L, 6L), ("c", 99L, 0L)), out)
    // and a capped key still re-admits WITHIN the cap: occurrences at
    // 0, 1, 150, 300 with cap 3 → the first 3 fold (0 kept, 1 in-horizon
    // dup, 150 re-admitted); the 4th at 300 is overflow despite being
    // past the horizon
    val mix = Seq(("m", 0L, 1L), ("m", 1L, 2L), ("m", 150L, 3L),
      ("m", 300L, 4L)).toDF("k", "us", "event_id")
    val kept2 = Events.horizonDedup(mix, "k", "us", "event_id", 100L,
        maxOccurrences = 3)
      .select($"event_id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 3L), kept2)
  }

  test("functionalDependency: holding and violated claims measured exactly") {
    import spark.implicits._
    val df = Seq(("b1", "m1", 1), ("b1", "m1", 2), ("b2", "m1", 3),
      ("b2", "m2", 4)).toDF("brand", "mfgr", "size")
    val ok = Quality.functionalDependency(df, Seq("brand"), "mfgr",
      "brand->mfgr").collect().head
    assert(ok.getAs[Long]("n_groups") == 2L &&
      ok.getAs[Long]("n_violating") == 1L &&
      ok.getAs[Long]("rows_in_violating") == 2L &&
      ok.getAs[Long]("max_fanout") == 2L &&
      ok.getAs[Long]("violation_bp") == 5000L)
    val key = Quality.functionalDependency(df, Seq("size"), "brand",
      "size->brand").collect().head
    assert(key.getAs[Long]("n_violating") == 0L &&
      key.getAs[Long]("violation_bp") == 0L)
  }

}
