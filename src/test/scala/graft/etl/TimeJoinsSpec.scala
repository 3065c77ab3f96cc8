package graft.etl

import java.sql.Timestamp
import graft.SparkSpec

class TimeJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: <= semantics, tie on max pick, null when nothing precedes") {
    import spark.implicits._
    val events = Seq(
      (1L, 7L, ts("2026-01-10 00:00:00")), // after both orders
      (2L, 7L, ts("2026-01-05 00:00:00")), // exactly at order 20's time
      (3L, 7L, ts("2026-01-01 00:00:00")), // before all orders
      (4L, 8L, ts("2026-01-10 00:00:00"))) // user without orders
      .toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, ts("2026-01-03 00:00:00"), 10L),
      (7L, ts("2026-01-05 00:00:00"), 20L),
      (7L, ts("2026-01-05 00:00:00"), 21L)) // same time: max orderkey wins
      .toDF("user_id", "o_date", "o_key")
    val out = TimeJoins.asofJoin(events, orders, "user_id", "ts", "o_date", "o_key")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_o_key")).map(_.longValue)).toMap
    assert(out(1L).contains(21L))
    assert(out(2L).contains(21L)) // order at exactly event time counts
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("asofJoin matches a brute-force reference on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val events = (1L to 200L).map(i =>
      (i, rnd.nextInt(10).toLong, ts(f"2026-01-${rnd.nextInt(28) + 1}%02d 12:00:00")))
    val orders = (1L to 80L).map(i =>
      (rnd.nextInt(10).toLong, ts(f"2026-01-${rnd.nextInt(28) + 1}%02d 12:00:00"), i))
    val out = TimeJoins.asofJoin(
        events.toDF("event_id", "user_id", "ts"),
        orders.toDF("user_id", "o_date", "o_key"),
        "user_id", "ts", "o_date", "o_key")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_o_key")).map(_.longValue)).toMap
    // brute force: max key among orders at the max date <= event time
    events.foreach { case (eid, u, t) =>
      val eligible = orders.filter(o => o._1 == u && !o._2.after(t))
      val expected =
        if (eligible.isEmpty) None
        else {
          val maxDate = eligible.map(_._2.getTime).max
          Some(eligible.filter(_._2.getTime == maxDate).map(_._3).max)
        }
      assert(out(eid) == expected, s"event $eid user $u at $t")
    }
  }

  test("asofJoinTolerance: stale matches null out, gap reported") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // right rows at t=10 (pick 1) and t=100 (pick 2); tolerance 20:
    // left t=25 matches pick 1 (gap 15), t=50 too stale (gap 40 > 20),
    // t=100 exact (gap 0), t=5 has nothing preceding
    val left = Seq((1L, 5L), (1L, 25L), (1L, 50L), (1L, 100L))
      .toDF("k", "lt")
    val right = Seq((1L, 10L, 1L), (1L, 100L, 2L)).toDF("k", "rt", "p")
    val got = TimeJoins.asofJoinTolerance(left, right, "k", "lt", "rt",
        "p", tolerance = 20L)
      .orderBy(col("lt"))
      .select(col("lt"), col("asof_p"), col("asof_gap"))
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (5L, None, None), (25L, Some(1L), Some(15L)),
      (50L, None, None), (100L, Some(2L), Some(0L))))
  }

  test("asofJoinTolerance: equal-time ties resolve to the max pick") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L)).toDF("k", "lt")
    val right = Seq((1L, 10L, 3L), (1L, 10L, 7L)).toDF("k", "rt", "p")
    val got = TimeJoins.asofJoinTolerance(left, right, "k", "lt", "rt",
        "p", tolerance = 0L)
      .select(col("asof_p"), col("asof_gap"))
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq((Some(7L), Some(0L))))
  }

  test("trailingCount: half-open [t-w, t) window, start inclusive") {
    import spark.implicits._
    // clicks for user 1 at 10, 20, 30; window 15:
    // probe 30 → [15,30) = {20} → 1; probe 31 → [16,31) = {20,30} → 2;
    // probe 25 → [10,25) = {10,20} → 2 (start boundary inclusive);
    // probe 10 → [-5,10) = {} → 0; user 2 with no clicks → 0
    val right = Seq((1L, 10L), (1L, 20L), (1L, 30L)).toDF("k", "rt")
    val left = Seq((1L, 100L, 30L), (1L, 101L, 31L), (1L, 102L, 25L),
      (1L, 103L, 10L), (2L, 104L, 50L)).toDF("k", "id", "lt")
    val got = TimeJoins.trailingCount(left, right, "k", "id", "lt", "rt",
        window = 15L)
      .orderBy(org.apache.spark.sql.functions.col("id"))
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("trail_cnt"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((100L, 1L), (101L, 2L), (102L, 2L),
      (103L, 0L), (104L, 0L)))
  }

  test("asofJoinForward: >= semantics, tie on min pick, null when nothing follows") {
    import spark.implicits._
    val events = Seq(
      (1L, 7L, ts("2026-01-01 00:00:00")), // before both orders
      (2L, 7L, ts("2026-01-05 00:00:00")), // exactly at order 20/21's time
      (3L, 7L, ts("2026-01-10 00:00:00")), // after all orders
      (4L, 8L, ts("2026-01-01 00:00:00"))) // user without orders
      .toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, ts("2026-01-03 00:00:00"), 10L),
      (7L, ts("2026-01-05 00:00:00"), 20L),
      (7L, ts("2026-01-05 00:00:00"), 21L)) // same time: min orderkey wins
      .toDF("user_id", "o_date", "o_key")
    val out = TimeJoins.asofJoinForward(events, orders, "user_id", "ts", "o_date", "o_key")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asoff_o_key")).map(_.longValue)).toMap
    assert(out(1L).contains(10L))
    assert(out(2L).contains(20L)) // order at exactly event time counts, min pick
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("asofJoinForward matches a brute-force reference on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val events = (1L to 200L).map(i =>
      (i, rnd.nextInt(10).toLong, ts(f"2026-01-${rnd.nextInt(28) + 1}%02d 12:00:00")))
    val orders = (1L to 80L).map(i =>
      (rnd.nextInt(10).toLong, ts(f"2026-01-${rnd.nextInt(28) + 1}%02d 12:00:00"), i))
    val out = TimeJoins.asofJoinForward(
        events.toDF("event_id", "user_id", "ts"),
        orders.toDF("user_id", "o_date", "o_key"),
        "user_id", "ts", "o_date", "o_key")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asoff_o_key")).map(_.longValue)).toMap
    // brute force: min key among orders at the min date >= event time
    events.foreach { case (eid, u, t) =>
      val eligible = orders.filter(o => o._1 == u && !o._2.before(t))
      val expected =
        if (eligible.isEmpty) None
        else {
          val minDate = eligible.map(_._2.getTime).min
          Some(eligible.filter(_._2.getTime == minDate).map(_._3).min)
        }
      assert(out(eid) == expected, s"event $eid user $u at $t")
    }
  }

  test("rangeJoinBucketed: [start, end) semantics across bucket boundaries") {
    import spark.implicits._
    val points = Seq(
      (1L, 7L, 100L),  // == start → in
      (2L, 7L, 249L),  // last µs inside
      (3L, 7L, 250L),  // == end → out
      (4L, 7L, 99L),   // just before → out
      (5L, 8L, 100L),  // wrong key → out
      (6L, 7L, 1000L)) // inside second interval only
      .toDF("event_id", "user_id", "t_us")
    val intervals = Seq(
      (10L, 7L, 100L, 250L),   // spans buckets 1..2 at width 100
      (11L, 7L, 900L, 1001L),
      (12L, 7L, 500L, 500L))   // empty interval → never matches
      .toDF("interval_id", "user_id", "s_us", "e_us")
    val out = TimeJoins.rangeJoinBucketed(points, intervals, "user_id",
        "t_us", "s_us", "e_us", bucketWidthUs = 100L)
      .select($"event_id", $"interval_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (6L, 11L)))
  }

  test("rangeJoinBucketed matches the direct inequality join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1L to 300L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
    val intervals = (1L to 60L).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i, rnd.nextInt(5).toLong, s, s + rnd.nextInt(800).toLong)
    }
    val out = TimeJoins.rangeJoinBucketed(
        points.toDF("event_id", "user_id", "t_us"),
        intervals.toDF("interval_id", "user_id", "s_us", "e_us"),
        "user_id", "t_us", "s_us", "e_us", bucketWidthUs = 512L)
      .select($"event_id", $"interval_id").as[(Long, Long)].collect().toSet
    val expected = (for {
      (eid, pu, t) <- points
      (iid, iu, s, e) <- intervals
      if pu == iu && t >= s && t < e
    } yield (eid, iid)).toSet
    assert(out == expected)
  }

  test("rangeJoinBucketed: result is invariant to the bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val points = (1L to 200L).map(i =>
      (i, rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong))
      .toDF("event_id", "user_id", "t_us")
    val intervals = (1L to 40L).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i, rnd.nextInt(4).toLong, s, s + rnd.nextInt(600).toLong)
    }.toDF("interval_id", "user_id", "s_us", "e_us")
    val results = Seq(1L, 7L, 100L, 640L, 100000L).map { w =>
      TimeJoins.rangeJoinBucketed(points, intervals, "user_id",
          "t_us", "s_us", "e_us", bucketWidthUs = w)
        .select($"event_id", $"interval_id").as[(Long, Long)].collect().toSet
    }
    assert(results.distinct.size == 1,
      "bucket width is a performance knob, never a semantics knob")
  }

  test("intervalOverlapJoin: exactly one match per overlapping pair") {
    import spark.implicits._
    val a = Seq(
      (1L, 7L, 100L, 400L),  // buckets 1..3 at width 100
      (2L, 7L, 400L, 500L),  // touches b22's start → no overlap (half-open)
      (3L, 8L, 100L, 400L),  // wrong key
      (4L, 7L, 900L, 900L))  // empty → never matches
      .toDF("a_id", "user_id", "s_us", "e_us")
    val b = Seq(
      (20L, 7L, 300L, 401L), // overlaps a1 at [300,400), a2 at [400,401)
      (21L, 7L, 0L, 101L),   // overlaps a1 by the single µs [100,101)
      (22L, 7L, 500L, 600L), // half-open: touching a2 is not overlapping
      (23L, 7L, 150L, 350L)) // shares buckets 1,2,3 with a1 → dedup must hold
      .toDF("b_id", "user_id", "s_us", "e_us")
    val out = TimeJoins.intervalOverlapJoin(a, b, "user_id",
        "s_us", "e_us", bucketWidthUs = 100L)
      .select($"a_id", $"b_b_id").as[(Long, Long)].collect().toList
    assert(out.sorted == List((1L, 20L), (1L, 21L), (1L, 23L), (2L, 20L)),
      "duplicates across shared buckets must be suppressed arithmetically")
  }

  test("intervalOverlapJoin matches the direct inequality join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def mk(n: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(8000).toLong
      (i.toLong, rnd.nextInt(4).toLong, s, s + rnd.nextInt(700).toLong)
    }
    val as = mk(150)
    val bs = mk(80)
    val expected = (for {
      (ai, ak, s1, e1) <- as
      (bi, bk, s2, e2) <- bs
      if ak == bk && s1 < e2 && s2 < e1
    } yield (ai, bi)).toList.sorted
    for (w <- Seq(1L, 37L, 512L, 100000L)) {
      val out = TimeJoins.intervalOverlapJoin(
          as.toDF("a_id", "user_id", "s_us", "e_us"),
          bs.toDF("b_id", "user_id", "s_us", "e_us"),
          "user_id", "s_us", "e_us", bucketWidthUs = w)
        .select($"a_id", $"b_b_id").as[(Long, Long)].collect().toList.sorted
      assert(out == expected, s"width $w drifted from the exact join")
    }
  }

  test("resampleDaily: zero-fills only inside each key's own span") {
    import spark.implicits._
    val events = Seq(
      (7L, ts("2026-01-01 10:00:00")),
      (7L, ts("2026-01-01 23:59:59")),
      (7L, ts("2026-01-04 00:00:00")),  // gap: Jan 2 + 3 missing
      (9L, ts("2026-02-10 12:00:00")))  // single-day key → one row, no fill
      .toDF("user_id", "ts")
    val out = TimeJoins.resampleDaily(events, "user_id", "ts")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n"))).toSet
    assert(out == Set(
      (7L, "2026-01-01", 2L), (7L, "2026-01-02", 0L),
      (7L, "2026-01-03", 0L), (7L, "2026-01-04", 1L),
      (9L, "2026-02-10", 1L)))
  }

  test("forwardFill: carries last non-null, keeps leading nulls, per key") {
    import spark.implicits._
    val df = Seq(
      (7L, 1L, None: Option[Long]),   // leading null stays null
      (7L, 2L, Some(10L)),
      (7L, 3L, None), (7L, 4L, None), // both carry 10
      (7L, 5L, Some(20L)),
      (9L, 1L, None))                 // other key unaffected
      .toDF("k", "t", "v")
    val out = TimeJoins.forwardFill(df, "k", "t", "v")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Long]("v")).map(_.longValue))).toSet
    assert(out == Set(
      (7L, 1L, None), (7L, 2L, Some(10L)), (7L, 3L, Some(10L)),
      (7L, 4L, Some(10L)), (7L, 5L, Some(20L)), (9L, 1L, None)))
  }

  test("sessionize: only a gap strictly greater than the window splits") {
    import spark.implicits._
    val events = Seq(
      (7L, ts("2026-01-01 10:00:00")),
      (7L, ts("2026-01-01 10:20:00")),  // within gap → same session
      (7L, ts("2026-01-01 10:50:00")),  // exactly 30m → still merged (Spark semantics)
      (7L, ts("2026-01-01 11:20:01")),  // 30m01s → new session
      (9L, ts("2026-01-01 00:00:00")))
      .toDF("user_id", "ts")
    val out = TimeJoins.sessionize(events, "user_id", "ts", "30 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString, r.getAs[Long]("n_events")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (7L, "2026-01-01 10:00:00.0", 3L),
      (7L, "2026-01-01 11:20:01.0", 1L),
      (9L, "2026-01-01 00:00:00.0", 1L)))
  }

  test("bitemporalAsOf: knowledge cutoff excludes late-arriving history") {
    val sq = spark
    import sq.implicits._
    // key 1: v=100 valid 10 known 11; v=200 valid 20 but recorded at 40
    // (late correction); v=150 valid 15 known 16
    val df = Seq((1L, 10L, 11L, 1L, 100L), (1L, 20L, 40L, 2L, 200L),
      (1L, 15L, 16L, 3L, 150L)).toDF("key", "valid_us", "tx_us", "id", "v")
    // as-known-at 30: the correction is invisible -> valid-15 row wins
    val early = TimeJoins.bitemporalAsOf(df, "key", "valid_us", "tx_us",
        "id", validAt = 25L, knownAt = 30L)
      .select($"id", $"v").as[(Long, Long)].collect().toSeq
    assert(early == Seq((3L, 150L)))
    // as-known-at 50: the correction is visible -> valid-20 row wins
    val late = TimeJoins.bitemporalAsOf(df, "key", "valid_us", "tx_us",
        "id", validAt = 25L, knownAt = 50L)
      .select($"id", $"v").as[(Long, Long)].collect().toSeq
    assert(late == Seq((2L, 200L)))
  }
  test("asofJoinNearest: closer side wins, ties prefer backward, edges null") {
    import spark.implicits._
    val probes = Seq((1L, 10L, 100L), (2L, 10L, 104L), (3L, 10L, 107L),
      (4L, 10L, 90L), (5L, 99L, 50L)).toDF("id", "k", "t")
    val quotes = Seq((10L, 95L, 7L), (10L, 103L, 8L), (10L, 105L, 9L))
      .toDF("k", "rt", "v")
    val got = graft.etl.TimeJoins.asofJoinNearest(probes, quotes, "k",
        "t", "rt", "v")
      .select($"id", $"asofn_v", $"asofn_gap").orderBy($"id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1L, Some(8L), Some(3L)),   // 100: fwd 103 gap 3 beats back 95 gap 5
      (2L, Some(8L), Some(1L)),   // 104: gap-1 tie both ways -> backward 103
      (3L, Some(9L), Some(2L)),   // 107: back 105 gap 2, no forward
      (4L, Some(7L), Some(5L)),   // 90: no backward, fwd 95 gap 5
      (5L, None, None)))          // key with no quotes
  }

}
