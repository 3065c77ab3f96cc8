package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Independent-computation pins for the serving-ops family: plain-Scala
  * recomputation at sf0.001 for the router frontier, hand-built fixtures
  * for the tier/burn thresholds, and a double-arithmetic cross-check of
  * the integer z² (the oracle shares the query's integer spelling, so
  * only an independent derivation catches a shared formula bug). */
class ServingOpsSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double,
      String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("servingops").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def tsAt(us: Long) = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("q501: frontier matches a plain-Scala router simulation at sf0.001") {
    import spark.implicits._
    val raw = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        $"value".isNotNull && $"value" >= 0)
      .select($"user_id", $"event_type", $"value")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val got = ServingOps.q501RouterFrontier(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("tau") ->
        (r.getAs[Long]("n_requests"), r.getAs[Long]("small_share_bp"),
          r.getAs[Long]("acc_bp"), r.getAs[Long]("cost_milli"))).toMap
    for (tau <- ServingOps.RouterGrid) {
      val sim = raw.map { case (u, t, v) =>
        val conf = math.round(v * 100)
        val small = conf >= tau
        val ok = if (small) t != "error" else u % 10 != 0
        (if (small) 1L else 0L, if (ok) 1L else 0L,
          if (small) 1L else ServingOps.BigCostX)
      }
      val n = sim.length.toLong
      val expected = (n, sim.map(_._1).sum * 10000 / n,
        sim.map(_._2).sum * 10000 / n, sim.map(_._3).sum * 1000 / n)
      assert(got(tau) == expected, s"tau=$tau")
    }
  }

  test("q502: tier boundaries are inclusive at mean and 2x mean") {
    // minutes with 1, 2, 2, 4, 6 arrivals: mean = 15/5 = 3
    // full: n<=3 -> minutes {1,2,2}; degraded: n<=6 -> {4,6}; no shed
    val m = 60000000L
    val ev = (Seq.fill(1)(0L) ++ Seq.fill(2)(1L) ++ Seq.fill(2)(2L) ++
      Seq.fill(4)(3L) ++ Seq.fill(6)(4L)).zipWithIndex.map {
      case (minute, i) =>
        (i.toLong, tsAt(minute * m + i), 1L, "view", 1.0, "{}")
    }
    val got = ServingOps.q502DegradationLadder(spark, eventsDir(ev))
      .collect().map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_minutes"), r.getAs[Long]("n_requests"),
          r.getAs[Long]("worst_minute"), r.getAs[Long]("req_share_bp")))
      .toMap
    assert(got == Map(
      "full" -> ((3L, 5L, 2L, 3333L)),
      "degraded" -> ((2L, 10L, 6L, 6666L))))
  }

  test("q503: alert needs BOTH burn windows over their thresholds") {
    val m = 60000000L
    // minute 0: 100 req, 0 err; minute 1: 100 req, 3 err (trailing
    // rates: fast = slow = 3/200 = 150bp >= 140 AND >= 60 -> alert);
    // minute 2: 100 req 0 err (3/300 = 100bp: fast below 140 -> clean)
    val ev = (0 until 300).map { i =>
      val minute = i / 100
      val isErr = minute == 1 && i % 100 < 3
      (i.toLong, tsAt(minute * m + i), 1L,
        if (isErr) "error" else "view", 1.0, "{}")
    }
    val got = ServingOps.q503SloBurn(spark, eventsDir(ev))
      .collect().map(r => (r.getAs[Long]("d"),
        r.getAs[Long]("n_minutes"), r.getAs[Long]("n_alert_minutes"),
        r.getAs[Long]("max_fast_bp")))
    assert(got.toSeq == Seq((0L, 3L, 1L, 150L)))
  }

  test("q504: integer z2_milli tracks the double pooled two-proportion z^2") {
    import spark.implicits._
    // crafted cohort: bucket<5 (treat) errs 20/100, rest errs 30/300
    val ev = (0 until 400).map { i =>
      val b = if (i < 100) (i % 5).toLong else 5L + i % 90
      val isErr = (i < 20) || (i >= 100 && i % 10 == 0)
      (i.toLong, tsAt(i.toLong), b, if (isErr) "error" else "view", 1.0,
        "{}")
    }
    val got = ServingOps.q504CanaryRollout(spark, eventsDir(ev))
      .collect().map(r => r.getAs[Long]("stage") ->
        (r.getAs[Long]("n_treat"), r.getAs[Long]("n_ctrl"),
          r.getAs[Long]("z2_milli"))).toMap
    // independent double recompute per stage from the raw fixture
    val rows = ev.map(e => (e._3, e._4 == "error"))
    for ((stage, (nt, nc, z2m)) <- got) {
      val treat = rows.filter(_._1 < stage)
      val ctrl = rows.filter(_._1 >= stage)
      assert(nt == treat.length.toLong && nc == ctrl.length.toLong)
      val (x1, n1) = (treat.count(_._2).toDouble, treat.length.toDouble)
      val (x2, n2) = (ctrl.count(_._2).toDouble, ctrl.length.toDouble)
      if (x1 + x2 > 0 && x1 + x2 < n1 + n2 && n1 > 0 && n2 > 0) {
        val p = (x1 + x2) / (n1 + n2)
        val z2 = math.pow(x1 / n1 - x2 / n2, 2) /
          (p * (1 - p) * (1 / n1 + 1 / n2))
        // the integer spelling floors at milli: |got - truth| < 1 milli
        assert(math.abs(z2m - z2 * 1000) <= 1.0,
          s"stage=$stage got=$z2m want=${z2 * 1000}")
      } else assert(z2m == 0L || got(stage)._3 == 0L)
    }
    // at least one stage has a non-degenerate z2
    assert(got.values.exists(_._3 > 0))
  }
}
