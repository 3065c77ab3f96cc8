package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-built truth tables for the governance family: the DuckDB twins
  * share the queries' arithmetic, so these fixtures pin the semantics
  * (SLA boundary, retention boundary, consent classes, split-vs-PII
  * cross) with independently hand-derived expected rows. */
class ComplianceSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double,
      String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("compliance").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def tsAt(us: Long) = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("q497: events exactly at the SLA deadline are NOT violations") {
    val day = 86400000000L
    val ev = Seq(
      // user 1 requests erasure at t=0; activity at exactly +24h (not
      // late), +24h+1us (late by 1), and before the request (not late)
      (1L, tsAt(0L), 1L, "signup", 0.0, "{}"),
      (2L, tsAt(day), 1L, "click", 0.0, "{}"),
      (3L, tsAt(day + 1), 1L, "click", 0.0, "{}"),
      (4L, tsAt(0L), 1L, "view", 0.0, "{}"),
      // user 2 never signed up: out of scope entirely
      (5L, tsAt(2 * day), 2L, "click", 0.0, "{}"))
    val got = Compliance.q497TombstoneAudit(spark, eventsDir(ev))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
          r.getAs[Long]("late_bp"), r.getAs[Long]("max_overshoot_us"),
          r.getAs[Long]("n_users_late"))).toMap
    assert(got == Map(
      "click" -> ((2L, 1L, 5000L, 1L, 1L)),
      "view" -> ((1L, 0L, 0L, 0L, 0L))))
  }

  test("q497: a re-request moves the deadline to the LATEST signup") {
    val day = 86400000000L
    val ev = Seq(
      (1L, tsAt(0L), 1L, "signup", 0.0, "{}"),
      (2L, tsAt(10 * day), 1L, "signup", 0.0, "{}"),
      // late vs the first signup but within SLA of the second
      (3L, tsAt(5 * day), 1L, "click", 0.0, "{}"))
    val got = Compliance.q497TombstoneAudit(spark, eventsDir(ev))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_late")).toMap
    assert(got == Map("click" -> 0L))
  }

  test("q498: purge fires strictly past the per-type retention day") {
    val day = 86400000000L
    val now = 100 * day
    val ev = Seq(
      // click retention 7d: age 7d exactly -> keep; 8d -> purge (1 over)
      (1L, tsAt(now - 7 * day), 1L, "click", 0.0, "{}"),
      (2L, tsAt(now - 8 * day), 1L, "click", 0.0, "{}"),
      // error retention 3d: age 10d -> 7 days overdue
      (3L, tsAt(now - 10 * day), 1L, "error", 0.0, "{}"),
      // the newest row pins "now"
      (4L, tsAt(now), 1L, "purchase", 0.0, "{}"))
    val got = Compliance.q498RetentionPurge(spark, eventsDir(ev))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_purge"),
          r.getAs[Long]("purge_bp"), r.getAs[Long]("max_overdue_days")))
      .toMap
    assert(got == Map(
      "click" -> ((2L, 1L, 5000L, 1L)),
      "error" -> ((1L, 1L, 10000L, 7L)),
      "purchase" -> ((1L, 0L, 0L, 0L))))
  }

  test("q499: fresh/stale/none classes split on the 90%-mark cutoff") {
    val ev = Seq(
      // span [0, 100]: cutoff at 0 + (100-0)*9/10 = 90
      (1L, tsAt(0L), 1L, "signup", 0.0, "{}"),   // u1 last consent 0: stale
      (2L, tsAt(60L), 1L, "click", 0.0, "{}"),   // pre-cutoff: excluded
      (3L, tsAt(95L), 1L, "click", 0.0, "{}"),
      (4L, tsAt(92L), 2L, "signup", 0.0, "{}"),  // u2 re-consent 92: fresh
      (5L, tsAt(96L), 2L, "view", 0.0, "{}"),
      (6L, tsAt(97L), 2L, "click", 0.0, "{}"),
      (7L, tsAt(100L), 3L, "click", 0.0, "{}"))  // u3 no signup: none
    val got = Compliance.q499ConsentCoverage(spark, eventsDir(ev))
      .collect().map(r => r.getAs[String]("consent_class") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"),
          r.getAs[Long]("share_bp"))).toMap
    // post-cutoff events: u1 click(95) stale; u2 signup(92)+view(96)+
    // click(97) fresh; u3 click(100) none -> 5 events total
    assert(got == Map(
      "stale" -> ((1L, 1L, 2000L)),
      "fresh" -> ((3L, 1L, 6000L)),
      "none" -> ((1L, 1L, 2000L))))
  }

  test("q500: per-split PII counts re-derived with independent Scala") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val raw = graft.Tables.orders(spark, dir)
      .filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    def luhnOk(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    def sha16(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val h = md.digest(id.toString.getBytes("UTF-8"))
      (((h(0) & 0xffL) << 8) | (h(1) & 0xffL)) % 100
    }
    val expected = raw.map { case (ok, ck) =>
      val text = "inv " + ("%013d".format(ok % 10000000000000L)) +
        s" ref $ck card " + ("%016d".format((ok * 7919) % 10000000000000000L))
      val runs = "[0-9]+".r.findAllIn(text).toSeq
        .filter(r => r.length >= 13 && r.length <= 19)
      val valid = runs.count(luhnOk)
      val b = sha16(ok)
      val split = if (b < 80) "train" else if (b < 90) "val" else "test"
      (split, if (valid > 0) 1L else 0L, valid.toLong)
    }.groupBy(_._1).map { case (s, rows) =>
      s -> (rows.length.toLong, rows.map(_._2).sum,
        rows.map(_._2).sum * 10000 / rows.length, rows.map(_._3).sum)
    }
    val got = Compliance.q500PiiSplitLeak(spark, dir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pii_docs"),
          r.getAs[Long]("pii_bp"), r.getAs[Long]("n_valid_runs"))).toMap
    assert(got == expected)
    // the fixture corpus actually plants PII in more than one split
    assert(expected.count(_._2._2 > 0) >= 2)
  }

  test("q515 accountant: hand-computed (eps, alpha) argmin at steps = 100") {
    import spark.implicits._
    // rdp_milli = alpha*100*1000/(2*sigma_sq); eps = rdp + 11513//(alpha-1)
    // sigma_sq=1:  alpha=2 -> 100000+11513 = 111513 (larger alphas worse)
    // sigma_sq=4:  alpha=2 ->  25000+11513 =  36513
    // sigma_sq=16: alpha=2 -> 6250+11513 = 17763; alpha=4 -> 12500+3837
    //              = 16337 (the argmin moves off the smallest alpha)
    val steps = Seq(100L).toDF("steps")
    val got = graft.etl.Privacy.gaussianDpAccountant(steps)
      .collect().map(r => r.getAs[Long]("sigma_sq") -> (
        r.getAs[Long]("steps"), r.getAs[Long]("best_alpha"),
        r.getAs[Long]("eps_milli"))).toMap
    assert(got == Map(1L -> (100L, 2L, 111513L),
      4L -> (100L, 2L, 36513L),
      16L -> (100L, 4L, 16337L)), got)
  }
}
