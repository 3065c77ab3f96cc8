package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Algebraic invariants of the round-9 families over SEEDED random
  * fixtures (the Spark twin of functions/PropertySpec — a handful of
  * seeds instead of 200 ScalaCheck cases, because each case is a Spark
  * job): conservation laws, range bounds, and monotonicities that must
  * hold for EVERY input, not just the hand-built truth tables. */
class InvariantSpec extends SparkSpec {

  private def randomEventsDir(seed: Long, n: Int): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val types = Seq("click", "view", "purchase", "signup", "error")
    val d = Files.createTempDirectory(s"inv$seed").toString
    (0 until n).map { i =>
      (i.toLong, new Timestamp(rnd.nextInt(40) * 86400000L +
        rnd.nextInt(86400000)), rnd.nextInt(50).toLong,
        types(rnd.nextInt(types.length)),
        (rnd.nextInt(20000).toDouble / 100.0),
        s"""{"k": ${1 + rnd.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q491: expert shares conserve the corpus and sum to ~10000 bp") {
    for (seed <- Seq(1L, 7L)) {
      val dir = randomEventsDir(seed, 2000)
      val rows = TrainOps.q491MoeBalance(spark, dir).collect()
      val n = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(n == 2000L, s"seed $seed conservation")
      val shares = rows.map(_.getAs[Long]("share_bp")).sum
      // floor per expert: total within E of 10000
      assert(shares > 10000 - 8 && shares <= 10000, s"seed $seed shares")
      rows.foreach(r => assert(r.getAs[Long]("dropped_n") >= 0))
    }
  }

  test("q496: straggler tax bounded, wall dominates useful tokens") {
    for (seed <- Seq(2L, 9L)) {
      val dir = randomEventsDir(seed, 1500)
      val r = TrainOps.q496StragglerTax(spark, dir).collect().head
      val wall = r.getAs[Long]("wall_tokens")
      val tot = r.getAs[Long]("total_tokens")
      val tax = r.getAs[Long]("straggler_tax_bp")
      assert(wall >= tot, s"seed $seed wall")
      assert(tax >= 0 && tax < 10000, s"seed $seed tax")
      val active = r.getAs[Long]("mean_active_milli")
      assert(active >= 1000 && active <= 8000, s"seed $seed active")
    }
  }

  test("tombstoneAudit: violations are monotone nonincreasing in the SLA") {
    import spark.implicits._
    val dir = randomEventsDir(3L, 2000)
    val e = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val day = 86400000000L
    val counts = Seq(0L, day, 10 * day, 100 * day).map { sla =>
      graft.etl.Privacy.tombstoneAudit(e, "user_id", "us", "event_type",
          "signup", sla)
        .agg(sum($"n_late")).as[Long].collect().headOption.getOrElse(0L)
    }
    assert(counts == counts.sorted.reverse, counts.toString)
    // n_events (the audited scope) must NOT depend on the SLA
    val scopes = Seq(0L, 100 * day).map { sla =>
      graft.etl.Privacy.tombstoneAudit(e, "user_id", "us", "event_type",
          "signup", sla)
        .agg(sum($"n_events")).as[Long].collect().head
    }
    assert(scopes.distinct.size == 1, scopes.toString)
  }

  test("q506: diff buckets + missing partition every order exactly once") {
    for (seed <- Seq(4L, 11L)) {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val d = Files.createTempDirectory(s"recon$seed").toString
      val orders = (1 to 300).map { i =>
        (i.toLong, 1L, "O", 1.0 + rnd.nextInt(50000) / 100.0,
          new Timestamp(rnd.nextInt(20) * 86400000L), "p")
      }
      orders.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
      val lines = (1 to 300).filter(_ => rnd.nextBoolean()).flatMap { i =>
        (0 to rnd.nextInt(3)).map(j =>
          (i.toLong, j, 1.0 + rnd.nextInt(40000) / 100.0))
      }
      lines.toDF("l_orderkey", "l_linenumber", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      val rows = DataContract.q506OrderRecon(spark, d).collect()
      for (r <- rows) {
        val parts = Seq("n_missing", "b_lt1pct", "b_1_10pct", "b_10_50pct",
          "b_ge50pct").map(r.getAs[Long]).sum
        assert(parts == r.getAs[Long]("n_orders"),
          s"seed $seed day ${r.getAs[Long]("d")}")
      }
      assert(rows.map(_.getAs[Long]("n_orders")).sum == 300L)
    }
  }

  test("q512: I2 in [0,1000], pooled inside the effect envelope") {
    for (seed <- Seq(5L, 13L)) {
      val dir = randomEventsDir(seed, 3000)
      val strata = StatsQueries.q511MetaStrata(spark, dir).collect()
      if (strata.nonEmpty) {
        val effs = strata.map(_.getAs[Long]("eff_bp"))
        val shares = strata.map(_.getAs[Long]("w_share_bp")).sum
        assert(shares > 10000 - strata.length && shares <= 10000)
        val p = StatsQueries.q512PooledMeta(spark, dir).collect().head
        val pooled = p.getAs[Long]("pooled_bp")
        // floored weighted mean sits within one bp of the envelope
        assert(pooled >= effs.min - 1 && pooled <= effs.max + 1,
          s"seed $seed pooled $pooled in ${effs.toSeq}")
        val i2 = p.getAs[Long]("i2_milli")
        assert(i2 >= 0 && i2 < 1000, s"seed $seed i2 $i2")
        assert(p.getAs[Long]("q_stat") >= 0)
      }
    }
  }

  test("q499: consent classes partition post-cutoff activity exactly") {
    for (seed <- Seq(6L, 17L)) {
      val dir = randomEventsDir(seed, 2000)
      val rows = Compliance.q499ConsentCoverage(spark, dir).collect()
      val shares = rows.map(_.getAs[Long]("share_bp")).sum
      assert(shares > 10000 - rows.length - 1 && shares <= 10000,
        s"seed $seed shares $shares")
      assert(rows.map(_.getAs[String]("consent_class")).toSet
        .subsetOf(Set("fresh", "stale", "none")))
    }
  }

  // ---------------------------------------------- round-10 families

  test("q513: the fit's expected wins conserve each pair, residuals bounded") {
    for (seed <- Seq(3L, 11L)) {
      val dir = randomEventsDir(seed, 1500)
      val rows = PrefQueries.q513BtResiduals(spark, dir).collect()
      rows.foreach { r =>
        val games = r.getAs[Long]("games")
        val exp = r.getAs[Long]("exp_milli")
        val resid = r.getAs[Long]("resid_milli")
        // expected milli-wins of an arm can't exceed its games; the L1
        // residual can't exceed obs + exp (triangle)
        assert(exp >= 0 && exp <= games * 1000, s"seed $seed exp")
        assert(resid >= 0 &&
          resid <= r.getAs[Long]("wins") * 1000 + exp, s"seed $seed resid")
        assert(r.getAs[Long]("resid_bp") <= 10000, s"seed $seed bp")
      }
      // conservation: summed over both sides, e_a + e_b <= 1000*n_ab
      // with at most 1 milli floor loss per side per pair, so the
      // corpus-wide expected mass stays within pairs of the win mass
      val totalExp = rows.map(_.getAs[Long]("exp_milli")).sum
      val totalWins = rows.map(_.getAs[Long]("wins")).sum * 1000
      assert(totalExp <= totalWins && totalWins - totalExp <=
        2L * rows.map(_.getAs[Long]("games")).sum,
        s"seed $seed conservation: exp $totalExp wins $totalWins")
    }
  }

  test("q514: alpha <= 1e6 always; full-panel do/de in range") {
    for (seed <- Seq(4L, 13L)) {
      val dir = randomEventsDir(seed, 1500)
      val rows = PrefQueries.q514KrippendorffLoo(spark, dir).collect()
      rows.foreach { r =>
        assert(r.getAs[Long]("alpha_ppm") <= 1000000L, s"seed $seed")
        assert(r.getAs[Long]("do_ppm") >= 0 &&
          r.getAs[Long]("do_ppm") <= 1000000L, s"seed $seed do")
        assert(r.getAs[Long]("de_ppm") >= 0 &&
          r.getAs[Long]("de_ppm") <= 1000000L, s"seed $seed de")
      }
    }
  }

  test("q516: keep rate and kept counts are monotone nonincreasing in tau") {
    for (seed <- Seq(5L, 19L)) {
      val dir = randomEventsDir(seed, 2000)
      val rows = PrefQueries.q516RejectionYield(spark, dir).collect()
        .groupBy(_.getAs[String]("arm"))
      rows.foreach { case (arm, rs) =>
        val byTau = rs.sortBy(_.getAs[Long]("tau"))
        val kept = byTau.map(_.getAs[Long]("n_kept"))
        assert(kept.zip(kept.tail).forall { case (a, b) => a >= b },
          s"seed $seed arm $arm kept $kept")
        byTau.foreach { r =>
          assert(r.getAs[Long]("keep_bp") <= 10000)
          assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_drawn"))
        }
      }
    }
  }

  test("q517: confidence buckets partition the rating mass exactly") {
    for (seed <- Seq(8L, 23L)) {
      val dir = randomEventsDir(seed, 2000)
      val rows = PrefQueries.q517TeacherConfidence(spark, dir).collect()
      val ratings = rows.map(_.getAs[Long]("n_ratings")).sum
      assert(ratings == 2000L, s"seed $seed partition $ratings")
      rows.foreach { r =>
        assert(r.getAs[Long]("conf_bucket") >= 0 &&
          r.getAs[Long]("conf_bucket") <= 3)
        assert(r.getAs[Long]("agree_bp") <= 10000)
      }
    }
  }

  test("q518: k=1 is unanimous by construction; full-k matches itself") {
    for (seed <- Seq(10L, 29L)) {
      val dir = randomEventsDir(seed, 2000)
      val rows = PrefQueries.q518SelfConsistency(spark, dir).collect()
        .map(r => r.getAs[Long]("k") -> r).toMap
      val n = rows(5L).getAs[Long]("n_prompts")
      // one panel across every k row
      assert(rows.values.forall(_.getAs[Long]("n_prompts") == n))
      assert(rows(1L).getAs[Long]("mean_major_share_bp") == 10000L)
      assert(rows(1L).getAs[Long]("unanimous_bp") == 10000L)
      assert(rows(5L).getAs[Long]("match_full_bp") == 10000L)
      rows.values.foreach { r =>
        assert(r.getAs[Long]("mean_major_share_bp") <= 10000L)
        assert(r.getAs[Long]("match_full_bp") <= 10000L)
      }
    }
  }
}
