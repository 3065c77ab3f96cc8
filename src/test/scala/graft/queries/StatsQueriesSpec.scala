package graft.queries

import graft.SparkSpec

/** Independent-computation pins for StatsQueries additions (the older
  * members of the module are pinned through their etl-operator specs;
  * this file covers queries whose logic lives in the query itself). */
class StatsQueriesSpec extends SparkSpec {

  test("q508: backtest grid matches a plain-Scala rolling-origin replay") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, dir)
      .filter($"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type", $"ts", $"value").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
    // independent daily totals: epoch micros -> day, cents via round
    val daily = raw.groupBy(r => (r._1, {
      val us = r._2.getTime * 1000L + (r._2.getNanos / 1000L) % 1000L
      us / 86400000000L
    })).map { case ((t, d), rows) =>
      (t, d) -> rows.map(r => math.round(r._3 * 100)).sum
    }
    val byType = daily.groupBy(_._1._1)
    val expected = (for {
      (t, m) <- byType.toSeq
      series = m.map { case ((_, d), c) => d -> c }
      h <- Seq(1L, 7L)
    } yield {
      val errs = series.toSeq.flatMap { case (d, c) =>
        series.get(d + h).map(tc => math.abs(tc - c))
      }
      val den = series.toSeq.flatMap { case (d, c) =>
        series.get(d + 7).map(_ => ()).map(_ =>
          math.abs(series(d + 7) - c))
      }
      val mase =
        if (den.sum > 0 && errs.nonEmpty)
          Some((BigInt(errs.sum) * den.length * 1000 /
            (BigInt(den.sum) * errs.length)).toLong)
        else None
      (t, h) -> (errs.length.toLong, errs.sum / errs.length, mase)
    }).toMap
    val got = StatsQueries.q508BacktestGrid(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("h")) ->
        (r.getAs[Long]("n_origins"), r.getAs[Long]("mae_cents"),
          Option(r.getAs[java.lang.Long]("mase_milli")).map(_.toLong)))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((k, v) <- expected) assert(got(k) == v, k)
    // the grid is non-degenerate on this data: both horizons score
    assert(expected.keySet.map(_._2) == Set(1L, 7L))
  }

  test("q511/q512: symmetric two-stratum fixture gives pooled 0, Q=56, " +
      "I2=982") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("meta").toString
    val ts = new java.sql.Timestamp(0L)
    // stratum a: treat converts 100/200 (5000bp), control 50/200
    // (2500bp) -> eff +2500; stratum b mirrors -> eff -2500.
    // v = 5000*5000 div 200 + 2500*7500 div 200 = 218750 on both;
    // w = 1e8 div v = 457. pooled(shifted) = 457*(12500+7500)/914 =
    // 10000 -> pooled 0. Q = 2*(2500^2 div 218750) = 56 > k-1 ->
    // I2 = 55000 div 56 = 982.
    def rows(t: String, conv1: Int, conv0: Int) =
      (0 until 200).flatMap { i =>
        Seq((t, 2L * i, if (i < conv1) 60.0 else 1.0),
          (t, 2L * i + 1, if (i < conv0) 60.0 else 1.0))
      }
    val ev = (rows("a", 100, 50) ++ rows("b", 50, 100)).zipWithIndex
      .map { case ((t, u, v), i) => (i.toLong, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$d/events.parquet")
    val strata = StatsQueries.q511MetaStrata(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("eff_bp"), r.getAs[Long]("v_bp2"),
          r.getAs[Long]("w"), r.getAs[Long]("w_share_bp"))).toMap
    assert(strata == Map(
      "a" -> ((2500L, 218750L, 457L, 5000L)),
      "b" -> ((-2500L, 218750L, 457L, 5000L))))
    val p = StatsQueries.q512PooledMeta(spark, d).collect().head
    assert(p.getAs[Long]("k") == 2L)
    assert(p.getAs[Long]("pooled_bp") == 0L)
    assert(p.getAs[Long]("q_stat") == 56L)
    assert(p.getAs[Long]("i2_milli") == 982L)
  }

  test("q512: pooled estimate matches an independent BigInt recompute " +
      "at sf0.001") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        $"event_type".isNotNull && $"value".isNotNull && $"value" >= 0)
      .select($"event_type", $"user_id", $"value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        math.round(r.getAs[Double]("value") * 100)))
    val strata = raw.groupBy(_._1).flatMap { case (_, rows) =>
      val (tr, ct) = rows.partition(_._2 % 2 == 0)
      if (tr.isEmpty || ct.isEmpty) None
      else {
        val p1 = BigInt(tr.count(_._3 >= 5000)) * 10000 / tr.length
        val p0 = BigInt(ct.count(_._3 >= 5000)) * 10000 / ct.length
        val v = p1 * (10000 - p1) / tr.length + p0 * (10000 - p0) / ct.length
        if (v > 0) Some((p1 - p0, v, BigInt(100000000) / v)) else None
      }
    }.toSeq
    val pooledShift = strata.map { case (e, _, w) => w * (e + 10000) }.sum /
      strata.map(_._3).sum
    val pooled = (pooledShift - 10000).toLong
    val q = strata.map { case (e, v, _) =>
      (e - pooled) * (e - pooled) / v
    }.sum.toLong
    val got = StatsQueries.q512PooledMeta(spark, dir).collect().head
    assert(got.getAs[Long]("k") == strata.length.toLong)
    assert(got.getAs[Long]("pooled_bp") == pooled)
    assert(got.getAs[Long]("q_stat") == q)
  }
}
