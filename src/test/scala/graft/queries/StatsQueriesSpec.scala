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
}
