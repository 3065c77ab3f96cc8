package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Model-serving operations analytics — the release/ops readouts next to
  * the inference-log family (q487–q490): cascade-router economics, load
  * degradation, SLO burn alerting, and canary gating. Synthetic mapping:
  * events are requests (value cents = the cheap model's self-confidence,
  * event_type = outcome where 'error' is a failure, user_id buckets =
  * rollout cohorts). Exact-integer with DuckDB twins; ServingOpsSpec
  * pins thresholds and the z² formula against independent computations.
  */
object ServingOps {

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")

  /** Confidence thresholds (cents) swept by the router frontier. */
  val RouterGrid: Seq[Long] = Seq(1000L, 2500L, 5000L, 10000L, 25000L)
  /** Big-model cost per request, in cheap-model units. */
  val BigCostX = 10L
  /** Cumulative canary stages (percent of the user space). */
  val CanaryStages: Seq[Int] = Seq(1, 5, 25)

  // ------------------------------------------ q501 router frontier

  /** Cascade-router cost–quality frontier: a cheap model answers when its
    * self-confidence (cents) clears τ, otherwise the request escalates to
    * the big model ([[BigCostX]]× the cost; its outcome is the
    * deterministic 90% stand-in `user_id % 10 != 0`). Per τ in
    * [[RouterGrid]]: volume kept by the cheap model (bp), combined
    * accuracy (bp), and mean cost per request (milli-units) — the three
    * numbers a routing threshold is chosen from. One scan broadcast-
    * crossed with the 5-row literal grid, then a 5-key aggregate. */
  def q501RouterFrontier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val req = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        $"value".isNotNull && $"value" >= 0)
      .select(cents.as("conf"),
        ($"event_type" =!= "error").cast("long").as("small_ok"),
        ($"user_id" % 10 =!= 0).cast("long").as("big_ok"))
    val grid = RouterGrid.toDF("tau")
    req.crossJoin(broadcast(grid))
      .withColumn("_small", ($"conf" >= $"tau").cast("long"))
      .groupBy($"tau")
      .agg(count(lit(1)).as("n_requests"),
        expr("sum(_small) * 10000 div count(1)").as("small_share_bp"),
        expr("sum(CASE WHEN _small = 1 THEN small_ok ELSE big_ok END) " +
          "* 10000 div count(1)").as("acc_bp"),
        expr(s"sum(CASE WHEN _small = 1 THEN 1 ELSE $BigCostX END) " +
          "* 1000 div count(1)").as("cost_milli"))
      .orderBy($"tau")
  }

  // --------------------------------------- q502 degradation ladder

  /** Graceful-degradation ladder: per-minute arrival counts classify
    * each minute as 'full' (at/below the mean arrival rate), 'degraded'
    * (above, up to 2× mean) or 'shed' (above 2×) — the capacity tiers a
    * serving stack steps through under load. Per tier: minutes,
    * requests, request share (bp) and the single worst minute. Minute
    * grain is calendar-bounded; the thresholds are broadcast scalars
    * computed exactly on both engines. */
  def q502DegradationLadder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pm = Tables.events(spark, dir)
      .filter($"ts".isNotNull)
      .select(expr("unix_micros(ts) div 60000000").as("minute"))
      .groupBy($"minute").agg(count(lit(1)).as("n_m"))
    val mean = pm.agg(expr("CAST(sum(n_m) AS DECIMAL(38,0))").as("_s"),
      count(lit(1)).as("_k"))
      .select(expr("CAST(_s div _k AS BIGINT)").as("_mean"))
    val per = pm.crossJoin(broadcast(mean))
      .withColumn("tier", expr(
        "CASE WHEN n_m <= _mean THEN 'full' " +
          "WHEN n_m <= 2 * _mean THEN 'degraded' ELSE 'shed' END"))
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_minutes"),
        expr("CAST(sum(n_m) AS BIGINT)").as("n_requests"),
        max($"n_m").as("worst_minute"))
    val tot = per.agg(sum($"n_requests").as("_tot"))
    per.crossJoin(broadcast(tot))
      .withColumn("req_share_bp", expr("n_requests * 10000 div _tot"))
      .drop("_tot")
      .orderBy($"tier")
  }

  // ------------------------------------------- q503 SLO burn alerts

  /** Multi-window SLO burn-rate alerting (the SRE workbook recipe): per
    * minute the error rate over the trailing 60 and 360 ACTIVE minutes
    * (ROWS frames over the minute aggregate — minutes with zero events
    * don't occupy a frame slot, so a sparse stream's window spans more
    * wall-clock than 60/360 minutes; the streaming twin `burnRateStream`
    * is the wall-clock-windowed face); a minute ALERTS when the fast
    * window burns ≥14× the 1% error budget (≥140 bp) AND the slow window
    * ≥6× (≥60 bp) — fast catches the spike, slow keeps one bad minute
    * from paging. Per day: alerting minutes and the worst fast-window
    * rate. The rolling windows run at MINUTE grain over a
    * calendar-bounded aggregate (the audited empty-partition window
    * class — the child is the minute aggregate, never raw rows). */
  def q503SloBurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pm = Tables.events(spark, dir)
      .filter($"ts".isNotNull)
      .select(expr("unix_micros(ts) div 60000000").as("minute"),
        ($"event_type" === "error").cast("long").as("err"))
      .groupBy($"minute")
      .agg(count(lit(1)).as("n"), sum($"err").as("e"))
    pm.withColumn("fast_bp", expr(
        "CAST(sum(e) OVER (ORDER BY minute ROWS BETWEEN 59 PRECEDING " +
          "AND CURRENT ROW) * 10000 div sum(n) OVER (ORDER BY minute " +
          "ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT)"))
      .withColumn("slow_bp", expr(
        "CAST(sum(e) OVER (ORDER BY minute ROWS BETWEEN 359 PRECEDING " +
          "AND CURRENT ROW) * 10000 div sum(n) OVER (ORDER BY minute " +
          "ROWS BETWEEN 359 PRECEDING AND CURRENT ROW) AS BIGINT)"))
      .withColumn("d", expr("minute div 1440"))
      .groupBy($"d")
      .agg(count(lit(1)).as("n_minutes"),
        sum(when($"fast_bp" >= 140 && $"slow_bp" >= 60, 1L).otherwise(0L))
          .as("n_alert_minutes"),
        max($"fast_bp").as("max_fast_bp"))
      .orderBy($"d")
  }

  // ------------------------------------------ q504 canary rollout

  /** Canary rollout gate: cumulative stages expose 1% / 5% / 25% of the
    * user space (`user_id % 100 < stage`); per stage the treated vs
    * control error rates and the pooled two-proportion z² in milli
    * (q480's exact-integer spelling, DECIMAL(38,0) before every product
    * so large counts cannot overflow) — the promote/rollback number read
    * at each stage gate. One scan crossed with the 3-row literal grid,
    * 3-key aggregate, then pure scalar algebra. */
  def q504CanaryRollout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val req = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select(($"user_id" % 100).as("b"),
        ($"event_type" === "error").cast("long").as("err"))
    val grid = CanaryStages.map(_.toLong).toDF("stage")
    req.crossJoin(broadcast(grid))
      .groupBy($"stage")
      .agg(sum(when($"b" < $"stage", 1L).otherwise(0L)).as("n_treat"),
        sum(when($"b" < $"stage", $"err").otherwise(0L)).as("x_treat"),
        sum(when($"b" >= $"stage", 1L).otherwise(0L)).as("n_ctrl"),
        sum(when($"b" >= $"stage", $"err").otherwise(0L)).as("x_ctrl"))
      .withColumn("err_treat_bp", expr(
        "CASE WHEN n_treat > 0 THEN x_treat * 10000 div n_treat END"))
      .withColumn("err_ctrl_bp", expr(
        "CASE WHEN n_ctrl > 0 THEN x_ctrl * 10000 div n_ctrl END"))
      .withColumn("z2_milli", expr(
        "CASE WHEN n_treat > 0 AND n_ctrl > 0 AND x_treat + x_ctrl > 0 " +
          "AND x_treat + x_ctrl < n_treat + n_ctrl THEN " +
          "CAST((CAST(x_treat AS DECIMAL(38,0)) * n_ctrl " +
          "- CAST(x_ctrl AS DECIMAL(38,0)) * n_treat) " +
          "* (CAST(x_treat AS DECIMAL(38,0)) * n_ctrl " +
          "- CAST(x_ctrl AS DECIMAL(38,0)) * n_treat) " +
          "* (n_treat + n_ctrl) * 1000 " +
          "div (CAST(n_treat AS DECIMAL(38,0)) * n_ctrl " +
          "* (x_treat + x_ctrl) " +
          "* (n_treat + n_ctrl - x_treat - x_ctrl)) AS BIGINT) END"))
      .select($"stage", $"n_treat", $"n_ctrl", $"err_treat_bp",
        $"err_ctrl_bp", $"z2_milli")
      .orderBy($"stage")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q501_router_frontier" -> q501RouterFrontier _,
    "q502_degradation_ladder" -> q502DegradationLadder _,
    "q503_slo_burn" -> q503SloBurn _,
    "q504_canary_rollout" -> q504CanaryRollout _)

  val oracleSql: Map[String, String] = Map(
    "q501_router_frontier" -> s"""
      |WITH req AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS conf,
      |    CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS small_ok,
      |    CASE WHEN user_id % 10 <> 0 THEN 1 ELSE 0 END AS big_ok
      |  FROM events
      |  WHERE user_id IS NOT NULL AND user_id >= 0
      |    AND value IS NOT NULL AND value >= 0),
      |g AS (SELECT unnest(ARRAY[${RouterGrid.mkString(",")}]) AS tau)
      |SELECT CAST(tau AS BIGINT) AS tau,
      |  CAST(count(*) AS BIGINT) AS n_requests,
      |  CAST(sum(CASE WHEN conf >= tau THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS small_share_bp,
      |  CAST(sum(CASE WHEN conf >= tau THEN small_ok ELSE big_ok END)
      |    * 10000 // count(*) AS BIGINT) AS acc_bp,
      |  CAST(sum(CASE WHEN conf >= tau THEN 1 ELSE $BigCostX END) * 1000
      |    // count(*) AS BIGINT) AS cost_milli
      |FROM req, g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q502_degradation_ladder" -> """
      |WITH pm AS (
      |  SELECT epoch_us(ts) // 60000000 AS minute, count(*) AS n_m
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      |m AS (SELECT CAST(CAST(sum(n_m) AS HUGEINT) // count(*) AS BIGINT)
      |  AS mean_m FROM pm),
      |t AS (
      |  SELECT CASE WHEN n_m <= mean_m THEN 'full'
      |    WHEN n_m <= 2 * mean_m THEN 'degraded' ELSE 'shed' END AS tier,
      |    n_m
      |  FROM pm, m),
      |per AS (
      |  SELECT tier, count(*) AS n_minutes, sum(n_m) AS n_requests,
      |    max(n_m) AS worst_minute
      |  FROM t GROUP BY 1),
      |tot AS (SELECT sum(n_requests) AS tr FROM per)
      |SELECT tier, CAST(n_minutes AS BIGINT) AS n_minutes,
      |  CAST(n_requests AS BIGINT) AS n_requests,
      |  CAST(worst_minute AS BIGINT) AS worst_minute,
      |  CAST(n_requests * 10000 // tr AS BIGINT) AS req_share_bp
      |FROM per, tot ORDER BY tier""".stripMargin,
    "q503_slo_burn" -> """
      |WITH pm AS (
      |  SELECT epoch_us(ts) // 60000000 AS minute, count(*) AS n,
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
      |r AS (
      |  SELECT minute // 1440 AS d,
      |    sum(e) OVER (ORDER BY minute ROWS BETWEEN 59 PRECEDING
      |      AND CURRENT ROW) * 10000
      |      // sum(n) OVER (ORDER BY minute ROWS BETWEEN 59 PRECEDING
      |      AND CURRENT ROW) AS fast_bp,
      |    sum(e) OVER (ORDER BY minute ROWS BETWEEN 359 PRECEDING
      |      AND CURRENT ROW) * 10000
      |      // sum(n) OVER (ORDER BY minute ROWS BETWEEN 359 PRECEDING
      |      AND CURRENT ROW) AS slow_bp
      |  FROM pm)
      |SELECT CAST(d AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n_minutes,
      |  CAST(sum(CASE WHEN fast_bp >= 140 AND slow_bp >= 60
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_alert_minutes,
      |  CAST(max(fast_bp) AS BIGINT) AS max_fast_bp
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q504_canary_rollout" -> s"""
      |WITH req AS (
      |  SELECT user_id % 100 AS b,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |g AS (SELECT unnest(ARRAY[${CanaryStages.mkString(",")}]) AS stage),
      |per AS (
      |  SELECT stage,
      |    sum(CASE WHEN b < stage THEN 1 ELSE 0 END) AS n_treat,
      |    sum(CASE WHEN b < stage THEN err ELSE 0 END) AS x_treat,
      |    sum(CASE WHEN b >= stage THEN 1 ELSE 0 END) AS n_ctrl,
      |    sum(CASE WHEN b >= stage THEN err ELSE 0 END) AS x_ctrl
      |  FROM req, g GROUP BY 1)
      |SELECT CAST(stage AS BIGINT) AS stage,
      |  CAST(n_treat AS BIGINT) AS n_treat,
      |  CAST(n_ctrl AS BIGINT) AS n_ctrl,
      |  CAST(CASE WHEN n_treat > 0 THEN x_treat * 10000 // n_treat END
      |    AS BIGINT) AS err_treat_bp,
      |  CAST(CASE WHEN n_ctrl > 0 THEN x_ctrl * 10000 // n_ctrl END
      |    AS BIGINT) AS err_ctrl_bp,
      |  CAST(CASE WHEN n_treat > 0 AND n_ctrl > 0 AND x_treat + x_ctrl > 0
      |    AND x_treat + x_ctrl < n_treat + n_ctrl THEN
      |    (CAST(x_treat AS HUGEINT) * n_ctrl
      |      - CAST(x_ctrl AS HUGEINT) * n_treat)
      |    * (CAST(x_treat AS HUGEINT) * n_ctrl
      |      - CAST(x_ctrl AS HUGEINT) * n_treat)
      |    * (n_treat + n_ctrl) * 1000
      |    // (CAST(n_treat AS HUGEINT) * n_ctrl * (x_treat + x_ctrl)
      |      * (n_treat + n_ctrl - x_treat - x_ctrl)) END AS BIGINT)
      |    AS z2_milli
      |FROM per ORDER BY stage""".stripMargin)
}
