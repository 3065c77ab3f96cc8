package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-contract / observability audits — the checks a warehouse runs on
  * every load before anything downstream trusts the tables: an
  * expectation suite (range / domain / presence / referential checks
  * with per-check violation rates), a money reconciliation between the
  * order header and its lines (bucketed by relative difference, with
  * orphan detection), and a freshness/coverage readout per event stream.
  * Exact-integer with DuckDB twins; DataContractSpec pins boundaries on
  * crafted fixtures and re-derives the suite from plain Scala. */
object DataContract {

  /** The lineitem expectation suite: (name, SQL predicate that is TRUE
    * when the row VIOLATES the expectation). Deliberately mixed — two
    * contracts are tighter than the data so the suite exercises both
    * outcomes. */
  val Expectations: Seq[(String, String)] = Seq(
    "qty_range" -> "l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 40",
    "price_positive" -> "l_extendedprice IS NULL OR l_extendedprice <= 0",
    "discount_cap" -> "l_discount IS NULL OR l_discount > 0.05",
    "flag_domain" -> "l_returnflag IS NULL OR l_returnflag NOT IN ('A','N','R')",
    "shipdate_present" -> "l_shipdate IS NULL")

  // -------------------------------------------- q505 expectation suite

  /** Expectation-suite run over lineitem: the five column contracts in
    * [[Expectations]] evaluate in ONE scan (an aggregate emitting one
    * violation sum per check, unpivoted to check-grain rows), plus the
    * referential check (lines whose order is missing) as a broadcast-free
    * anti-join count at the same grain. Per check: rows checked,
    * violations, violation bp — the table a load gate reads before
    * promoting the partition. */
  def q505ExpectationSuite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val colChecks = li.agg(count(lit(1)).as("_n"),
        Expectations.map { case (name, pred) =>
          sum(expr(s"CASE WHEN $pred THEN 1 ELSE 0 END")).as(s"_v_$name")
        }: _*)
      .select(expr("stack(" + Expectations.size + ", " +
        Expectations.map { case (name, _) =>
          s"'$name', _n, _v_$name"
        }.mkString(", ") + ") AS (check_name, n_rows, n_fail)"))
    val fk = li.select($"l_orderkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("n_fail"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n_rows"))))
      .select(lit("order_fk").as("check_name"), $"n_rows", $"n_fail")
    colChecks.unionByName(fk)
      .withColumn("fail_bp", expr("n_fail * 10000 div n_rows"))
      .orderBy($"check_name")
  }

  // ------------------------------------------------ q506 order recon

  /** Order-header vs line-sum money reconciliation: per order the
    * relative difference between o_totalprice and Σ l_extendedprice in
    * exact cents/bp, bucketed the way a recon dashboard reads (<1%,
    * 1–10%, 10–50%, ≥50%) plus the headless-order orphan count (orders
    * with NO lines — the missing-feed signal); reported per order DAY.
    * One keyed join (order grain, both sides reducible before the join)
    * + one day-grain aggregate. */
  def q506OrderRecon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lsum = Tables.lineitem(spark, dir)
      .groupBy($"l_orderkey")
      .agg(expr("CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) " +
        "AS BIGINT)").as("_lc"))
    Tables.orders(spark, dir)
      .select($"o_orderkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("_oc"),
        // o_orderdate ships as TIMESTAMP_NTZ in some driver data drops
        // (same story as events.ts, Tables.events) — the session runs
        // UTC so the NTZ->TZ cast is wall-clock identity
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("d"))
      .join(lsum, $"o_orderkey" === $"l_orderkey", "left")
      .withColumn("_rel_bp", expr(
        "CASE WHEN _lc IS NULL OR _oc <= 0 THEN NULL " +
          "ELSE abs(_lc - _oc) * 10000 div _oc END"))
      .groupBy($"d")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"_lc".isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when($"_rel_bp" < 100, 1L).otherwise(0L)).as("b_lt1pct"),
        sum(when($"_rel_bp" >= 100 && $"_rel_bp" < 1000, 1L).otherwise(0L))
          .as("b_1_10pct"),
        sum(when($"_rel_bp" >= 1000 && $"_rel_bp" < 5000, 1L).otherwise(0L))
          .as("b_10_50pct"),
        sum(when($"_rel_bp" >= 5000, 1L).otherwise(0L)).as("b_ge50pct"),
        max($"_rel_bp").as("max_rel_bp"))
      .orderBy($"d")
  }

  // ------------------------------------------------ q507 freshness

  /** Stream freshness and coverage: per event_type the staleness (how
    * many minutes the newest row lags the newest row ANYWHERE — the
    * dead-feed detector) and the minute coverage (active minutes over
    * the corpus span in bp — the silent-gap detector, without a per-gap
    * window). Two aggregates ((type, minute) grain then type grain) + a
    * broadcast bounds row. */
  def q507Freshness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"event_type".isNotNull && $"ts".isNotNull)
      .select($"event_type", expr("unix_micros(ts) div 60000000").as("m"))
    val bounds = e.agg(min($"m").as("_mn"), max($"m").as("_mx"))
    e.groupBy($"event_type", $"m").agg(count(lit(1)).as("_c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("active_minutes"),
        max($"m").as("_last"),
        expr("CAST(sum(_c) AS BIGINT)").as("n_events"))
      .crossJoin(broadcast(bounds))
      .withColumn("span_minutes", $"_mx" - $"_mn" + 1L)
      .withColumn("staleness_min", $"_mx" - $"_last")
      .withColumn("coverage_bp",
        expr("active_minutes * 10000 div span_minutes"))
      .select($"event_type", $"n_events", $"active_minutes",
        $"span_minutes", $"staleness_min", $"coverage_bp")
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q505_expectation_suite" -> q505ExpectationSuite _,
    "q506_order_recon" -> q506OrderRecon _,
    "q507_freshness" -> q507Freshness _)

  val oracleSql: Map[String, String] = Map(
    "q505_expectation_suite" -> {
      val cols = Expectations.map { case (name, pred) =>
        s"""|SELECT '$name' AS check_name, count(*) AS n_rows,
            |  sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS n_fail
            |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""
      |WITH checks AS (
      |$cols
      |UNION ALL
      |SELECT 'order_fk' AS check_name,
      |  (SELECT count(*) FROM lineitem) AS n_rows,
      |  (SELECT count(*) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o
      |     WHERE o.o_orderkey = l.l_orderkey)) AS n_fail)
      |SELECT check_name, CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_fail AS BIGINT) AS n_fail,
      |  CAST(n_fail * 10000 // n_rows AS BIGINT) AS fail_bp
      |FROM checks ORDER BY check_name""".stripMargin
    },
    "q506_order_recon" -> """
      |WITH lsum AS (
      |  SELECT l_orderkey,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS lc
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS oc, lc
      |  FROM orders o LEFT JOIN lsum ON lsum.l_orderkey = o.o_orderkey),
      |r AS (
      |  SELECT d, lc,
      |    CASE WHEN lc IS NULL OR oc <= 0 THEN NULL
      |      ELSE abs(lc - oc) * 10000 // oc END AS rel_bp
      |  FROM j)
      |SELECT CAST(d AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CASE WHEN lc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing,
      |  CAST(sum(CASE WHEN rel_bp < 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS b_lt1pct,
      |  CAST(sum(CASE WHEN rel_bp >= 100 AND rel_bp < 1000 THEN 1
      |    ELSE 0 END) AS BIGINT) AS b_1_10pct,
      |  CAST(sum(CASE WHEN rel_bp >= 1000 AND rel_bp < 5000 THEN 1
      |    ELSE 0 END) AS BIGINT) AS b_10_50pct,
      |  CAST(sum(CASE WHEN rel_bp >= 5000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS b_ge50pct,
      |  CAST(max(rel_bp) AS BIGINT) AS max_rel_bp
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q507_freshness" -> """
      |WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 60000000 AS m FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
      |b AS (SELECT min(m) AS mn, max(m) AS mx FROM e),
      |tm AS (SELECT event_type, m, count(*) AS c FROM e GROUP BY 1, 2),
      |per AS (
      |  SELECT event_type, count(*) AS active_minutes, max(m) AS last_m,
      |    sum(c) AS n_events
      |  FROM tm GROUP BY 1)
      |SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(active_minutes AS BIGINT) AS active_minutes,
      |  CAST(mx - mn + 1 AS BIGINT) AS span_minutes,
      |  CAST(mx - last_m AS BIGINT) AS staleness_min,
      |  CAST(active_minutes * 10000 // (mx - mn + 1) AS BIGINT)
      |    AS coverage_bp
      |FROM per, b ORDER BY event_type""".stripMargin)
}
