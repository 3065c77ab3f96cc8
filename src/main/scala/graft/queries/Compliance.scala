package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Privacy

/** Data-governance / compliance analytics — the audit surface an ETL
  * pipeline runs before regulators (or the training team) do: erasure
  * propagation, retention purge planning, consent coverage, and PII
  * survivorship into the train split. Synthetic mapping: 'signup' events
  * stand in for the consent/erasure-request stream, other event types
  * for the data still flowing about that user; q500 reuses q387's
  * planted-card corpus because documents.text carries no digit runs.
  * Everything exact-integer with a DuckDB twin; ComplianceSpec pins the
  * contracts on hand-built fixtures.
  */
object Compliance {

  /** Erasure-SLA grace period: 24h in micros. */
  val ErasureSlaUs: Long = 86400000000L

  /** Retention policy (days) per event type — transactional data keeps
    * longest, telemetry shortest, diagnostics barely at all. */
  val RetentionDays: Map[String, Int] =
    Map("signup" -> 30, "purchase" -> 21, "click" -> 7, "view" -> 7,
      "error" -> 3)

  private def retentionSql(col: String): String =
    "CASE " + RetentionDays.toSeq.sortBy(_._1).map { case (t, d) =>
      s"WHEN $col = '$t' THEN $d"
    }.mkString(" ") + " ELSE 7 END"

  // ------------------------------------------- q497 tombstone audit

  /** Right-to-be-forgotten propagation
    * ([[graft.etl.Privacy.tombstoneAudit]]): the user's last 'signup'
    * is the erasure request; per event_type, their events recorded more
    * than 24h later are violations still flowing through the pipeline.
    * User-keyed join + one type-grain aggregate. */
  def q497TombstoneAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    Privacy.tombstoneAudit(e, "user_id", "us", "event_type",
        "signup", ErasureSlaUs)
      .orderBy($"event_type")
  }

  // ------------------------------------------- q498 retention purge

  /** Retention purge plan: with "now" pinned to the newest event (the
    * injected-clock convention — deterministic on both engines), every
    * row older than its type's [[RetentionDays]] must be purged. Per
    * type: total rows, purge count + share (bp), and the worst overdue
    * age in days — the number that says HOW far out of compliance the
    * oldest surviving row is. One scan + broadcast now + one 5-key
    * aggregate. */
  def q498RetentionPurge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"event_type".isNotNull)
      .select($"event_type", unix_micros($"ts").as("us"))
    val now = e.agg(max($"us").as("_now"))
    e.crossJoin(broadcast(now))
      .withColumn("_age_d", expr("(_now - us) div 86400000000"))
      .withColumn("_ret", expr(retentionSql("event_type")))
      .withColumn("_over_d", greatest(lit(0L), $"_age_d" - $"_ret"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(when($"_over_d" > 0, 1L).otherwise(0L)).as("n_purge"),
        expr("sum(CASE WHEN _over_d > 0 THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("purge_bp"),
        max($"_over_d").as("max_overdue_days"))
      .orderBy($"event_type")
  }

  // ----------------------------------------- q499 consent coverage

  /** Consent-version coverage of recent activity: the user's LATEST
    * 'signup' is their most recent (re-)consent; the policy-v2 cutoff
    * sits at the 90% mark of the corpus time span (deterministic on
    * both engines — a midpoint cutoff degenerates to one class on any
    * corpus whose users sign up early). Post-cutoff events classify as
    * 'fresh' (re-consented at/after cutoff), 'stale' (last consent
    * predates it), or 'none' (no consent on record at all — the rows a
    * processor must not have). Per class: events, distinct users, share
    * of all post-cutoff activity (bp). One user-keyed left join + a
    * 3-key aggregate + a broadcast total. */
  def q499ConsentCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val bounds = e.agg(min($"us").as("_mn"), max($"us").as("_mx"))
      .select(expr("_mn + (_mx - _mn) * 9 div 10").as("_cut"))
    val consent = e.filter($"event_type" === "signup")
      .groupBy($"user_id".as("_cu"))
      .agg(max($"us").as("_consent_us"))
    val post = e.crossJoin(broadcast(bounds)).filter($"us" >= $"_cut")
      .join(consent, $"user_id" === $"_cu", "left")
      .withColumn("consent_class", expr(
        "CASE WHEN _consent_us IS NULL THEN 'none' " +
          "WHEN _consent_us < _cut THEN 'stale' ELSE 'fresh' END"))
    val per = post.groupBy($"consent_class")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
    val tot = per.agg(sum($"n_events").as("_tot"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_bp", expr("n_events * 10000 div _tot"))
      .select($"consent_class", $"n_events", $"n_users", $"share_bp")
      .orderBy($"consent_class")
  }

  // ----------------------------------------- q500 PII split leak

  /** PII survivorship into the train split: q387's planted-card corpus
    * (orders-derived text with Luhn-valid runs) through
    * [[graft.etl.Privacy.luhnAudit]], split by q59's content-addressed
    * sha rule — per split the PII share in bp plus the total valid
    * runs. The release question behind it: did the PII screen run
    * BEFORE the split froze, or is the eval set carrying cards the
    * train set was scrubbed of? Scan-only detection + one 3-key
    * aggregate. */
  def q500PiiSplitLeak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.orders(spark, dir)
      .filter($"o_orderkey" % 10 === 0)
      .select($"o_orderkey",
        concat(lit("inv "),
          lpad(($"o_orderkey" % 10000000000000L).cast("string"), 13, "0"),
          lit(" ref "), $"o_custkey".cast("string"), lit(" card "),
          lpad((($"o_orderkey" * 7919) % 10000000000000000L).cast("string"),
            16, "0")).as("text"))
    Privacy.luhnAudit(docs, "o_orderkey", "text")
      .withColumn("split", TrainingData.splitColumn($"o_orderkey"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"has_pii").as("n_pii_docs"),
        expr("sum(has_pii) * 10000 div count(1)").as("pii_bp"),
        expr("CAST(sum(n_luhn_valid) AS BIGINT)").as("n_valid_runs"))
      .orderBy($"split")
  }

  // ------------------------------------------- q515 DP accountant

  /** DP-SGD noise-sizing table ([[graft.etl.Privacy.gaussianDpAccountant]]):
    * per noise multiplier σ² ∈ {1,4,16}, the best (ε, α) over the RDP
    * order grid {2..32} after composing one Gaussian release per
    * training step — steps = the corpus's distinct active minutes (the
    * per-minute-batch stand-in). δ = 10⁻⁵ as the quantized literal
    * 11513 milli-nats. The table a privacy review reads to pick σ
    * BEFORE a run commits to it; conservative (no subsampling
    * amplification). */
  def q515DpAccountant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val steps = Tables.events(spark, dir)
      .filter($"ts".isNotNull)
      .select(expr("unix_micros(ts) div 60000000").as("m"))
      .distinct().agg(count(lit(1)).as("steps"))
    Privacy.gaussianDpAccountant(steps).orderBy($"sigma_sq")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q497_tombstone_audit" -> q497TombstoneAudit _,
    "q498_retention_purge" -> q498RetentionPurge _,
    "q499_consent_coverage" -> q499ConsentCoverage _,
    "q500_pii_split_leak" -> q500PiiSplitLeak _,
    "q515_dp_accountant" -> q515DpAccountant _)

  val oracleSql: Map[String, String] = Map(
    "q515_dp_accountant" -> """
      |WITH st AS (
      |  SELECT count(*) AS steps FROM (
      |    SELECT DISTINCT epoch_us(ts) // 60000000 AS m FROM events
      |    WHERE ts IS NOT NULL)),
      |g AS (
      |  SELECT s.sigma_sq, a.alpha
      |  FROM (SELECT unnest(ARRAY[1, 4, 16]) AS sigma_sq) s,
      |       (SELECT unnest(ARRAY[2, 4, 8, 16, 32]) AS alpha) a),
      |e AS (
      |  SELECT sigma_sq, alpha, steps,
      |    alpha * steps * 1000 // (2 * sigma_sq)
      |      + 11513 // (alpha - 1) AS eps
      |  FROM st, g),
      |best AS (
      |  SELECT sigma_sq, min(eps) AS eps_milli FROM e GROUP BY 1)
      |SELECT CAST(b.sigma_sq AS BIGINT) AS sigma_sq,
      |  CAST(e.steps AS BIGINT) AS steps,
      |  CAST(min(e.alpha) AS BIGINT) AS best_alpha,
      |  CAST(b.eps_milli AS BIGINT) AS eps_milli
      |FROM best b JOIN e ON e.sigma_sq = b.sigma_sq
      |  AND e.eps = b.eps_milli
      |GROUP BY 1, 2, 4 ORDER BY 1""".stripMargin,
    "q497_tombstone_audit" -> s"""
      |WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |req AS (
      |  SELECT user_id, max(us) AS req_us FROM e
      |  WHERE user_id IS NOT NULL AND event_type = 'signup' GROUP BY 1),
      |j AS (
      |  SELECT e.event_type, e.user_id,
      |    greatest(0, e.us - r.req_us - $ErasureSlaUs) AS ov
      |  FROM e JOIN req r ON r.user_id = e.user_id
      |  WHERE e.event_type <> 'signup')
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN ov > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(sum(CASE WHEN ov > 0 THEN 1 ELSE 0 END) * 10000 // count(*)
      |    AS BIGINT) AS late_bp,
      |  CAST(max(ov) AS BIGINT) AS max_overshoot_us,
      |  CAST(count(DISTINCT CASE WHEN ov > 0 THEN user_id END) AS BIGINT)
      |    AS n_users_late
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q498_retention_purge" -> s"""
      |WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS us FROM events
      |  WHERE event_type IS NOT NULL),
      |now_t AS (SELECT max(us) AS now_us FROM e),
      |a AS (
      |  SELECT event_type,
      |    greatest(0, (now_us - us) // 86400000000
      |      - ${retentionSql("event_type")}) AS over_d
      |  FROM e, now_t)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN over_d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purge,
      |  CAST(sum(CASE WHEN over_d > 0 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS purge_bp,
      |  CAST(max(over_d) AS BIGINT) AS max_overdue_days
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "q499_consent_coverage" -> """
      |WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |  WHERE user_id IS NOT NULL),
      |cut AS (SELECT min(us) + (max(us) - min(us)) * 9 // 10 AS cut
      |  FROM e),
      |consent AS (
      |  SELECT user_id, max(us) AS consent_us FROM e
      |  WHERE event_type = 'signup' GROUP BY 1),
      |base AS (SELECT e.user_id, e.us, cut FROM e, cut WHERE e.us >= cut),
      |post AS (
      |  SELECT b.user_id,
      |    CASE WHEN c.consent_us IS NULL THEN 'none'
      |      WHEN c.consent_us < b.cut THEN 'stale' ELSE 'fresh' END
      |      AS consent_class
      |  FROM base b LEFT JOIN consent c ON c.user_id = b.user_id),
      |per AS (
      |  SELECT consent_class, count(*) AS n_events,
      |    count(DISTINCT user_id) AS n_users
      |  FROM post GROUP BY 1),
      |tot AS (SELECT sum(n_events) AS t FROM per)
      |SELECT consent_class, CAST(n_events AS BIGINT) AS n_events,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(n_events * 10000 // t AS BIGINT) AS share_bp
      |FROM per, tot ORDER BY consent_class""".stripMargin,
    "q500_pii_split_leak" -> """
      |WITH d AS (
      |  SELECT o_orderkey,
      |    'inv ' || lpad(CAST(o_orderkey % 10000000000000 AS VARCHAR), 13, '0')
      |    || ' ref ' || CAST(o_custkey AS VARCHAR)
      |    || ' card '
      |    || lpad(CAST((o_orderkey * 7919) % 10000000000000000 AS VARCHAR),
      |         16, '0') AS text
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |r AS (
      |  SELECT o_orderkey,
      |    list_filter(regexp_extract_all(text, '[0-9]+'),
      |      x -> length(x) >= 13 AND length(x) <= 19) AS runs
      |  FROM d),
      |v AS (
      |  SELECT o_orderkey,
      |    len(list_filter(runs, x ->
      |      list_sum(list_transform(generate_series(1, length(x)), i ->
      |        CASE WHEN i % 2 = 0 THEN
      |          CAST(substring(reverse(x), i, 1) AS BIGINT) * 2
      |            - CASE WHEN CAST(substring(reverse(x), i, 1) AS BIGINT) * 2 > 9
      |                   THEN 9 ELSE 0 END
      |        ELSE CAST(substring(reverse(x), i, 1) AS BIGINT) END))
      |      % 10 = 0)) AS n_luhn_valid
      |  FROM r),
      |s AS (
      |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |      ELSE 'test' END AS split,
      |    CASE WHEN n_luhn_valid > 0 THEN 1 ELSE 0 END AS has_pii,
      |    n_luhn_valid
      |  FROM (SELECT o_orderkey, n_luhn_valid,
      |    ('0x' || substring(sha256(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
      |      % 100 AS b FROM v))
      |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(has_pii) AS BIGINT) AS n_pii_docs,
      |  CAST(sum(has_pii) * 10000 // count(*) AS BIGINT) AS pii_bp,
      |  CAST(sum(n_luhn_valid) AS BIGINT) AS n_valid_runs
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)
}
