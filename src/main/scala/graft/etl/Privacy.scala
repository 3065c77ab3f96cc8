package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact email addresses
  * and NL mobile numbers before text reaches a training mix. Everything is
  * codegen regexp column expressions — scan-only, no shuffle, so the pass
  * rides along with whatever else touches the text.
  *
  * The patterns deliberately stay inside the regex subset where Java's
  * engine and RE2 agree (character classes, bounded repeats, `\b`): both
  * this engine and SQL-engine oracles/colleagues must see identical
  * matches or a redaction diff becomes a silent corpus fork.
  */
object Privacy {

  /** Pragmatic email shape (not RFC 5322 — the corpus-cleaning standard). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NL mobile: 06- plus 8 digits, word-bounded. */
  val PhoneRe = "\\b06-[0-9]{8}\\b"

  /** Adds `n_emails` / `n_phones` match counts and a `redacted` copy of
    * `textCol` with emails replaced by `<EMAIL>` then phones by
    * `<PHONE>` (fixed order — replacement order is part of the
    * contract). */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** Luhn-validated payment-card detection — the precision upgrade over
    * the regex-only PII pass: a 13–19 digit run is only counted as card
    * PII when its Luhn mod-10 checksum holds, which screens out invoice
    * ids, timestamps and tracking numbers that a bare digit-run regex
    * would redact (destroying useful text) or over-report.
    *
    * Candidate runs are maximal `[0-9]+` matches length-filtered to
    * [minLen, maxLen] — extracting maximal runs and filtering, rather
    * than matching `[0-9]{13,19}` directly, keeps the semantics identical
    * across regex engines (no partial match inside a longer run). The
    * checksum is the textbook fold: from the right, double every second
    * digit, subtract 9 above 9, valid iff the total ≡ 0 (mod 10) —
    * evaluated as column HOFs over ≤19-char runs (bounded, so the
    * per-element substring re-evaluation is constant work).
    *
    * Scan-only per-row expressions, no shuffle. Returns per row:
    * n_candidates, n_luhn_valid, has_pii. */
  def luhnAudit(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 13, maxLen: Int = 19): DataFrame = {
    val runs = filter(
      regexp_extract_all(col(textCol), lit("[0-9]+"), lit(0)),
      r => length(r) >= minLen && length(r) <= maxLen)
    def luhnOk(run: Column): Column = {
      val digitSum = aggregate(
        transform(sequence(lit(1), length(run)), i => {
          val d = reverse(run).substr(i, lit(1)).cast("long")
          when(pmod(i, lit(2)) === 0,
            d * 2 - when(d * 2 > 9, 9L).otherwise(0L)).otherwise(d)
        }),
        lit(0L), (acc, x) => acc + x)
      pmod(digitSum, lit(10)) === 0
    }
    df.select(col(idCol),
      size(runs).cast("long").as("n_candidates"),
      size(filter(runs, luhnOk(_))).cast("long").as("n_luhn_valid"))
      .withColumn("has_pii",
        when(col("n_luhn_valid") > 0, 1L).otherwise(0L))
  }

  /** l-diversity audit — the release gate k-anonymity (q148) misses: a
    * quasi-identifier group can hold ≥ k rows yet leak the sensitive
    * attribute if all k agree on it. Per QI group: row count, number of
    * distinct sensitive values (distinct l), the dominant sensitive
    * value's share in basis points (the homogeneity-attack surface), and
    * a pass/violates verdict against the required l.
    *
    * Two combiner-friendly shuffles — (QI, sensitive) counts, then the
    * per-QI fold — on aggregate-shrunk rows; nothing is quadratic in
    * group size, so a 10⁹-row QI cell costs what its distinct sensitive
    * domain costs. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensCol: String,
      l: Int): DataFrame = {
    val qi = qiCols.map(col)
    df.filter(col(sensCol).isNotNull)
      .groupBy(qi :+ col(sensCol): _*)
      .agg(count(lit(1)).as("_sc"))
      .groupBy(qi: _*)
      .agg(sum(col("_sc")).cast("long").as("n"),
        count(lit(1)).as("l_distinct"),
        max(col("_sc")).cast("long").as("top_cnt"))
      .select(qi ++ Seq(col("n"), col("l_distinct"),
        expr("top_cnt * 10000L div n").as("top_share_bp"),
        when(col("l_distinct") >= l, lit("ok"))
          .otherwise(lit("violates")).as("diversity")): _*)
  }

  /** t-closeness audit — the third rung of the release-audit ladder after
    * k-anonymity (group size) and l-diversity (within-group variety): how
    * far each quasi-identifier group's SENSITIVE-value distribution sits
    * from the global one. For categorical sensitive attributes the
    * accepted instantiation is total-variation distance, kept as the
    * exact cross-multiplied fraction
    *   t = Σ_s |c_{g,s}·N − C_s·n_g| / (2·n_g·N)
    * (zero cells contribute their full global mass — a group MISSING a
    * sensitive value leaks as much as one concentrating it). Shape: cell
    * agg, group agg, then the group table crossed with the broadcast
    * global distribution (#groups × #sensitive-values grid — the small
    * side is the handful of sensitive values) and one final group agg.
    * Sums run in decimal(38,0): the cross products reach N². */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensCol: String): DataFrame = {
    val qi = qiCols.map(col)
    val base = df.filter(col(sensCol).isNotNull)
    val cell = base.groupBy(qi :+ col(sensCol): _*)
      .agg(count(lit(1)).as("_c"))
    val grp = cell.groupBy(qi: _*).agg(sum(col("_c")).as("n_group"))
    val glob = base.groupBy(col(sensCol)).agg(count(lit(1)).as("_cs"))
    val n = base.agg(count(lit(1)).as("n_total"))
    grp.crossJoin(broadcast(glob))
      .join(cell, qiCols :+ sensCol, "left")
      .crossJoin(broadcast(n))
      .groupBy(qi ++ Seq(col("n_group"), col("n_total")): _*)
      .agg(sum(abs(
        coalesce(col("_c"), lit(0L)).cast("decimal(38,0)") * col("n_total") -
          col("_cs").cast("decimal(38,0)") * col("n_group"))).as("t_num"))
      .select(qi ++ Seq(col("n_group"), col("n_total"), col("t_num"),
        (col("n_group").cast("decimal(38,0)") * col("n_total") * 2)
          .as("t_den"),
        expr("CAST(t_num * 10000 div (2 * CAST(n_group AS DECIMAL(38,0))" +
          " * n_total) AS BIGINT)").as("t_bp")): _*)
  }

  /** Univariate microaggregation (the fixed-size SDC transform): within
    * each stratum, sort the sensitive value and replace every run of k
    * consecutive records with the run's FLOORED mean — after which every
    * published value is shared by ≥ k records (the k-anonymity
    * transform, where [[generalizationLadder]] only audits). The last
    * run absorbs the remainder (standard rule: runs of k..2k−1, never a
    * sub-k leak). Deterministic (value, id) order; the group mean is a
    * floored exact fraction. A stratum with fewer than k rows total
    * cannot meet the guarantee at all — its single run is published
    * with `meets_k = false` so the violation is VISIBLE in the output
    * (callers release only `meets_k` rows); every run of a ≥k stratum
    * has `meets_k = true` by construction. One rank window + one group
    * fold + one join back on the (stratum, run) key. */
  def microaggregate(df: DataFrame, stratumCol: String, idCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col(valueCol), col(idCol))
    val wAll = Window.partitionBy(col(stratumCol))
    val ranked = df
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      // runs of k; the final partial run merges into the previous one.
      // A stratum smaller than k collapses to a single run (clamped at
      // 0) — sub-k by necessity, flagged meets_k = false below.
      // Values must be nonnegative: the floored run mean would
      // truncate-vs-floor diverge across engines on a negative sum.
      .withColumn("run",
        greatest(least(expr(s"(_rn - 1) div $k"),
          expr(s"_n div $k - 1")), lit(0L)))
    val means = ranked.groupBy(col(stratumCol), col("run"))
      .agg(count(lit(1)).as("run_size"),
        expr(s"sum($valueCol) div count(1)").as("micro_v"))
    ranked.join(means, Seq(stratumCol, "run"))
      .select(col(stratumCol), col(idCol), col(valueCol), col("run"),
        col("run_size"), col("micro_v"),
        (col("run_size") >= k).as("meets_k"))
  }

  /** Minimal-generalization search for k-anonymity: given a LADDER of
    * progressively coarser quasi-identifier sets (level 0 = most
    * specific), report per level the group count, minimum group size,
    * and the row mass exposed in sub-k groups, and flag the FIRST level
    * that meets k — answering the release question "how much detail must
    * we suppress", where q148's audit only answers pass/fail at one
    * fixed QI. One grouped aggregation per level (each folds to a single
    * row map-side), a union of `ladder.size` rows, and a broadcast
    * one-row join to mark the chosen level — no windows, no iteration. */
  def generalizationLadder(df: DataFrame, ladder: Seq[Seq[String]],
      k: Long): DataFrame = {
    require(ladder.nonEmpty, "need at least one generalization level")
    val per = ladder.zipWithIndex.map { case (qis, lvl) =>
      df.groupBy(qis.map(col): _*).agg(count(lit(1)).as("_g"))
        .agg(count(lit(1)).as("n_groups"), min(col("_g")).as("min_group"),
          coalesce(sum(when(col("_g") < k, col("_g"))), lit(0L))
            .as("rows_below_k"))
        .select(lit(lvl.toLong).as("level"), col("n_groups"),
          col("min_group"), col("rows_below_k"),
          coalesce(col("min_group") >= k, lit(false)).as("meets_k"))
    }
    val u = per.reduce(_ unionByName _)
    val first = u.filter(col("meets_k"))
      .agg(min(col("level")).as("_first"))
    u.crossJoin(broadcast(first))
      .withColumn("chosen",
        coalesce(col("level") === col("_first"), lit(false)))
      .drop("_first")
  }

  /** Right-to-be-forgotten propagation audit: per user the LATEST event
    * of `requestType` is an erasure request; any OTHER event of that
    * user recorded more than `slaUs` micros after it is a violation —
    * data still flowing through the pipeline past the deletion deadline.
    * Per event_type over the requested users' activity: event count,
    * violations (count + bp + distinct users) and the worst overshoot
    * past the deadline. Inner join keyed on the user (only users with a
    * request are in scope) then one type-grain aggregate — the request
    * side is user-grain, so the join shuffles both sides on the key and
    * partial-aggregates; nothing is collected or windowed. */
  def tombstoneAudit(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, requestType: String, slaUs: Long): DataFrame = {
    require(slaUs >= 0)
    val u = col(userCol)
    val req = events.filter(u.isNotNull && col(typeCol) === requestType)
      .groupBy(u.as("_ru"))
      .agg(max(col(tsUsCol)).as("_req_us"))
    events.filter(u.isNotNull && col(typeCol) =!= requestType)
      .join(req, u === col("_ru"))
      .withColumn("_over",
        greatest(lit(0L), col(tsUsCol) - col("_req_us") - slaUs))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("_over") > 0, 1L).otherwise(0L)).as("n_late"),
        expr("sum(CASE WHEN _over > 0 THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("late_bp"),
        max(col("_over")).as("max_overshoot_us"),
        countDistinct(when(col("_over") > 0, u)).as("n_users_late"))
  }

  /** DP-SGD noise-sizing table via Gaussian-mechanism RDP composition —
    * the accountant a training run consults BEFORE committing to a noise
    * multiplier: for each σ² in the grid, the best (ε, α) after `steps`
    * compositions at δ fixed by `lnInvDeltaMilli` (= ln(1/δ) in
    * milli-nats; the default 11513 is δ = 10⁻⁵ — a quantized LITERAL,
    * the SPRT/q470 convention: constants quantize, data never does).
    *
    * Per (σ², α): RDP(α) of one Gaussian release is α/(2σ²), composing
    * linearly over steps —
    *   rdp_milli = ⌊α · steps · 1000 div (2σ²)⌋
    * and the standard RDP→(ε,δ) conversion adds ln(1/δ)/(α−1):
    *   eps_milli = rdp_milli + ⌊11513 div (α−1)⌋ ,
    * minimized over the α grid per σ² (min-α tiebreak via the struct
    * ordering). No subsampling amplification — this is the full-batch
    * (or amplification-ignored, i.e. conservative) accountant; exact
    * integers throughout, so the table is engine-identical.
    *
    * `stepsDf` is a ONE-ROW frame with a `steps` column (keep the step
    * count in the plan — a driver-side .head() here would be exactly
    * what CollectLintSpec exists to flag); the grid is a broadcast
    * literal, so the whole table costs one crossJoin + one 3-key
    * aggregate on top of whatever produced `steps`. */
  def gaussianDpAccountant(stepsDf: DataFrame,
      sigmaSq: Seq[Long] = Seq(1L, 4L, 16L),
      alphas: Seq[Long] = Seq(2L, 4L, 8L, 16L, 32L),
      lnInvDeltaMilli: Long = 11513L): DataFrame = {
    require(sigmaSq.nonEmpty && sigmaSq.forall(_ >= 1))
    require(alphas.nonEmpty && alphas.forall(_ >= 2))
    require(lnInvDeltaMilli >= 0)
    val spark = stepsDf.sparkSession
    import spark.implicits._
    val grid = (for (s <- sigmaSq; a <- alphas) yield (s, a))
      .toDF("sigma_sq", "alpha")
    stepsDf.crossJoin(broadcast(grid))
      .withColumn("_eps", expr(
        s"alpha * steps * 1000 div (2 * sigma_sq) " +
          s"+ $lnInvDeltaMilli div (alpha - 1)"))
      .groupBy(col("sigma_sq"))
      .agg(max(col("steps")).as("steps"),
        min(struct(col("_eps"), col("alpha"))).as("_b"))
      .select(col("sigma_sq"), col("steps"),
        col("_b.alpha").as("best_alpha"), col("_b._eps").as("eps_milli"))
  }
}
