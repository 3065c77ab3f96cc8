package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Layout

/** Distributed-training operations analytics — the round-9 follow-on to
  * the preference/inference-log family: the readouts a training-infra
  * team runs over routing, dataloader, and per-step telemetry. Synthetic
  * mapping: events rows are tokens/microbatches (user_id the example or
  * data-parallel rank, props.k the token count, value the loss/reward
  * signal in cents), documents is the shardable corpus. Every statistic
  * is exact-integer with a DuckDB twin; all divisions keep dividends
  * non-negative (or subtract two already-floored values) so Spark's
  * truncating `div` and DuckDB's flooring `//` cannot diverge —
  * TrainOpsSpec pins each formula against independent computations.
  */
object TrainOps {

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")
  private def tokK = get_json_object(col("props"), "$.k").cast("long")

  /** Experts in the simulated MoE router (q491). */
  val MoeExperts = 8
  /** Data-parallel world size for the straggler audit (q496). */
  val DpRanks = 8
  /** Dataloader batch size / checkpoint interval in batches (q493). */
  val ReplayBatch = 16
  val ReplayCkptEvery = 4

  // ------------------------------------------------ q491 MoE balance

  /** MoE router load-balance audit: each token (event) is routed top-1
    * to one of [[MoeExperts]] experts by a deterministic hash of
    * (user_id, event_id) — the synthetic stand-in for an argmax router
    * log. Per expert: token count, corpus share (bp), load relative to
    * the perfectly-balanced mean (bp — 10000 = exactly mean), and the
    * tokens DROPPED under the standard capacity-factor-1.25 rule
    * (cap = ceil(N/E) * 5/4, exact in integers): the number every
    * expert-parallel deployment watches, because dropped tokens are
    * silently skipped gradient signal. One narrow projection + one
    * 8-key hash aggregate + a broadcast total — a single shuffle whose
    * key count is fixed at E however large the corpus grows. */
  def q491MoeBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 && $"event_id" >= 0)
      // multipliers small enough that ids up to ~1e12 stay inside LONG
      .select(expr(s"pmod(user_id * 7919 + event_id * 104729, $MoeExperts)")
        .as("expert"))
    val pe = toks.groupBy($"expert").agg(count(lit(1)).as("n_tokens"))
    val tot = pe.agg(sum($"n_tokens").as("_tot"))
    pe.crossJoin(broadcast(tot))
      .withColumn("share_bp", expr("n_tokens * 10000 div _tot"))
      .withColumn("rel_load_bp",
        expr(s"n_tokens * $MoeExperts * 10000 div _tot"))
      .withColumn("dropped_n", greatest(lit(0L),
        expr(s"n_tokens - (((_tot + ${MoeExperts - 1}) div $MoeExperts)" +
          " * 5 div 4)")))
      .select($"expert", $"n_tokens", $"share_bp", $"rel_load_bp",
        $"dropped_n")
      .orderBy($"expert")
  }

  // ------------------------------------------------ q492 cartography

  /** Dataset-cartography map (Swayamdipta et al.'s easy/ambiguous/hard
    * regions, integer-exact): each example (user) has a training-dynamics
    * trace — its events' cents values across time are the per-epoch
    * signal. confidence = mean (milli-cents), variability = population
    * variance (cents², exact: (n·Σx² − (Σx)²) div n²). Regions split on
    * the corpus MEANS of the two statistics (data-derived but exactly
    * computable on both engines, unlike a quantile): variability above
    * mean → ambiguous; else confidence at-or-above mean → easy, below →
    * hard. Ambiguous examples are the ones worth keeping under data
    * selection; a large hard region with low variability flags label
    * noise. Two keyed shuffles (example grain, then 3-key region grain)
    * plus one broadcast scalar aggregate. */
  def q492Cartography(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"value".isNotNull && $"value" >= 0)
      .select($"user_id", cents.as("c"))
    val per = e.groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(c) AS DECIMAL(38,0))").as("sc"),
        expr("CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
          .as("sc2"))
      .select($"user_id",
        expr("CAST(sc * 1000 div n AS BIGINT)").as("conf_milli"),
        expr("CAST((n * sc2 - sc * sc) div (n * n) AS BIGINT)").as("var_c2"))
    val means = per.agg(
      expr("CAST(CAST(sum(conf_milli) AS DECIMAL(38,0)) div count(1) " +
        "AS BIGINT)").as("_mc"),
      expr("CAST(CAST(sum(var_c2) AS DECIMAL(38,0)) div count(1) " +
        "AS BIGINT)").as("_mv"))
    per.crossJoin(broadcast(means))
      .withColumn("region", expr(
        "CASE WHEN var_c2 > _mv THEN 'ambiguous' " +
          "WHEN conf_milli >= _mc THEN 'easy' ELSE 'hard' END"))
      .groupBy($"region")
      .agg(count(lit(1)).as("n_examples"),
        expr("CAST(CAST(sum(conf_milli) AS DECIMAL(38,0)) div count(1) " +
          "AS BIGINT)").as("mean_conf_milli"),
        expr("CAST(CAST(sum(var_c2) AS DECIMAL(38,0)) div count(1) " +
          "AS BIGINT)").as("mean_var_c2"))
      .orderBy($"region")
  }

  // -------------------------------------------- q493 restart replay

  /** Checkpoint-restart reconsumption audit: each data-parallel rank
    * reads its own hash shard of the corpus in deterministic hash order,
    * [[ReplayBatch]] docs per step, checkpointing every
    * [[ReplayCkptEvery]] steps. A crash at step ⌊2/3·last⌋ resumes from
    * the last checkpoint, so every rank re-reads the batches between
    * checkpoint and crash — those docs get an extra epoch's gradient
    * weight (the silent-duplication failure mode of step-grain
    * checkpointing without loader state). Per source: docs reconsumed,
    * their share (bp) of the source, and the extra characters re-seen.
    * The within-shard index rides [[graft.etl.Layout.groupedGlobalRank]]
    * — the 8-value shard key would otherwise be a one-task-per-shard
    * sort at 100 TB (the q268 enum-window class). */
  def q493RestartReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .filter($"doc_id" >= 0)
      .select($"doc_id", $"source", $"n_chars",
        expr("pmod(doc_id * 104729 + 7919, 1000003)").as("h"))
      .withColumn("shard", expr(s"pmod(h, $DpRanks)"))
    val rn = Layout.groupedGlobalRank(d, Seq("shard"),
      Seq(col("h"), col("doc_id")), "rn")
      .withColumn("batch", expr(s"(rn - 1) div $ReplayBatch"))
    // the last batch id is derivable from per-shard COUNTS alone
    // (batches run 0..(n_shard-1) div B within each shard) — computing
    // it off `rn` would run the whole zipWithIndex rank pipeline twice
    val mb = d.groupBy($"shard").agg(count(lit(1)).as("_n"))
      .agg(max(expr(s"(_n - 1) div $ReplayBatch")).as("_mb"))
    rn.crossJoin(broadcast(mb))
      .withColumn("_crash", expr("_mb * 2 div 3"))
      .withColumn("_ckpt", expr(s"(_crash div $ReplayCkptEvery) " +
        s"* $ReplayCkptEvery"))
      .withColumn("_re",
        ($"batch" >= $"_ckpt" && $"batch" <= $"_crash").cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"_re").as("n_reconsumed"),
        expr("sum(_re) * 10000 div count(1)").as("reconsumed_bp"),
        expr("CAST(sum(CASE WHEN _re = 1 THEN n_chars ELSE 0 END) " +
          "AS BIGINT)").as("extra_chars"))
      .orderBy($"source")
  }

  // -------------------------------------------- q494 LOO influence

  /** Leave-one-source-out influence on corpus composition metrics —
    * the datamodels-style ablation readout at the grain where it is
    * exactly computable without rescanning: because the metrics are
    * ratios of sums, LOO(source) = (total − source) algebra over one
    * per-source aggregate, never a per-subset pass. Metrics: mean doc
    * length (milli-chars) and non-English share (bp; NULL lang counts
    * as non-English on both engines). influence = LOO metric − overall
    * metric: positive length influence means removing the source makes
    * the corpus LONGER on average (the source drags it down). One
    * shuffle at source grain + a broadcast totals row; NULL (not a
    * fabricated 0) when a source is the whole corpus. */
  def q494LooInfluence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .select($"source", $"n_chars",
        ($"lang".isNull || $"lang" =!= "en").cast("long").as("ne"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(n_chars) AS DECIMAL(38,0))").as("sc"),
        sum($"ne").as("sn"))
    val tot = per.agg(sum($"n_docs").as("_tn"),
      expr("CAST(sum(sc) AS DECIMAL(38,0))").as("_tc"),
      sum($"sn").as("_tne"))
    per.crossJoin(broadcast(tot))
      .withColumn("_overall_len", expr("CAST(_tc * 1000 div _tn AS BIGINT)"))
      .withColumn("_loo_len", expr(
        "CASE WHEN _tn > n_docs THEN CAST((_tc - sc) * 1000 " +
          "div (_tn - n_docs) AS BIGINT) END"))
      .withColumn("_overall_ne", expr("_tne * 10000 div _tn"))
      .withColumn("_loo_ne", expr(
        "CASE WHEN _tn > n_docs THEN (_tne - sn) * 10000 " +
          "div (_tn - n_docs) END"))
      .select($"source", $"n_docs",
        ($"_loo_len" - $"_overall_len").as("len_influence_milli"),
        ($"_loo_ne" - $"_overall_ne").as("nonen_influence_bp"))
      .orderBy($"source")
  }

  // ------------------------------------------------ q495 GNS estimate

  /** Gradient-noise-scale estimate (McCandlish et al.'s B_simple, the
    * critical-batch-size heuristic) from per-batch telemetry: batches
    * are minute buckets, the per-batch mean cents value is the batch
    * gradient-magnitude proxy, the corpus mean is the true-gradient
    * proxy. Reports the unweighted between-batch variance, the
    * batch-size-weighted variance (Σ n_b·(mean_b − g)² div N — the
    * noise trace), and gns_milli = 1000·weighted_var / g² — batch sizes
    * below the GNS waste optimizer steps, above it waste tokens. All
    * deviations are squared (non-negative) before the floored division,
    * and sums run in DECIMAL(38,0) because milli² deviations cross the
    * LONG line at corpus scale. Two shuffles: minute grain, then one
    * scalar aggregate. */
  def q495GnsEstimate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0)
      .select(expr("unix_micros(ts) div 60000000").as("minute"), cents.as("c"))
    // minute grain is calendar-bounded (the repo's localCheckpoint
    // contract) — pinning it makes the global-mean branch and the
    // deviation aggregate read ONE materialization instead of scanning
    // events twice (2.0 s off the sf0.1 wall)
    val pb = e.groupBy($"minute")
      .agg(count(lit(1)).as("n_b"),
        expr("CAST(sum(c) AS DECIMAL(38,0))").as("sc"))
      .select($"n_b", expr("CAST(sc * 1000 div n_b AS BIGINT)").as("m_milli"))
      .localCheckpoint()
    val g = pb.agg(sum($"n_b").as("_tn"),
      expr("CAST(sum(CAST(m_milli AS DECIMAL(38,0)) * n_b) " +
        "AS DECIMAL(38,0))").as("_wsum"))
      .select($"_tn", expr("CAST(_wsum div _tn AS BIGINT)").as("_g"))
    pb.crossJoin(broadcast(g))
      .withColumn("_d", $"m_milli" - $"_g")
      .agg(count(lit(1)).as("n_batches"),
        max($"_g").as("g_milli"),
        expr("CAST(sum(CAST(_d AS DECIMAL(38,0)) * _d) div count(1) " +
          "AS BIGINT)").as("between_var_milli2"),
        expr("CAST(sum(CAST(_d AS DECIMAL(38,0)) * _d * n_b) " +
          "div max(_tn) AS BIGINT)").as("weighted_var_milli2"))
      .withColumn("gns_milli", expr(
        "CASE WHEN g_milli > 0 THEN CAST(CAST(weighted_var_milli2 " +
          "AS DECIMAL(38,0)) * 1000 div (CAST(g_milli AS DECIMAL(38,0)) " +
          "* g_milli) AS BIGINT) END"))
  }

  // ------------------------------------------------ q496 straggler tax

  /** Data-parallel straggler tax: per step (minute) each of [[DpRanks]]
    * ranks (user_id mod R) processes its events' token counts (props.k);
    * the step's wall-clock is the SLOWEST rank × R rank-slots, and the
    * tax is the share of that wall spent waiting at the allreduce
    * barrier: (Σ_step max_r·R − Σ_step Σ_r tok) / Σ_step max_r·R, in bp.
    * Also reports mean active ranks per step (milli) — absent ranks are
    * idle capacity the max-based wall already charges for. The standard
    * first readout when step time regresses: a rising tax with flat
    * token totals means skew (one hot rank), not model cost. Two keyed
    * shuffles ((step, rank) grain then step grain) + one scalar row —
    * no windows, no sort. */
  def q496StragglerTax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 && tokK.isNotNull)
      .select(expr("unix_micros(ts) div 60000000").as("step"),
        expr(s"pmod(user_id, $DpRanks)").as("rank"), tokK.as("k"))
    val pr = e.groupBy($"step", $"rank")
      .agg(expr("CAST(sum(k) AS BIGINT)").as("tok"))
    val ps = pr.groupBy($"step")
      .agg(max($"tok").as("mx"), sum($"tok").as("tot"),
        count(lit(1)).as("active"))
    ps.agg(count(lit(1)).as("n_steps"),
      expr("CAST(sum(tot) AS BIGINT)").as("total_tokens"),
      expr(s"CAST(sum(mx) * $DpRanks AS BIGINT)").as("wall_tokens"),
      expr("CAST(sum(active) * 1000 div count(1) AS BIGINT)")
        .as("mean_active_milli"))
      .withColumn("straggler_tax_bp", expr(
        "CASE WHEN wall_tokens > 0 THEN (wall_tokens - total_tokens) " +
          "* 10000 div wall_tokens END"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q491_moe_balance" -> q491MoeBalance _,
    "q492_cartography" -> q492Cartography _,
    "q493_restart_replay" -> q493RestartReplay _,
    "q494_loo_influence" -> q494LooInfluence _,
    "q495_gns_estimate" -> q495GnsEstimate _,
    "q496_straggler_tax" -> q496StragglerTax _)

  val oracleSql: Map[String, String] = Map(
    "q491_moe_balance" -> s"""
      |WITH t AS (
      |  SELECT (user_id * 7919 + event_id * 104729) % $MoeExperts
      |    AS expert
      |  FROM events
      |  WHERE user_id IS NOT NULL AND user_id >= 0 AND event_id >= 0),
      |pe AS (SELECT expert, count(*) AS n_tokens FROM t GROUP BY 1),
      |tot AS (SELECT sum(n_tokens) AS tn FROM pe)
      |SELECT CAST(expert AS BIGINT) AS expert,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_tokens * 10000 // tn AS BIGINT) AS share_bp,
      |  CAST(n_tokens * $MoeExperts * 10000 // tn AS BIGINT)
      |    AS rel_load_bp,
      |  CAST(greatest(0, n_tokens - (((tn + ${MoeExperts - 1})
      |    // $MoeExperts) * 5 // 4)) AS BIGINT) AS dropped_n
      |FROM pe, tot ORDER BY expert""".stripMargin,
    "q492_cartography" -> """
      |WITH e AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events
      |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND value >= 0),
      |per AS (
      |  SELECT user_id,
      |    CAST(CAST(sum(c) AS HUGEINT) * 1000 // count(*) AS BIGINT)
      |      AS conf_milli,
      |    CAST((count(*) * CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
      |      - CAST(sum(c) AS HUGEINT) * sum(c))
      |      // (count(*) * count(*)) AS BIGINT) AS var_c2
      |  FROM e GROUP BY 1),
      |m AS (
      |  SELECT CAST(CAST(sum(conf_milli) AS HUGEINT) // count(*)
      |      AS BIGINT) AS mc,
      |    CAST(CAST(sum(var_c2) AS HUGEINT) // count(*) AS BIGINT) AS mv
      |  FROM per)
      |SELECT region, CAST(count(*) AS BIGINT) AS n_examples,
      |  CAST(CAST(sum(conf_milli) AS HUGEINT) // count(*) AS BIGINT)
      |    AS mean_conf_milli,
      |  CAST(CAST(sum(var_c2) AS HUGEINT) // count(*) AS BIGINT)
      |    AS mean_var_c2
      |FROM (
      |  SELECT CASE WHEN var_c2 > mv THEN 'ambiguous'
      |    WHEN conf_milli >= mc THEN 'easy' ELSE 'hard' END AS region,
      |    conf_milli, var_c2
      |  FROM per, m)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q493_restart_replay" -> s"""
      |WITH d AS (
      |  SELECT doc_id, source, n_chars,
      |    (doc_id * 104729 + 7919) % 1000003 AS h
      |  FROM documents WHERE doc_id >= 0),
      |r AS (
      |  SELECT source, n_chars,
      |    (row_number() OVER (PARTITION BY h % $DpRanks
      |      ORDER BY h, doc_id) - 1) // $ReplayBatch AS batch
      |  FROM d),
      |mb AS (SELECT max(batch) AS mb FROM r),
      |f AS (
      |  SELECT source, n_chars,
      |    CASE WHEN batch >= ((mb * 2 // 3) // $ReplayCkptEvery)
      |      * $ReplayCkptEvery AND batch <= mb * 2 // 3
      |      THEN 1 ELSE 0 END AS re
      |  FROM r, mb)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(re) AS BIGINT) AS n_reconsumed,
      |  CAST(sum(re) * 10000 // count(*) AS BIGINT) AS reconsumed_bp,
      |  CAST(sum(CASE WHEN re = 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS extra_chars
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q494_loo_influence" -> """
      |WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_chars) AS HUGEINT) AS sc,
      |    sum(CASE WHEN lang IS NULL OR lang <> 'en' THEN 1 ELSE 0 END)
      |      AS sn
      |  FROM documents GROUP BY 1),
      |tot AS (
      |  SELECT sum(n_docs) AS tn, CAST(sum(sc) AS HUGEINT) AS tc,
      |    sum(sn) AS tne
      |  FROM per)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(CASE WHEN tn > n_docs THEN CAST((tc - sc) * 1000
      |      // (tn - n_docs) AS BIGINT) END
      |    - CAST(tc * 1000 // tn AS BIGINT) AS BIGINT)
      |    AS len_influence_milli,
      |  CAST(CASE WHEN tn > n_docs THEN (tne - sn) * 10000
      |      // (tn - n_docs) END
      |    - tne * 10000 // tn AS BIGINT) AS nonen_influence_bp
      |FROM per, tot ORDER BY source""".stripMargin,
    "q495_gns_estimate" -> """
      |WITH e AS (
      |  SELECT epoch_us(ts) // 60000000 AS minute,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL AND value >= 0),
      |pb AS (
      |  SELECT count(*) AS n_b,
      |    CAST(CAST(sum(c) AS HUGEINT) * 1000 // count(*) AS BIGINT)
      |      AS m_milli
      |  FROM e GROUP BY minute),
      |g AS (
      |  SELECT sum(n_b) AS tn,
      |    CAST(CAST(sum(CAST(m_milli AS HUGEINT) * n_b) AS HUGEINT)
      |      // sum(n_b) AS BIGINT) AS gm
      |  FROM pb),
      |s AS (
      |  SELECT count(*) AS n_batches, max(gm) AS g_milli,
      |    CAST(sum(CAST(m_milli - gm AS HUGEINT) * (m_milli - gm))
      |      // count(*) AS BIGINT) AS between_var_milli2,
      |    CAST(sum(CAST(m_milli - gm AS HUGEINT) * (m_milli - gm) * n_b)
      |      // max(tn) AS BIGINT) AS weighted_var_milli2
      |  FROM pb, g)
      |SELECT CAST(n_batches AS BIGINT) AS n_batches,
      |  CAST(g_milli AS BIGINT) AS g_milli,
      |  between_var_milli2, weighted_var_milli2,
      |  CAST(CASE WHEN g_milli > 0 THEN CAST(weighted_var_milli2
      |    AS HUGEINT) * 1000 // (CAST(g_milli AS HUGEINT) * g_milli)
      |    END AS BIGINT) AS gns_milli
      |FROM s""".stripMargin,
    "q496_straggler_tax" -> s"""
      |WITH e AS (
      |  SELECT epoch_us(ts) // 60000000 AS step,
      |    user_id % $DpRanks AS drank,
      |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
      |  FROM events
      |  WHERE user_id IS NOT NULL AND user_id >= 0
      |    AND json_extract_string(props, '$$.k') IS NOT NULL),
      |pr AS (SELECT step, drank, sum(k) AS tok FROM e GROUP BY 1, 2),
      |ps AS (
      |  SELECT step, max(tok) AS mx, sum(tok) AS tot,
      |    count(*) AS active
      |  FROM pr GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_steps,
      |  CAST(sum(tot) AS BIGINT) AS total_tokens,
      |  CAST(sum(mx) * $DpRanks AS BIGINT) AS wall_tokens,
      |  CAST(sum(active) * 1000 // count(*) AS BIGINT)
      |    AS mean_active_milli,
      |  CAST(CASE WHEN sum(mx) * $DpRanks > 0
      |    THEN (sum(mx) * $DpRanks - sum(tot)) * 10000
      |      // (sum(mx) * $DpRanks) END AS BIGINT) AS straggler_tax_bp
      |FROM ps""".stripMargin)
}
