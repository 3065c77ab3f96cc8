package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Model-evaluation and serving analytics — the readouts an LLM team
  * runs AFTER training on sampled generations, reward scores, and A/B
  * exposure logs (pass@k, best-of-n scaling, conformal calibration,
  * sequential tests, group-relative advantages). The reference has no
  * analogue; this is beyond-reference surface in the same spirit as the
  * training-data families: every statistic exact-integer with a DuckDB
  * oracle twin, every plan one-or-two keyed shuffles, nothing global.
  *
  * The synthetic mapping (events as samples): a user's events are that
  * "task"'s generated samples, purchases are "correct" completions, and
  * amounts are "reward scores" — the shapes, cardinalities, and skew
  * match real eval logs (many tasks × bounded samples each).
  */
object EvalQueries {

  import TrainingData.{corpusSql, shinglesSql}

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")

  /** The q466 pass@k ppm expression over columns (n, c) for one literal
    * k — exposed so the spec can truth-table it against an independent
    * BigInt computation (the oracle SQL shares these factor chains, so
    * only an independent implementation can catch a formula bug). */
  private[queries] def passPpmSqlExpr(k: Int): String = {
    val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
    val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
    s"1000000 - CAST(greatest(CAST($num AS DECIMAL(38,0)), 0) " +
      s"* 1000000 div ($den) AS BIGINT)"
  }

  // -------------------------------------------------- q466 pass@k

  /** Exact pass@k (the unbiased HumanEval estimator): per task with n
    * samples and c correct, pass@k = 1 − C(n−c,k)/C(n,k), computed as
    * the telescoped product Π_{i<k}(n−c−i)/Π_{i<k}(n−i) — UNROLLED per
    * literal k (no HOF folds: the products are plain integer factor
    * chains both engines evaluate identically; a factor hitting zero is
    * exactly the n−c<k ⇒ pass=1 case). Samples are capped at the first
    * 50 per task by (ts, id) — the cap bounds the k=10 product at
    * 50!/40! ≈ 3.7e16 (long-safe; the ×10⁶ scaling rides decimal) and
    * is the honest eval shape anyway (eval harnesses sample a FIXED n
    * per task, they don't stream unbounded samples). One partitioned
    * rank window + one task aggregate; the per-k readout is a 3-row
    * broadcast-size table. */
  def q466PassAtK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val t = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .withColumn("_rk", row_number().over(w))
      .filter($"_rk" <= 50)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c"))
    val perK = Seq(1, 5, 10).map { k =>
      t.filter($"n" >= k)
        .withColumn("_pass_ppm", expr(passPpmSqlExpr(k)))
        .agg(count(lit(1)).as("n_tasks"),
          expr("CAST(CAST(sum(_pass_ppm) AS DECIMAL(38,0)) " +
            "* 1 div count(1) AS BIGINT)").as("mean_pass_ppm"),
          min($"_pass_ppm").as("min_pass_ppm"),
          max($"_pass_ppm").as("max_pass_ppm"))
        .select(lit(k.toLong).as("k"), $"n_tasks", $"mean_pass_ppm",
          $"min_pass_ppm", $"max_pass_ppm")
    }
    perK.reduce(_ unionByName _).orderBy($"k")
  }

  // -------------------------------------------- q467 best-of-n curve

  /** Empirical best-of-n scaling curve: per prompt group, scores are
    * split into DISJOINT batches of n by deterministic sha order, each
    * batch contributes max(score), and the curve point is the mean of
    * batch maxima — the estimator serving teams actually plot (disjoint
    * batches keep it unbiased without C(N,n) combinatorics, and the
    * sha-rank makes it seedless and engine-exact). The per-group rank
    * rides [[graft.etl.Layout.globalRank]] over (group, sha, id) minus
    * a broadcast per-group offset — NOT a window partitioned by the
    * 5-value group key, which would sort each group in ONE task (the
    * q268-class trap: a low-cardinality partition key is a global sort
    * in disguise). Plus a broadcast 4-row n table; partial batches are
    * dropped (count = n) so every max is a true best-of-n. */
  def q467BonCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", cents.as("s"),
        sha2($"event_id".cast("string"), 256).as("_sha"))
    val ranked = graft.etl.Layout.globalRank(base,
      Seq($"event_type", $"_sha", $"event_id"), "_grk")
    val offs = ranked.groupBy($"event_type").agg(min($"_grk").as("_off"))
    val scored = ranked.join(broadcast(offs), "event_type")
      .withColumn("_rk", $"_grk" - $"_off" + 1L)
    val ns = Seq(1L, 2L, 4L, 8L).toDF("n")
    scored.crossJoin(broadcast(ns))
      .withColumn("_batch", expr("(_rk - 1) div n"))
      .groupBy($"event_type", $"n", $"_batch")
      .agg(count(lit(1)).as("_sz"), max($"s").as("_mx"))
      .filter($"_sz" === $"n")
      .groupBy($"event_type", $"n")
      .agg(count(lit(1)).as("n_batches"),
        expr("CAST(CAST(sum(_mx) AS DECIMAL(38,0)) * 1000 " +
          "div count(1) AS BIGINT)").as("mean_max_milli"))
      .orderBy($"event_type", $"n")
  }

  // --------------------------------------- q468 conformal coverage

  /** Split-conformal calibration + coverage audit: per group, the even
    * sha half calibrates (q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest score —
    * the finite-sample-valid nearest-rank quantile, NOT the n·0.9
    * plug-in) and the odd half tests; coverage_ppm = share of test
    * scores ≤ q̂. Split-conformal's guarantee is coverage ≥ 90% in
    * expectation — this query is the audit that checks it held on the
    * actual data. The r-th smallest is SELECTED from a per-(group,
    * value) count histogram — cum(v) ≥ r ∧ cum(v) − c(v) < r picks the
    * unique containing value — so the cumsum window runs over the
    * VALUE-grouped aggregate (cardinality = distinct cent values per
    * group, bounded by the price domain), never a row-grain rank
    * partitioned by the 5-value group key (the q268-class trap). Groups
    * with n_cal < 20 drop (the ceil-rank would exceed n_cal). */
  def q468ConformalCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", cents.as("s"),
        (conv(substring(sha2($"event_id".cast("string"), 256), 1, 4),
          16, 10).cast("long") % 2).as("_half"))
    val cal = e.filter($"_half" === 0)
    val nCal = cal.groupBy($"event_type").agg(count(lit(1)).as("n_cal"))
      .filter($"n_cal" >= 20)
      .withColumn("_r", expr("(9 * (n_cal + 1) + 9) div 10"))
    val wv = Window.partitionBy($"event_type").orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qhat = cal.groupBy($"event_type", $"s")
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum($"_c").over(wv))
      .join(broadcast(nCal), "event_type")
      .filter($"_cum" >= $"_r" && $"_cum" - $"_c" < $"_r")
      .select($"event_type", $"n_cal", $"s".as("qhat_cents"))
    e.filter($"_half" === 1)
      .join(broadcast(qhat), "event_type")
      .groupBy($"event_type", $"n_cal", $"qhat_cents")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"s" <= $"qhat_cents", 1L).otherwise(0L)).as("_cov"))
      .select($"event_type", $"n_cal", $"n_test", $"qhat_cents",
        expr("_cov * 1000000 div n_test").as("coverage_ppm"))
      .orderBy($"event_type")
  }

  // -------------------------------------- q469 dedup split leakage

  /** Near-dup pairs straddling the train/val/test split — the leakage
    * dedup exists to prevent, measured directly: every ≥50%-Jaccard
    * pair from the q26 engine is labeled with its endpoints' q59 splits,
    * and the per-Jaccard-decile straddle share says how much near-dup
    * mass crosses split boundaries (a healthy pipeline dedups BEFORE
    * splitting, driving this to 0; ~20% straddle_bp ≈ the 80/10/10
    * random-split expectation when it didn't). Pair engine + two hash
    * projections — no new shuffle beyond the engine's own. */
  def q469SplitLeak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val split = (c: Column) => TrainingData.splitColumn(c)
    graft.etl.Similarity.ngramJaccardPairs(
        TrainingData.corpus(spark, dir), "doc_id", "text", 3)
      .filter($"inter" * 2 >= $"union_size")
      .select(expr("least(inter * 10000 div union_size div 1000, 9)")
        .as("decile"),
        (split($"id_a") =!= split($"id_b")).as("_straddle"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"_straddle", 1L).otherwise(0L)).as("n_straddle"))
      .select($"decile", $"n_pairs", $"n_straddle",
        expr("n_straddle * 10000 div n_pairs").as("straddle_bp"))
      .orderBy($"decile")
  }

  // ------------------------------------------------ q470 SPRT walk

  /** Wald's SPRT on the daily conversion rate — the sequential test
    * that answers "could we have stopped this experiment early": H₀
    * p=2%, H₁ p=3%, per-day log-likelihood increment
    * k·ln(p₁/p₀) + (m−k)·ln((1−p₁)/(1−p₀)) with the four logs as
    * FIXED milli-nat literals (405, −10; boundaries ln((1−β)/α)=2890,
    * ln(β/(1−α))=−2251 at α=5%, β=10%) — quantizing the constants
    * (not the data) keeps both engines bit-identical and is how
    * fixed-point SPRT ships in production monitors anyway. The
    * cumulative walk is a global cumsum over the per-DAY aggregate —
    * calendar-bounded (WindowLintSpec allowlist). Output: the daily
    * walk with the first-crossing decision per day. */
  def q470SprtWalk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val day = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("d"), $"event_type")
      .groupBy($"d")
      .agg(count(lit(1)).as("m"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("k"))
    val w = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day
      .withColumn("llr_milli", $"k" * 405L + ($"m" - $"k") * -10L)
      .withColumn("cum_llr_milli", sum($"llr_milli").over(w))
      .withColumn("decision",
        when($"cum_llr_milli" >= 2890L, "accept_h1")
          .when($"cum_llr_milli" <= -2251L, "accept_h0")
          .otherwise("continue"))
      .select($"d", $"m", $"k", $"llr_milli", $"cum_llr_milli", $"decision")
      .orderBy($"d")
  }

  // ------------------------------------ q471 group-relative advantage

  /** GRPO-style group-relative advantage panel: per prompt group the
    * reward baseline is the GROUP mean (no value model), and each
    * sample's advantage is (r − mean), normalized by the group's mean
    * absolute deviation — MAD, not σ, because MAD stays in exact
    * integer arithmetic (no square root) and is the robust scale
    * serving teams prefer under reward outliers anyway. Output per
    * group: n, mean, MAD (milli-cents), and the clip fraction
    * |adv/MAD| > 2 (bp) — the knob that says how often a PPO-style
    * clip would bite. Two aggregates over one group shuffle (mean
    * first, then |r−mean| stats); divisions sign-factored so floored
    * quotients agree cross-engine. */
  def q471GrpoAdvantage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // value >= 0 guard (repo convention, see q457/q463): mean_milli's
    // `sum(r)*1000 div n` would truncate toward zero in Spark but floor
    // in DuckDB on a negative sum (refund-heavy groups).
    val r = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0)
      .select($"event_type", cents.as("r"))
    val m = r.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"r").as("_sr"))
      .withColumn("mean_milli", expr(
        "CAST(CAST(_sr AS DECIMAL(38,0)) * 1000 div n AS BIGINT)"))
      .select($"event_type", $"n", $"mean_milli")
    val dev = r.join(broadcast(m), "event_type")
      .withColumn("_dev", $"r" * 1000L - $"mean_milli")
    val stats = dev.groupBy($"event_type", $"n", $"mean_milli")
      .agg(expr("CAST(sum(CAST(abs(_dev) AS DECIMAL(38,0))) " +
        "div count(1) AS BIGINT)").as("mad_milli"))
    // clip test is |dev| > 2·MAD — a pure integer comparison, no division
    // by MAD (which can be 0 on a constant group) ever happens
    val clip = dev
      .join(broadcast(stats.select($"event_type", $"mad_milli")),
        "event_type")
      .groupBy($"event_type")
      .agg(sum(when(abs($"_dev") > $"mad_milli" * 2, 1L).otherwise(0L))
        .as("_nclip"), count(lit(1)).as("_nn"))
    stats.join(clip, "event_type")
      .select($"event_type", $"n", $"mean_milli", $"mad_milli",
        expr("_nclip * 10000 div _nn").as("clip_bp"))
      .orderBy($"event_type")
  }

  // ------------------------------------------ q472 1-bit MinHash

  /** b-bit MinHash (b=1, Li & König) estimator audit on the q442
    * verified pair set: keeping only the LOWEST BIT of each of the 32
    * permutation minima shrinks signatures 64×, and Ĵ = 2·(m̂ − ½)
    * corrects the ½ random-collision floor. Per exact-Jaccard decile:
    * mean |err| of the 1-bit estimator NEXT TO the full-width one —
    * the table that says what the 64× compression costs in estimator
    * noise (theory: Var grows ≈ (1−J)⁻¹-ish at the low end — visible
    * in the low deciles). Same pair-members-only signature plan as
    * q442/q450. */
  def q472BbitMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = TrainingData.corpus(spark, dir)
    val pairs = graft.etl.Similarity
      .ngramJaccardPairs(docs, "doc_id", "text", 3)
      .filter($"inter" * 2 >= $"union_size")
      .select($"id_a", $"id_b",
        expr("inter * 10000 div union_size").as("exact_bp"))
      .localCheckpoint()
    val members = pairs.select($"id_a".as("doc_id"))
      .unionByName(pairs.select($"id_b".as("doc_id"))).distinct()
    val shingles = graft.etl.Parallelism
      .spread(docs.join(broadcast(members), Seq("doc_id"), "left_semi"))
      .select($"doc_id",
        explode(array_distinct(call_function("word_shingles", $"text",
          lit(3)))).as("s"))
    val sigs = TrainingData.shaLaneSigs(shingles)
    val est = pairs
      .join(sigs.select($"doc_id".as("id_a"), $"i", $"mh".as("ha")),
        Seq("id_a"))
      .join(sigs.select($"doc_id".as("id_b"), $"i", $"mh".as("hb")),
        Seq("id_b", "i"))
      .groupBy($"id_a", $"id_b", $"exact_bp")
      .agg(sum(when($"ha" === $"hb", 1L).otherwise(0L)).as("_mfull"),
        sum(when($"ha" % 2 === $"hb" % 2, 1L).otherwise(0L)).as("_m1"))
      // full: Ĵ = m/32. 1-bit: Ĵ = 2·(m/32 − 1/2) = (2m − 32)/32,
      // clamped at 0 (below-floor noise estimates negative J)
      .withColumn("_est_full_bp", expr("_mfull * 10000 div 32"))
      .withColumn("_est1_bp",
        expr("greatest((_m1 * 2 - 32) * 10000 div 32, 0)"))
    est.groupBy(expr("least(exact_bp div 1000, 9)").as("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(CAST(sum(abs(_est_full_bp - exact_bp)) " +
          "AS DECIMAL(38,0)) div count(1) AS BIGINT)")
          .as("mae_full_bp"),
        expr("CAST(CAST(sum(abs(_est1_bp - exact_bp)) " +
          "AS DECIMAL(38,0)) div count(1) AS BIGINT)")
          .as("mae_1bit_bp"))
      .orderBy($"decile")
  }

  // ------------------------------------------- q473 curation ROI

  /** Token-budget curation ROI curve: documents bucketed into 100
    * quality bins (the q414 score proxy), and for each bin the
    * cumulative-from-best docs/chars/mean-quality — "what average
    * quality does each extra token of budget buy" read directly off
    * the table (the marginal-quality curve whose knee picks the
    * budget). The cumsum runs over the 100-row bin aggregate
    * (bounded domain — WindowLintSpec allowlist), never over docs. */
  def q473CurationRoi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bins = Tables.documents(spark, dir)
      .select((length($"text") % 997).cast("long").as("_score"),
        $"n_chars")
      .groupBy(expr("_score div 10").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"),
        sum($"_score").as("_ssc"))
    val w = Window.orderBy($"bin".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins
      .withColumn("cum_docs", sum($"n_docs").over(w))
      .withColumn("cum_chars", sum($"chars").over(w))
      .withColumn("cum_mean_score_milli", expr(
        "CAST(CAST(sum(_ssc) OVER (ORDER BY bin DESC " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS DECIMAL(38,0)) * 1000 div (sum(n_docs) OVER (ORDER BY " +
          "bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
          "AS BIGINT)"))
      .select($"bin", $"n_docs", $"chars", $"cum_docs", $"cum_chars",
        $"cum_mean_score_milli")
      .orderBy($"bin".desc)
  }

  // ------------------------------------------- q474 length bias

  /** Reward length-bias audit: the exact integer OLS slope of score on
    * document length per source ([[graft.etl.Mining.groupedSlope]]
    * convention inlined: slope = (nΣxy − ΣxΣy)·10⁶ div (nΣx² − (Σx)²),
    * decimal(38,0) throughout) — the one-number check that a "quality"
    * scorer isn't just a length detector (the classic reward-model
    * failure; a big positive slope here means long docs buy score
    * regardless of content). One combiner-friendly aggregate per
    * source. Headroom note: with x ≤ 10⁴ chars and y < 10³ the
    * decimal(38,0) numerator n·Σxy·10⁶ stays under 10³⁷ up to ~10¹²
    * docs per source — at a larger corpus, drop the micro scale to
    * milli before widening breaks, not after. */
  def q474LengthBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast(d38).as("x"),
        (length($"text") % 997).cast(d38).as("y"))
      .groupBy($"source")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"source", $"n".cast("long").as("n"),
        expr("CAST(((n * sxy - sx * sy) * 1000000) div " +
          "NULLIF(n * sxx - sx * sx, 0) AS BIGINT)").as("slope_micro"))
      .orderBy($"source")
  }

  // ----------------------------------------- q475 importance-weight ESS

  /** Effective sample size of importance weights per source — Kish's
    * ESS = (Σw)²/Σw², the one-number diagnostic every weighted pipeline
    * (DSIR mixing, IPS off-policy evals) should publish next to its
    * weights: ESS ≪ n means a few documents carry the estimate and the
    * nominal sample size is a lie. Weights are the repo's integer
    * quality proxy + 1 (strictly positive). ess_bp = ESS/n in bp — the
    * fraction of the sample that is EFFECTIVELY there. One
    * combiner-friendly aggregate per source; (Σw)² rides decimal. */
  def q475IwEss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", ((length($"text") % 997) + 1L).as("w"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"w").as("_sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("_sw2"))
      .select($"source", $"n",
        expr("CAST(CAST(_sw AS DECIMAL(38,0)) * _sw div _sw2 AS BIGINT)")
          .as("ess"),
        expr("CAST(CAST(_sw AS DECIMAL(38,0)) * _sw * 10000 " +
          "div (_sw2 * n) AS BIGINT)").as("ess_bp"))
      .orderBy($"source")
  }

  // ----------------------------------------- q476 calibration / ECE

  /** Calibration curve + expected calibration error of a spend-based
    * purchase predictor (conf = min(cents/10, 9999) bp — "the more they
    * spend the likelier a purchase"): 10 equal-width confidence bins,
    * per bin the mean stated confidence vs the realized purchase rate,
    * and ECE_bp = Σ n_b·|acc_b − conf_b| / N — the standard reliability
    * readout for any score a pipeline wants to treat as a probability
    * (quality classifiers, LLM-judge scores). Bin grain + one broadcast
    * total; everything floored bp. */
  def q476CalibrationEce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // value >= 0 guard (repo convention, see q457/q463): conf_bp's
    // `div 10` and the bin's `div 1000` truncate toward zero in Spark
    // but floor in DuckDB on negative cents (refunds).
    val scored = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0)
      .select(expr("least(CAST(round(value * 100) AS BIGINT) div 10, " +
        "9999)").as("conf_bp"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("y"))
    val bins = scored
      .groupBy(expr("least(conf_bp div 1000, 9)").as("bin"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(CAST(sum(conf_bp) AS DECIMAL(38,0)) div count(1) " +
          "AS BIGINT)").as("mean_conf_bp"),
        expr("sum(y) * 10000 div count(1)").as("acc_bp"))
    val ece = bins.agg(expr(
      "CAST(CAST(sum(n * abs(acc_bp - mean_conf_bp)) AS DECIMAL(38,0)) " +
        "div sum(n) AS BIGINT)").as("ece_bp"))
    bins.crossJoin(broadcast(ece))
      .select($"bin", $"n", $"mean_conf_bp", $"acc_bp", $"ece_bp")
      .orderBy($"bin")
  }

  // ----------------------------------------- q477 power analysis table

  /** Two-proportion power-analysis table — the experiment-sizing op an
    * A/B platform runs BEFORE launching: from the measured baseline
    * conversion p (ppm), for each relative MDE in {5, 10, 20}%, the
    * per-arm n = ⌈(z_{α/2}+z_β)²·(p(1−p)+p₂(1−p₂))/δ²⌉ at α=5%,
    * β=20% — the z-sum squared is the literal micro constant 7851204
    * ((1.960+0.842)² — quantizing the CONSTANTS, not the data, same
    * convention as q470), so both engines evaluate one exact integer
    * ceiling division. Output also says whether the CURRENT per-arm
    * count already meets each n — the go/no-go column. */
  def q477PowerTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
        .as("_conv"))
      .agg(count(lit(1)).as("n_users"),
        expr("sum(_conv) * 1000000 div count(1)").as("p_ppm"))
    val mdes = Seq(5L, 10L, 20L).toDF("rel_pct")
    base.crossJoin(broadcast(mdes))
      .withColumn("p2_ppm", expr("p_ppm + p_ppm * rel_pct div 100"))
      .withColumn("_v", expr("CAST(p_ppm AS DECIMAL(38,0)) " +
        "* (1000000 - p_ppm) + CAST(p2_ppm AS DECIMAL(38,0)) " +
        "* (1000000 - p2_ppm)"))
      .withColumn("_d", expr("CAST(p2_ppm - p_ppm AS DECIMAL(38,0))"))
      .withColumn("n_per_arm", expr(
        "CAST((7851204 * _v + (_d * _d * 1000000) - 1) " +
          "div (_d * _d * 1000000) AS BIGINT)"))
      .select($"rel_pct", $"p_ppm", $"p2_ppm", $"n_per_arm", $"n_users",
        expr("n_users div 2 >= n_per_arm").as("feasible_now"))
      .orderBy($"rel_pct")
  }

  // ----------------------------------------- q478 truncation loss

  /** Context-window truncation loss per source: for L ∈ {128, 512,
    * 2048} tokens, the share of DOCUMENTS that overflow and the share
    * of TOKENS lost to truncation — the table that picks the training
    * context length (and justifies paying for a longer one) from the
    * corpus itself rather than folklore. One token-count projection,
    * one broadcast 3-row L table, one aggregate. */
  def q478TruncationLoss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source",
        size(graft.etl.Corpus.tokensOf($"text")).cast("long").as("t"))
    val ls = Seq(128L, 512L, 2048L).toDF("l")
    toks.crossJoin(broadcast(ls))
      .groupBy($"source", $"l")
      .agg(count(lit(1)).as("n_docs"), sum($"t").as("tokens"),
        sum(when($"t" > $"l", 1L).otherwise(0L)).as("n_truncated"),
        sum(greatest($"t" - $"l", lit(0L))).as("tokens_lost"))
      .select($"source", $"l", $"n_docs", $"n_truncated",
        expr("n_truncated * 10000 div n_docs").as("doc_trunc_bp"),
        expr("CAST(CAST(tokens_lost AS DECIMAL(38,0)) * 10000 " +
          "div tokens AS BIGINT)").as("token_loss_bp"))
      .orderBy($"source", $"l")
  }

  // ----------------------------------------- q479 canary survival

  /** Memorization-canary pipeline audit: plant a unique canary string
    * in every doc_id % 101 == 0 document of the PLANTED-DUP corpus (the
    * clone at doc_id+10⁶ carries the same canary — a real leaked-secret
    * shape: the secret recurs verbatim), then run the exact-dedup +
    * split pipeline and report what a training run would see: canary
    * copies planted, surviving exact dedup (keep-min-id), landing in
    * train, and canaries whose copies straddle ≥2 splits BEFORE dedup —
    * the "your test set contains the training secret" number that must
    * be 0 after dedup-then-split. Equi-joins/groupBys only, one row. */
  def q479CanarySurvival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // canary condition keys on the ORIGINAL id (doc_id % 1e6) so a
    // planted clone carries the SAME canary as its source — 1e6 % 101
    // != 0, so a raw doc_id % 101 test would canary the original but
    // not its clone and the recurring-secret shape would silently break
    val c = TrainingData.corpus(spark, dir)
      .withColumn("_cid",
        when(($"doc_id" % 1000000) % 101 === 0, $"doc_id" % 1000000))
      .withColumn("text", when($"_cid".isNotNull,
        concat($"text", lit(" CANARY-"), $"_cid")).otherwise($"text"))
    val canaries = c.filter($"_cid".isNotNull)
      .select($"doc_id", $"_cid", TrainingData.splitColumn($"doc_id")
        .as("split"))
    val kept = c.groupBy(sha2($"text", 256).as("_h"))
      .agg(min($"doc_id").as("doc_id"))
    val keptCanaries = canaries.join(kept, Seq("doc_id"), "left_semi")
    val planted = canaries.agg(count(lit(1)).as("copies_planted"),
      countDistinct($"_cid").as("canaries_planted"))
    val surv = keptCanaries.agg(count(lit(1)).as("copies_post_dedup"),
      sum(when($"split" === "train", 1L).otherwise(0L)).as("in_train"))
    val straddle = canaries.groupBy($"_cid")
      .agg(countDistinct($"split").as("_ns"))
      .agg(sum(when($"_ns" >= 2, 1L).otherwise(0L))
        .as("cross_split_pre_dedup"))
    planted.crossJoin(broadcast(surv)).crossJoin(broadcast(straddle))
  }

  // -------------------------------------- q480 group-sequential looks

  /** O'Brien–Fleming group-sequential monitoring — the "five planned
    * looks" sibling of q470's fully-sequential SPRT: at each of 5
    * equally-spaced calendar cutoffs, the two-proportion pooled z² for
    * conversion (odd vs even users) is compared against the SQUARED
    * OBF boundary. Everything stays exact-integer through the
    * squared-z cross-multiplication
    *   z² = (x₁n₂ − x₂n₁)²·N / (n₁·n₂·X·(N−X)),  X = x₁+x₂, N = n₁+n₂
    * (no square root ever happens — the comparison squares the
    * boundary instead, the standard fixed-point spelling), with the
    * boundaries z_k = 2.040·√(5/k) as micro literals (z² ≈ 20.81,
    * 10.41, 6.94, 5.20, 4.16 — EvalQueriesSpec pins them to the
    * formula). Users enter at their first event day; conversion =
    * any purchase by the cutoff. One user aggregate + a broadcast
    * 5-row look grid. */
  def q480ObfLooks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val users = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id", ($"user_id" % 2).as("arm"),
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"), $"event_type")
      .groupBy($"user_id", $"arm")
      .agg(min($"d").as("first_d"),
        min(when($"event_type" === "purchase", $"d")).as("conv_d"))
    val span = users.agg(min($"first_d").as("_lo"),
      (max($"first_d") + 1).as("_hi"))
    val bounds = Seq((1L, 20808000L), (2L, 10404000L), (3L, 6936000L),
      (4L, 5202000L), (5L, 4161600L)).toDF("look", "b2_micro")
    val looks = broadcast(bounds.crossJoin(broadcast(span))
      .withColumn("cut", expr("_lo + (_hi - _lo) * look div 5"))
      .select($"look", $"b2_micro", $"cut"))
    users.crossJoin(looks)
      .filter($"first_d" < $"cut")
      .groupBy($"look", $"cut", $"b2_micro")
      .agg(sum($"arm").as("n1"),
        (count(lit(1)) - sum($"arm")).as("n2"),
        sum(when($"arm" === 1 && $"conv_d" < $"cut", 1L).otherwise(0L))
          .as("x1"),
        sum(when($"arm" === 0 && $"conv_d" < $"cut", 1L).otherwise(0L))
          .as("x2"))
      .withColumn("_dnum", expr(
        // the cross-multiplication difference is built in DECIMAL(38,0)
        // (never LONG): x1*n2 alone would wrap int64 at per-arm counts
        // ~3e9, while the DuckDB oracle is HUGEINT throughout
        "CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1"))
      .withColumn("z2_micro", expr(
        "CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0 " +
          "AND x1 + x2 < n1 + n2 THEN " +
          "CAST(_dnum * _dnum * (n1 + n2) * 1000000 " +
          "div (CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2) " +
          "* (n1 + n2 - x1 - x2)) AS BIGINT) END"))
      .select($"look", $"cut", $"n1", $"n2", $"x1", $"x2", $"z2_micro",
        coalesce($"z2_micro" >= $"b2_micro", lit(false)).as("crossed"))
      .orderBy($"look")
  }

  // -------------------------------------- q481 crawl saturation

  /** Crawl-saturation curve: documents in doc_id order stand in for
    * crawl order, cut into 10 equal buckets; per bucket, the distinct
    * 3-gram shingles seen in it, how many are NEW (first occurrence in
    * crawl order), and the new-shingle rate — the diminishing-returns
    * curve that says when more crawling stops buying new content
    * (new_bp collapsing toward 0 = the crawl has saturated its
    * sources). Shingle-grain min-bucket aggregate + two bucket-grain
    * rollups; the cumulative runs over the 10-row bucket table
    * (WindowLintSpec allowlist). */
  def q481CrawlSaturation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val hi = broadcast(docs.agg((max($"doc_id") + 1).as("_hi")))
    val sh = docs
      .select($"doc_id", explode(array_distinct(
        call_function("word_shingles", $"text", lit(3)))).as("s"))
      .crossJoin(hi)
      .select(expr("least(doc_id * 10 div _hi, 9)").as("bucket"), $"s")
    val perBucket = sh.distinct()
      .groupBy($"bucket").agg(count(lit(1)).as("n_distinct"))
    val firstSeen = sh.groupBy($"s").agg(min($"bucket").as("fb"))
      .groupBy($"fb".as("bucket")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firstSeen, Seq("bucket"), "left")
      .withColumn("n_new", coalesce($"n_new", lit(0L)))
      .withColumn("cum_new", sum($"n_new").over(w))
      .select($"bucket", $"n_distinct", $"n_new", $"cum_new",
        expr("n_new * 10000 div n_distinct").as("new_bp"))
      .orderBy($"bucket")
  }

  // -------------------------------------- q482 backfill LPT plan

  /** Backfill-wave planner — longest-processing-time greedy assignment
    * of per-day partition sizes onto 8 parallel workers, the classic
    * 4/3-approximation every batch-backfill (and shuffle-file planner)
    * leans on: makespan vs the ceil-average ideal says how lumpy the
    * calendar is and whether 8 ways is enough. The greedy is a
    * SEQUENTIAL fold by construction, but its domain is CALENDAR DAYS —
    * bounded at any corpus size — so it rides one
    * sort_array(collect_list) group + an `aggregate` fold whose state
    * is the sorted 8-worker load vector (assign to loads[0], re-sort;
    * the DuckDB twin replays the identical fold as a recursive CTE over
    * rank-ordered items). Ties break by day so both engines fold the
    * same sequence. Output: one row — days, rows, makespan, min load,
    * and balance_bp = makespan/ideal (10000 = perfectly level). */
  def q482BackfillLpt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("d"))
      .groupBy($"d").agg(count(lit(1)).as("sz"))
    days
      .agg(sort_array(collect_list(struct((-$"sz").as("negsz"),
        $"d".as("d"), $"sz".as("sz")))).as("items"))
      .withColumn("loads", expr(
        """aggregate(items, array_repeat(CAST(0 AS BIGINT), 8),
          |  (acc, x) -> array_sort(concat(slice(acc, 2, 7),
          |    array(acc[0] + x.sz))))""".stripMargin))
      .select(size($"items").cast("long").as("n_days"),
        expr("aggregate(items, CAST(0 AS BIGINT), (a, x) -> a + x.sz)")
          .as("total_rows"),
        expr("element_at(loads, 8)").as("makespan"),
        expr("element_at(loads, 1)").as("min_load"))
      .withColumn("balance_bp",
        expr("makespan * 10000 div ((total_rows + 7) div 8)"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q482_backfill_lpt" -> q482BackfillLpt _,
    "q480_obf_looks" -> q480ObfLooks _,
    "q481_crawl_saturation" -> q481CrawlSaturation _,
    "q475_iw_ess" -> q475IwEss _,
    "q476_calibration_ece" -> q476CalibrationEce _,
    "q477_power_table" -> q477PowerTable _,
    "q478_truncation_loss" -> q478TruncationLoss _,
    "q479_canary_survival" -> q479CanarySurvival _,
    "q466_pass_at_k" -> q466PassAtK _,
    "q467_bon_curve" -> q467BonCurve _,
    "q468_conformal_coverage" -> q468ConformalCoverage _,
    "q469_split_leak" -> q469SplitLeak _,
    "q470_sprt_walk" -> q470SprtWalk _,
    "q471_grpo_advantage" -> q471GrpoAdvantage _,
    "q472_bbit_minhash" -> q472BbitMinhash _,
    "q473_curation_roi" -> q473CurationRoi _,
    "q474_length_bias" -> q474LengthBias _)

  val oracleSql: Map[String, String] = Map(
    "q482_backfill_lpt" -> """
      |WITH RECURSIVE d AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    CAST(count(*) AS BIGINT) AS sz
      |  FROM events GROUP BY 1),
      |it AS (
      |  SELECT d, sz, row_number() OVER (ORDER BY sz DESC, d) AS rn
      |  FROM d),
      |fold AS (
      |  SELECT 0::BIGINT AS rn,
      |    [0, 0, 0, 0, 0, 0, 0, 0]::BIGINT[] AS loads
      |  UNION ALL
      |  SELECT f.rn + 1,
      |    list_sort(list_concat(f.loads[2:8], [f.loads[1] + it.sz]))
      |  FROM fold f JOIN it ON it.rn = f.rn + 1),
      |fin AS (
      |  SELECT loads FROM fold
      |  WHERE rn = (SELECT count(*) FROM it)),
      |tot AS (SELECT count(*) AS n_days, sum(sz) AS total_rows FROM it)
      |SELECT CAST(n_days AS BIGINT) AS n_days,
      |  CAST(total_rows AS BIGINT) AS total_rows,
      |  CAST(loads[8] AS BIGINT) AS makespan,
      |  CAST(loads[1] AS BIGINT) AS min_load,
      |  CAST(loads[8] * 10000 // ((total_rows + 7) // 8) AS BIGINT)
      |    AS balance_bp
      |FROM fin, tot""".stripMargin,
    "q480_obf_looks" -> """
      |WITH u AS (
      |  SELECT user_id, user_id % 2 AS arm,
      |    min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
      |      AS first_d,
      |    min(CASE WHEN event_type = 'purchase' THEN
      |      datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) END)
      |      AS conv_d
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
      |span AS (SELECT min(first_d) AS lo, max(first_d) + 1 AS hi FROM u),
      |looks AS (
      |  SELECT look, b2_micro, lo + (hi - lo) * look // 5 AS cut
      |  FROM (VALUES (1, 20808000), (2, 10404000), (3, 6936000),
      |    (4, 5202000), (5, 4161600)) AS t(look, b2_micro), span),
      |agg AS (
      |  SELECT look, cut, b2_micro,
      |    sum(arm) AS n1, count(*) - sum(arm) AS n2,
      |    sum(CASE WHEN arm = 1 AND conv_d < cut THEN 1 ELSE 0 END) AS x1,
      |    sum(CASE WHEN arm = 0 AND conv_d < cut THEN 1 ELSE 0 END) AS x2
      |  FROM u JOIN looks ON u.first_d < looks.cut
      |  GROUP BY 1, 2, 3),
      |z AS (
      |  SELECT *,
      |    CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0
      |      AND x1 + x2 < n1 + n2 THEN
      |      CAST(CAST(x1 * n2 - x2 * n1 AS HUGEINT)
      |        * (x1 * n2 - x2 * n1) * (n1 + n2) * 1000000
      |        // (CAST(n1 AS HUGEINT) * n2 * (x1 + x2)
      |        * (n1 + n2 - x1 - x2)) AS BIGINT) END AS z2_micro
      |  FROM agg)
      |SELECT CAST(look AS BIGINT) AS look, CAST(cut AS BIGINT) AS cut,
      |  CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(x1 AS BIGINT) AS x1, CAST(x2 AS BIGINT) AS x2, z2_micro,
      |  coalesce(z2_micro >= b2_micro, false) AS crossed
      |FROM z ORDER BY look""".stripMargin,
    "q481_crawl_saturation" -> """
      |WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
      |    AS tf
      |  FROM documents),
      |hi AS (SELECT max(doc_id) + 1 AS hi FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, tf[i] || ' ' || tf[i+1] || ' ' || tf[i+2]
      |    AS s
      |  FROM w, LATERAL (SELECT unnest(generate_series(1,
      |    greatest(len(tf) - 2, 0))) AS i) g),
      |b AS (SELECT least(doc_id * 10 // hi, 9) AS bucket, s FROM sh, hi),
      |pb AS (
      |  SELECT bucket, count(*) AS n_distinct
      |  FROM (SELECT DISTINCT bucket, s FROM b) d GROUP BY 1),
      |fs AS (SELECT s, min(bucket) AS fb FROM b GROUP BY 1),
      |nn AS (SELECT fb AS bucket, count(*) AS n_new FROM fs GROUP BY 1)
      |SELECT CAST(pb.bucket AS BIGINT) AS bucket,
      |  CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
      |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY pb.bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_new,
      |  CAST(coalesce(n_new, 0) * 10000 // n_distinct AS BIGINT) AS new_bp
      |FROM pb LEFT JOIN nn ON pb.bucket = nn.bucket
      |ORDER BY pb.bucket""".stripMargin,
    "q475_iw_ess" -> """
      |SELECT source, CAST(count(*) AS BIGINT) AS n,
      |  CAST(CAST(sum((length(text) % 997) + 1) AS HUGEINT)
      |    * sum((length(text) % 997) + 1)
      |    // sum(CAST((length(text) % 997) + 1 AS HUGEINT)
      |      * ((length(text) % 997) + 1)) AS BIGINT) AS ess,
      |  CAST(CAST(sum((length(text) % 997) + 1) AS HUGEINT)
      |    * sum((length(text) % 997) + 1) * 10000
      |    // (sum(CAST((length(text) % 997) + 1 AS HUGEINT)
      |      * ((length(text) % 997) + 1)) * count(*)) AS BIGINT) AS ess_bp
      |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q476_calibration_ece" -> """
      |WITH s AS (
      |  SELECT least(CAST(round(value * 100) AS BIGINT) // 10, 9999)
      |      AS conf_bp,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events WHERE value IS NOT NULL AND value >= 0),
      |bins AS (
      |  SELECT least(conf_bp // 1000, 9) AS bin,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(CAST(sum(conf_bp) AS HUGEINT) // count(*) AS BIGINT)
      |      AS mean_conf_bp,
      |    CAST(sum(y) * 10000 // count(*) AS BIGINT) AS acc_bp
      |  FROM s GROUP BY 1),
      |e AS (
      |  SELECT CAST(CAST(sum(n * abs(acc_bp - mean_conf_bp)) AS HUGEINT)
      |    // sum(n) AS BIGINT) AS ece_bp FROM bins)
      |SELECT CAST(bin AS BIGINT) AS bin, n, mean_conf_bp, acc_bp, e.ece_bp
      |FROM bins, e ORDER BY bin""".stripMargin,
    "q477_power_table" -> """
      |WITH u AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      |b AS (
      |  SELECT count(*) AS n_users,
      |    sum(conv) * 1000000 // count(*) AS p_ppm
      |  FROM u),
      |g AS (
      |  SELECT b.n_users, b.p_ppm, t.rel_pct,
      |    b.p_ppm + b.p_ppm * t.rel_pct // 100 AS p2_ppm
      |  FROM b CROSS JOIN (VALUES (5), (10), (20)) AS t(rel_pct)),
      |c AS (
      |  SELECT rel_pct, p_ppm, p2_ppm, n_users,
      |    CAST(p_ppm AS HUGEINT) * (1000000 - p_ppm)
      |      + CAST(p2_ppm AS HUGEINT) * (1000000 - p2_ppm) AS v,
      |    CAST(p2_ppm - p_ppm AS HUGEINT) AS d
      |  FROM g)
      |SELECT CAST(rel_pct AS BIGINT) AS rel_pct,
      |  CAST(p_ppm AS BIGINT) AS p_ppm, CAST(p2_ppm AS BIGINT) AS p2_ppm,
      |  CAST((7851204 * v + (d * d * 1000000) - 1)
      |    // (d * d * 1000000) AS BIGINT) AS n_per_arm,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  n_users // 2 >= (7851204 * v + (d * d * 1000000) - 1)
      |    // (d * d * 1000000) AS feasible_now
      |FROM c ORDER BY rel_pct""".stripMargin,
    "q478_truncation_loss" -> """
      |WITH toks AS (
      |  SELECT source,
      |    len(list_filter(string_split_regex(text, '[ \t\n\r]+'),
      |      x -> x <> '')) AS t
      |  FROM documents),
      |x AS (
      |  SELECT source, l, count(*) AS n_docs, sum(t) AS tokens,
      |    sum(CASE WHEN t > l THEN 1 ELSE 0 END) AS n_truncated,
      |    sum(greatest(t - l, 0)) AS tokens_lost
      |  FROM toks CROSS JOIN (VALUES (128), (512), (2048)) AS g(l)
      |  GROUP BY 1, 2)
      |SELECT source, CAST(l AS BIGINT) AS l,
      |  CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_truncated AS BIGINT) AS n_truncated,
      |  CAST(n_truncated * 10000 // n_docs AS BIGINT) AS doc_trunc_bp,
      |  CAST(CAST(tokens_lost AS HUGEINT) * 10000 // tokens AS BIGINT)
      |    AS token_loss_bp
      |FROM x ORDER BY source, l""".stripMargin,
    "q479_canary_survival" -> s"""
      |WITH $corpusSql,
      |c AS (
      |  SELECT doc_id,
      |    CASE WHEN (doc_id % 1000000) % 101 = 0
      |      THEN doc_id % 1000000 END AS cid,
      |    CASE WHEN (doc_id % 1000000) % 101 = 0
      |      THEN text || ' CANARY-' || CAST(doc_id % 1000000 AS VARCHAR)
      |      ELSE text END AS text
      |  FROM corpus),
      |canaries AS (
      |  SELECT doc_id, cid,
      |    CASE WHEN ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)),
      |        1, 4))::BIGINT % 100 < 80 THEN 'train'
      |      WHEN ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)),
      |        1, 4))::BIGINT % 100 < 90 THEN 'val' ELSE 'test' END AS split
      |  FROM c WHERE cid IS NOT NULL),
      |kept AS (
      |  SELECT min(doc_id) AS doc_id FROM c GROUP BY sha256(text)),
      |kc AS (
      |  SELECT ca.* FROM canaries ca JOIN kept k ON ca.doc_id = k.doc_id),
      |p AS (
      |  SELECT CAST(count(*) AS BIGINT) AS copies_planted,
      |    CAST(count(DISTINCT cid) AS BIGINT) AS canaries_planted
      |  FROM canaries),
      |s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS copies_post_dedup,
      |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS in_train
      |  FROM kc),
      |st AS (
      |  SELECT CAST(sum(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS cross_split_pre_dedup
      |  FROM (SELECT cid, count(DISTINCT split) AS ns
      |        FROM canaries GROUP BY 1) a)
      |SELECT p.copies_planted, p.canaries_planted, s.copies_post_dedup,
      |  s.in_train, st.cross_split_pre_dedup
      |FROM p, s, st""".stripMargin,
    "q466_pass_at_k" -> passAtKSql,
    "q467_bon_curve" -> """
      |WITH s AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS s,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY sha256(CAST(event_id AS VARCHAR)), event_id) AS rk
      |  FROM events WHERE value IS NOT NULL),
      |b AS (
      |  SELECT event_type, n, (rk - 1) // n AS batch,
      |    count(*) AS sz, max(s) AS mx
      |  FROM s CROSS JOIN (VALUES (1), (2), (4), (8)) AS t(n)
      |  GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_batches,
      |  CAST(CAST(sum(mx) AS HUGEINT) * 1000 // count(*) AS BIGINT)
      |    AS mean_max_milli
      |FROM b WHERE sz = n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q468_conformal_coverage" -> """
      |WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS s,
      |    ('0x' || substring(sha256(CAST(event_id AS VARCHAR)), 1, 4))
      |      ::BIGINT % 2 AS half
      |  FROM events WHERE value IS NOT NULL),
      |nc AS (
      |  SELECT event_type, count(*) AS n_cal,
      |    (9 * (count(*) + 1) + 9) // 10 AS r
      |  FROM e WHERE half = 0 GROUP BY 1 HAVING count(*) >= 20),
      |rk AS (
      |  SELECT event_type, s,
      |    row_number() OVER (PARTITION BY event_type ORDER BY s, event_id)
      |      AS rk
      |  FROM e WHERE half = 0),
      |qh AS (
      |  SELECT rk.event_type, nc.n_cal, rk.s AS qhat_cents
      |  FROM rk JOIN nc ON rk.event_type = nc.event_type AND rk.rk = nc.r)
      |SELECT e.event_type, CAST(qh.n_cal AS BIGINT) AS n_cal,
      |  CAST(count(*) AS BIGINT) AS n_test, qh.qhat_cents,
      |  CAST(sum(CASE WHEN e.s <= qh.qhat_cents THEN 1 ELSE 0 END)
      |    * 1000000 // count(*) AS BIGINT) AS coverage_ppm
      |FROM e JOIN qh ON e.event_type = qh.event_type
      |WHERE e.half = 1
      |GROUP BY 1, 2, 4 ORDER BY 1""".stripMargin,
    "q470_sprt_walk" -> """
      |WITH day AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k
      |  FROM events GROUP BY 1),
      |walk AS (
      |  SELECT d, m, k, k * 405 + (m - k) * -10 AS llr_milli,
      |    CAST(sum(k * 405 + (m - k) * -10) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_llr_milli
      |  FROM day)
      |SELECT CAST(d AS BIGINT) AS d, m, k,
      |  CAST(llr_milli AS BIGINT) AS llr_milli, cum_llr_milli,
      |  CASE WHEN cum_llr_milli >= 2890 THEN 'accept_h1'
      |       WHEN cum_llr_milli <= -2251 THEN 'accept_h0'
      |       ELSE 'continue' END AS decision
      |FROM walk ORDER BY d""".stripMargin,
    "q469_split_leak" -> s"""
      |WITH $corpusSql,
      |$shinglesSql,
      |freq AS (SELECT s, count(*) AS c FROM sh GROUP BY 1),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |    max(CASE WHEN f.c <= 256 THEN 1 ELSE 0 END) AS has_kept
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN freq f ON f.s = a.s
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT id_a, id_b,
      |    inter * 10000 // (sa.n + sb.n - inter) AS jbp
      |  FROM cand
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE 2 * inter >= sa.n + sb.n - inter AND has_kept = 1),
      |lab AS (
      |  SELECT least(jbp // 1000, 9) AS decile,
      |    CASE WHEN
      |      (CASE WHEN ('0x' || substring(sha256(CAST(id_a AS VARCHAR)),
      |          1, 4))::BIGINT % 100 < 80 THEN 'train'
      |        WHEN ('0x' || substring(sha256(CAST(id_a AS VARCHAR)),
      |          1, 4))::BIGINT % 100 < 90 THEN 'val' ELSE 'test' END) <>
      |      (CASE WHEN ('0x' || substring(sha256(CAST(id_b AS VARCHAR)),
      |          1, 4))::BIGINT % 100 < 80 THEN 'train'
      |        WHEN ('0x' || substring(sha256(CAST(id_b AS VARCHAR)),
      |          1, 4))::BIGINT % 100 < 90 THEN 'val' ELSE 'test' END)
      |      THEN 1 ELSE 0 END AS straddle
      |  FROM jp)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(straddle) AS BIGINT) AS n_straddle,
      |  CAST(sum(straddle) * 10000 // count(*) AS BIGINT) AS straddle_bp
      |FROM lab GROUP BY 1 ORDER BY decile""".stripMargin,
    "q471_grpo_advantage" -> """
      |WITH r AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS r
      |  FROM events WHERE value IS NOT NULL AND value >= 0),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(CAST(sum(r) AS HUGEINT) * 1000 // count(*) AS BIGINT)
      |      AS mean_milli
      |  FROM r GROUP BY 1),
      |d AS (
      |  SELECT r.event_type, m.n, m.mean_milli,
      |    r.r * 1000 - m.mean_milli AS dev
      |  FROM r JOIN m ON r.event_type = m.event_type),
      |s AS (
      |  SELECT event_type, n, mean_milli,
      |    CAST(CAST(sum(abs(dev)) AS HUGEINT) // count(*) AS BIGINT)
      |      AS mad_milli
      |  FROM d GROUP BY 1, 2, 3)
      |SELECT d.event_type, CAST(s.n AS BIGINT) AS n, s.mean_milli,
      |  s.mad_milli,
      |  CAST(sum(CASE WHEN abs(d.dev) > 2 * s.mad_milli THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS clip_bp
      |FROM d JOIN s ON d.event_type = s.event_type
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "q472_bbit_minhash" -> s"""
      |WITH $corpusSql,
      |$shinglesSql,
      |freq AS (SELECT s, count(*) AS c FROM sh GROUP BY 1),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
      |    max(CASE WHEN f.c <= 256 THEN 1 ELSE 0 END) AS has_kept
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN freq f ON f.s = a.s
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT id_a, id_b,
      |    inter * 10000 // (sa.n + sb.n - inter) AS exact_bp
      |  FROM cand
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE 2 * inter >= sa.n + sb.n - inter AND has_kept = 1),
      |sigs AS (
      |  SELECT doc_id, d * 8 + j AS i,
      |    min(('0x' || substring(hx, 1 + 8 * j, 8))::BIGINT) AS mh
      |  FROM (SELECT doc_id, d,
      |          sha256(CAST(d AS VARCHAR) || ':' || s) AS hx
      |        FROM sh CROSS JOIN
      |          (SELECT unnest(generate_series(0, 3)) AS d) pd) t
      |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) pj
      |  GROUP BY 1, 2),
      |est AS (
      |  SELECT id_a, id_b, exact_bp,
      |    sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS mfull,
      |    sum(CASE WHEN a.mh % 2 = b.mh % 2 THEN 1 ELSE 0 END) AS m1
      |  FROM jp
      |  JOIN sigs a ON a.doc_id = id_a
      |  JOIN sigs b ON b.doc_id = id_b AND b.i = a.i
      |  GROUP BY 1, 2, 3),
      |er AS (
      |  SELECT least(exact_bp // 1000, 9) AS decile,
      |    abs(mfull * 10000 // 32 - exact_bp) AS efull,
      |    abs(greatest((m1 * 2 - 32) * 10000 // 32, 0) - exact_bp) AS e1
      |  FROM est)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(CAST(sum(efull) AS HUGEINT) // count(*) AS BIGINT)
      |    AS mae_full_bp,
      |  CAST(CAST(sum(e1) AS HUGEINT) // count(*) AS BIGINT)
      |    AS mae_1bit_bp
      |FROM er GROUP BY 1 ORDER BY decile""".stripMargin,
    "q473_curation_roi" -> """
      |WITH bins AS (
      |  SELECT (length(text) % 997) // 10 AS bin,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_chars) AS BIGINT) AS chars,
      |    CAST(sum(length(text) % 997) AS BIGINT) AS ssc
      |  FROM documents GROUP BY 1)
      |SELECT CAST(bin AS BIGINT) AS bin, n_docs, chars,
      |  CAST(sum(n_docs) OVER wdesc AS BIGINT) AS cum_docs,
      |  CAST(sum(chars) OVER wdesc AS BIGINT) AS cum_chars,
      |  CAST(CAST(sum(ssc) OVER wdesc AS HUGEINT) * 1000
      |    // (sum(n_docs) OVER wdesc) AS BIGINT) AS cum_mean_score_milli
      |FROM bins
      |WINDOW wdesc AS (ORDER BY bin DESC
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY bin DESC""".stripMargin,
    "q474_length_bias" -> """
      |SELECT source, CAST(count(*) AS BIGINT) AS n,
      |  CAST(((count(*) * sum(CAST(n_chars AS HUGEINT)
      |      * (length(text) % 997))
      |    - sum(CAST(n_chars AS HUGEINT))
      |      * sum(CAST(length(text) % 997 AS HUGEINT))) * 1000000)
      |    // NULLIF(count(*) * sum(CAST(n_chars AS HUGEINT) * n_chars)
      |    - sum(CAST(n_chars AS HUGEINT)) * sum(CAST(n_chars AS HUGEINT)),
      |      0) AS BIGINT) AS slope_micro
      |FROM documents GROUP BY source ORDER BY source""".stripMargin)

  /** q466's oracle: the same unrolled factor chains, generated from one
    * list of k values so Spark and DuckDB can never drift. */
  private def passAtKSql: String = {
    val arms = Seq(1, 5, 10).map { k =>
      val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
      val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_tasks,
         |  CAST(CAST(sum(pass_ppm) AS HUGEINT) * 1 // count(*) AS BIGINT)
         |    AS mean_pass_ppm,
         |  CAST(min(pass_ppm) AS BIGINT) AS min_pass_ppm,
         |  CAST(max(pass_ppm) AS BIGINT) AS max_pass_ppm
         |FROM (SELECT 1000000 - CAST(greatest(CAST($num AS HUGEINT), 0)
         |    * 1000000 // ($den) AS BIGINT) AS pass_ppm
         |  FROM t WHERE n >= $k) a""".stripMargin
    }
    s"""WITH s AS (
       |  SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS rk
       |  FROM events WHERE user_id IS NOT NULL),
       |t AS (
       |  SELECT user_id, count(*) AS n,
       |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
       |  FROM s WHERE rk <= 50 GROUP BY 1)
       |${arms.mkString("\n", "\nUNION ALL\n", "\n")}ORDER BY k""".stripMargin
  }
}
