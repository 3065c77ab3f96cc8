package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Inference, Preference}

/** Preference-data production + inference-log analytics — the round-9
  * additions the round-8 verdict asked for: the DATA side of RLHF
  * (the eval side exists: Bradley–Terry q393, Copeland q383, GRPO q471)
  * and the serving-log readouts next to q432's static prefix sharing and
  * q482's LPT packing planner. Synthetic mapping: a user's events are
  * candidate responses to that "prompt" (amounts = reward scores,
  * event_type = the generating model/policy arm, props.k = token
  * count), annotators are event_id mod 5. Every statistic exact-integer
  * with a DuckDB twin; PrefQueriesSpec pins the formulas against
  * independent computations on synthetic fixtures.
  */
object PrefQueries {

  private def cents = expr("CAST(round(value * 100) AS BIGINT)")
  private def tokK = get_json_object(col("props"), "$.k").cast("long")

  // ------------------------------------------------ q483 DPO pairs

  /** DPO pair construction with the position-debias audit
    * ([[graft.etl.Preference.dpoPairs]]): per prompt (user) the
    * max-score response is chosen, the min-score rejected (min-id
    * tiebreaks, strict margin required), then per chosen ARM
    * (event_type): pair count, mean margin, and the share of pairs
    * where the chosen response was SHOWN FIRST — the position-bias
    * number (≫5000 bp means the "preference" is really a position
    * artifact and the pair set needs debiasing before DPO sees it). */
  def q483DpoPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"value".isNotNull)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("us"), cents.as("c"))
    val pairs = Preference.dpoPairs(e, "user_id", "event_id", "c")
    val ch = e.select($"event_id".as("chosen_id"),
      $"event_type".as("chosen_type"), $"us".as("chosen_us"))
    val rj = e.select($"event_id".as("rejected_id"), $"us".as("rejected_us"))
    pairs.join(ch, "chosen_id").join(rj, "rejected_id")
      .groupBy($"chosen_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(CAST(sum(cmax - cmin) AS DECIMAL(38,0)) * 1000 " +
          "div count(1) AS BIGINT)").as("margin_milli"),
        expr("sum(CASE WHEN chosen_us < rejected_us THEN 1 ELSE 0 END) " +
          "* 10000 div count(1)").as("chosen_first_bp"))
      .orderBy($"chosen_type")
  }

  // ------------------------------------ q484 preference transitivity

  /** Preference transitivity-violation rate: per prompt each arm's best
    * score, majority direction per arm pair
    * ([[graft.etl.Preference.majorityEdges]]), then the share of
    * 3-arm triangles that CYCLE (a≻b≻c≻a) — the standard consistency
    * audit before fitting any Bradley–Terry/reward model (a high rate
    * means the comparisons don't admit a total order and BT residuals
    * will be structural, not noise). The per-prompt fan-out is C(5,2)
    * pairs; everything after the pair aggregate is a broadcast-size
    * tournament table, and each directed 3-cycle is counted 3× by the
    * rotation join then divided out exactly. */
  def q484PrefTransitivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // event_type NOT NULL: a NULL arm would count in the Spark-side
    // distinct-rows n_types but not in DuckDB's count(DISTINCT) — the
    // q465-class cross-engine NULL asymmetry (it also can't pair: NULL
    // never satisfies the a < b join)
    val ut = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull)
      .select($"user_id", $"event_type", cents.as("c"))
    val edges = Preference.majorityEdges(ut, "user_id", "event_type", "c")
      .localCheckpoint() // tiny (≤ C(5,2) rows); pins one plan for 5 reuses
    val und = edges.select(least($"src", $"dst").as("a"),
      greatest($"src", $"dst").as("b"))
    // explicit broadcast: localCheckpoint erases size stats, and without
    // them the <= C(5,2)-row tournament joins would plan as sort-merges
    val tri = und.as("e1")
      .join(broadcast(und.as("e2")), col("e2.a") === col("e1.b"))
      .join(broadcast(und.as("e3")),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val cyc = edges.as("d1")
      .join(broadcast(edges.as("d2")), col("d2.src") === col("d1.dst"))
      .join(broadcast(edges.as("d3")),
        col("d3.src") === col("d2.dst") && col("d3.dst") === col("d1.src"))
      .agg((count(lit(1)) / 3).cast("long").as("n_cyclic"))
    val nt = ut.select($"event_type").distinct()
      .agg(count(lit(1)).as("n_types"))
    val ne = edges.agg(count(lit(1)).as("n_edges"))
    nt.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .crossJoin(broadcast(cyc))
      .withColumn("violation_bp", expr(
        "CASE WHEN n_triangles > 0 " +
          "THEN n_cyclic * 10000 div n_triangles ELSE 0 END"))
  }

  // ------------------------------------ q485 annotator agreement/drift

  /** Annotator-vs-gold agreement with temporal drift: items are users,
    * annotators event_id mod 5, labels event_type; gold = majority label
    * with min-label tiebreak ([[graft.etl.Preference.majorityLabel]]).
    * Per annotator: overall agreement, agreement in the early vs late
    * half of the time span (split at the µs midpoint), and the drift
    * delta — the audit that catches an annotator (or a labeling model
    * version) degrading mid-campaign, composing the same consensus
    * machinery Krippendorff's alpha (q357 family) scores globally. */
  def q485AnnotatorDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .select($"user_id".as("item"), ($"event_id" % 5).as("ann"),
        $"event_type".as("label"), unix_micros($"ts").as("us"))
    val gold = Preference.majorityLabel(a, "item", "label")
      .select($"item", $"gold")
    val mid = broadcast(a.agg(
      expr("min(us) + (max(us) - min(us)) div 2").as("_mid")))
    a.join(gold, "item").crossJoin(mid)
      .groupBy($"ann")
      .agg(count(lit(1)).as("n"),
        sum(when($"label" === $"gold", 1L).otherwise(0L)).as("_ag"),
        sum(when($"us" <= $"_mid", 1L).otherwise(0L)).as("_ne"),
        sum(when($"us" <= $"_mid" && $"label" === $"gold", 1L)
          .otherwise(0L)).as("_age"),
        sum(when($"us" > $"_mid", 1L).otherwise(0L)).as("_nl"),
        sum(when($"us" > $"_mid" && $"label" === $"gold", 1L)
          .otherwise(0L)).as("_agl"))
      .select($"ann", $"n",
        expr("_ag * 10000 div n").as("agree_bp"),
        expr("CASE WHEN _ne > 0 THEN _age * 10000 div _ne END")
          .as("agree_early_bp"),
        expr("CASE WHEN _nl > 0 THEN _agl * 10000 div _nl END")
          .as("agree_late_bp"),
        expr("CASE WHEN _ne > 0 AND _nl > 0 THEN " +
          "_agl * 10000 div _nl - _age * 10000 div _ne END").as("drift_bp"))
      .orderBy($"ann")
  }

  // ------------------------------------------- q486 format-bias screen

  /** Reward-model format-bias screen, length-controlled: documents
    * stratified into length buckets, and WITHIN each bucket the mean
    * reward (the q475-convention stand-in score n_chars mod 997) of docs
    * carrying a format feature vs not — the regression that separates
    * "the RM likes lists/markdown" from "the RM likes length" (length
    * alone is q474). The feature here is presence of the token 'table'
    * (the synthetic corpus has no markdown; a real corpus plugs
    * markdown/list markers into the same machinery). One shuffle. */
  def q486FormatBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(expr("least(n_chars div 64, 9)").as("bucket"),
        ($"n_chars" % 997).as("r"),
        when($"text".contains("table"), 1L).otherwise(0L).as("f"))
      .groupBy($"bucket")
      .agg(sum($"f").as("n_with"),
        (count(lit(1)) - sum($"f")).as("n_without"),
        sum(when($"f" === 1, $"r").otherwise(0L)).as("_rw"),
        sum(when($"f" === 0, $"r").otherwise(0L)).as("_ro"))
      .select($"bucket", $"n_with", $"n_without",
        expr("CASE WHEN n_with > 0 THEN _rw * 1000 div n_with END")
          .as("mean_with_milli"),
        expr("CASE WHEN n_without > 0 THEN _ro * 1000 div n_without END")
          .as("mean_without_milli"),
        expr("CASE WHEN n_with > 0 AND n_without > 0 THEN " +
          "_rw * 1000 div n_with - _ro * 1000 div n_without END")
          .as("gap_milli"))
      .orderBy($"bucket")
  }

  // ------------------------------------------ q487 KV prefix hit rate

  /** The (level, LRU horizon) grid for q487: prompt prefixes at three
    * depths (arm; arm+coarse token bucket; arm+exact token count) ×
    * three cache horizons. */
  private[queries] val kvLevels = Seq(1, 2, 3)
  private[queries] val kvHorizonsSec = Seq(60L, 600L, 3600L)

  /** KV-cache prefix-hit-rate over the time-ordered request log
    * ([[graft.etl.Inference.prefixHitRate]]): a request hits if the
    * same prefix was served within the LRU horizon. Three prefix depths
    * × three horizons — the grid a serving team reads to size cache TTL
    * (hit rate vs horizon) and to decide how much prefix granularity
    * the router should key on. q432's prefix_sharing is the static-
    * corpus ceiling; this is what the cache would actually have hit.
    * Each cell is one (prefix, horizon-bucket)-keyed window + aggregate
    * — never a one-task enum sort (the bucketed spelling exists exactly
    * because depth-1 prefixes are a 5-value enum). */
  def q487KvPrefixHits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter($"event_type".isNotNull && tokK.isNotNull)
      .select($"event_id", unix_micros($"ts").as("us"), $"event_type",
        tokK.as("k"))
      .localCheckpoint() // 9 grid cells re-read this; pin one scan
    def pfx(level: Int) = level match {
      case 1 => $"event_type"
      case 2 => concat($"event_type", lit(":"), expr("k div 10"))
      case 3 => concat($"event_type", lit(":"), $"k")
    }
    val cells = for (l <- kvLevels; h <- kvHorizonsSec) yield {
      Inference.prefixHitRate(base, pfx(l), "us", "event_id", h * 1000000L)
        .agg(count(lit(1)).as("n"),
          sum(when($"hit", 1L).otherwise(0L)).as("hits"))
        .select(lit(l.toLong).as("level"), lit(h).as("horizon_s"),
          $"n", $"hits", expr("hits * 10000 div n").as("hit_bp"))
    }
    cells.reduce(_ unionByName _).orderBy($"level", $"horizon_s")
  }

  // ------------------------------------------- q488 batch packing

  /** Measured dynamic-batching utilization
    * ([[graft.etl.Inference.windowPacking]]): requests batched per
    * (arm, 1h arrival window), capacity 128 tokens per compute wave.
    * Per arm: batches, requests, wave utilization, and padding waste
    * (every request padded to its batch max). q482's LPT planner says
    * what a perfect packer could do with the same volume; the gap
    * between these two tables is the scheduling headroom. */
  def q488BatchPacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter(tokK.isNotNull)
      .select($"event_type", unix_micros($"ts").as("us"), tokK.as("k"))
    Inference.windowPacking(base, "event_type", "us", "k",
        windowUs = 3600000000L, capacity = 128L)
      .orderBy($"event_type")
  }

  // ------------------------------------ q489 speculative acceptance

  /** Speculative-decoding acceptance analytics: requests (users) draft
    * up to 8 tokens (their first 8 events in time order); a draft is
    * accepted while the event is non-error, and the first error rejects
    * the rest of the window (the verify-model contract). Per position
    * k: how many requests drafted ≥k, the marginal acceptance rate at
    * position k, and the survival rate L ≥ k (L = accepted run length)
    * — the curve that sizes the draft window: expected accepted length
    * is Σ_k surv_bp/10⁴, and the window should end where survival
    * collapses. One high-cardinality (request) rank window + two
    * bounded-domain aggregates; the survival suffix-sum runs as a
    * 9×8-row broadcast inequality join, never a global window. */
  def q489SpecDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val drafts = Tables.events(spark, dir)
      .filter($"user_id".isNotNull)
      .withColumn("k", row_number().over(w))
      .filter($"k" <= 8)
      .select($"user_id", $"k".cast("long").as("k"),
        ($"event_type" =!= "error").as("acc"))
    val marginal = drafts.groupBy($"k")
      .agg(count(lit(1)).as("n_at_k"),
        expr("sum(CASE WHEN acc THEN 1 ELSE 0 END) * 10000 div count(1)")
          .as("acc_bp"))
    val runs = drafts.groupBy($"user_id")
      .agg(coalesce(min(when(!$"acc", $"k")) - 1L, max($"k")).as("len"))
    val total = broadcast(runs.agg(count(lit(1)).as("_n")))
    val hist = runs.groupBy($"len").agg(count(lit(1)).as("_c"))
    val surv = broadcast(hist).as("h")
      .join(broadcast(marginal.select($"k").distinct()).as("g"),
        col("h.len") >= col("g.k"))
      .groupBy(col("g.k").as("k")).agg(sum(col("h._c")).as("_ge"))
    marginal.join(surv, "k").crossJoin(total)
      .select($"k", $"n_at_k", $"acc_bp",
        expr("_ge * 10000 div _n").as("surv_bp"))
      .orderBy($"k")
  }

  // ------------------------------------------ q490 FIFO queue replay

  /** FIFO queueing replay ([[graft.etl.Inference.fifoReplay]]): one
    * server per (arm, day), requests served in arrival order, service
    * demand (k+1) seconds — the capacity what-if over the request log
    * (would yesterday's traffic have queued on one replica?). Per arm:
    * requests, share delayed, mean and max queueing wait. The Lindley
    * recurrence rides its max-plus closed form on the two-phase
    * primitives — prefix service-sum plus running max of
    * (arrival − prior service mass) — so the replay is exact AND never
    * a one-task-per-key sort; the DuckDB twin replays the same closed
    * form with plain windows. */
  def q490QueueReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter($"event_type".isNotNull && tokK.isNotNull)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        unix_micros($"ts").as("us"), $"event_id",
        ((tokK + 1L) * 1000000L).as("s_us"))
    Inference.fifoReplay(base, Seq("event_type", "d"), "us", "event_id",
        "s_us")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        expr("sum(CASE WHEN wait_us > 0 THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("delayed_bp"),
        expr("CAST(CAST(sum(wait_us) AS DECIMAL(38,0)) div count(1) " +
          "AS BIGINT)").as("mean_wait_us"),
        max($"wait_us").as("max_wait_us"))
      .orderBy($"event_type")
  }

  // ------------------------------------------ q513 BT fit residuals

  /** Per-arm Bradley–Terry residual diagnostics
    * ([[graft.etl.Stats.btResiduals]]) over the SAME per-prompt duels as
    * q484: the q484 cycle rate says the comparisons admit no total
    * order; this says WHERE the 2-step quantized BT fit breaks — per
    * arm, games, wins, the fit's expected wins (milli), the L1 residual
    * and its per-game rate (bp). An arm at the center of the cyclic
    * sub-tournament reads high resid_bp; arms the order explains read
    * near 0. Duels: within each prompt (user) every ordered arm pair
    * with a strict best-score margin. */
  def q513BtResiduals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ut = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"value".isNotNull &&
        $"event_type".isNotNull)
      .groupBy($"user_id", $"event_type")
      .agg(max(cents).as("s"))
    val duels = ut.as("x").join(ut.as("y"),
        col("y.user_id") === col("x.user_id") &&
          col("x.event_type") < col("y.event_type") &&
          col("x.s") =!= col("y.s"))
      .select(
        when(col("x.s") > col("y.s"), col("x.event_type"))
          .otherwise(col("y.event_type")).as("w"),
        when(col("x.s") > col("y.s"), col("y.event_type"))
          .otherwise(col("x.event_type")).as("l"))
    graft.etl.Stats.btResiduals(duels, "w", "l", iters = 2)
      .orderBy($"item")
  }

  // --------------------------------------- q514 Krippendorff LOO alpha

  /** Krippendorff's alpha with the leave-one-annotator-out grid
    * ([[graft.etl.Preference.krippendorffAlpha]]) over the q485
    * item/annotator/label mapping: the full-panel row (excl = −1) is
    * the chance-corrected agreement the campaign reports; each LOO row
    * re-scores the panel without one annotator — the annotator whose
    * removal RAISES alpha is the one dragging consensus down, the
    * targeted version of q485's drift screen. All divisions floored,
    * engine-exact. */
  def q514KrippendorffLoo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"event_type".isNotNull)
      .select($"user_id".as("item"), ($"event_id" % 5).as("ann"),
        $"event_type".as("label"))
    Preference.krippendorffAlpha(a, "item", "ann", "label",
        exclGrid = -1L to 4L)
      .orderBy($"excl")
  }

  // --------------------------------------- q516 rejection-sampling yield

  /** Threshold grid for the rejection-sampling yield ladder (cents). */
  private[queries] val RsTaus = Seq(1000L, 2500L, 5000L, 10000L)

  /** Rejection-sampling yield ladder
    * ([[graft.etl.Preference.rejectionYield]]): per (arm, reward
    * threshold τ) the keep rate, draws-per-kept (milli) and total
    * tokens drawn per kept sample — the table a synthetic-data budget
    * is planned from (rejected drafts still burn inference tokens). */
  def q516RejectionYield(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"event_type".isNotNull && $"value".isNotNull &&
        $"value" >= 0 && tokK.isNotNull)
      .select($"event_type", cents.as("c"), tokK.as("k"))
    Preference.rejectionYield(e, "event_type", "c", "k", RsTaus)
      .orderBy($"arm", $"tau")
  }

  // ------------------------------------ q517 teacher-confidence audit

  /** Teacher-confidence distillation audit
    * ([[graft.etl.Preference.teacherConfidence]]) on the q485 mapping:
    * ratings bucketed by their item's gold-vote-share quartile; per
    * bucket the agreement of individual labels with gold. A rising
    * agree_bp curve validates confidence-weighted distillation. */
  def q517TeacherConfidence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"event_type".isNotNull)
      .select($"user_id".as("item"), $"event_type".as("label"))
    Preference.teacherConfidence(a, "item", "label")
      .orderBy($"conf_bucket")
  }

  // ------------------------------------- q518 self-consistency curve

  /** Self-consistency sampling curve
    * ([[graft.etl.Preference.selfConsistency]]): per sample budget
    * k ∈ {1, 3, 5}, the majority-vote share, unanimity rate, and the
    * early-stopping agreement with the full 5-sample majority, over the
    * prompts (users) carrying all 5 samples. */
  def q518SelfConsistency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"event_type".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    Preference.selfConsistency(e, "user_id", "event_type",
        Seq($"ts", $"event_id"), ks = Seq(1L, 3L, 5L))
      .orderBy($"k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q513_bt_residuals" -> q513BtResiduals _,
    "q514_krippendorff_loo" -> q514KrippendorffLoo _,
    "q516_rejection_yield" -> q516RejectionYield _,
    "q517_teacher_confidence" -> q517TeacherConfidence _,
    "q518_self_consistency" -> q518SelfConsistency _,
    "q490_queue_replay" -> q490QueueReplay _,
    "q489_spec_decode" -> q489SpecDecode _,
    "q483_dpo_pairs" -> q483DpoPairs _,
    "q484_pref_transitivity" -> q484PrefTransitivity _,
    "q485_annotator_drift" -> q485AnnotatorDrift _,
    "q486_format_bias" -> q486FormatBias _,
    "q487_kv_prefix_hits" -> q487KvPrefixHits _,
    "q488_batch_packing" -> q488BatchPacking _)

  private val kvCellSql: String = {
    def pfxSql(l: Int) = l match {
      case 1 => "event_type"
      case 2 => "event_type || ':' || CAST(k // 10 AS VARCHAR)"
      case 3 => "event_type || ':' || CAST(k AS VARCHAR)"
    }
    (for (l <- kvLevels; h <- kvHorizonsSec) yield s"""
      |SELECT CAST($l AS BIGINT) AS level, CAST($h AS BIGINT) AS horizon_s,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN prev >= us - ${h}000000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS hits,
      |  CAST(sum(CASE WHEN prev >= us - ${h}000000 THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS hit_bp
      |FROM (
      |  SELECT us, max(us) OVER (PARTITION BY ${pfxSql(l)}
      |    ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      |  FROM kvbase)""".stripMargin).mkString("\nUNION ALL\n")
  }

  val oracleSql: Map[String, String] = Map(
    "q516_rejection_yield" -> s"""
      |WITH e AS (
      |  SELECT event_type AS arm, CAST(round(value * 100) AS BIGINT) AS c,
      |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND value >= 0
      |    AND json_extract_string(props, '$$.k') IS NOT NULL),
      |g AS (SELECT unnest(ARRAY[${RsTaus.mkString(",")}]) AS tau),
      |per AS (
      |  SELECT arm, tau, count(*) AS n_drawn,
      |    sum(CASE WHEN c >= tau THEN 1 ELSE 0 END) AS n_kept,
      |    sum(k) AS tok
      |  FROM e, g GROUP BY 1, 2)
      |SELECT arm, CAST(tau AS BIGINT) AS tau,
      |  CAST(n_drawn AS BIGINT) AS n_drawn,
      |  CAST(n_kept AS BIGINT) AS n_kept,
      |  CAST(n_kept * 10000 // n_drawn AS BIGINT) AS keep_bp,
      |  CAST(CASE WHEN n_kept > 0 THEN n_drawn * 1000 // n_kept END
      |    AS BIGINT) AS draws_per_keep_milli,
      |  CAST(CASE WHEN n_kept > 0 THEN tok // n_kept END AS BIGINT)
      |    AS tokens_per_keep
      |FROM per ORDER BY arm, tau""".stripMargin,
    "q517_teacher_confidence" -> """
      |WITH a AS (
      |  SELECT user_id AS item, event_type AS label FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |counts AS (
      |  SELECT item, label, count(*) AS n FROM a GROUP BY 1, 2),
      |m AS (SELECT item, sum(n) AS m, max(n) AS nmax
      |      FROM counts GROUP BY 1),
      |gold AS (
      |  SELECT c.item, m.m, m.nmax, min(c.label) AS gold
      |  FROM counts c JOIN m ON m.item = c.item AND c.n = m.nmax
      |  GROUP BY 1, 2, 3),
      |j AS (
      |  SELECT least(g.nmax * 4 // g.m, 3) AS conf_bucket, a.item,
      |    CASE WHEN a.label = g.gold THEN 1 ELSE 0 END AS ag
      |  FROM a JOIN gold g ON g.item = a.item)
      |SELECT CAST(conf_bucket AS BIGINT) AS conf_bucket,
      |  CAST(count(DISTINCT item) AS BIGINT) AS n_items,
      |  CAST(count(*) AS BIGINT) AS n_ratings,
      |  CAST(sum(ag) * 10000 // count(*) AS BIGINT) AS agree_bp
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q518_self_consistency" -> """
      |WITH s AS (
      |  SELECT user_id AS p, rn, event_type AS label FROM (
      |    SELECT user_id, event_type, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |    FROM events WHERE user_id IS NOT NULL
      |      AND event_type IS NOT NULL)
      |  WHERE rn <= 5),
      |g AS (SELECT unnest(ARRAY[1, 3, 5]) AS k),
      |votes AS (
      |  SELECT k, p, label, count(*) AS v
      |  FROM s, g WHERE rn <= k GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT k, p, sum(v) AS m, max(v) AS vmax
      |  FROM votes GROUP BY 1, 2 HAVING sum(v) = k),
      |maj AS (
      |  SELECT v.k, v.p, m.m, m.vmax, min(v.label) AS maj
      |  FROM votes v JOIN m ON m.k = v.k AND m.p = v.p AND v.v = m.vmax
      |  GROUP BY 1, 2, 3, 4),
      |mx AS (SELECT p, maj AS majmax FROM maj WHERE k = 5)
      |SELECT CAST(maj.k AS BIGINT) AS k,
      |  CAST(count(*) AS BIGINT) AS n_prompts,
      |  CAST(sum(maj.vmax * 10000 // maj.m) // count(*) AS BIGINT)
      |    AS mean_major_share_bp,
      |  CAST(sum(CASE WHEN maj.vmax = maj.m THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS unanimous_bp,
      |  CAST(sum(CASE WHEN maj.maj = mx.majmax THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS match_full_bp
      |FROM maj JOIN mx ON mx.p = maj.p
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q513_bt_residuals" -> """
      |WITH ut AS (
      |  SELECT user_id, event_type,
      |    max(CAST(round(value * 100) AS BIGINT)) AS s
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |pr AS (
      |  SELECT CASE WHEN x.s > y.s THEN x.event_type ELSE y.event_type END
      |      AS w,
      |    CASE WHEN x.s > y.s THEN y.event_type ELSE x.event_type END AS l
      |  FROM ut x JOIN ut y ON y.user_id = x.user_id
      |    AND x.event_type < y.event_type AND x.s <> y.s),
      |pair AS (
      |  SELECT least(w, l) AS a, greatest(w, l) AS b,
      |    CAST(count(*) AS BIGINT) AS n_ab,
      |    CAST(sum(CASE WHEN w < l THEN 1 ELSE 0 END) AS BIGINT) AS w_a
      |  FROM pr GROUP BY 1, 2),
      |wn AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS wins
      |       FROM pr GROUP BY 1),
      |gm AS (SELECT item, CAST(count(*) AS BIGINT) AS games FROM
      |       (SELECT w AS item FROM pr UNION ALL SELECT l FROM pr)
      |       GROUP BY 1),
      |base AS (SELECT gm.item, coalesce(wn.wins, 0) AS wins, gm.games
      |         FROM gm LEFT JOIN wn USING (item)),
      |s0 AS (SELECT item, CAST(1000000 AS HUGEINT) AS s FROM base),
      |t1 AS (
      |  SELECT pair.a, pair.b,
      |    CAST(n_ab AS HUGEINT) * 1000000000 // (sa.s + sb.s) AS tq
      |  FROM pair JOIN s0 sa ON sa.item = pair.a
      |            JOIN s0 sb ON sb.item = pair.b),
      |d1 AS (SELECT item, sum(tq) AS den FROM
      |       (SELECT a AS item, tq FROM t1 UNION ALL SELECT b, tq FROM t1)
      |       GROUP BY 1),
      |r1 AS (
      |  SELECT base.item,
      |    coalesce(CAST(wins AS HUGEINT) * 1000000000 // den, 0) AS raw
      |  FROM base LEFT JOIN d1 USING (item)),
      |n1 AS (SELECT sum(raw) AS tot, CAST(count(*) AS HUGEINT) AS n FROM r1),
      |s1 AS (SELECT item, CAST(raw AS HUGEINT) * n * 1000000
      |         // NULLIF(tot, 0) AS s FROM r1, n1),
      |t2 AS (
      |  SELECT pair.a, pair.b,
      |    CAST(n_ab AS HUGEINT) * 1000000000 // (sa.s + sb.s) AS tq
      |  FROM pair JOIN s1 sa ON sa.item = pair.a
      |            JOIN s1 sb ON sb.item = pair.b),
      |d2 AS (SELECT item, sum(tq) AS den FROM
      |       (SELECT a AS item, tq FROM t2 UNION ALL SELECT b, tq FROM t2)
      |       GROUP BY 1),
      |r2 AS (
      |  SELECT base.item,
      |    coalesce(CAST(wins AS HUGEINT) * 1000000000 // den, 0) AS raw
      |  FROM base LEFT JOIN d2 USING (item)),
      |n2 AS (SELECT sum(raw) AS tot, CAST(count(*) AS HUGEINT) AS n FROM r2),
      |s2 AS (SELECT item, CAST(raw AS HUGEINT) * n * 1000000
      |         // NULLIF(tot, 0) AS s FROM r2, n2),
      |e AS (
      |  SELECT pair.a, pair.b, pair.n_ab, pair.w_a,
      |    CASE WHEN sa.s + sb.s > 0 THEN
      |      CAST(n_ab AS HUGEINT) * sa.s * 1000 // (sa.s + sb.s) END AS e_a,
      |    CASE WHEN sa.s + sb.s > 0 THEN
      |      CAST(n_ab AS HUGEINT) * sb.s * 1000 // (sa.s + sb.s) END AS e_b
      |  FROM pair JOIN s2 sa ON sa.item = pair.a
      |            JOIN s2 sb ON sb.item = pair.b),
      |sides AS (
      |  SELECT a AS item, n_ab, w_a AS w, e_a AS e FROM e
      |  UNION ALL
      |  SELECT b, n_ab, n_ab - w_a, e_b FROM e)
      |SELECT item, CAST(sum(n_ab) AS BIGINT) AS games,
      |  CAST(sum(w) AS BIGINT) AS wins,
      |  CAST(sum(e) AS BIGINT) AS exp_milli,
      |  CAST(sum(abs(w * 1000 - e)) AS BIGINT) AS resid_milli,
      |  CAST(sum(abs(w * 1000 - e)) * 10 // sum(n_ab) AS BIGINT)
      |    AS resid_bp
      |FROM sides GROUP BY 1 ORDER BY 1""".stripMargin,
    "q514_krippendorff_loo" -> """
      |WITH a AS (
      |  SELECT user_id AS item, event_id % 5 AS ann, event_type AS label
      |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      |g AS (SELECT unnest(ARRAY[-1, 0, 1, 2, 3, 4]) AS excl),
      |r AS (SELECT excl, item, ann, label FROM a, g WHERE ann <> excl),
      |cl AS (
      |  SELECT excl, item, label, count(*) AS nil
      |  FROM r GROUP BY 1, 2, 3),
      |per_item AS (
      |  SELECT excl, item, sum(nil) AS m, sum(nil * nil) AS sq
      |  FROM cl GROUP BY 1, 2 HAVING sum(nil) >= 2),
      |pi2 AS (
      |  SELECT excl, item, m,
      |    (CAST(m AS HUGEINT) * m - sq) * 1000000 // (m - 1) AS wdo
      |  FROM per_item),
      |marg AS (
      |  SELECT cl.excl, cl.label, sum(cl.nil) AS nc
      |  FROM cl JOIN per_item p ON p.excl = cl.excl AND p.item = cl.item
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT excl, sum(nc) AS n_ratings, sum(nc * nc) AS sqc
      |  FROM marg GROUP BY 1),
      |obs AS (
      |  SELECT excl, count(*) AS n_items, sum(wdo) AS wdos
      |  FROM pi2 GROUP BY 1),
      |fin AS (
      |  SELECT o.excl, o.n_items, t.n_ratings,
      |    o.wdos // t.n_ratings AS do_ppm,
      |    (CAST(t.n_ratings AS HUGEINT) * t.n_ratings - t.sqc) * 1000000
      |      // (CAST(t.n_ratings AS HUGEINT) * (t.n_ratings - 1)) AS de_ppm
      |  FROM obs o JOIN tot t ON t.excl = o.excl)
      |SELECT CAST(excl AS BIGINT) AS excl,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n_ratings AS BIGINT) AS n_ratings,
      |  CAST(do_ppm AS BIGINT) AS do_ppm,
      |  CAST(de_ppm AS BIGINT) AS de_ppm,
      |  CAST(CASE WHEN de_ppm > 0 THEN
      |    CASE WHEN do_ppm <= de_ppm
      |    THEN (de_ppm - do_ppm) * 1000000 // de_ppm
      |    ELSE -((do_ppm - de_ppm) * 1000000 // de_ppm) END END
      |    AS BIGINT) AS alpha_ppm
      |FROM fin ORDER BY excl""".stripMargin,
    "q490_queue_replay" -> """
      |WITH base AS (
      |  SELECT event_type,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    epoch_us(ts) AS us, event_id,
      |    (CAST(json_extract_string(props, '$.k') AS BIGINT) + 1)
      |      * 1000000 AS s_us
      |  FROM events WHERE event_type IS NOT NULL
      |    AND json_extract_string(props, '$.k') IS NOT NULL),
      |w1 AS (
      |  SELECT event_type, d, us, event_id, s_us,
      |    sum(s_us) OVER (PARTITION BY event_type, d
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
      |  FROM base),
      |w2 AS (
      |  SELECT event_type, us, s_us, S,
      |    max(us - S + s_us) OVER (PARTITION BY event_type, d
      |      ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS M
      |  FROM w1),
      |r AS (SELECT event_type, S + M - us - s_us AS wait_us FROM w2)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN wait_us > 0 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS delayed_bp,
      |  CAST(CAST(sum(wait_us) AS HUGEINT) // count(*) AS BIGINT)
      |    AS mean_wait_us,
      |  CAST(max(wait_us) AS BIGINT) AS max_wait_us
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q489_spec_decode" -> """
      |WITH d AS (
      |  SELECT user_id, k,
      |    (event_type <> 'error') AS acc
      |  FROM (
      |    SELECT user_id, event_type,
      |      row_number() OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS k
      |    FROM events WHERE user_id IS NOT NULL)
      |  WHERE k <= 8),
      |marginal AS (
      |  SELECT k, count(*) AS n_at_k,
      |    sum(CASE WHEN acc THEN 1 ELSE 0 END) * 10000 // count(*)
      |      AS acc_bp
      |  FROM d GROUP BY 1),
      |runs AS (
      |  SELECT user_id,
      |    coalesce(min(CASE WHEN NOT acc THEN k END) - 1, max(k)) AS len
      |  FROM d GROUP BY 1),
      |total AS (SELECT count(*) AS n FROM runs),
      |hist AS (SELECT len, count(*) AS c FROM runs GROUP BY 1),
      |surv AS (
      |  SELECT m.k, sum(h.c) AS ge
      |  FROM marginal m JOIN hist h ON h.len >= m.k GROUP BY 1)
      |SELECT CAST(m.k AS BIGINT) AS k, CAST(m.n_at_k AS BIGINT) AS n_at_k,
      |  CAST(m.acc_bp AS BIGINT) AS acc_bp,
      |  CAST(s.ge * 10000 // t.n AS BIGINT) AS surv_bp
      |FROM marginal m JOIN surv s ON s.k = m.k, total t
      |ORDER BY k""".stripMargin,
    "q483_dpo_pairs" -> """
      |WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |m AS (
      |  SELECT user_id, max(c) AS cmax, min(c) AS cmin
      |  FROM e GROUP BY 1 HAVING max(c) > min(c)),
      |sel AS (
      |  SELECT e.user_id, m.cmax, m.cmin,
      |    min(CASE WHEN c = cmax THEN event_id END) AS chosen_id,
      |    min(CASE WHEN c = cmin THEN event_id END) AS rejected_id
      |  FROM e JOIN m USING (user_id) GROUP BY 1, 2, 3),
      |p AS (
      |  SELECT s.cmax, s.cmin, ce.event_type AS chosen_type,
      |    ce.us AS chosen_us, re.us AS rejected_us
      |  FROM sel s JOIN e ce ON ce.event_id = s.chosen_id
      |  JOIN e re ON re.event_id = s.rejected_id)
      |SELECT chosen_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(CAST(sum(cmax - cmin) AS HUGEINT) * 1000 // count(*)
      |    AS BIGINT) AS margin_milli,
      |  CAST(sum(CASE WHEN chosen_us < rejected_us THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS chosen_first_bp
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q484_pref_transitivity" -> """
      |WITH ut AS (
      |  SELECT user_id, event_type, max(CAST(round(value * 100) AS BIGINT))
      |    AS s
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT a.event_type AS la, b.event_type AS lb,
      |    sum(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS wa,
      |    sum(CASE WHEN b.s > a.s THEN 1 ELSE 0 END) AS wb
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT CASE WHEN wa > wb THEN la ELSE lb END AS src,
      |    CASE WHEN wa > wb THEN lb ELSE la END AS dst
      |  FROM w WHERE wa <> wb),
      |und AS (
      |  SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
      |tri AS (
      |  SELECT count(*) AS n_triangles
      |  FROM und e1 JOIN und e2 ON e2.a = e1.b
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |cyc AS (
      |  SELECT count(*) // 3 AS n_cyclic
      |  FROM edges d1 JOIN edges d2 ON d2.src = d1.dst
      |  JOIN edges d3 ON d3.src = d2.dst AND d3.dst = d1.src),
      |nt AS (SELECT count(DISTINCT event_type) AS n_types FROM ut),
      |ne AS (SELECT count(*) AS n_edges FROM edges)
      |SELECT CAST(n_types AS BIGINT) AS n_types,
      |  CAST(n_edges AS BIGINT) AS n_edges,
      |  CAST(n_triangles AS BIGINT) AS n_triangles,
      |  CAST(n_cyclic AS BIGINT) AS n_cyclic,
      |  CAST(CASE WHEN n_triangles > 0
      |    THEN n_cyclic * 10000 // n_triangles ELSE 0 END AS BIGINT)
      |    AS violation_bp
      |FROM nt, ne, tri, cyc""".stripMargin,
    "q485_annotator_drift" -> """
      |WITH a AS (
      |  SELECT user_id AS item, event_id % 5 AS ann, event_type AS label,
      |    epoch_us(ts) AS us
      |  FROM events WHERE user_id IS NOT NULL),
      |counts AS (
      |  SELECT item, label, count(*) AS n FROM a GROUP BY 1, 2),
      |top AS (SELECT item, max(n) AS nmax FROM counts GROUP BY 1),
      |gold AS (
      |  SELECT c.item, min(c.label) AS gold
      |  FROM counts c JOIN top t ON c.item = t.item AND c.n = t.nmax
      |  GROUP BY 1),
      |mid AS (SELECT min(us) + (max(us) - min(us)) // 2 AS m FROM a),
      |j AS (
      |  SELECT a.ann, a.label, g.gold, a.us, mid.m
      |  FROM a JOIN gold g ON a.item = g.item, mid)
      |SELECT ann, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN label = gold THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS agree_bp,
      |  CAST(CASE WHEN sum(CASE WHEN us <= m THEN 1 ELSE 0 END) > 0 THEN
      |    sum(CASE WHEN us <= m AND label = gold THEN 1 ELSE 0 END) * 10000
      |    // sum(CASE WHEN us <= m THEN 1 ELSE 0 END) END AS BIGINT)
      |    AS agree_early_bp,
      |  CAST(CASE WHEN sum(CASE WHEN us > m THEN 1 ELSE 0 END) > 0 THEN
      |    sum(CASE WHEN us > m AND label = gold THEN 1 ELSE 0 END) * 10000
      |    // sum(CASE WHEN us > m THEN 1 ELSE 0 END) END AS BIGINT)
      |    AS agree_late_bp,
      |  CAST(CASE WHEN sum(CASE WHEN us <= m THEN 1 ELSE 0 END) > 0
      |    AND sum(CASE WHEN us > m THEN 1 ELSE 0 END) > 0 THEN
      |    sum(CASE WHEN us > m AND label = gold THEN 1 ELSE 0 END) * 10000
      |    // sum(CASE WHEN us > m THEN 1 ELSE 0 END)
      |    - sum(CASE WHEN us <= m AND label = gold THEN 1 ELSE 0 END) * 10000
      |    // sum(CASE WHEN us <= m THEN 1 ELSE 0 END) END AS BIGINT)
      |    AS drift_bp
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q486_format_bias" -> """
      |WITH s AS (
      |  SELECT least(n_chars // 64, 9) AS bucket, n_chars % 997 AS r,
      |    CASE WHEN contains(text, 'table') THEN 1 ELSE 0 END AS f
      |  FROM documents)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(sum(f) AS BIGINT) AS n_with,
      |  CAST(count(*) - sum(f) AS BIGINT) AS n_without,
      |  CAST(CASE WHEN sum(f) > 0 THEN
      |    sum(CASE WHEN f = 1 THEN r ELSE 0 END) * 1000 // sum(f) END
      |    AS BIGINT) AS mean_with_milli,
      |  CAST(CASE WHEN count(*) - sum(f) > 0 THEN
      |    sum(CASE WHEN f = 0 THEN r ELSE 0 END) * 1000
      |    // (count(*) - sum(f)) END AS BIGINT) AS mean_without_milli,
      |  CAST(CASE WHEN sum(f) > 0 AND count(*) - sum(f) > 0 THEN
      |    sum(CASE WHEN f = 1 THEN r ELSE 0 END) * 1000 // sum(f)
      |    - sum(CASE WHEN f = 0 THEN r ELSE 0 END) * 1000
      |    // (count(*) - sum(f)) END AS BIGINT) AS gap_milli
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q487_kv_prefix_hits" -> s"""
      |WITH kvbase AS (
      |  SELECT event_id, epoch_us(ts) AS us, event_type,
      |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
      |  FROM events WHERE event_type IS NOT NULL
      |    AND json_extract_string(props, '$$.k') IS NOT NULL)
      |$kvCellSql
      |ORDER BY level, horizon_s""".stripMargin,
    "q488_batch_packing" -> """
      |WITH base AS (
      |  SELECT event_type, epoch_us(ts) AS us,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL),
      |b AS (
      |  SELECT event_type, us // 3600000000 AS w, count(*) AS n,
      |    sum(k) AS tok, max(k) AS mx
      |  FROM base GROUP BY 1, 2),
      |wv AS (SELECT *, (tok + 127) // 128 AS waves FROM b)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_batches,
      |  CAST(sum(n) AS BIGINT) AS n_requests,
      |  CAST(sum(tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(waves) AS BIGINT) AS waves,
      |  CAST(CASE WHEN sum(waves) > 0 THEN
      |    sum(tok) * 10000 // (sum(waves) * 128) ELSE 0 END
      |    AS BIGINT) AS util_bp,
      |  CAST(CASE WHEN sum(n * mx) > 0 THEN
      |    (sum(n * mx) - sum(tok)) * 10000 // sum(n * mx) ELSE 0 END
      |    AS BIGINT) AS pad_waste_bp
      |FROM wv GROUP BY 1 ORDER BY 1""".stripMargin)
}
