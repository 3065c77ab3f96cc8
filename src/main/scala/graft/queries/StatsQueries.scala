package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Encoding, Stats}

/** Oracle-gated exact-statistics and multidimensional-reporting operators
  * (round 4, q216+): cohort hypothesis tests (Mann–Whitney, KS, runs),
  * stateful balances via the prefix-min window identity, LOCF time-weighted
  * averages, and the ROLLUP / pivot reporting family that was the one
  * remaining uncovered corner of the DataFrame aggregation API.
  *
  * All arithmetic is integral (cents, microseconds, doubled ranks,
  * cross-multiplied CDFs) so the DuckDB re-derivations match hash-exactly.
  */
object StatsQueries {

  /** Event amounts in integer cents, null-safe (both engines drop null
    * values explicitly so rank/window null ordering can never diverge). */
  private def cents = expr("CAST(round(value * 100) AS BIGINT)")

  // ------------------------------------------- q216 Mann-Whitney U

  /** Per-cohort tie-aware Mann–Whitney U ([[Stats.mannWhitneyU]]):
    * does the purchase-amount distribution differ from the click-amount
    * distribution inside each user cohort? Doubled mid-ranks keep ties
    * integral; one shuffle on the cohort key. */
  def q216MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "click") && $"value".isNotNull)
      .select(($"user_id" % 8).as("cohort"),
        when($"event_type" === "purchase", 1).otherwise(2).as("s"),
        cents.as("v"))
    Stats.mannWhitneyU(x, "cohort", "s", "v").orderBy($"cohort")
  }

  // ------------------------------------------- q217 Kolmogorov-Smirnov

  /** Per-cohort two-sample KS distance ([[Stats.ksStatistic]]) between
    * purchase and view amounts, as the exact fraction
    * `d_num / (n1·n2)` plus the argmax value — the drift screen run
    * between a reference window and a fresh batch. */
  def q217KsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "view") && $"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        when($"event_type" === "purchase", 1).otherwise(2).as("s"),
        cents.as("v"))
    Stats.ksStatistic(x, "cohort", "s", "v").orderBy($"cohort")
  }

  // ------------------------------------------- q218 clamped balance

  /** Floor-at-zero running balance per user ([[Stats.clampedBalance]]):
    * purchases/signups credit, other events debit, and the balance can
    * never go negative — the `max(0, prev + delta)` recurrence evaluated
    * as two partitioned window sums (prefix-min identity), then rolled up
    * to final/peak/clamp-count per user. */
  def q218ClampedBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"ts", $"event_id",
        when($"event_type".isin("purchase", "signup"), cents)
          .otherwise(-cents).as("delta"))
    val bal = Stats.clampedBalance(e, "user_id", Seq("ts", "event_id"), "delta")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    bal.withColumn("rn", row_number().over(w))
      .groupBy($"user_id")
      .agg(
        max(when($"rn" === 1, $"balance")).as("final_c"),
        max($"balance").as("peak_c"),
        count(when($"balance" === 0 && $"delta" < 0, lit(1))).as("clamps"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  // ------------------------------------------------------ q219 TWAP

  /** Daily time-weighted average amount per user ([[Stats.timeWeighted]]):
    * each event's value holds until the next event that day (LOCF), the
    * last until midnight; the exact integer quotient Σv·dt div Σdt plus
    * the covered microseconds. The feature a pricing pipeline derives from
    * irregular observations without resampling. */
  def q219Twap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        unix_micros($"ts").as("us"), $"event_id", cents.as("v"))
    Stats.timeWeighted(e, "user_id", "d", "us", "event_id", "v",
        bucketEndUs = ($"d" + 1) * lit(86400000000L))
      .select($"user_id", $"d", expr("num div held_us").as("twap_c"),
        $"held_us")
      .orderBy($"user_id", $"d")
  }

  // -------------------------------------------- q220 revenue rollup

  /** Region → nation revenue ROLLUP with grouping_id: the region/nation/
    * grand-total hierarchy in ONE aggregation pass (Catalyst expands the
    * grouping sets; no self-union of three scans). gid 0 = leaf,
    * 1 = region subtotal, 3 = grand total. */
  def q220RevenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, dir), $"c_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, dir), $"n_regionkey" === $"r_regionkey")
      .select($"r_name", $"n_name",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    df.rollup($"r_name", $"n_name")
      .agg(grouping_id().cast("long").as("gid"),
        sum($"cents").as("revenue_c"), count(lit(1)).as("n_orders"))
      .select(coalesce($"r_name", lit("(all)")).as("region_name"),
        coalesce($"n_name", lit("(all)")).as("nation_name"),
        $"gid", $"revenue_c", $"n_orders")
      .orderBy($"gid", $"region_name", $"nation_name")
  }

  // ---------------------------------------------- q221 daily pivot

  /** Daily event-type pivot: counts spread into one column per type with
    * an EXPLICIT value list (no extra distinct-collection job — the
    * two-pass `pivot(col)` overload is a hidden scan at scale) plus a
    * total; absent cells coalesce to 0. */
  def q221DailyPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("d"), $"event_type")
      .groupBy($"d").pivot("event_type", types).agg(count(lit(1)))
    val filled = types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t"))
    p.select(($"d" +: filled): _*)
      .withColumn("n_total",
        types.map(t => col(s"n_$t")).reduce(_ + _))
      .orderBy($"d")
  }

  // ------------------------------------------------ q222 runs test

  /** Wald–Wolfowitz run counts per user ([[Stats.runCounts]]) over the
    * above/below-€100 sequence of event amounts in time order — the
    * randomness screen whose too-few-runs tail flags feed stickiness.
    * Single-event users report runs = 1. */
  def q222RunsTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"user_id", $"ts", $"event_id", (cents >= 10000L).as("hi"))
    Stats.runCounts(x, "user_id", Seq("ts", "event_id"), "hi")
      .orderBy($"user_id")
  }

  // ------------------------------------------------- q226 cube

  /** Event-type × day-of-week CUBE: all four marginal combinations
    * (leaf, per-type, per-dow, grand) in one Expand pass — the
    * grouping-sets sibling of q220's ROLLUP. dow is `days-since-epoch
    * mod 7` (0 = Thursday), an integer both engines derive identically
    * (SQL DOW numbering conventions differ engine-to-engine). */
  def q226Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_type",
        (datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("dow7"),
        cents.as("v"))
    e.cube($"event_type", $"dow7")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"), sum($"v").as("sum_c"))
      .select(coalesce($"event_type", lit("(all)")).as("etype"),
        coalesce($"dow7", lit(-1L)).as("dow7"), $"gid", $"n", $"sum_c")
      .orderBy($"gid", $"etype", $"dow7")
  }

  // ------------------------------------------- q228 FIFO matching

  /** FIFO allocation of purchase credit against click consumption per
    * user ([[Stats.fifoMatch]]): each click draw is matched against the
    * oldest unconsumed purchase lots, emitted as (supply id, demand id,
    * matched qty) segments. The inventory-costing recurrence with NO
    * sequential state — cumulative-interval intersection, two window
    * passes + one keyed join. */
  def q228FifoMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
    def side(t: String) = e.filter($"event_type" === t)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        cents.as("qty"))
    Stats.fifoMatch(side("purchase"), side("click"),
        "user_id", "event_id", Seq("us", "event_id"), "qty")
      .orderBy($"user_id", $"s_id", $"d_id")
  }

  // ------------------------------------- q231 total variation drift

  /** Total-variation distance between each cohort's event-type mix and
    * cohort 0's, as the exact fraction `Σ|c_i·n0 − c0_i·n| / (2·n·n0)`
    * (numerator reported, scaled tv_bp = 10⁴·TV floored) — the
    * categorical-distribution drift screen beside q217's ordinal KS. Two
    * tiny aggregations; the per-(cohort,type) table is enum-sized. */
  def q231TvDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cell = Tables.events(spark, dir)
      .select(($"user_id" % 4).as("cohort"), $"event_type")
      .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("c"))
    // dense cohort×type grid: a type absent from one side still deviates
    val grid = cell.select($"cohort").distinct()
      .crossJoin(broadcast(cell.select($"event_type").distinct()))
    val full = grid.join(cell, Seq("cohort", "event_type"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
    val ref = full.filter($"cohort" === 0)
      .select($"event_type", $"c".as("c0"))
    val n = full.groupBy($"cohort").agg(sum($"c").as("n"))
    val n0 = n.filter($"cohort" === 0).select($"n".as("n0"))
    full.join(broadcast(ref), Seq("event_type"))
      .join(n, Seq("cohort")).crossJoin(broadcast(n0))
      .withColumn("dev", abs($"c" * $"n0" - $"c0" * $"n"))
      .groupBy($"cohort", $"n", $"n0")
      .agg(sum($"dev").as("tv_num"))
      .select($"cohort", $"n", $"n0", $"tv_num",
        expr("tv_num * 10000 div (2 * n * n0)").as("tv_bp"))
      .orderBy($"cohort")
  }

  // ------------------------------------------- q232 event debounce

  /** Debounce: collapse each burst of same-(user, type) events with ≤5 s
    * inter-arrival gaps to its FIRST event (the islands trick — a gap
    * > 5 s starts a new burst), reporting kept/dropped per user. The
    * at-the-source dedup every clickstream ingest runs; one partitioned
    * window, no self-join. */
  def q232Debounce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"us", $"event_id")
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("first_of_burst",
        coalesce($"us" - lag($"us", 1).over(w) > 5000000L, lit(true)))
    e.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when($"first_of_burst", lit(1))).as("n_kept"),
        count(when(!$"first_of_burst", lit(1))).as("n_dropped"))
      .orderBy($"user_id")
  }

  // ------------------------------------------ q233 Wasserstein-1

  /** Per-cohort earth mover's distance between purchase and view amount
    * distributions ([[Stats.wasserstein1]]): the un-normalized CDF area
    * as the exact integer `w1_num` over `n1·n2` — with q217 (KS max gap)
    * and q231 (TV), the full drift-metric triad. */
  def q233Wasserstein(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "view") && $"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        when($"event_type" === "purchase", 1).otherwise(2).as("s"),
        cents.as("v"))
    Stats.wasserstein1(x, "cohort", "s", "v").orderBy($"cohort")
  }

  // ------------------------------------------------ q239 PSI drift

  /** Population stability index of each cohort's event-type mix against
    * cohort 0 ([[Stats.psiFromCounts]]) — the drift quartet's fourth
    * member beside q217 (KS), q231 (TV), q233 (EMD), and the score a
    * production monitor alarms on first. Histogram upstream (one
    * combiner-friendly groupBy), PSI math on the enum-sized counts table
    * in exact floored-bits integers; cohort 0 vs itself pins the zero. */
  def q239PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cell = Tables.events(spark, dir)
      .select(($"user_id" % 4).as("cohort"), $"event_type")
      .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("c"))
    // dense cohort×type grid: a type absent from one side still shifts mass
    val grid = cell.select($"cohort").distinct()
      .crossJoin(broadcast(cell.select($"event_type").distinct()))
    val full = grid.join(cell, Seq("cohort", "event_type"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
    val ref = full.filter($"cohort" === 0)
      .select($"event_type", $"c".as("c_ref"))
    Stats.psiFromCounts(
        full.join(broadcast(ref), Seq("event_type")),
        "cohort", "event_type", "c_ref", "c")
      .orderBy($"cohort")
  }

  // ------------------------------------- q235 weighted Jaccard

  /** Weighted Jaccard `Σmin(w)/Σmax(w)` between each cohort pair's
    * brand-purchase weight vector — the weighted sibling of q214's set
    * overlap: two cohorts buying the same brands in different PROPORTIONS
    * score below 1. Dense cohort×brand grid (enum-sized), pair join on
    * the brand key only, exact integer sums with floored bp ratio. */
  def q235WeightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cell = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.part(spark, dir), $"p_partkey" === $"l_partkey")
      .select(($"o_custkey" % 4).as("cohort"), $"p_brand")
      .groupBy($"cohort", $"p_brand").agg(count(lit(1)).as("w"))
    val grid = cell.select($"cohort").distinct()
      .crossJoin(broadcast(cell.select($"p_brand").distinct()))
    val full = grid.join(cell, Seq("cohort", "p_brand"), "left")
      .withColumn("w", coalesce($"w", lit(0L)))
    val a = full.select($"cohort".as("ca"), $"p_brand", $"w".as("wa"))
    val b = full.select($"cohort".as("cb"), $"p_brand", $"w".as("wb"))
    a.join(b, Seq("p_brand")).filter($"ca" < $"cb")
      .groupBy($"ca", $"cb")
      .agg(sum(least($"wa", $"wb")).as("min_sum"),
        sum(greatest($"wa", $"wb")).as("max_sum"))
      .select($"ca", $"cb", $"min_sum", $"max_sum",
        expr("min_sum * 10000 div max_sum").as("wj_bp"))
      .orderBy($"ca", $"cb")
  }

  // ------------------------------------ q243 LOO target encoding

  /** Leave-one-out target encoding of market segment against order value
    * ([[Encoding.looTargetEncode]]): each order's segment becomes the mean
    * cents of the segment's OTHER orders, as the exact fraction — the
    * high-cardinality categorical encoder with the label leak removed.
    * Category stats aggregate map-side and broadcast back; no window over
    * a skewed category partition. */
  def q243TargetEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment".as("category"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    Encoding.looTargetEncode(df, "category", "cents")
      .select($"o_orderkey", $"category", $"cents", $"n_cat",
        $"loo_num", $"loo_den")
      .orderBy($"o_orderkey")
  }

  // ------------------------------------------------ q244 McNemar

  /** McNemar discordant-pair test per cohort ([[Stats.mcnemar]]): two
    * deterministic "classifiers" over events scored against the purchase
    * truth flag, reduced to b/c discordant counts and the exact
    * (b−c)²/(b+c) statistic — the paired did-the-model-change test. */
  def q244Mcnemar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select(($"user_id" % 4).as("cohort"),
        ($"event_type" === "purchase").as("truth"),
        ($"event_id" % 3 === 0).as("pa"),
        ($"event_id" % 5 === 0).as("pb"))
    Stats.mcnemar(e, "cohort", "truth", "pa", "pb").orderBy($"cohort")
  }

  // ------------------------------------- q245 Brier decomposition

  /** Brier reliability/resolution decomposition over integer-percent
    * forecasts ([[Stats.brierDecomposition]]): a deterministic forecast in
    * hundredths vs the purchase outcome, per-bin REL and RES terms as
    * exact fractions (decimal(38,0) inside; values fit BIGINT at test
    * scale for the harness). */
  def q245Brier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select(($"event_id" % 101).as("p100"),
        ($"event_type" === "purchase").as("pos"))
    Stats.brierDecomposition(e, "p100", "pos")
      .select($"p100", $"n", $"s",
        $"rel_num".cast("long").as("rel_num"),
        $"rel_den".cast("long").as("rel_den"),
        $"res_num".cast("long").as("res_num"),
        $"res_den".cast("long").as("res_den"))
      .orderBy($"p100")
  }

  // --------------------------------------------------- q246 ECE

  /** Expected calibration error per model ([[Stats.ece]]): stated
    * confidence in hundredths, 10-bin bucketing, the per-model gap
    * telescoped to one exact fraction plus basis points. */
  def q246Ece(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = ($"event_id" * 7) % 101
    val e = Tables.events(spark, dir)
      .select(($"user_id" % 3).as("model"), conf.as("p100"),
        ((conf >= 50) === ($"event_type" === "purchase")).as("correct"))
    Stats.ece(e, "model", "p100", "correct").orderBy($"model")
  }

  // -------------------------------------- q247 mutual information

  /** Categorical mutual information cells ([[Stats.mutualInfoBits]]):
    * market segment × order priority contingency with quantized PMI bits
    * per cell — the feature-selection screen for "does this column
    * predict that one". */
  def q247MutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"), $"o_orderpriority".as("prio"))
    Stats.mutualInfoBits(df, "seg", "prio")
      .select($"seg", $"prio", $"n_xy", $"r_x", $"c_y", $"n_total",
        $"pmi_bits", $"mi_num")
      .orderBy($"seg", $"prio")
  }

  // -------------------------------------- q248 weight of evidence

  /** Weight-of-evidence encoding of order priority against fulfilled
    * status ([[Encoding.woeEncode]]): per-category WoE bits and the
    * information-value fraction — the scorecard-style categorical
    * encoder. */
  def q248Woe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("category"),
        ($"o_orderstatus" === "F").as("good"))
    Encoding.woeEncode(df, "category", "good")
      .select($"category", $"good", $"bad", $"good_total", $"bad_total",
        $"woe_bits",
        $"iv_num".cast("long").as("iv_num"),
        $"iv_den".cast("long").as("iv_den"))
      .orderBy($"category")
  }

  // ------------------------------------------------ q256 KL drift

  /** KL-divergence drift per cohort vs cohort 0 ([[Stats.klFromCounts]]):
    * the q239 PSI grid shape with the asymmetric divergence — the drift
    * quartet's final member (PSI/TV/EMD/KS exist). */
  def q256KlDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cell = Tables.events(spark, dir)
      .select(($"user_id" % 4).as("cohort"), $"event_type")
      .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("c"))
    val grid = cell.select($"cohort").distinct()
      .crossJoin(broadcast(cell.select($"event_type").distinct()))
    val full = grid.join(cell, Seq("cohort", "event_type"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
    val ref = full.filter($"cohort" === 0)
      .select($"event_type", $"c".as("c_ref"))
    Stats.klFromCounts(
        full.join(broadcast(ref), Seq("event_type")),
        "cohort", "event_type", "c_ref", "c")
      .orderBy($"cohort")
  }

  // ------------------------------------- q273 Jensen-Shannon drift

  /** Jensen–Shannon drift per cohort vs cohort 0
    * ([[Stats.jsFromCounts]]): the q256 grid with the SYMMETRIC bounded
    * divergence — the member of the drift family to alert on when
    * neither window is privileged as reference. */
  def q273JsDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cell = Tables.events(spark, dir)
      .select(($"user_id" % 4).as("cohort"), $"event_type")
      .groupBy($"cohort", $"event_type").agg(count(lit(1)).as("c"))
    val grid = cell.select($"cohort").distinct()
      .crossJoin(broadcast(cell.select($"event_type").distinct()))
    val full = grid.join(cell, Seq("cohort", "event_type"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
    val ref = full.filter($"cohort" === 0)
      .select($"event_type", $"c".as("c_ref"))
    Stats.jsFromCounts(
        full.join(broadcast(ref), Seq("event_type")),
        "cohort", "event_type", "c_ref", "c")
      .orderBy($"cohort")
  }

  // ----------------------------------------------- q297 QTE

  /** Quantile treatment effect ([[Stats.qte]]) of purchase vs view
    * amounts per cohort at P25/P50/P75/P90 — where in the spend
    * distribution the two event types actually differ, not just whether
    * the means do (the distribution-level readout beside q216/q217). */
  def q297Qte(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "view") && $"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        when($"event_type" === "purchase", 1).otherwise(2).as("s"),
        cents.as("v"))
    Stats.qte(x, "cohort", "s", "v", Seq(25, 50, 75, 90))
      .orderBy($"cohort")
  }

  // --------------------------------------- q308 diff-in-diff

  /** Difference-in-differences ([[Stats.diffInDiff]]) of event amounts
    * per event type: odd users "treated", the month's second half
    * "post" — the 2×2 cell sums/counts plus the parallel-trends
    * contrast in exact truncated milli-cents, which a naive post-only
    * mean comparison confounds with pre-existing level gaps. */
  def q308Did(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type", cents.as("cents"),
        ($"user_id" % 2 === 1).as("treat"),
        ($"ts" >= lit("2024-01-16").cast("timestamp")).as("post"))
    Stats.diffInDiff(e, "event_type", $"treat", $"post", "cents")
      .orderBy($"event_type")
  }

  // --------------------------------------------- q311 CUPED

  /** CUPED variance reduction ([[Stats.cuped]]): users as units, first
    * half-month spend as the pre-period covariate, second half as the
    * experiment metric, odd users "treated" — the pooled θ, raw and
    * adjusted treatment–control gaps in exact quantized milli-cents.
    * The A/B readout that decides in a (1−ρ²) fraction of the runtime
    * of q308's unadjusted contrast. */
  def q311Cuped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2024-01-16").cast("timestamp")
    val perUser = Tables.events(spark, dir).filter($"value".isNotNull)
      .groupBy($"user_id")
      .agg(sum(when($"ts" < cut, cents).otherwise(0L)).as("x"),
        sum(when($"ts" >= cut, cents).otherwise(0L)).as("y"))
      .select(lit("all").as("exp"), ($"user_id" % 2 === 1).as("treat"),
        $"x", $"y")
    Stats.cuped(perUser, "exp", $"treat", "x", "y")
  }

  // --------------------------------------- q322 score matching

  /** Nearest-score matching + ATT ([[Stats.scoreMatchAtt]]): treated
    * (odd) users' event amounts matched to the nearest control on the
    * user_id%50 covariate score per event type — the observational
    * causal readout beside q308's DiD and q311's CUPED, with the
    * worst-gap caliper check exposed. */
  def q322ScoreMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type", ($"user_id" % 2 === 1).as("treat"),
        ($"user_id" % 50).as("score"), cents.as("y"))
    Stats.scoreMatchAtt(e, "event_type", $"treat", "score", "y")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q318 burst days

  /** Burst detection ([[Series.burstDays]]) over the daily event count
    * per type: a day flags when its count reaches 1.5× the exact lower
    * median of the 7 prior days — the spike monitor whose median
    * baseline one previous spike cannot poison, with an honest NULL
    * cold start. */
  def q318BurstDays(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("cnt"))
    graft.etl.Series.burstDays(daily, "event_type", "d", "cnt", n = 7)
      .select($"event_type", $"d", $"cnt", $"baseline_med", $"burst")
      .orderBy($"event_type", $"d")
  }

  // --------------------------------------- q338 weekday burst

  /** Weekday-seasonal burst detection: [[Series.burstDays]] keyed on
    * (event_type, day-of-week), so each tick's baseline is the lower
    * median of the 3 PRIOR SAME-WEEKDAY values — the variant that
    * doesn't false-alarm every Monday on weekly-seasonal traffic,
    * where q318's calendar baseline would. Same helper, composite
    * key as a STRUCT (not a delimited concat — a free-form event_type
    * containing the delimiter could collide two (type, dow) series). */
  def q338DowBurst(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("cnt"))
      .withColumn("k", struct($"event_type", ($"d" % 7).as("dow")))
    graft.etl.Series.burstDays(daily, "k", "d", "cnt", n = 3)
      .select($"event_type", ($"d" % 7).as("dow"), $"d", $"cnt",
        $"baseline_med", $"burst")
      .orderBy($"event_type", $"d")
  }

  // ------------------------------------------------ q312 SRM

  /** Sample-ratio-mismatch gate ([[Stats.srmCheck]]) per event type:
    * distinct users per arm of the user_id%2 split with the exact
    * integer chi-square — the per-segment assignment health check that
    * must pass before q308/q311 readouts mean anything. */
  def q312Srm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Stats.srmCheck(Tables.events(spark, dir), "event_type",
        $"user_id" % 2 === 1, "user_id")
      .orderBy($"event_type")
  }

  // --------------------------------------- q291 conformal radius

  /** Split-conformal interval radii ([[Stats.conformalRadius]]) at 90%
    * and 95% per cohort: nonconformity = |amount − the q258
    * deterministic forecast|; the finite-sample-valid interval width a
    * conformal predictor would ship, from exact order statistics. */
  def q291Conformal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        abs(cents - ($"event_id" % 200) * 50).as("s"))
    Stats.conformalRadius(x, "cohort", "s", Seq(10, 5))
      .select($"cohort", $"n", $"k_a10".cast("long").as("k_a10"),
        $"radius_a10", $"k_a5".cast("long").as("k_a5"), $"radius_a5")
      .orderBy($"cohort")
  }

  // -------------------------------------------- q258 pinball loss

  /** Pinball loss at P50/P90 per cohort ([[Stats.pinballLoss]]) of a
    * deterministic point forecast against purchase amounts — the
    * quantile-forecast eval as one exact fraction per (cohort, q). */
  def q258Pinball(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select(($"user_id" % 5).as("cohort"), cents.as("y"),
        (($"event_id" % 200) * 50).as("yhat"))
    Stats.pinballLoss(e, "cohort", "y", "yhat", Seq(50, 90))
      .select($"cohort", $"q".cast("long").as("q"), $"n",
        $"loss_num".cast("long").as("loss_num"), $"loss_den")
      .orderBy($"cohort", $"q")
  }

  // --------------------------------------- q259 dispersion index

  /** Variance-to-mean dispersion per event type
    * ([[Stats.dispersionIndex]]) over daily event counts — the
    * overdispersion screen run before anyone fits a Poisson to a burst-y
    * count column. */
  def q259Dispersion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
      .agg(count(lit(1)).as("cnt"))
    Stats.dispersionIndex(daily, "event_type", "cnt")
      .select($"event_type", $"n", $"sum_x",
        $"d_num".cast("long").as("d_num"),
        $"d_den".cast("long").as("d_den"))
      .orderBy($"event_type")
  }

  // ----------------------------------------- q260 Cramér's V²

  /** Cramér's V² of market segment × order priority
    * ([[Stats.cramersV2]]): the table-level association summary over the
    * q247 MI grid, χ² floored to centi-units per cell. */
  def q260CramersV(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"), $"o_orderpriority".as("prio"))
    Stats.cramersV2(df, "seg", "prio")
      .select($"n_total", $"k_rows", $"k_cols", $"chi2_cb", $"v2_ppm")
  }

  // ------------------------------------------------- q262 MASE backtest

  /** Seasonal-naive forecast backtest per event type: MASE's two absolute
    * error sums — seasonal forecast (value 7 days ago) vs the naive
    * one-day benchmark — over the daily cents series, with the
    * mean-adjusted ratio in floored basis points. Calendar-correct lags
    * via equi-joins on (type, d−k), so gap days cost a miss instead of
    * silently comparing the wrong day. */
  def q262Mase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(sum(cents).as("v"))
    val f = daily.as("a").join(
        daily.select($"event_type", ($"d" + 7).as("d"), $"v".as("v7")),
        Seq("event_type", "d"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_f"), sum(abs($"v" - $"v7")).as("ae_f"))
    val n = daily.as("a").join(
        daily.select($"event_type", ($"d" + 1).as("d"), $"v".as("v1")),
        Seq("event_type", "d"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_n"), sum(abs($"v" - $"v1")).as("ae_n"))
    f.join(n, "event_type")
      .select($"event_type", $"n_f", $"ae_f", $"n_n", $"ae_n",
        expr("(ae_f * n_n * 10000) div NULLIF(ae_n * n_f, 0)")
          .as("mase_bp"))
      .orderBy($"event_type")
  }

  // --------------------------------------------- q264 mix-shift report

  /** Mix-vs-rate decomposition ([[graft.etl.Analytics.mixShift]]) of the
    * month's first half vs second half per event type: did the average
    * ticket move because traffic shifted between types or because types
    * themselves repriced? Quantized shares (ppm) and rates (floored
    * cents), contributions exact on top. */
  def q264MixShift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type",
        when(dayofmonth($"ts") <= 15, "A").otherwise("B").as("period"),
        cents.as("c"))
      .groupBy($"event_type", $"period")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"))
    graft.etl.Analytics.mixShift(base, "event_type", "period", "n", "s")
      .orderBy($"event_type")
  }

  // --------------------------------------------- q265 CMH stratified

  /** Cochran–Mantel–Haenszel per-stratum terms ([[Stats.cmhTerms]]):
    * even-keyed orders as "treatment", fulfilled status as outcome,
    * stratified by priority — the Simpson's-paradox-proof A/B readout. */
  def q265Cmh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .select($"o_orderpriority".as("stratum"),
        ($"o_orderkey" % 2 === 0).as("treat"),
        ($"o_orderstatus" === "F").as("outcome"))
    Stats.cmhTerms(df, "stratum", "treat", "outcome").orderBy($"stratum")
  }

  // --------------------------------------------- q272 STL-lite

  /** Exact STL-lite decomposition ([[graft.etl.Series.stlLite]]) of the
    * daily cents series per event type: centered-week trend, day-of-week
    * seasonal, residual — v = trend + seasonal + residual holds exactly
    * in the emitted fractions. */
  def q272StlLite(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(sum(cents).as("v"))
    graft.etl.Series.stlLite(daily, "event_type", "d", "v")
      .select($"event_type", $"d", $"v", $"dow", $"trend_num", $"det_num",
        $"seas_num", $"seas_den", $"res_num", $"res_den")
      .orderBy($"event_type", $"d")
  }

  // ------------------------------------------- q377 Welch t-test

  /** Per-cohort Welch unequal-variance t² ([[Stats.welchT]]) between
    * purchase (arm 1) and click (arm 2) amounts — the workhorse two-sample
    * mean test next to q216's rank test, integer-exact end to end (t² as
    * a floored-bp decimal(38,0) rational; see the operator's magnitude
    * bound — the %64 cohorts keep the cross-products inside decimal 38). */
  def q377WelchT(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val x = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "click") && $"value".isNotNull)
      .select(($"user_id" % 64).as("cohort"),
        when($"event_type" === "purchase", 1).otherwise(2).as("arm"),
        cents.as("v"))
    Stats.welchT(x, "cohort", $"arm", $"v").orderBy($"cohort")
  }

  // ------------------------------------------- q378 change point

  /** Offline single change-point per event type ([[Stats.changePoint]])
    * over the daily event-count series: the binary-segmentation split
    * maximizing between-segment sum of squares, argmax decided on the
    * quantized score so engine float semantics never touch the selection.
    * The feed-level "did the volume level-shift, and when" audit. */
  def q378ChangePoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    Stats.changePoint(daily, "event_type", $"d", $"n")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q383 Copeland prefs

  /** Copeland preference aggregation ([[Stats.copelandPrefs]]) over
    * within-order brand duels (higher line value wins): raw duel counts,
    * majority wins/losses with contested ties surfaced, and the Copeland
    * score — the tournament ranking a preference-data pipeline runs
    * before trusting scalar scores. Duel generation is a per-order
    * self-join (bounded by lines-per-order), never cross-order. */
  def q383Copeland(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"p_partkey" === $"l_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("b"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
    val prefs = li.as("x").join(li.as("y"),
        col("y.ok") === col("x.ok") && col("x.c") > col("y.c") &&
          col("x.b") =!= col("y.b"))
      .select(col("x.b").as("w"), col("y.b").as("l"))
    Stats.copelandPrefs(prefs, "w", "l").orderBy($"item")
  }

  // ------------------------------------------- q393 Bradley-Terry

  /** Bradley–Terry strength fit ([[Stats.bradleyTerry]], 2 quantized MM
    * steps) over the SAME within-order brand duels as q383 — Copeland's
    * majority ranking next to the model-based strengths that weigh how
    * often and against whom each brand wins. Fully integer (ppm
    * strengths, every division floored) so the fit is engine-exact. */
  def q393BradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"p_partkey" === $"l_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("b"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
    val prefs = li.as("x").join(li.as("y"),
        col("y.ok") === col("x.ok") && col("x.c") > col("y.c") &&
          col("x.b") =!= col("y.b"))
      .select(col("x.b").as("w"), col("y.b").as("l"))
    Stats.bradleyTerry(prefs, "w", "l", iters = 2).orderBy($"item")
  }

  // ------------------------------------------- q401 Brown-Forsythe

  /** Brown–Forsythe variance-homogeneity gate
    * ([[Stats.brownForsythe]]): are the four user-arm cent
    * distributions equally dispersed within each event type? The
    * median-centered variance check that must pass before the
    * pooled-variance readouts (q308/q311/q377) on the same arms are
    * trusted. */
  def q401BrownForsythe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"user_id".isNotNull && $"user_id" >= 0)
      .select($"event_type", ($"user_id" % 4).as("arm"), cents.as("v"))
    Stats.brownForsythe(e, "event_type", "arm", $"v")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q402 sign test + BH

  /** Exact sign test per (event_type, weekday) × Benjamini–Hochberg
    * step-up ([[Stats.signTestPpm]] → [[Stats.bhFdr]]): each weekday's
    * 12 earliest amounts test against the type's overall lower median
    * with an EXACT binomial tail (no normal approximation at n=12 —
    * exactly where the approximation lies), then the 7-weekday panel
    * per type passes FDR control at α=10% before any single
    * "significant weekday" is believed. */
  def q402SignBh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"ts", cents.as("v"))
    // median selected from the per-(type, value) histogram - the cumsum
    // runs over distinct values, never a row-grain rank partitioned by
    // the 5-value type key
    val wv = Window.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val medHist = e.groupBy($"event_type", $"v")
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum($"_c").over(wv))
    val medNs = medHist.groupBy($"event_type").agg(sum($"_c").as("_n"))
    val med = medHist.join(broadcast(medNs), "event_type")
      .filter($"_cum" >= expr("(_n + 1) div 2") &&
        $"_cum" - $"_c" < expr("(_n + 1) div 2"))
      .select($"event_type", $"v".as("med"))
    val wt = Window.partitionBy($"event_type", $"d")
      .orderBy($"ts", $"event_id")
    val trials = e
      .withColumn("d",
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS LONG) % 7"))
      .withColumn("_rn", row_number().over(wt)).filter($"_rn" <= 12)
      .join(broadcast(med), "event_type")
    val p = Stats.signTestPpm(trials, "event_type", "d", $"v", $"med",
      maxN = 12)
    Stats.bhFdr(p, "family", "key", $"p_ppm", alphaPpm = 100000L)
      .select($"family".as("event_type"), $"key".as("dow"), $"p_ppm",
        $"rank", $"m_tests", $"rejected")
      .orderBy($"event_type", $"dow")
  }

  // ------------------------------------------- q404 jackknife ratio

  /** Delete-one-bucket jackknife ([[Stats.jackknifeRatio]]) for
    * revenue-per-user by event type: users pre-aggregate (the
    * independence unit), 32 user buckets are the jackknife groups, and
    * the ratio's variance comes out exact in milli² — the standard error
    * the per-event variance would get WRONG for a ratio metric. */
  def q404JackknifeRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0 &&
        $"user_id".isNotNull && $"user_id" >= 0)
      .groupBy($"event_type", $"user_id")
      .agg(sum(cents).as("y"))
      .withColumn("bucket", $"user_id" % 32)
    Stats.jackknifeRatio(perUser, "event_type", "bucket",
        $"y", lit(1L))
      .orderBy($"event_type")
  }

  // ------------------------------------------- q405 Mann-Kendall

  /** Mann–Kendall trend gate ([[Stats.mannKendall]]) on daily event
    * counts per type: the distribution-free is-it-drifting decision
    * (exact S, tie-corrected var×18, signed milli-z²) that tells q165's
    * Theil–Sen slope whether there is a trend to estimate at all. */
  def q405MannKendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type",
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS LONG)")
          .as("d"))
      .agg(count(lit(1)).as("cnt"))
    Stats.mannKendall(daily, "event_type", $"d", $"cnt")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q406 Kruskal-Wallis

  /** Kruskal–Wallis H ([[Stats.kruskalWallis]]) on the SAME four
    * user-arm cent distributions as q401: the rank-based k-sample gate
    * that stays honest when one arm is heavy-tailed — read next to
    * Brown–Forsythe's dispersion check before trusting any
    * pooled-variance comparison across the arms. */
  def q406KruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"user_id".isNotNull && $"user_id" >= 0)
      .select($"event_type", ($"user_id" % 4).as("arm"), cents.as("v"))
    Stats.kruskalWallis(e, "event_type", "arm", $"v")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q407 Cochran-Armitage

  /** Cochran–Armitage trend test ([[Stats.cochranArmitage]]): does the
    * purchase share drift monotonically across the week (engine-neutral
    * weekday 0–6 as the ordered dose score) inside each user cohort?
    * The ordered-alternative refinement of the chi² independence check
    * (q130) — a flat-vs-trending distinction chi² cannot make. */
  def q407CochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select(($"user_id" % 4).as("cohort"),
        (datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("dow"),
        ($"event_type" === "purchase").as("is_purchase"))
    Stats.cochranArmitage(e, "cohort", $"dow", $"is_purchase")
      .orderBy($"cohort")
  }

  // ------------------------------------------- q408 Krippendorff alpha

  /** Krippendorff's alpha ([[Stats.krippendorffAlpha]]) over a
    * three-annotator language-labeling panel per source: annotator A
    * labels every document with its lang, annotator B labels the even
    * half (with a deterministic source-bucket error on every 5th doc),
    * annotator C labels every 3rd doc (defecting to 'xx' on every 11th)
    * — uneven coverage and systematic disagreement, exactly the missing-
    * data shape Cohen's kappa (q142) cannot score. Single-rating units
    * drop out per the coincidence-matrix construction. */
  def q408Krippendorff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source")
    val a = docs.select($"source", $"doc_id", $"lang".as("label"))
    val b = docs.filter($"doc_id" % 2 === 0)
      .select($"source", $"doc_id",
        when($"doc_id" % 5 === 0,
          concat(lit("l"), ($"doc_id" % 3).cast("string")))
          .otherwise($"lang").as("label"))
    val c = docs.filter($"doc_id" % 3 === 0)
      .select($"source", $"doc_id",
        when($"doc_id" % 11 === 0, lit("xx")).otherwise($"lang").as("label"))
    Stats.krippendorffAlpha(a.unionByName(b).unionByName(c),
        "source", "doc_id", $"label")
      .orderBy($"source")
  }

  // ------------------------------------------- q409 Simpson reversal

  /** Simpson-reversal tripwire ([[Stats.simpsonReversal]]): per event
    * type, does the pooled even-vs-odd-user high-amount comparison
    * (cents ≥ 3500) point the opposite way from every weekday stratum?
    * The confounding check that must pass before q264's mix-shift or
    * any pooled uplift is read across a week boundary. */
  def q409SimpsonReversal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"user_id".isNotNull && $"user_id" >= 0)
      .select($"event_type",
        (datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7)
          .cast("long").as("dow"),
        ($"user_id" % 2 === 0).as("treated"),
        (cents >= 3500).as("hi"))
    Stats.simpsonReversal(e, "event_type", "dow", $"treated", $"hi")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q410 folded period scan

  /** Epoch-folding periodicity scan ([[Series.foldedPeriodScan]]):
    * fold each type's daily counts onto candidate periods 2–14 and
    * score the between-phase variance share — the integer spectral
    * proxy (no sin/cos, no libm divergence) that finds the weekly
    * cycle q338's burst detector ASSUMES, instead of assuming it.
    * The p=7 row should dominate for seasonal traffic; a flat scan
    * says calendar folding adds nothing. */
  def q410PeriodScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .agg(count(lit(1)).as("cnt"))
    graft.etl.Series.foldedPeriodScan(daily, "event_type", "d", "cnt",
        periods = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10, 14))
      .orderBy($"event_type", $"period")
  }

  // ------------------------------------------- q415 fairness gaps

  /** Subgroup fairness audit ([[Stats.fairnessGaps]]) of a length-based
    * curation keep rule (n_chars ≥ 500) per source, grouped by language:
    * selection-rate, TPR and FPR gaps vs each source's overall rates,
    * against a deterministic usefulness label. The demographic-parity /
    * equalized-odds read a keep gate must pass before its decisions
    * reshape the language mix of the corpus. */
  def q415FairnessGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"source", $"lang", ($"n_chars" >= 500).as("pred"),
        (expr("conv(substring(sha2(CAST(doc_id AS STRING), 256), 1, 4), 16, 10)").cast("long") % 4 =!= 0).as("label"))
    Stats.fairnessGaps(docs, "source", "lang", $"pred", $"label")
      .orderBy($"source", $"lang")
  }

  // ------------------------------------------- q416 SMD balance

  /** Covariate-balance SMD ([[Stats.smdBalance]]): are the even/odd
    * user arms balanced on spend (cents) inside each event type?
    * smd2_milli > 10 (|SMD| > 0.1) flags an imbalance that invalidates
    * the pooled uplift reads (q308/q311) built on these arms. */
  def q416SmdBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0 &&
        $"user_id".isNotNull && $"user_id" >= 0)
      .select($"event_type", ($"user_id" % 2 === 0).as("t"), cents.as("v"))
    Stats.smdBalance(e, "event_type", $"t", $"v")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q418 power plan

  /** Two-arm sample-size plan ([[Stats.samplePowerPlan]]) for a 5% MDE
    * on mean spend per event type at α=0.05 / power 0.80 — the
    * "how long must this A/B run" table, from each type's own observed
    * variance, with the z-constant precomputed as a milli literal. */
  def q418PowerPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"value" >= 0)
      .select($"event_type", cents.as("v"))
    Stats.samplePowerPlan(e, "event_type", $"v")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q420 Matthews correlation

  /** Matthews correlation ([[Stats.matthewsCorr]]) of the q415 keep rule
    * (n_chars ≥ 500) against the deterministic usefulness label, per
    * source: the imbalance-honest single-number confusion summary
    * (signed square in milli — sqrt-free) next to F1 (q202) and the
    * per-group fairness gaps computed from the same decisions. */
  def q420Mcc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"source", ($"n_chars" >= 500).as("pred"),
        (expr("conv(substring(sha2(CAST(doc_id AS STRING), 256), 1, 4), 16, 10)").cast("long") % 4 =!= 0).as("label"))
    Stats.matthewsCorr(docs, "source", $"pred", $"label")
      .orderBy($"source")
  }

  // ------------------------------------------- q423 rank churn

  /** Day-over-day leaderboard churn: per event type, how much of the
    * daily top-10 spender list survives from the previous day —
    * `churn_bp` = replaced share. The serving-stability read for any
    * ranked surface (recommendations, trending, leaderboards): a
    * healthy ranking churns some; churn ≈ 10000 means yesterday's list
    * is noise. Days whose predecessor has no data are excluded (churn
    * undefined), not emitted as 10000. Keyed windows and a keyed
    * next-day self-join only — no global ordering anywhere. */
  def q423RankChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .filter($"value".isNotNull && $"user_id".isNotNull && $"user_id" >= 0)
      .groupBy($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        $"user_id")
      .agg(sum(cents).as("amt"))
    val w = Window.partitionBy($"event_type", $"d")
      .orderBy($"amt".desc, $"user_id")
    val top = daily.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10).select($"event_type", $"d", $"user_id")
    val prev = top.select($"event_type", ($"d" + 1).as("d"), $"user_id")
    val prevDays = prev.select($"event_type", $"d").distinct()
    val overlap = top.join(prev, Seq("event_type", "d", "user_id"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("_ov"))
    top.groupBy($"event_type", $"d").agg(count(lit(1)).as("n_curr"))
      .join(prevDays, Seq("event_type", "d"))
      .join(overlap, Seq("event_type", "d"), "left")
      .select($"event_type", $"d", $"n_curr",
        coalesce($"_ov", lit(0L)).as("n_kept"),
        expr("(n_curr - coalesce(_ov, 0)) * 10000 div n_curr")
          .as("churn_bp"))
      .orderBy($"event_type", $"d")
  }

  // ------------------------------------------- q439 bot regularity

  /** Bot/automation screen by inter-arrival regularity: humans are
    * bursty, schedulers are metronomes — per user (≥ 10 events) the
    * mean and variance of inter-event gaps (whole SECONDS — µs gaps
    * square past int64 on year-sparse users; measured) and the
    * squared coefficient of variation `cv2_milli = var/mean²·1000`;
    * cv² ≪ 1000 (sub-Poisson) flags clockwork traffic for the crawler/
    * abuse review that feeds the host-cap policy (q367). One user-keyed
    * lag window + one combiner aggregate; variance via the same exact
    * milli pipeline as [[Stats.smdBalance]]. */
  def q439BotRegularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val gaps = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("_prev", lag($"us", 1).over(w))
      .filter($"_prev".isNotNull)
      .select($"user_id", expr("(us - _prev) div 1000000").as("g"))
    gaps.groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"), sum($"g").as("_s"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g")).as("_q"))
      .filter($"n_gaps" >= 10)
      .withColumn("mean_s_milli", expr(
        "CAST(CAST(_s AS DECIMAL(38,0)) * 1000 div n_gaps AS BIGINT)"))
      .withColumn("var_milli", expr(
        "CAST((_q * 1000 * n_gaps - CAST(_s AS DECIMAL(38,0)) * _s * 1000)" +
          " div (CAST(n_gaps AS DECIMAL(38,0)) * (n_gaps - 1)) AS BIGINT)"))
      .filter($"mean_s_milli" > 0)
      .select($"user_id", $"n_gaps", $"mean_s_milli", $"var_milli",
        expr("CAST(CAST(var_milli AS DECIMAL(38,0)) * 1000 * 1000 " +
          "div (CAST(mean_s_milli AS DECIMAL(38,0)) * mean_s_milli) " +
          "AS BIGINT)").as("cv2_milli"))
      .orderBy($"cv2_milli".asc, $"user_id")
      .limit(50)
  }

  // ------------------------------------------- q457 stratified ATE

  /** Propensity-stratified average treatment effect: users stratify by
    * PRE-period activity (event count up to the observed mid-date,
    * floored into 4 fixed buckets), and the treatment/control outcome
    * gap (post-period purchase cents) is estimated WITHIN each stratum,
    * then combined with stratum-size weights — the classic
    * stratification estimator that removes confounding carried by the
    * stratification variable, next to CUPED (q311) which removes its
    * variance and DiD (q308) which removes its time trend. The overall
    * ATE is formed as a DIFFERENCE of two nonnegative weighted means
    * (never dividing a negative), and strata missing an arm drop from
    * the combined estimate in both engines identically. Two shuffles
    * (user panel, stratum agg) + one broadcast scalar each for the
    * mid-date and the combined row. */
  def q457StratifiedAte(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // value >= 0 (nulls kept as 0-cent events): keeps every floor-divided
    // sum nonnegative, so Spark's truncating div and DuckDB's flooring //
    // can never disagree on a future corpus with refunds
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        ($"value".isNull || $"value" >= 0))
      .select($"user_id", ($"user_id" % 2).as("arm"),
        expr("CAST(datediff(to_date(ts), DATE'1970-01-01') AS LONG)")
          .as("d"),
        $"event_type", coalesce(cents, lit(0L)).as("c"))
    val mid = broadcast(e.agg(expr("(min(d) + max(d)) div 2").as("mid")))
    val panel = e.crossJoin(mid)
      .groupBy($"user_id", $"arm")
      .agg(sum(when($"d" <= $"mid", 1L).otherwise(0L)).as("pre_cnt"),
        sum(when($"d" > $"mid" && $"event_type" === "purchase", $"c")
          .otherwise(0L)).as("y"))
      .filter($"pre_cnt" >= 1)
      .withColumn("stratum", least(lit(3L), expr("pre_cnt div 16")))
    val per = panel.groupBy($"stratum")
      .agg(count(lit(1)).as("n"), sum($"arm").as("n_t"),
        (count(lit(1)) - sum($"arm")).as("n_c"),
        sum(when($"arm" === 1, $"y").otherwise(0L)).as("sum_t"),
        sum(when($"arm" === 0, $"y").otherwise(0L)).as("sum_c"))
      .withColumn("mean_t_milli", expr("sum_t * 1000 div NULLIF(n_t, 0)"))
      .withColumn("mean_c_milli", expr("sum_c * 1000 div NULLIF(n_c, 0)"))
      .withColumn("diff_milli", $"mean_t_milli" - $"mean_c_milli")
    val tot = broadcast(per.filter($"n_t" > 0 && $"n_c" > 0)
      .agg((expr("sum(mean_t_milli * n) div sum(n)") -
        expr("sum(mean_c_milli * n) div sum(n)")).as("ate_milli")))
    per.crossJoin(tot)
      .select($"stratum", $"n", $"n_t", $"n_c", $"mean_t_milli",
        $"mean_c_milli", $"diff_milli", $"ate_milli")
      .orderBy($"stratum")
  }

  // ------------------------------------------- q463 IV / Wald LATE

  /** Instrumental-variable Wald estimator (LATE): encouragement
    * z = user_id%2, synthetic imperfect compliance (encouraged users
    * take up unless user_id%7=0; controls cross over when user_id%11=0
    * — never/always-takers, the real-world shape), outcome = per-user
    * purchase cents. LATE = ITT_y / ITT_d — the effect on COMPLIERS,
    * which the naive per-protocol comparison (q457's strata, q311's
    * CUPED) gets wrong under selective take-up. Both ITTs are signed
    * DIFFERENCES of nonnegative floor-divided means; the final ratio
    * divides |ITT_y| by the positive ITT_d and reapplies the sign, so
    * no engine ever floor-divides a negative. NULL when take-up didn't
    * move (ITT_d ≤ 0): the instrument is dead and no LATE exists. */
  def q463IvWald(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // value >= 0 (nulls kept as 0-cent events): see q457 — keeps the
    // floor-divided ITT_y means nonnegative per arm on any corpus
    val panel = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        ($"value".isNull || $"value" >= 0))
      .select($"user_id", ($"user_id" % 2).as("z"), $"event_type",
        coalesce(cents, lit(0L)).as("c"))
      .groupBy($"user_id", $"z")
      .agg(sum(when($"event_type" === "purchase", $"c").otherwise(0L))
        .as("y"))
      .withColumn("d",
        when(($"z" === 1 && $"user_id" % 7 =!= 0) ||
          ($"z" === 0 && $"user_id" % 11 === 0), 1L).otherwise(0L))
    panel.agg(
        sum(when($"z" === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when($"z" === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when($"z" === 1, $"y").otherwise(0L)).as("y_t"),
        sum(when($"z" === 0, $"y").otherwise(0L)).as("y_c"),
        sum(when($"z" === 1, $"d").otherwise(0L)).as("d_t"),
        sum(when($"z" === 0, $"d").otherwise(0L)).as("d_c"))
      .withColumn("itt_y_milli",
        expr("y_t * 1000 div n_t - y_c * 1000 div n_c"))
      .withColumn("itt_d_bp",
        expr("d_t * 10000 div n_t - d_c * 10000 div n_c"))
      .withColumn("late_milli", expr(
        "CASE WHEN itt_d_bp > 0 THEN " +
          "CASE WHEN itt_y_milli >= 0 THEN 1 ELSE -1 END * " +
          "(abs(itt_y_milli) * 10000 div itt_d_bp) END"))
      .select($"n_t", $"n_c", $"itt_y_milli", $"itt_d_bp", $"late_milli")
  }

  // ------------------------------------------- q451 reciprocity

  /** Directed-graph reciprocity of the user transition graph (q103's
    * edges): Σ min(c_ab, c_ba) over ordered type pairs vs total
    * transition mass — how much of the flow runs both ways. Near 0 =
    * a funnel (flow is one-directional); near 10⁴ = ping-pong traffic.
    * One full-outer self-join on the reversed key, integer mins. */
  def q451Reciprocity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = graft.etl.Events.transitionCounts(Tables.events(spark, dir),
        "user_id", "event_type", "ts")
      .select($"prev_type".as("a"), $"curr_type".as("b"), $"n")
      .filter($"a" =!= $"b")
    val rev = t.select($"b".as("a"), $"a".as("b"), $"n".as("n_rev"))
    t.join(rev, Seq("a", "b"), "left")
      .agg(sum($"n").as("total_flow"),
        sum(least($"n", coalesce($"n_rev", lit(0L)))).as("recip_flow"))
      .select($"total_flow", $"recip_flow",
        expr("recip_flow * 10000 div total_flow").as("reciprocity_bp"))
  }

  // ------------------------------------------- q452 degree histogram

  /** Log₂-bucketed degree distribution of the transition graph's
    * out-degree per (user-visited) event type — the scale-free-or-not
    * readout whose bucket boundaries ride the native `bitlen`
    * expression (`length(bin(x))` spelled portably, rewritten to
    * codegen by BitLenRewrite). */
  def q452DegreeHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deg = graft.etl.Events.transitionCounts(Tables.events(spark, dir),
        "user_id", "event_type", "ts")
      .groupBy($"prev_type").agg(sum($"n").as("d"))
    deg.groupBy(expr("length(bin(d))").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum($"d").as("edge_mass"))
      .orderBy($"bucket")
  }

  // ------------------------------------------- q453 engagement gini

  /** Engagement inequality ([[Analytics.giniCoefficientBp]]): Gini of
    * per-user event counts inside each event type — "do 1% of users
    * generate 50% of the clicks?" — the user-side companion to the
    * revenue Lorenz read (q171), same exact integer Gini. */
  def q453EngagementGini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .groupBy($"event_type", $"user_id").agg(count(lit(1)).as("cnt"))
    graft.etl.Analytics.giniCoefficientBp(perUser, "event_type", "cnt",
        "user_id")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q508 backtest grid

  /** Rolling-origin forecast backtest: the seasonal-naive forecaster
    * (value at origin day d predicts day d+h) scored at every origin
    * with actual data for the horizon, per (event_type, h ∈ {1, 7}).
    * Reports MAE in exact cents and MASE in milli — the error scaled by
    * the in-sample seasonal-naive denominator (mean |a(t) − a(t−7)|),
    * the standard "is the model beating persistence" gate for any
    * forecasting job. Entirely self-joins on the calendar-bounded daily
    * aggregate (day grain: one keyed shuffle to build, broadcast-size
    * after), NULL (not 0) where the denominator is degenerate. */
  def q508BacktestGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"event_type".isNotNull && $"value".isNotNull)
      .groupBy($"event_type",
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
        .as("c"))
      .localCheckpoint() // day grain, calendar-bounded; feeds 3 branches
    val denom = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.d") === col("b.d") + 7)
      .groupBy(col("a.event_type").as("event_type"))
      .agg(expr("CAST(sum(abs(a.c - b.c)) AS BIGINT)").as("_sae"),
        count(lit(1)).as("_nd"))
    val horizons = Seq(1L, 7L).toDF("h")
    val errs = daily.as("o").crossJoin(broadcast(horizons))
      .join(daily.as("t"),
        col("t.event_type") === col("o.event_type") &&
          col("t.d") === col("o.d") + col("h"))
      .groupBy(col("o.event_type").as("event_type"), col("h"))
      .agg(count(lit(1)).as("n_origins"),
        expr("CAST(sum(abs(t.c - o.c)) AS BIGINT)").as("_sfe"))
    errs.join(denom, "event_type")
      .withColumn("mae_cents", expr("_sfe div n_origins"))
      .withColumn("mase_milli", expr(
        "CASE WHEN _sae > 0 THEN CAST(CAST(_sfe AS DECIMAL(38,0)) * _nd " +
          "* 1000 div (CAST(_sae AS DECIMAL(38,0)) * n_origins) " +
          "AS BIGINT) END"))
      .select($"event_type", $"h", $"n_origins", $"mae_cents",
        $"mase_milli")
      .orderBy($"event_type", $"h")
  }

  /** Shared stratum table for the meta-analysis pair (q511/q512): each
    * event_type is an "experiment", treatment = even user_id, outcome =
    * conversion (value ≥ €50 — it must VARY within a stratum, which the
    * error flag cannot: it IS the stratum key). Per stratum: counts,
    * rates (bp), risk difference (bp), its variance proxy
    * v = p1(1−p1)/n1 + p0(1−p0)/n0 in bp² (floored per term,
    * non-negative), and the inverse-variance weight w = 10^8 div v.
    * One keyed aggregate. */
  private[queries] def metaStrata(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0 &&
        $"event_type".isNotNull && $"value".isNotNull && $"value" >= 0)
      .select($"event_type", ($"user_id" % 2 === 0).cast("long").as("t"),
        expr("CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000 " +
          "THEN 1 ELSE 0 END").as("e"))
      .groupBy($"event_type")
      .agg(sum($"t").as("n1"),
        sum($"t" * $"e").as("x1"),
        sum(lit(1L) - $"t").as("n0"),
        sum((lit(1L) - $"t") * $"e").as("x0"))
      .filter($"n1" > 0 && $"n0" > 0)
      .withColumn("p1_bp", expr("x1 * 10000 div n1"))
      .withColumn("p0_bp", expr("x0 * 10000 div n0"))
      .withColumn("eff_bp", $"p1_bp" - $"p0_bp")
      .withColumn("v_bp2", expr(
        "CAST(CAST(p1_bp AS DECIMAL(38,0)) * (10000 - p1_bp) div n1 " +
          "+ CAST(p0_bp AS DECIMAL(38,0)) * (10000 - p0_bp) div n0 " +
          "AS BIGINT)"))
      .withColumn("w", expr(
        "CASE WHEN v_bp2 > 0 THEN 100000000 div v_bp2 END"))
  }

  // ------------------------------------------- q511 meta strata

  /** Per-stratum effects feeding the fixed-effect meta-analysis: risk
    * difference, variance proxy, inverse-variance weight, and the
    * weight's share of the pool (bp) — the forest-plot table. */
  def q511MetaStrata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = metaStrata(spark, dir).filter($"w".isNotNull)
    val tot = s.agg(sum($"w").as("_tw"))
    s.crossJoin(broadcast(tot))
      .withColumn("w_share_bp", expr("w * 10000 div _tw"))
      .select($"event_type", $"n1", $"n0", $"p1_bp", $"p0_bp", $"eff_bp",
        $"v_bp2", $"w", $"w_share_bp")
      .orderBy($"event_type")
  }

  // ------------------------------------------- q512 pooled meta

  /** Fixed-effect pooled estimate + heterogeneity: pooled risk
    * difference = Σwᵢ·effᵢ / Σwᵢ (computed on effects SHIFTED by
    * +10000 bp so every division dividend stays non-negative — Spark
    * truncates, DuckDB floors, and a negative pooled numerator would
    * diverge), Cochran's Q = Σ (effᵢ − pooled)² div vᵢ (each term a
    * non-negative floored integer), and I² = (Q − (k−1))/Q in milli,
    * clamped at 0. The Q > k−1 CASE keeps that division's dividend
    * non-negative too. */
  def q512PooledMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = metaStrata(spark, dir).filter($"w".isNotNull)
      .localCheckpoint() // enum-domain strata (≤5 rows); feeds 2 passes
    val pooled = s.agg(
        count(lit(1)).as("k"),
        expr("CAST(CAST(sum(w * (eff_bp + 10000)) AS DECIMAL(38,0)) " +
          "div sum(w) AS BIGINT) - 10000").as("pooled_bp"))
    s.crossJoin(broadcast(pooled))
      .withColumn("_d", $"eff_bp" - $"pooled_bp")
      .agg(max($"k").as("k"), max($"pooled_bp").as("pooled_bp"),
        expr("CAST(sum(CAST(_d AS DECIMAL(38,0)) * _d div v_bp2) " +
          "AS BIGINT)").as("q_stat"))
      .withColumn("i2_milli", expr(
        "CASE WHEN q_stat > k - 1 THEN (q_stat - (k - 1)) * 1000 " +
          "div q_stat ELSE 0 END"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q511_meta_strata" -> q511MetaStrata _,
    "q512_pooled_meta" -> q512PooledMeta _,
    "q508_backtest_grid" -> q508BacktestGrid _,
    "q457_stratified_ate" -> q457StratifiedAte _,
    "q463_iv_wald" -> q463IvWald _,
    "q451_reciprocity" -> q451Reciprocity _,
    "q452_degree_hist" -> q452DegreeHist _,
    "q453_engagement_gini" -> q453EngagementGini _,
    "q439_bot_regularity" -> q439BotRegularity _,
    "q423_rank_churn" -> q423RankChurn _,
    "q420_mcc" -> q420Mcc _,
    "q415_fairness_gaps" -> q415FairnessGaps _,
    "q416_smd_balance" -> q416SmdBalance _,
    "q418_power_plan" -> q418PowerPlan _,
    "q410_period_scan" -> q410PeriodScan _,
    "q406_kruskal_wallis" -> q406KruskalWallis _,
    "q407_cochran_armitage" -> q407CochranArmitage _,
    "q408_krippendorff" -> q408Krippendorff _,
    "q409_simpson_reversal" -> q409SimpsonReversal _,
    "q401_brown_forsythe" -> q401BrownForsythe _,
    "q402_sign_bh" -> q402SignBh _,
    "q404_jackknife_ratio" -> q404JackknifeRatio _,
    "q405_mann_kendall" -> q405MannKendall _,
    "q383_copeland" -> q383Copeland _,
    "q393_bradley_terry" -> q393BradleyTerry _,
    "q377_welch_t" -> q377WelchT _,
    "q378_changepoint" -> q378ChangePoint _,
    "q272_stl_lite" -> q272StlLite _,
    "q265_cmh" -> q265Cmh _,
    "q262_mase" -> q262Mase _,
    "q264_mix_shift" -> q264MixShift _,
    "q256_kl_drift" -> q256KlDrift _,
    "q273_js_drift" -> q273JsDrift _,
    "q291_conformal" -> q291Conformal _,
    "q297_qte" -> q297Qte _,
    "q308_did" -> q308Did _,
    "q311_cuped" -> q311Cuped _,
    "q312_srm" -> q312Srm _,
    "q318_burst_days" -> q318BurstDays _,
    "q322_score_match" -> q322ScoreMatch _,
    "q338_dow_burst" -> q338DowBurst _,
    "q258_pinball" -> q258Pinball _,
    "q259_dispersion" -> q259Dispersion _,
    "q260_cramers_v" -> q260CramersV _,
    "q243_target_encode" -> q243TargetEncode _,
    "q244_mcnemar" -> q244Mcnemar _,
    "q245_brier" -> q245Brier _,
    "q246_ece" -> q246Ece _,
    "q247_mutual_info" -> q247MutualInfo _,
    "q248_woe" -> q248Woe _,
    "q235_weighted_jaccard" -> q235WeightedJaccard _,
    "q239_psi_drift" -> q239PsiDrift _,
    "q233_wasserstein" -> q233Wasserstein _,
    "q231_tv_distance" -> q231TvDistance _,
    "q232_debounce" -> q232Debounce _,
    "q228_fifo_match" -> q228FifoMatch _,
    "q226_cube" -> q226Cube _,
    "q216_mann_whitney" -> q216MannWhitney _,
    "q217_ks_test" -> q217KsTest _,
    "q218_clamped_balance" -> q218ClampedBalance _,
    "q219_twap" -> q219Twap _,
    "q220_rollup_revenue" -> q220RevenueRollup _,
    "q221_daily_pivot" -> q221DailyPivot _,
    "q222_runs_test" -> q222RunsTest _)

  private val metaStrataSql: String = """
      |  SELECT event_type, sum(t) AS n1, sum(t * e) AS x1,
      |    sum(1 - t) AS n0, sum((1 - t) * e) AS x0
      |  FROM (
      |    SELECT event_type,
      |      CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
      |      CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000
      |        THEN 1 ELSE 0 END AS e
      |    FROM events
      |    WHERE user_id IS NOT NULL AND user_id >= 0
      |      AND event_type IS NOT NULL
      |      AND value IS NOT NULL AND value >= 0)
      |  GROUP BY 1 HAVING sum(t) > 0 AND sum(1 - t) > 0""".stripMargin

  private val metaRatesSql: String = s"""
      |base AS (
      |$metaStrataSql),
      |rates AS (
      |  SELECT event_type, n1, n0, x1, x0,
      |    x1 * 10000 // n1 AS p1_bp, x0 * 10000 // n0 AS p0_bp
      |  FROM base),
      |strata AS (
      |  SELECT event_type, n1, n0, p1_bp, p0_bp,
      |    p1_bp - p0_bp AS eff_bp,
      |    CAST(CAST(p1_bp AS HUGEINT) * (10000 - p1_bp) // n1
      |      + CAST(p0_bp AS HUGEINT) * (10000 - p0_bp) // n0 AS BIGINT)
      |      AS v_bp2
      |  FROM rates),
      |w AS (
      |  SELECT *, CASE WHEN v_bp2 > 0 THEN 100000000 // v_bp2 END AS w
      |  FROM strata)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q511_meta_strata" -> s"""
      |WITH
      |$metaRatesSql,
      |f AS (SELECT * FROM w WHERE w IS NOT NULL),
      |tot AS (SELECT sum(w) AS tw FROM f)
      |SELECT event_type, CAST(n1 AS BIGINT) AS n1,
      |  CAST(n0 AS BIGINT) AS n0, CAST(p1_bp AS BIGINT) AS p1_bp,
      |  CAST(p0_bp AS BIGINT) AS p0_bp, CAST(eff_bp AS BIGINT) AS eff_bp,
      |  v_bp2, CAST(w AS BIGINT) AS w,
      |  CAST(w * 10000 // tw AS BIGINT) AS w_share_bp
      |FROM f, tot ORDER BY event_type""".stripMargin,
    "q512_pooled_meta" -> s"""
      |WITH
      |$metaRatesSql,
      |f AS (SELECT * FROM w WHERE w IS NOT NULL),
      |pooled AS (
      |  SELECT count(*) AS k,
      |    CAST(CAST(sum(w * (eff_bp + 10000)) AS HUGEINT) // sum(w)
      |      AS BIGINT) - 10000 AS pooled_bp
      |  FROM f),
      |qs AS (
      |  SELECT max(k) AS k, max(pooled_bp) AS pooled_bp,
      |    CAST(sum(CAST(eff_bp - pooled_bp AS HUGEINT)
      |      * (eff_bp - pooled_bp) // v_bp2) AS BIGINT) AS q_stat
      |  FROM f, pooled)
      |SELECT CAST(k AS BIGINT) AS k, CAST(pooled_bp AS BIGINT)
      |    AS pooled_bp, q_stat,
      |  CAST(CASE WHEN q_stat > k - 1 THEN (q_stat - (k - 1)) * 1000
      |    // q_stat ELSE 0 END AS BIGINT) AS i2_milli
      |FROM qs""".stripMargin,
    "q508_backtest_grid" -> """
      |WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS c
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |  GROUP BY 1, 2),
      |denom AS (
      |  SELECT a.event_type, sum(abs(a.c - b.c)) AS sae, count(*) AS nd
      |  FROM daily a JOIN daily b
      |    ON b.event_type = a.event_type AND a.d = b.d + 7
      |  GROUP BY 1),
      |h AS (SELECT unnest(ARRAY[1, 7]) AS h),
      |errs AS (
      |  SELECT o.event_type, h.h, count(*) AS n_origins,
      |    sum(abs(t.c - o.c)) AS sfe
      |  FROM daily o CROSS JOIN h
      |  JOIN daily t ON t.event_type = o.event_type AND t.d = o.d + h.h
      |  GROUP BY 1, 2)
      |SELECT e.event_type, CAST(e.h AS BIGINT) AS h,
      |  CAST(e.n_origins AS BIGINT) AS n_origins,
      |  CAST(e.sfe // e.n_origins AS BIGINT) AS mae_cents,
      |  CAST(CASE WHEN d.sae > 0 THEN CAST(e.sfe AS HUGEINT) * d.nd
      |    * 1000 // (CAST(d.sae AS HUGEINT) * e.n_origins) END AS BIGINT)
      |    AS mase_milli
      |FROM errs e JOIN denom d ON d.event_type = e.event_type
      |ORDER BY 1, 2""".stripMargin,
    "q463_iv_wald" -> """
      |WITH e AS (
      |  SELECT user_id, user_id % 2 AS z, event_type,
      |    coalesce(CAST(round(value * 100) AS BIGINT), 0) AS c
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0
      |    AND (value IS NULL OR value >= 0)),
      |panel AS (
      |  SELECT user_id, z,
      |    sum(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS y
      |  FROM e GROUP BY 1, 2),
      |p2 AS (
      |  SELECT *, CASE WHEN (z = 1 AND user_id % 7 <> 0)
      |      OR (z = 0 AND user_id % 11 = 0) THEN 1 ELSE 0 END AS d
      |  FROM panel),
      |a AS (
      |  SELECT
      |    sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS n_t,
      |    sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS n_c,
      |    sum(CASE WHEN z = 1 THEN y ELSE 0 END) AS y_t,
      |    sum(CASE WHEN z = 0 THEN y ELSE 0 END) AS y_c,
      |    sum(CASE WHEN z = 1 THEN d ELSE 0 END) AS d_t,
      |    sum(CASE WHEN z = 0 THEN d ELSE 0 END) AS d_c
      |  FROM p2),
      |m AS (
      |  SELECT n_t, n_c,
      |    y_t * 1000 // n_t - y_c * 1000 // n_c AS itt_y_milli,
      |    d_t * 10000 // n_t - d_c * 10000 // n_c AS itt_d_bp
      |  FROM a)
      |SELECT CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
      |  CAST(itt_y_milli AS BIGINT) AS itt_y_milli,
      |  CAST(itt_d_bp AS BIGINT) AS itt_d_bp,
      |  CAST(CASE WHEN itt_d_bp > 0 THEN
      |    (CASE WHEN itt_y_milli >= 0 THEN 1 ELSE -1 END)
      |      * (abs(itt_y_milli) * 10000 // itt_d_bp) END AS BIGINT)
      |    AS late_milli
      |FROM m""".stripMargin,
    "q457_stratified_ate" -> """
      |WITH e AS (
      |  SELECT user_id, user_id % 2 AS arm,
      |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    event_type,
      |    coalesce(CAST(round(value * 100) AS BIGINT), 0) AS c
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0
      |    AND (value IS NULL OR value >= 0)),
      |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM e),
      |panel AS (
      |  SELECT user_id, arm,
      |    sum(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS pre_cnt,
      |    sum(CASE WHEN d > mid AND event_type = 'purchase'
      |        THEN c ELSE 0 END) AS y
      |  FROM e, b GROUP BY 1, 2),
      |s AS (SELECT *, least(3, pre_cnt // 16) AS stratum
      |      FROM panel WHERE pre_cnt >= 1),
      |per AS (
      |  SELECT stratum, count(*) AS n, sum(arm) AS n_t,
      |    count(*) - sum(arm) AS n_c,
      |    sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sum_t,
      |    sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sum_c
      |  FROM s GROUP BY 1),
      |m AS (SELECT *, sum_t * 1000 // NULLIF(n_t, 0) AS mean_t_milli,
      |        sum_c * 1000 // NULLIF(n_c, 0) AS mean_c_milli FROM per),
      |t AS (SELECT sum(mean_t_milli * n) // sum(n)
      |        - sum(mean_c_milli * n) // sum(n) AS ate_milli
      |      FROM m WHERE n_t > 0 AND n_c > 0)
      |SELECT CAST(stratum AS BIGINT) AS stratum, CAST(n AS BIGINT) AS n,
      |  CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
      |  CAST(mean_t_milli AS BIGINT) AS mean_t_milli,
      |  CAST(mean_c_milli AS BIGINT) AS mean_c_milli,
      |  CAST(mean_t_milli - mean_c_milli AS BIGINT) AS diff_milli,
      |  CAST(ate_milli AS BIGINT) AS ate_milli
      |FROM m, t ORDER BY stratum""".stripMargin,
    "q451_reciprocity" -> """
      |WITH t AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
      |      AS prev_type,
      |    event_type AS curr_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type AS a, curr_type AS b, CAST(count(*) AS BIGINT) AS n
      |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |cf AS (SELECT * FROM c WHERE a <> b),
      |j AS (
      |  SELECT cf.a, cf.b, cf.n, r.n AS n_rev
      |  FROM cf LEFT JOIN cf r ON r.a = cf.b AND r.b = cf.a)
      |SELECT CAST(sum(n) AS BIGINT) AS total_flow,
      |  CAST(sum(least(n, coalesce(n_rev, 0))) AS BIGINT) AS recip_flow,
      |  CAST(sum(least(n, coalesce(n_rev, 0))) * 10000 // sum(n) AS BIGINT)
      |    AS reciprocity_bp
      |FROM j""".stripMargin,
    "q452_degree_hist" -> """
      |WITH t AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
      |      AS prev_type,
      |    event_type AS curr_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type, curr_type, CAST(count(*) AS BIGINT) AS n
      |  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |deg AS (SELECT prev_type, sum(n) AS d FROM c GROUP BY 1)
      |SELECT CAST(length(bin(d)) AS INTEGER) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(sum(d) AS BIGINT) AS edge_mass
      |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q453_engagement_gini" -> """
      |WITH pu AS (
      |  SELECT event_type, user_id, count(*) AS cnt FROM events
      |  WHERE user_id IS NOT NULL AND user_id >= 0 GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, cnt, row_number() OVER (PARTITION BY event_type
      |    ORDER BY cnt, user_id) AS i
      |  FROM pu),
      |a AS (
      |  SELECT event_type, count(*) AS n, sum(cnt) AS s,
      |    sum(CAST(i AS HUGEINT) * cnt) AS isum
      |  FROM r GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(((2 * isum) - ((CAST(n AS HUGEINT) + 1) * s)) * 10000
      |    // (CAST(n AS HUGEINT) * s) AS BIGINT) AS gini_bp
      |FROM a ORDER BY event_type""".stripMargin,
    "q439_bot_regularity" -> """
      |WITH g AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id)) // 1000000 AS g
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |a AS (
      |  SELECT user_id, count(*) AS n_gaps, sum(g) AS s,
      |    sum(CAST(g AS HUGEINT) * g) AS q
      |  FROM g WHERE g IS NOT NULL
      |  GROUP BY 1 HAVING count(*) >= 10),
      |m AS (
      |  SELECT user_id, n_gaps,
      |    CAST(CAST(s AS HUGEINT) * 1000 // n_gaps AS BIGINT)
      |      AS mean_s_milli,
      |    CAST((q * 1000 * n_gaps - CAST(s AS HUGEINT) * s * 1000)
      |      // (CAST(n_gaps AS HUGEINT) * (n_gaps - 1)) AS BIGINT)
      |      AS var_milli
      |  FROM a)
      |SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps, mean_s_milli,
      |  var_milli,
      |  CAST(CAST(var_milli AS HUGEINT) * 1000 * 1000
      |    // (CAST(mean_s_milli AS HUGEINT) * mean_s_milli) AS BIGINT)
      |    AS cv2_milli
      |FROM m WHERE mean_s_milli > 0
      |ORDER BY cv2_milli, user_id LIMIT 50""".stripMargin,
    "q423_rank_churn" -> """
      |WITH daily AS (
      |  SELECT event_type, CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(ts AS DATE)) AS BIGINT) AS d, user_id,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS amt
      |  FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0
      |  GROUP BY 1, 2, 3),
      |top AS (
      |  SELECT event_type, d, user_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type, d
      |      ORDER BY amt DESC, user_id) AS rk FROM daily)
      |  WHERE rk <= 10),
      |prev AS (SELECT event_type, d + 1 AS d, user_id FROM top),
      |pd AS (SELECT DISTINCT event_type, d FROM prev),
      |ov AS (
      |  SELECT t.event_type, t.d, count(*) AS ov
      |  FROM top t JOIN prev p USING (event_type, d, user_id)
      |  GROUP BY 1, 2),
      |cur AS (
      |  SELECT event_type, d, count(*) AS n_curr FROM top GROUP BY 1, 2)
      |SELECT c.event_type, c.d, CAST(n_curr AS BIGINT) AS n_curr,
      |  CAST(coalesce(ov, 0) AS BIGINT) AS n_kept,
      |  CAST((n_curr - coalesce(ov, 0)) * 10000 // n_curr AS BIGINT)
      |    AS churn_bp
      |FROM cur c JOIN pd USING (event_type, d)
      |LEFT JOIN ov USING (event_type, d)
      |ORDER BY event_type, d""".stripMargin,
    "q420_mcc" -> """
      |WITH d AS (
      |  SELECT source AS s,
      |    CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS p,
      |    CASE WHEN ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4 <> 0 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |c AS (
      |  SELECT s, sum(p * y) AS tp, sum(p * (1 - y)) AS fp,
      |    sum((1 - p) * y) AS fn, sum((1 - p) * (1 - y)) AS tn
      |  FROM d GROUP BY 1),
      |m AS (
      |  SELECT *, CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS num,
      |    CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn) AS den
      |  FROM c)
      |SELECT s AS source, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      |  CAST(sign(num) AS INTEGER) AS mcc_sign,
      |  CAST(CASE WHEN den > 0 THEN num * num * 1000 // den END AS BIGINT)
      |    AS mcc2_milli
      |FROM m ORDER BY source""".stripMargin,
    "q415_fairness_gaps" -> """
      |WITH d AS (
      |  SELECT source AS s, lang AS g,
      |    CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS p,
      |    CASE WHEN ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 4 <> 0 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |gr AS (
      |  SELECT s, g, count(*) AS n, sum(p) AS np, sum(y) AS ny,
      |    sum(p * y) AS tp, sum(p * (1 - y)) AS fp
      |  FROM d GROUP BY 1, 2),
      |w AS (
      |  SELECT *, sum(n) OVER (PARTITION BY s) AS tn,
      |    sum(np) OVER (PARTITION BY s) AS tnp,
      |    sum(ny) OVER (PARTITION BY s) AS tny,
      |    sum(tp) OVER (PARTITION BY s) AS ttp,
      |    sum(fp) OVER (PARTITION BY s) AS tfp
      |  FROM gr)
      |SELECT s AS source, g AS lang, CAST(n AS BIGINT) AS n,
      |  CAST(np * 10000 // n AS BIGINT) AS sel_bp,
      |  CAST(tp * 10000 // NULLIF(ny, 0) AS BIGINT) AS tpr_bp,
      |  CAST(fp * 10000 // NULLIF(n - ny, 0) AS BIGINT) AS fpr_bp,
      |  CAST(np * 10000 // n - tnp * 10000 // tn AS BIGINT) AS sel_gap_bp,
      |  CAST(tp * 10000 // NULLIF(ny, 0)
      |    - ttp * 10000 // NULLIF(tny, 0) AS BIGINT) AS tpr_gap_bp,
      |  CAST(fp * 10000 // NULLIF(n - ny, 0)
      |    - tfp * 10000 // NULLIF(tn - tny, 0) AS BIGINT) AS fpr_gap_bp
      |FROM w ORDER BY source, lang""".stripMargin,
    "q416_smd_balance" -> """
      |WITH d AS (
      |  SELECT event_type AS s,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND value >= 0
      |    AND user_id IS NOT NULL AND user_id >= 0),
      |arms AS (
      |  SELECT s, t, count(*) AS n, sum(v) AS sm,
      |    sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM d GROUP BY 1, 2 HAVING count(*) >= 2),
      |mv AS (
      |  SELECT s, t, n,
      |    CAST(CAST(sm AS HUGEINT) * 1000 // n AS BIGINT) AS m_milli,
      |    CAST((q * 1000 * n - CAST(sm AS HUGEINT) * sm * 1000)
      |      // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS v_milli
      |  FROM arms),
      |j AS (
      |  SELECT a.s, a.n AS n1, b.n AS n0,
      |    a.m_milli - b.m_milli AS d_milli,
      |    (a.v_milli + b.v_milli) // 2 AS vp
      |  FROM mv a JOIN mv b ON a.s = b.s AND a.t = 1 AND b.t = 0)
      |SELECT s AS event_type, CAST(n1 AS BIGINT) AS n1,
      |  CAST(n0 AS BIGINT) AS n0, CAST(d_milli AS BIGINT) AS d_milli,
      |  CAST(CAST(d_milli AS HUGEINT) * d_milli // vp AS BIGINT)
      |    AS smd2_milli
      |FROM j WHERE vp > 0 ORDER BY event_type""".stripMargin,
    "q418_power_plan" -> """
      |WITH d AS (
      |  SELECT event_type AS s, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND value >= 0),
      |a AS (
      |  SELECT s, count(*) AS n_obs, sum(v) AS sm,
      |    sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM d GROUP BY 1 HAVING count(*) >= 2),
      |m AS (
      |  SELECT s, n_obs,
      |    CAST(CAST(sm AS HUGEINT) * 1000 // n_obs AS BIGINT) AS mean_milli,
      |    CAST((q * 1000 * n_obs - CAST(sm AS HUGEINT) * sm * 1000)
      |      // (CAST(n_obs AS HUGEINT) * (n_obs - 1)) AS BIGINT)
      |      AS var_milli
      |  FROM a),
      |p AS (
      |  SELECT *, abs(mean_milli) * 50 // 1000 AS delta_milli FROM m)
      |SELECT s AS event_type, CAST(n_obs AS BIGINT) AS n_obs,
      |  mean_milli, var_milli, CAST(delta_milli AS BIGINT) AS delta_milli,
      |  CAST(CAST(15697 AS HUGEINT) * var_milli
      |    // NULLIF(CAST(delta_milli AS HUGEINT) * delta_milli, 0)
      |    AS BIGINT) AS n_required
      |FROM p ORDER BY event_type""".stripMargin,
    "q410_period_scan" -> """
      |WITH daily AS (
      |  SELECT event_type AS k,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |pers AS (SELECT * FROM (VALUES (2), (3), (4), (5), (6), (7), (8),
      |  (9), (10), (14)) t(period)),
      |b AS (
      |  SELECT k, period, d % period AS ph, count(*) AS c, sum(x) AS s
      |  FROM daily CROSS JOIN pers GROUP BY 1, 2, 3),
      |a AS (
      |  SELECT k, period,
      |    sum(CAST(s AS HUGEINT) * s * 1000000 // c) AS aa
      |  FROM b GROUP BY 1, 2),
      |tot AS (
      |  SELECT k, count(*) AS n_ticks, sum(x) AS sm,
      |    sum(CAST(x AS HUGEINT) * x) AS q
      |  FROM daily GROUP BY 1),
      |t2 AS (
      |  SELECT k, n_ticks, q,
      |    CAST(sm AS HUGEINT) * sm * 1000000 // n_ticks AS bb
      |  FROM tot)
      |SELECT a.k AS event_type, a.period, CAST(n_ticks AS BIGINT) AS n_ticks,
      |  CAST(greatest(aa - bb, CAST(0 AS HUGEINT)) * 1000
      |    // (q * 1000000 - bb) AS BIGINT) AS score_milli
      |FROM a JOIN t2 ON a.k = t2.k
      |WHERE q * 1000000 - bb > 0
      |ORDER BY event_type, period""".stripMargin,
    "q406_kruskal_wallis" -> """
      |WITH d AS (
      |  SELECT event_type AS s, user_id % 4 AS g,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0),
      |r AS (
      |  SELECT s, g, v,
      |    rank() OVER (PARTITION BY s ORDER BY v) * 2
      |      + count(*) OVER (PARTITION BY s, v) - 1 AS hr
      |  FROM d),
      |arms AS (
      |  SELECT s, g, count(*) AS n, sum(hr) AS hrs FROM r GROUP BY 1, 2),
      |qs AS (
      |  SELECT s, count(*) AS n_groups, sum(n) AS n_total,
      |    sum(CAST(hrs AS HUGEINT) * hrs * 1000 // n) AS qsum
      |  FROM arms GROUP BY 1),
      |ties AS (
      |  SELECT s, sum(CAST(t AS HUGEINT) * t * t - t) AS tsum
      |  FROM (SELECT s, v, count(*) AS t FROM d GROUP BY 1, 2)
      |  GROUP BY 1),
      |f AS (
      |  SELECT qs.s, n_groups, n_total, qsum, tsum,
      |    CAST(n_total AS HUGEINT) AS nn,
      |    CAST(n_total AS HUGEINT) * n_total * n_total - n_total AS cube
      |  FROM qs JOIN ties ON qs.s = ties.s WHERE n_groups >= 2)
      |SELECT s AS event_type, CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(n_total AS BIGINT) AS n_total, CAST(tsum AS BIGINT) AS tie_t,
      |  CAST(greatest(3 * qsum - 3000 * nn * (nn + 1) * (nn + 1),
      |      CAST(0 AS HUGEINT))
      |    * cube // (nn * (nn + 1) * (cube - tsum)) AS BIGINT) AS h_milli
      |FROM f WHERE cube > tsum ORDER BY event_type""".stripMargin,
    "q407_cochran_armitage" -> """
      |WITH d AS (
      |  SELECT user_id % 4 AS s,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |      AS BIGINT) AS x,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |a AS (
      |  SELECT s, count(*) AS n_total, sum(y) AS n_pos, sum(x) AS sx,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sr
      |  FROM d GROUP BY 1),
      |u AS (
      |  SELECT s, n_total, n_pos,
      |    CAST(n_total AS HUGEINT) * sr - CAST(n_pos AS HUGEINT) * sx AS uu,
      |    CAST(n_pos AS HUGEINT) * (n_total - n_pos)
      |      * (CAST(n_total AS HUGEINT) * sxx
      |         - CAST(sx AS HUGEINT) * sx) AS vv
      |  FROM a)
      |SELECT s AS cohort, CAST(n_total AS BIGINT) AS n_total,
      |  CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(sign(uu) AS INTEGER) AS trend_sign,
      |  CAST(1000 * CAST(n_total AS HUGEINT) * uu * uu // vv AS BIGINT)
      |    AS z2_milli
      |FROM u WHERE vv > 0 ORDER BY cohort""".stripMargin,
    "q408_krippendorff" -> """
      |WITH r AS (
      |  SELECT source AS s, doc_id AS u, lang AS c FROM documents
      |  UNION ALL
      |  SELECT source, doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN 'l' || CAST(doc_id % 3 AS VARCHAR)
      |      ELSE lang END
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT source, doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END
      |  FROM documents WHERE doc_id % 3 = 0),
      |cell AS (SELECT s, u, c, count(*) AS nuc FROM r GROUP BY 1, 2, 3),
      |units AS (
      |  SELECT s, u, c, nuc, sum(nuc) OVER (PARTITION BY s, u) AS m
      |  FROM cell QUALIFY m >= 2),
      |u2 AS (
      |  SELECT s, u, m, sum(CAST(nuc AS HUGEINT) * (m - nuc)) AS dis
      |  FROM units GROUP BY 1, 2, 3),
      |so AS (
      |  SELECT s, sum(1000000 * dis // (m - 1)) AS ss,
      |    sum(m) AS n_ratings, count(*) AS n_units
      |  FROM u2 GROUP BY 1),
      |ct AS (SELECT s, c, sum(nuc) AS nc FROM units GROUP BY 1, 2),
      |e AS (
      |  SELECT s, sum(CAST(nc AS HUGEINT) * (n - nc)) AS ee
      |  FROM (SELECT s, nc, sum(nc) OVER (PARTITION BY s) AS n FROM ct)
      |  GROUP BY 1)
      |SELECT so.s AS source, CAST(n_units AS BIGINT) AS n_units,
      |  CAST(n_ratings AS BIGINT) AS n_ratings,
      |  CAST(1000000 - ss * (n_ratings - 1) // ee AS BIGINT) AS alpha_ppm
      |FROM so JOIN e ON so.s = e.s WHERE ee > 0
      |ORDER BY source""".stripMargin,
    "q409_simpson_reversal" -> """
      |WITH d AS (
      |  SELECT event_type AS s,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |      AS BIGINT) AS g,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
      |    CASE WHEN CAST(round(value * 100) AS BIGINT) >= 3500
      |      THEN 1 ELSE 0 END AS y
      |  FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0),
      |st AS (
      |  SELECT s, g,
      |    sum(CASE WHEN t = 1 THEN y END) AS a,
      |    sum(CASE WHEN t = 1 THEN 1 END) AS n1,
      |    sum(CASE WHEN t = 0 THEN y END) AS b,
      |    sum(CASE WHEN t = 0 THEN 1 END) AS n0
      |  FROM d GROUP BY 1, 2),
      |sg AS (
      |  SELECT s, g, a, n1, b, n0,
      |    CAST(sign(CAST(a AS HUGEINT) * n0 - CAST(b AS HUGEINT) * n1)
      |      AS INTEGER) AS sgn
      |  FROM st WHERE n1 > 0 AND n0 > 0),
      |p AS (
      |  SELECT s, sum(a) AS aa, sum(n1) AS nn1, sum(b) AS bb,
      |    sum(n0) AS nn0,
      |    sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS strata_pos,
      |    sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS strata_neg,
      |    sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS strata_zero,
      |    count(*) AS n_strata
      |  FROM sg GROUP BY 1),
      |ps AS (
      |  SELECT *, CAST(sign(CAST(aa AS HUGEINT) * nn0
      |    - CAST(bb AS HUGEINT) * nn1) AS INTEGER) AS pooled_sign
      |  FROM p)
      |SELECT s AS event_type, CAST(n_strata AS BIGINT) AS n_strata,
      |  CAST(strata_pos AS BIGINT) AS strata_pos,
      |  CAST(strata_neg AS BIGINT) AS strata_neg,
      |  CAST(strata_zero AS BIGINT) AS strata_zero, pooled_sign,
      |  (pooled_sign = 1 AND strata_pos = 0 AND strata_neg > 0)
      |    OR (pooled_sign = -1 AND strata_neg = 0 AND strata_pos > 0)
      |    AS reversal
      |FROM ps ORDER BY event_type""".stripMargin,
    "q404_jackknife_ratio" -> """
      |WITH u AS (
      |  SELECT event_type AS s, user_id AS uid,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS y
      |  FROM events
      |  WHERE value IS NOT NULL AND value >= 0
      |    AND user_id IS NOT NULL AND user_id >= 0
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT s, uid % 32 AS gk, sum(y) AS sg, count(*) AS ng
      |  FROM u GROUP BY 1, 2),
      |t AS (
      |  SELECT s, sum(sg) AS s_all, sum(ng) AS n_all, count(*) AS g_cnt
      |  FROM g GROUP BY 1),
      |loo AS (
      |  SELECT g.s, t.s_all, t.n_all, t.g_cnt,
      |    CASE WHEN t.n_all <> g.ng THEN
      |      CAST(t.s_all - g.sg AS HUGEINT) * 1000 // (t.n_all - g.ng)
      |    END AS th
      |  FROM g JOIN t ON g.s = t.s),
      |f AS (
      |  SELECT s, s_all, n_all, g_cnt,
      |    count(*) FILTER (WHERE th IS NULL) AS n_degenerate,
      |    sum(th) AS st, sum(CAST(th AS HUGEINT) * th) AS qt
      |  FROM loo GROUP BY 1, 2, 3, 4)
      |SELECT s AS event_type, CAST(g_cnt AS BIGINT) AS n_groups,
      |  CAST(n_degenerate AS BIGINT) AS n_degenerate,
      |  CAST(CAST(s_all AS HUGEINT) * 1000 // n_all AS BIGINT)
      |    AS theta_milli,
      |  CASE WHEN n_degenerate = 0 THEN
      |    CAST((g_cnt - 1) * (qt - CAST(st AS HUGEINT) * st // g_cnt)
      |      // g_cnt AS BIGINT)
      |  END AS var_jk_q
      |FROM f ORDER BY event_type""".stripMargin,
    "q405_mann_kendall" -> """
      |WITH daily AS (
      |  SELECT event_type AS s,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT a.s, CAST(sign(b.v - a.v) AS BIGINT) AS sgn
      |  FROM daily a JOIN daily b ON a.s = b.s AND a.t < b.t),
      |sstat AS (SELECT s, CAST(sum(sgn) AS BIGINT) AS s_stat
      |  FROM p GROUP BY 1),
      |base AS (SELECT s, count(*) AS n FROM daily GROUP BY 1),
      |tie AS (
      |  SELECT s, sum(c * (c - 1) * (2 * c + 5)) AS tm
      |  FROM (SELECT s, v, count(*) AS c FROM daily GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT b.s AS event_type, CAST(b.n AS BIGINT) AS n,
      |  CAST(coalesce(ss.s_stat, 0) AS BIGINT) AS s_stat,
      |  CAST(b.n * (b.n - 1) * (2 * b.n + 5) - coalesce(tm, 0) AS BIGINT)
      |    AS var18,
      |  CASE WHEN b.n * (b.n - 1) * (2 * b.n + 5) - coalesce(tm, 0) > 0
      |  THEN CAST(sign(ss.s_stat) AS BIGINT)
      |    * CAST(18000 * ss.s_stat * ss.s_stat
      |        // (b.n * (b.n - 1) * (2 * b.n + 5) - coalesce(tm, 0))
      |      AS BIGINT)
      |  END AS trend_milli
      |FROM base b LEFT JOIN sstat ss ON b.s = ss.s
      |LEFT JOIN tie ON b.s = tie.s
      |ORDER BY event_type""".stripMargin,
    "q401_brown_forsythe" -> """
      |WITH d AS (
      |  SELECT event_type AS s, user_id % 4 AS g,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND user_id >= 0),
      |r AS (
      |  SELECT s, g, v,
      |    row_number() OVER (PARTITION BY s, g ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY s, g) AS n
      |  FROM d),
      |med AS (SELECT s, g, v AS m FROM r WHERE rn = (n + 1) // 2),
      |z AS (
      |  SELECT d.s, d.g, abs(d.v - med.m) AS z
      |  FROM d JOIN med ON d.s = med.s AND d.g = med.g),
      |gs AS (
      |  SELECT s, g, count(*) AS nj, sum(z) AS sj,
      |    sum(CAST(z AS HUGEINT) * z) AS qj,
      |    CAST(sum(z) AS HUGEINT) * sum(z) // count(*) AS t
      |  FROM z GROUP BY 1, 2),
      |a AS (
      |  SELECT s, count(*) AS k, sum(nj) AS n_total, sum(sj) AS s_all,
      |    sum(t) AS t_all, sum(qj) AS q_all
      |  FROM gs GROUP BY 1)
      |SELECT s AS event_type, CAST(k AS BIGINT) AS n_groups,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  CAST(greatest(t_all - CAST(s_all AS HUGEINT) * s_all // n_total,
      |    0) AS BIGINT) AS ssb_q,
      |  CAST(q_all - t_all AS BIGINT) AS ssw_q,
      |  CASE WHEN q_all - t_all > 0 THEN
      |    CAST(greatest(t_all - CAST(s_all AS HUGEINT) * s_all // n_total,
      |        0) * 1000 * (n_total - k) // ((k - 1) * (q_all - t_all))
      |      AS BIGINT)
      |  END AS f_milli
      |FROM a WHERE k >= 2 ORDER BY event_type""".stripMargin,
    "q402_sign_bh" -> """
      |WITH e AS (
      |  SELECT event_type, event_id, ts,
      |    CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) % 7 AS d
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (SELECT event_type, v AS med FROM r WHERE rn = (n + 1) // 2),
      |t AS (
      |  SELECT event_type, d, v,
      |    row_number() OVER (PARTITION BY event_type, d
      |      ORDER BY ts, event_id) AS rn
      |  FROM e),
      |cell AS (
      |  SELECT t.event_type, t.d,
      |    count(*) FILTER (WHERE t.v <> med.med) AS m,
      |    count(*) FILTER (WHERE t.v > med.med) AS x
      |  FROM t JOIN med USING (event_type) WHERE t.rn <= 12
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type, d,
      |    CAST(list_sum(list_transform(range(x, m + 1), j ->
      |        factorial(CAST(m AS INT)) // (factorial(CAST(j AS INT))
      |          * factorial(CAST(m - j AS INT)))))
      |      * 1000000 // (1 << m) AS BIGINT) AS p_ppm
      |  FROM cell),
      |b AS (
      |  SELECT event_type, d, p_ppm,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY p_ppm, d) AS rank,
      |    count(*) OVER (PARTITION BY event_type) AS m_tests
      |  FROM p),
      |c AS (
      |  SELECT *, max(CASE WHEN p_ppm * m_tests <= rank * 100000
      |      THEN rank END)
      |      OVER (PARTITION BY event_type) AS cut
      |  FROM b)
      |SELECT event_type, d AS dow, p_ppm, CAST(rank AS BIGINT) AS rank,
      |  CAST(m_tests AS BIGINT) AS m_tests,
      |  rank <= coalesce(cut, 0) AS rejected
      |FROM c ORDER BY event_type, dow""".stripMargin,
    "q393_bradley_terry" -> """
      |WITH li AS (
      |  SELECT l_orderkey AS ok, p_brand AS b,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |pr AS (
      |  SELECT x.b AS w, y.b AS l
      |  FROM li x JOIN li y ON y.ok = x.ok AND x.c > y.c AND x.b <> y.b),
      |pair AS (
      |  SELECT least(w, l) AS a, greatest(w, l) AS b,
      |    CAST(count(*) AS BIGINT) AS n_ab
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
      |         // NULLIF(tot, 0) AS s FROM r2, n2)
      |SELECT base.item, wins, games,
      |  CAST(s2.s AS BIGINT) AS strength_ppm
      |FROM base JOIN s2 USING (item)
      |ORDER BY item""".stripMargin,
    "q383_copeland" -> """
      |WITH li AS (
      |  SELECT l_orderkey AS ok, p_brand AS b,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |pr AS (
      |  SELECT x.b AS w, y.b AS l
      |  FROM li x JOIN li y ON y.ok = x.ok AND x.c > y.c AND x.b <> y.b),
      |rw AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS raw_wins
      |       FROM pr GROUP BY 1),
      |rl AS (SELECT l AS item, CAST(count(*) AS BIGINT) AS raw_losses
      |       FROM pr GROUP BY 1),
      |pair AS (
      |  SELECT least(w, l) AS a, greatest(w, l) AS b,
      |    CAST(sum(CASE WHEN w < l THEN 1 ELSE 0 END) AS BIGINT) AS w_lo,
      |    CAST(sum(CASE WHEN w < l THEN 0 ELSE 1 END) AS BIGINT) AS w_hi
      |  FROM pr GROUP BY 1, 2),
      |sides AS (
      |  SELECT a AS item,
      |    CASE WHEN w_lo > w_hi THEN 1 ELSE 0 END AS mw,
      |    CASE WHEN w_lo < w_hi THEN 1 ELSE 0 END AS ml,
      |    CASE WHEN w_lo = w_hi THEN 1 ELSE 0 END AS mt
      |  FROM pair
      |  UNION ALL
      |  SELECT b AS item,
      |    CASE WHEN w_hi > w_lo THEN 1 ELSE 0 END,
      |    CASE WHEN w_hi < w_lo THEN 1 ELSE 0 END,
      |    CASE WHEN w_lo = w_hi THEN 1 ELSE 0 END
      |  FROM pair),
      |maj AS (
      |  SELECT item, CAST(sum(mw) AS BIGINT) AS maj_wins,
      |    CAST(sum(ml) AS BIGINT) AS maj_losses,
      |    CAST(sum(mt) AS BIGINT) AS maj_ties
      |  FROM sides GROUP BY 1)
      |SELECT item,
      |  coalesce(raw_wins, 0) AS raw_wins,
      |  coalesce(raw_losses, 0) AS raw_losses,
      |  coalesce(maj_wins, 0) AS maj_wins,
      |  coalesce(maj_losses, 0) AS maj_losses,
      |  coalesce(maj_ties, 0) AS maj_ties,
      |  coalesce(maj_wins, 0) - coalesce(maj_losses, 0) AS copeland
      |FROM rw
      |FULL OUTER JOIN rl USING (item)
      |FULL OUTER JOIN maj USING (item)
      |ORDER BY item""".stripMargin,
    "q377_welch_t" -> """
      |WITH x AS (
      |  SELECT user_id % 64 AS cohort,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS arm,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
      |g AS (
      |  SELECT cohort,
      |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1,
      |    CAST(count(*) FILTER (WHERE arm = 2) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN arm = 2 THEN v ELSE 0 END) AS BIGINT) AS s2,
      |    sum(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q1,
      |    sum(CASE WHEN arm = 2 THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS q2
      |  FROM x GROUP BY 1),
      |t AS (
      |  SELECT cohort, n1, n2,
      |    CAST(s1 * n2 - s2 * n1 AS BIGINT) AS diff_num,
      |    (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
      |      * n2 * n2 * (n2 - 1)
      |  + (CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
      |      * n1 * n1 * (n1 - 1) AS c
      |  FROM g WHERE n1 >= 2 AND n2 >= 2)
      |SELECT cohort, n1, n2, diff_num,
      |  CASE WHEN c > 0 THEN CAST(CAST(diff_num AS HUGEINT) * diff_num
      |    * (n1 - 1) * (n2 - 1) * 10000 // c AS BIGINT) END AS t2_bp
      |FROM t ORDER BY cohort""".stripMargin,
    "q378_changepoint" -> """
      |WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |pre AS (
      |  SELECT event_type, d AS idx,
      |    CAST(row_number() OVER w AS BIGINT) AS k,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
      |tot AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
      |    CAST(sum(n) AS BIGINT) AS t
      |  FROM daily GROUP BY 1),
      |scored AS (
      |  SELECT pre.event_type, idx, k, sk, dd, t,
      |    CAST((CAST(sk AS HUGEINT) * dd - CAST(t AS HUGEINT) * k)
      |       * (CAST(sk AS HUGEINT) * dd - CAST(t AS HUGEINT) * k) * 10000
      |       // (CAST(k AS HUGEINT) * (dd - k) * dd) AS BIGINT) AS score_q
      |  FROM pre JOIN tot ON tot.event_type = pre.event_type
      |  WHERE k < dd),
      |pick AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY score_q DESC, k) AS rn
      |  FROM scored)
      |SELECT event_type, dd AS n_points, k AS split_k, idx AS split_idx,
      |  score_q,
      |  CAST(sk * 100 // k AS BIGINT) AS left_mean_x100,
      |  CAST((t - sk) * 100 // (dd - k) AS BIGINT) AS right_mean_x100
      |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q338_dow_burst" -> """
      |WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, d, cnt,
      |    list_sort(list(cnt) OVER (PARTITION BY event_type, d % 7
      |      ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)) AS fr
      |  FROM daily)
      |SELECT event_type, CAST(d % 7 AS BIGINT) AS dow, d, cnt,
      |  CAST(CASE WHEN len(fr) = 3 THEN fr[(len(fr) + 1) // 2] END
      |    AS BIGINT) AS baseline_med,
      |  coalesce(cnt * 2 >= (CASE WHEN len(fr) = 3
      |    THEN fr[(len(fr) + 1) // 2] END) * 3, false) AS burst
      |FROM w ORDER BY 1, 3""".stripMargin,
    "q322_score_match" -> """
      |WITH e AS (
      |  SELECT event_type,
      |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
      |    CAST(user_id % 50 AS BIGINT) AS s,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL),
      |t AS MATERIALIZED (SELECT event_type, s, y FROM e WHERE tr = 1),
      |c AS MATERIALIZED (SELECT event_type, s AS cs, y AS yc FROM e
      |                   WHERE tr = 0),
      |n AS (
      |  SELECT t.event_type, t.s, t.y,
      |    (SELECT max(cs) FROM c
      |     WHERE c.event_type = t.event_type AND cs <= t.s) AS bt,
      |    (SELECT min(cs) FROM c
      |     WHERE c.event_type = t.event_type AND cs > t.s) AS ft
      |  FROM t),
      |p AS (
      |  SELECT n.*,
      |    (SELECT max(yc) FROM c
      |     WHERE c.event_type = n.event_type AND cs = bt) AS bp,
      |    (SELECT min(yc) FROM c
      |     WHERE c.event_type = n.event_type AND cs = ft) AS fp
      |  FROM n),
      |m AS (
      |  SELECT event_type, y,
      |    CASE WHEN bt IS NOT NULL AND (ft IS NULL OR s - bt <= ft - s)
      |         THEN bp ELSE fp END AS ym,
      |    CASE WHEN bt IS NOT NULL AND (ft IS NULL OR s - bt <= ft - s)
      |         THEN s - bt
      |         ELSE CASE WHEN ft IS NOT NULL THEN ft - s END END AS gap
      |  FROM p),
      |a AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n_treated,
      |    CAST(sum(CASE WHEN ym IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_matched,
      |    CAST(sum(CASE WHEN ym IS NOT NULL THEN y ELSE 0 END)
      |      AS BIGINT) AS sy_t,
      |    CAST(sum(coalesce(ym, 0)) AS BIGINT) AS sy_c,
      |    CAST(max(gap) AS BIGINT) AS max_gap
      |  FROM m GROUP BY 1)
      |SELECT event_type, n_treated, n_matched, sy_t, sy_c, max_gap,
      |  CAST(CAST(sign(sy_t - sy_c) AS BIGINT) *
      |    (abs(sy_t - sy_c) * 1000 // NULLIF(n_matched, 0)) AS BIGINT)
      |    AS att_milli
      |FROM a ORDER BY 1""".stripMargin,
    "q318_burst_days" -> """
      |WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, d, cnt,
      |    list_sort(list(cnt) OVER (PARTITION BY event_type ORDER BY d
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS fr
      |  FROM daily)
      |SELECT event_type, d, cnt,
      |  CAST(CASE WHEN len(fr) = 7 THEN fr[(len(fr) + 1) // 2] END
      |    AS BIGINT) AS baseline_med,
      |  coalesce(cnt * 2 >= (CASE WHEN len(fr) = 7
      |    THEN fr[(len(fr) + 1) // 2] END) * 3, false) AS burst
      |FROM w ORDER BY 1, 2""".stripMargin,
    "q312_srm" -> """
      |WITH u AS (
      |  SELECT event_type, user_id,
      |    CAST(max(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS arm,
      |    CAST(min(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS arm_min
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT event_type,
      |    CAST(sum(1 - arm) AS BIGINT) AS n0,
      |    CAST(sum(arm) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN arm <> arm_min THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_mixed
      |  FROM u GROUP BY 1)
      |SELECT event_type, n0, n1, n_mixed,
      |  CAST((n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) AS BIGINT)
      |    AS chi2_milli,
      |  (n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) > 3841 AS srm
      |FROM a ORDER BY 1""".stripMargin,
    "q311_cuped" -> """
      |WITH u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS HUGEINT) AS x,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS HUGEINT) AS y,
      |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |a AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
      |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy,
      |    CAST(sum(t) AS HUGEINT) AS n_t,
      |    sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS sx_t,
      |    sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sy_t
      |  FROM u),
      |b AS (
      |  SELECT *, n - n_t AS n_c, sx - sx_t AS sx_c, sy - sy_t AS sy_c
      |  FROM a),
      |m AS (
      |  SELECT 'all' AS exp, CAST(n_t AS BIGINT) AS n_t,
      |    CAST(n_c AS BIGINT) AS n_c,
      |    CAST(sign(n * sxy - sx * sy) AS BIGINT) *
      |      CAST(abs(n * sxy - sx * sy) * 1000
      |        // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS theta_milli,
      |    CAST(sign(sx_t * n_c - sx_c * n_t) AS BIGINT) *
      |      CAST(abs(sx_t * n_c - sx_c * n_t) * 1000
      |        // NULLIF(n_t * n_c, 0) AS BIGINT) AS dx_milli,
      |    CAST(sign(sy_t * n_c - sy_c * n_t) AS BIGINT) *
      |      CAST(abs(sy_t * n_c - sy_c * n_t) * 1000
      |        // NULLIF(n_t * n_c, 0) AS BIGINT) AS dy_milli
      |  FROM b)
      |SELECT exp, n_t, n_c, theta_milli, dx_milli, dy_milli,
      |  CAST(dy_milli -
      |    CAST(sign(CAST(theta_milli AS HUGEINT) * dx_milli) AS BIGINT) *
      |    CAST(abs(CAST(theta_milli AS HUGEINT) * dx_milli) // 1000
      |      AS BIGINT) AS BIGINT) AS adj_dy_milli
      |FROM m""".stripMargin,
    "q308_did" -> """
      |WITH e AS (
      |  SELECT event_type,
      |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS tr,
      |    CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS po,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |a AS (
      |  SELECT event_type,
      |    CAST(sum(CASE WHEN tr=0 AND po=0 THEN 1 END) AS HUGEINT) AS n00,
      |    CAST(sum(CASE WHEN tr=0 AND po=1 THEN 1 END) AS HUGEINT) AS n01,
      |    CAST(sum(CASE WHEN tr=1 AND po=0 THEN 1 END) AS HUGEINT) AS n10,
      |    CAST(sum(CASE WHEN tr=1 AND po=1 THEN 1 END) AS HUGEINT) AS n11,
      |    CAST(sum(CASE WHEN tr=0 AND po=0 THEN cents END) AS HUGEINT)
      |      AS s00,
      |    CAST(sum(CASE WHEN tr=0 AND po=1 THEN cents END) AS HUGEINT)
      |      AS s01,
      |    CAST(sum(CASE WHEN tr=1 AND po=0 THEN cents END) AS HUGEINT)
      |      AS s10,
      |    CAST(sum(CASE WHEN tr=1 AND po=1 THEN cents END) AS HUGEINT)
      |      AS s11
      |  FROM e GROUP BY 1),
      |d AS (
      |  SELECT *,
      |    (s11 * n10 - s10 * n11) * n01 * n00 -
      |      (s01 * n00 - s00 * n01) * n11 * n10 AS num,
      |    NULLIF(n11 * n10 * n01 * n00, 0) AS den
      |  FROM a)
      |SELECT event_type,
      |  CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
      |  CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
      |  CAST(s00 AS BIGINT) AS s00, CAST(s01 AS BIGINT) AS s01,
      |  CAST(s10 AS BIGINT) AS s10, CAST(s11 AS BIGINT) AS s11,
      |  CAST(CAST(sign(num) AS BIGINT) * (abs(num) * 1000 // den)
      |    AS BIGINT) AS did_milli
      |FROM d ORDER BY 1""".stripMargin,
    "q272_stl_lite" -> """
      |WITH daily AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, d, v, d % 7 AS dow,
      |    CASE WHEN count(*) OVER w = 7 THEN
      |      CAST(sum(v) OVER w AS BIGINT) END AS trend_num,
      |    CASE WHEN count(*) OVER w = 7 THEN
      |      CAST(v * 7 - sum(v) OVER w AS BIGINT) END AS det_num
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |seas AS (
      |  SELECT event_type, dow,
      |    CAST(sum(det_num) AS BIGINT) AS seas_num,
      |    CAST(count(*) * 7 AS BIGINT) AS seas_den
      |  FROM t WHERE det_num IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, d, v, CAST(dow AS BIGINT) AS dow, trend_num,
      |  det_num, seas_num, seas_den,
      |  CAST(det_num * (seas_den // 7) - seas_num AS BIGINT) AS res_num,
      |  seas_den AS res_den
      |FROM t LEFT JOIN seas USING (event_type, dow)
      |ORDER BY event_type, d""".stripMargin,
    "q265_cmh" -> """
      |SELECT o_orderpriority AS stratum, count(*) AS n,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 2 = 0
      |    AND o_orderstatus = 'F') AS BIGINT) AS a,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS r1,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS c1,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 2 = 0
      |      AND o_orderstatus = 'F') * count(*)
      |    - count(*) FILTER (WHERE o_orderkey % 2 = 0)
      |      * count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
      |    AS term_num,
      |  count(*) AS term_den,
      |  CAST((count(*) FILTER (WHERE o_orderkey % 2 = 0
      |      AND o_orderstatus = 'F') * count(*)
      |    - count(*) FILTER (WHERE o_orderkey % 2 = 0)
      |      * count(*) FILTER (WHERE o_orderstatus = 'F')) * 1000000
      |    // count(*) AS BIGINT) AS term_ppm
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q262_mase" -> """
      |WITH daily AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |f AS (
      |  SELECT a.event_type, count(*) AS n_f, sum(abs(a.v - b.v)) AS ae_f
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d = b.d + 7
      |  GROUP BY 1),
      |nn AS (
      |  SELECT a.event_type, count(*) AS n_n, sum(abs(a.v - b.v)) AS ae_n
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d = b.d + 1
      |  GROUP BY 1)
      |SELECT event_type, CAST(n_f AS BIGINT) AS n_f,
      |  CAST(ae_f AS BIGINT) AS ae_f, CAST(n_n AS BIGINT) AS n_n,
      |  CAST(ae_n AS BIGINT) AS ae_n,
      |  CAST((ae_f * n_n * 10000) // NULLIF(ae_n * n_f, 0) AS BIGINT)
      |    AS mase_bp
      |FROM f JOIN nn USING (event_type) ORDER BY event_type""".stripMargin,
    "q264_mix_shift" -> """
      |WITH base AS (
      |  SELECT event_type,
      |    CASE WHEN day(CAST(ts AS DATE)) <= 15 THEN 'A' ELSE 'B' END
      |      AS period,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT period, CAST(sum(n) AS BIGINT) AS tn
      |        FROM base GROUP BY 1),
      |x AS (
      |  SELECT event_type, period, n, s,
      |    n * 1000000 // tn AS share_ppm, s // n AS rate
      |  FROM base JOIN tot USING (period)),
      |a AS (SELECT event_type, n AS n_a, s AS s_a,
      |        share_ppm AS share_a_ppm, rate AS rate_a
      |      FROM x WHERE period = 'A'),
      |b AS (SELECT event_type, n AS n_b, s AS s_b,
      |        share_ppm AS share_b_ppm, rate AS rate_b
      |      FROM x WHERE period = 'B')
      |SELECT event_type,
      |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
      |  CAST(coalesce(s_a, 0) AS BIGINT) AS s_a,
      |  CAST(coalesce(share_a_ppm, 0) AS BIGINT) AS share_a_ppm,
      |  CAST(coalesce(rate_a, 0) AS BIGINT) AS rate_a,
      |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
      |  CAST(coalesce(s_b, 0) AS BIGINT) AS s_b,
      |  CAST(coalesce(share_b_ppm, 0) AS BIGINT) AS share_b_ppm,
      |  CAST(coalesce(rate_b, 0) AS BIGINT) AS rate_b,
      |  CAST((coalesce(share_b_ppm, 0) - coalesce(share_a_ppm, 0))
      |    * coalesce(rate_a, 0) AS BIGINT) AS mix_contrib,
      |  CAST(coalesce(share_b_ppm, 0)
      |    * (coalesce(rate_b, 0) - coalesce(rate_a, 0)) AS BIGINT)
      |    AS rate_contrib
      |FROM a FULL JOIN b USING (event_type)
      |ORDER BY event_type""".stripMargin,
    "q256_kl_drift" -> """
      |WITH cell AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort, event_type,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT co.cohort, ty.event_type
      |  FROM (SELECT DISTINCT cohort FROM cell) co,
      |       (SELECT DISTINCT event_type FROM cell) ty),
      |f AS (
      |  SELECT g.cohort, g.event_type, coalesce(c, 0) AS c
      |  FROM grid g LEFT JOIN cell
      |    ON cell.cohort = g.cohort AND cell.event_type = g.event_type),
      |sm AS (
      |  SELECT f.cohort, f.event_type, r.c + 1 AS a, f.c + 1 AS b
      |  FROM f JOIN (SELECT event_type, c FROM f WHERE cohort = 0) r
      |    USING (event_type)),
      |t AS (
      |  SELECT cohort, a, b,
      |    sum(a) OVER (PARTITION BY cohort) AS na,
      |    sum(b) OVER (PARTITION BY cohort) AS nb
      |  FROM sm),
      |agg AS (
      |  SELECT cohort, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |    CAST(sum(b * (length(bin(CAST(b AS BIGINT)))
      |      + length(bin(CAST(na AS BIGINT)))
      |      - length(bin(CAST(a AS BIGINT)))
      |      - length(bin(CAST(nb AS BIGINT))))) AS BIGINT) AS kl_bits_num
      |  FROM t GROUP BY cohort, na, nb)
      |SELECT cohort, na, nb, kl_bits_num,
      |  CAST(greatest(kl_bits_num, 0) * 100 // nb AS BIGINT) AS kl_cb
      |FROM agg ORDER BY cohort""".stripMargin,
    "q297_qte" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |         CASE event_type WHEN 'purchase' THEN 1 ELSE 2 END AS s,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
      |r AS (
      |  SELECT cohort, s, v,
      |    row_number() OVER (PARTITION BY cohort, s ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY cohort, s) AS n
      |  FROM x),
      |a AS (
      |  SELECT cohort,
      |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN s = 1 AND rn = (n * 25 + 99) // 100
      |      THEN v END) AS BIGINT) AS q1_p25,
      |    CAST(sum(CASE WHEN s = 2 AND rn = (n * 25 + 99) // 100
      |      THEN v END) AS BIGINT) AS q2_p25,
      |    CAST(sum(CASE WHEN s = 1 AND rn = (n * 50 + 99) // 100
      |      THEN v END) AS BIGINT) AS q1_p50,
      |    CAST(sum(CASE WHEN s = 2 AND rn = (n * 50 + 99) // 100
      |      THEN v END) AS BIGINT) AS q2_p50,
      |    CAST(sum(CASE WHEN s = 1 AND rn = (n * 75 + 99) // 100
      |      THEN v END) AS BIGINT) AS q1_p75,
      |    CAST(sum(CASE WHEN s = 2 AND rn = (n * 75 + 99) // 100
      |      THEN v END) AS BIGINT) AS q2_p75,
      |    CAST(sum(CASE WHEN s = 1 AND rn = (n * 90 + 99) // 100
      |      THEN v END) AS BIGINT) AS q1_p90,
      |    CAST(sum(CASE WHEN s = 2 AND rn = (n * 90 + 99) // 100
      |      THEN v END) AS BIGINT) AS q2_p90
      |  FROM r GROUP BY cohort)
      |SELECT cohort, n1, n2,
      |  q1_p25, q2_p25, q1_p50, q2_p50, q1_p75, q2_p75, q1_p90, q2_p90,
      |  q1_p25 - q2_p25 AS qte_p25, q1_p50 - q2_p50 AS qte_p50,
      |  q1_p75 - q2_p75 AS qte_p75, q1_p90 - q2_p90 AS qte_p90
      |FROM a ORDER BY cohort""".stripMargin,
    "q291_conformal" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |    abs(CAST(round(value * 100) AS BIGINT) - (event_id % 200) * 50)
      |      AS s
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT cohort, s,
      |    row_number() OVER (PARTITION BY cohort ORDER BY s) AS rn,
      |    count(*) OVER (PARTITION BY cohort) AS n
      |  FROM x)
      |SELECT cohort, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(((n + 1) * 90 + 99) // 100) AS BIGINT) AS k_a10,
      |  CAST(sum(CASE WHEN rn = ((n + 1) * 90 + 99) // 100 THEN s END)
      |    AS BIGINT) AS radius_a10,
      |  CAST(max(((n + 1) * 95 + 99) // 100) AS BIGINT) AS k_a5,
      |  CAST(sum(CASE WHEN rn = ((n + 1) * 95 + 99) // 100 THEN s END)
      |    AS BIGINT) AS radius_a5
      |FROM r GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q273_js_drift" -> """
      |WITH cell AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort, event_type,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT co.cohort, ty.event_type
      |  FROM (SELECT DISTINCT cohort FROM cell) co,
      |       (SELECT DISTINCT event_type FROM cell) ty),
      |f AS (
      |  SELECT g.cohort, g.event_type, coalesce(c, 0) AS c
      |  FROM grid g LEFT JOIN cell
      |    ON cell.cohort = g.cohort AND cell.event_type = g.event_type),
      |sm AS (
      |  SELECT f.cohort, f.event_type, r.c + 1 AS a, f.c + 1 AS b
      |  FROM f JOIN (SELECT event_type, c FROM f WHERE cohort = 0) r
      |    USING (event_type)),
      |t AS (
      |  SELECT cohort, a, b,
      |    CAST(sum(a) OVER (PARTITION BY cohort) AS BIGINT) AS na,
      |    CAST(sum(b) OVER (PARTITION BY cohort) AS BIGINT) AS nb
      |  FROM sm),
      |m AS (
      |  SELECT cohort, a, b, na, nb,
      |         CAST(a * nb + b * na AS BIGINT) AS mm,
      |         CAST(na * nb * 2 AS BIGINT) AS w
      |  FROM t),
      |agg AS (
      |  SELECT cohort, na, nb,
      |    CAST(sum(a * (length(bin(CAST(a AS BIGINT))) + length(bin(w))
      |      - length(bin(na)) - length(bin(mm)))) AS BIGINT) AS jsp_num,
      |    CAST(sum(b * (length(bin(CAST(b AS BIGINT))) + length(bin(w))
      |      - length(bin(nb)) - length(bin(mm)))) AS BIGINT) AS jsq_num
      |  FROM m GROUP BY cohort, na, nb)
      |SELECT cohort, na, nb, jsp_num, jsq_num,
      |  CAST(greatest(CAST(jsp_num AS HUGEINT) * nb
      |      + CAST(jsq_num AS HUGEINT) * na, 0) * 50
      |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS js_cb
      |FROM agg ORDER BY cohort""".stripMargin,
    "q258_pinball" -> """
      |WITH e AS (
      |  SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
      |         CAST(round(value * 100) AS BIGINT) AS y,
      |         (event_id % 200) * 50 AS yhat
      |  FROM events WHERE value IS NOT NULL),
      |x AS (SELECT e.*, q.range AS q FROM e,
      |      (SELECT unnest([50, 90]) AS range) q)
      |SELECT cohort, CAST(q AS BIGINT) AS q, count(*) AS n,
      |  CAST(sum(CASE WHEN y >= yhat THEN q * (y - yhat)
      |                ELSE (100 - q) * (yhat - y) END) AS BIGINT)
      |    AS loss_num,
      |  CAST(100 * count(*) AS BIGINT) AS loss_den
      |FROM x GROUP BY cohort, q ORDER BY cohort, q""".stripMargin,
    "q259_dispersion" -> """
      |WITH daily AS (
      |  SELECT event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |         count(*) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(cnt) AS BIGINT) AS sum_x,
      |  CAST(CASE WHEN count(*) >= 2 AND sum(cnt) <> 0 THEN
      |    count(*) * (count(*) * sum(cnt * cnt) - sum(cnt) * sum(cnt))
      |    END AS BIGINT) AS d_num,
      |  CAST(CASE WHEN count(*) >= 2 AND sum(cnt) <> 0 THEN
      |    count(*) * (count(*) - 1) * sum(cnt) END AS BIGINT) AS d_den
      |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q260_cramers_v" -> """
      |WITH base AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT seg, prio, count(*) AS n_xy FROM base GROUP BY 1, 2),
      |rx AS (SELECT seg, CAST(sum(n_xy) AS BIGINT) AS r_x
      |       FROM cells GROUP BY 1),
      |cy AS (SELECT prio, CAST(sum(n_xy) AS BIGINT) AS c_y
      |       FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS nt,
      |        CAST(count(DISTINCT seg) AS BIGINT) AS kr,
      |        CAST(count(DISTINCT prio) AS BIGINT) AS kc
      |      FROM cells),
      |grid AS (
      |  SELECT rx.seg, cy.prio, rx.r_x, cy.c_y FROM rx CROSS JOIN cy),
      |terms AS (
      |  -- dense grid: empty cells still contribute (0 - e)^2/e
      |  SELECT (coalesce(n_xy, 0) * nt - r_x * c_y) AS dd, nt, kr, kc,
      |         r_x, c_y
      |  FROM grid LEFT JOIN cells USING (seg, prio) CROSS JOIN n)
      |SELECT nt AS n_total, kr AS k_rows, kc AS k_cols,
      |  CAST(sum((CAST(dd AS HUGEINT) * dd * 100)
      |    // (CAST(nt AS HUGEINT) * r_x * c_y)) AS BIGINT) AS chi2_cb,
      |  CAST(sum((CAST(dd AS HUGEINT) * dd * 100)
      |    // (CAST(nt AS HUGEINT) * r_x * c_y)) * 10000
      |    // (nt * (least(kr, kc) - 1)) AS BIGINT) AS v2_ppm
      |FROM terms GROUP BY nt, kr, kc""".stripMargin,
    "q243_target_encode" -> """
      |WITH base AS (
      |  SELECT o_orderkey, c_mktsegment AS category,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |st AS (
      |  SELECT category, count(*) AS n_cat, sum(cents) AS s
      |  FROM base GROUP BY 1)
      |SELECT o_orderkey, category, cents,
      |  CAST(n_cat AS BIGINT) AS n_cat,
      |  CAST(CASE WHEN n_cat > 1 THEN s - cents END AS BIGINT) AS loo_num,
      |  CAST(CASE WHEN n_cat > 1 THEN n_cat - 1 END AS BIGINT) AS loo_den
      |FROM base JOIN st USING (category)
      |ORDER BY o_orderkey""".stripMargin,
    "q244_mcnemar" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |         (event_type = 'purchase') AS truth,
      |         (event_id % 3 = 0) AS pa, (event_id % 5 = 0) AS pb
      |  FROM events),
      |agg AS (
      |  SELECT cohort, count(*) AS n,
      |    count(*) FILTER (WHERE (pa = truth) AND NOT (pb = truth)) AS b,
      |    count(*) FILTER (WHERE NOT (pa = truth) AND (pb = truth)) AS c
      |  FROM x GROUP BY 1)
      |SELECT cohort, CAST(n AS BIGINT) AS n,
      |  CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
      |  CAST((b - c) * (b - c) AS BIGINT) AS stat_num,
      |  CAST(b + c AS BIGINT) AS stat_den
      |FROM agg ORDER BY cohort""".stripMargin,
    "q245_brier" -> """
      |WITH x AS (
      |  SELECT CAST(event_id % 101 AS BIGINT) AS p100,
      |         (event_type = 'purchase') AS pos
      |  FROM events),
      |agg AS (
      |  SELECT p100, count(*) AS n, count(*) FILTER (WHERE pos) AS s
      |  FROM x GROUP BY 1),
      |tot AS (SELECT sum(n) AS tn, sum(s) AS ts FROM agg)
      |SELECT p100, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
      |  CAST((p100 * n - 100 * s) * (p100 * n - 100 * s) AS BIGINT)
      |    AS rel_num,
      |  CAST(10000 * n AS BIGINT) AS rel_den,
      |  CAST((s * tn - ts * n) * (s * tn - ts * n) AS BIGINT) AS res_num,
      |  CAST(n * tn * tn AS BIGINT) AS res_den
      |FROM agg CROSS JOIN tot ORDER BY p100""".stripMargin,
    "q246_ece" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 3 AS BIGINT) AS model,
      |         CAST((event_id * 7) % 101 AS BIGINT) AS p100,
      |         (((event_id * 7) % 101 >= 50) = (event_type = 'purchase'))
      |           AS correct
      |  FROM events),
      |b AS (
      |  SELECT model, p100 // 10 AS bin, count(*) AS n,
      |         count(*) FILTER (WHERE correct) AS s, sum(p100) AS p
      |  FROM x GROUP BY 1, 2)
      |SELECT model, CAST(sum(n) AS BIGINT) AS n,
      |  CAST(sum(abs(100 * s - p)) AS BIGINT) AS ece_num,
      |  CAST(100 * sum(n) AS BIGINT) AS ece_den,
      |  CAST(sum(abs(100 * s - p)) * 10000 // (100 * sum(n)) AS BIGINT)
      |    AS ece_bp
      |FROM b GROUP BY model ORDER BY model""".stripMargin,
    "q247_mutual_info" -> """
      |WITH base AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT seg, prio, count(*) AS n_xy FROM base GROUP BY 1, 2),
      |rx AS (SELECT seg, CAST(sum(n_xy) AS BIGINT) AS r_x
      |       FROM cells GROUP BY 1),
      |cy AS (SELECT prio, CAST(sum(n_xy) AS BIGINT) AS c_y
      |       FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(n_xy) AS BIGINT) AS nt FROM cells)
      |SELECT seg, prio, CAST(n_xy AS BIGINT) AS n_xy, r_x, c_y,
      |  nt AS n_total,
      |  CAST(length(bin(n_xy)) + length(bin(nt))
      |     - length(bin(r_x)) - length(bin(c_y)) AS BIGINT) AS pmi_bits,
      |  CAST(n_xy * (length(bin(n_xy)) + length(bin(nt))
      |     - length(bin(r_x)) - length(bin(c_y))) AS BIGINT) AS mi_num
      |FROM cells JOIN rx USING (seg) JOIN cy USING (prio) CROSS JOIN n
      |ORDER BY seg, prio""".stripMargin,
    "q248_woe" -> """
      |WITH base AS (
      |  SELECT o_orderpriority AS category, (o_orderstatus = 'F') AS good
      |  FROM orders),
      |cat AS (
      |  SELECT category,
      |    CAST(count(*) FILTER (WHERE good) + 1 AS BIGINT) AS g,
      |    CAST(count(*) FILTER (WHERE NOT good) + 1 AS BIGINT) AS bd
      |  FROM base GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(g) AS BIGINT) AS tg, CAST(sum(bd) AS BIGINT) AS tb
      |  FROM cat)
      |SELECT category, g AS good, bd AS bad,
      |  tg AS good_total, tb AS bad_total,
      |  CAST(length(bin(g)) + length(bin(tb))
      |     - length(bin(bd)) - length(bin(tg)) AS BIGINT) AS woe_bits,
      |  CAST((g * tb - bd * tg) * (length(bin(g)) + length(bin(tb))
      |     - length(bin(bd)) - length(bin(tg))) AS BIGINT) AS iv_num,
      |  CAST(tg * tb AS BIGINT) AS iv_den
      |FROM cat CROSS JOIN tot ORDER BY category""".stripMargin,
    "q239_psi_drift" -> """
      |WITH cell AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort, event_type,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT co.cohort, br.event_type
      |  FROM (SELECT DISTINCT cohort FROM cell) co,
      |       (SELECT DISTINCT event_type FROM cell) br),
      |f AS (
      |  SELECT g.cohort, g.event_type, coalesce(c, 0) AS c
      |  FROM grid g LEFT JOIN cell
      |    ON cell.cohort = g.cohort AND cell.event_type = g.event_type),
      |sm AS (
      |  SELECT f.cohort, f.event_type,
      |         r.c + 1 AS a, f.c + 1 AS b
      |  FROM f JOIN (SELECT event_type, c FROM f WHERE cohort = 0) r
      |    USING (event_type)),
      |t AS (
      |  SELECT cohort,
      |    sum(a) OVER (PARTITION BY cohort) AS na,
      |    sum(b) OVER (PARTITION BY cohort) AS nb,
      |    a, b
      |  FROM sm),
      |t2 AS (
      |  SELECT cohort, na, nb, b * na AS bna, a * nb AS anb FROM t)
      |SELECT cohort, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
      |  CAST(sum((bna - anb) * (length(bin(bna)) - length(bin(anb))))
      |    AS BIGINT) AS psi_bits_num,
      |  CAST(sum((bna - anb) * (length(bin(bna)) - length(bin(anb))))
      |    * 100 // (na * nb) AS BIGINT) AS psi_cb
      |FROM t2 GROUP BY cohort, na, nb ORDER BY cohort""".stripMargin,
    "q235_weighted_jaccard" -> """
      |WITH cell AS (
      |  SELECT CAST(o_custkey % 4 AS BIGINT) AS cohort, p_brand,
      |         count(*) AS w
      |  FROM orders
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN part ON p_partkey = l_partkey
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT co.cohort, br.p_brand
      |  FROM (SELECT DISTINCT cohort FROM cell) co,
      |       (SELECT DISTINCT p_brand FROM cell) br),
      |f AS (
      |  SELECT g.cohort, g.p_brand, coalesce(w, 0) AS w
      |  FROM grid g LEFT JOIN cell
      |    ON cell.cohort = g.cohort AND cell.p_brand = g.p_brand)
      |SELECT a.cohort AS ca, b.cohort AS cb,
      |  CAST(sum(least(a.w, b.w)) AS BIGINT) AS min_sum,
      |  CAST(sum(greatest(a.w, b.w)) AS BIGINT) AS max_sum,
      |  CAST(sum(least(a.w, b.w)) * 10000 // sum(greatest(a.w, b.w))
      |    AS BIGINT) AS wj_bp
      |FROM f a JOIN f b ON a.p_brand = b.p_brand AND a.cohort < b.cohort
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q233_wasserstein" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |         CASE event_type WHEN 'purchase' THEN 1 ELSE 2 END AS s,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
      |cell AS (
      |  SELECT cohort, v,
      |         count(*) FILTER (WHERE s = 1) AS c1,
      |         count(*) FILTER (WHERE s = 2) AS c2
      |  FROM x GROUP BY cohort, v),
      |cum AS (
      |  SELECT cohort, v,
      |    sum(c1) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
      |    sum(c2) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
      |    sum(c1) OVER (PARTITION BY cohort) AS n1,
      |    sum(c2) OVER (PARTITION BY cohort) AS n2,
      |    coalesce(lead(v) OVER (PARTITION BY cohort ORDER BY v) - v, 0)
      |      AS gap
      |  FROM cell)
      |SELECT cohort, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(sum(abs(f1 * n2 - f2 * n1) * gap) AS BIGINT) AS w1_num
      |FROM cum GROUP BY cohort, n1, n2 ORDER BY cohort""".stripMargin,
    "q231_tv_distance" -> """
      |WITH cell AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort, event_type,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT co.cohort, ty.event_type
      |  FROM (SELECT DISTINCT cohort FROM cell) co,
      |       (SELECT DISTINCT event_type FROM cell) ty),
      |f AS (
      |  SELECT g.cohort, g.event_type, coalesce(c, 0) AS c
      |  FROM grid g LEFT JOIN cell
      |    ON cell.cohort = g.cohort AND cell.event_type = g.event_type),
      |ref AS (SELECT event_type, c AS c0 FROM f WHERE cohort = 0),
      |n AS (SELECT cohort, sum(c) AS n FROM f GROUP BY 1),
      |n0 AS (SELECT n AS n0 FROM n WHERE cohort = 0)
      |SELECT f.cohort, CAST(n.n AS BIGINT) AS n, CAST(n0.n0 AS BIGINT) AS n0,
      |  CAST(sum(abs(f.c * n0.n0 - ref.c0 * n.n)) AS BIGINT) AS tv_num,
      |  CAST(sum(abs(f.c * n0.n0 - ref.c0 * n.n)) * 10000
      |       // (2 * n.n * n0.n0) AS BIGINT) AS tv_bp
      |FROM f
      |JOIN ref ON ref.event_type = f.event_type
      |JOIN n ON n.cohort = f.cohort
      |CROSS JOIN n0
      |GROUP BY f.cohort, n.n, n0.n0 ORDER BY f.cohort""".stripMargin,
    "q232_debounce" -> """
      |WITH x AS (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      |  FROM events),
      |b AS (
      |  SELECT user_id,
      |    coalesce(us - lag(us) OVER (PARTITION BY user_id, event_type
      |      ORDER BY us, event_id) > 5000000, TRUE) AS f
      |  FROM x)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(count(*) FILTER (WHERE f) AS BIGINT) AS n_kept,
      |  CAST(count(*) FILTER (WHERE NOT f) AS BIGINT) AS n_dropped
      |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q228_fifo_match" -> """
      |WITH sup AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS q
      |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
      |dem AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS q
      |  FROM events WHERE event_type = 'click' AND value IS NOT NULL),
      |s2 AS (
      |  SELECT user_id, event_id AS s_id, sum(q) OVER w AS s_hi,
      |         sum(q) OVER w - q AS s_lo
      |  FROM sup WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |d2 AS (
      |  SELECT user_id, event_id AS d_id, sum(q) OVER w AS d_hi,
      |         sum(q) OVER w - q AS d_lo
      |  FROM dem WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT s2.user_id, s_id, d_id,
      |  CAST(least(s_hi, d_hi) - greatest(s_lo, d_lo) AS BIGINT) AS qty
      |FROM s2 JOIN d2 ON s2.user_id = d2.user_id
      |  AND s_lo < d_hi AND d_lo < s_hi
      |  AND least(s_hi, d_hi) - greatest(s_lo, d_lo) > 0
      |ORDER BY 1, 2, 3""".stripMargin,
    "q226_cube" -> """
      |WITH e AS (
      |  SELECT event_type,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
      |      AS BIGINT) AS dow7,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events)
      |SELECT coalesce(event_type, '(all)') AS etype,
      |  coalesce(dow7, -1) AS dow7,
      |  CAST(2 * GROUPING(event_type) + GROUPING(dow7) AS BIGINT) AS gid,
      |  count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_c
      |FROM e GROUP BY CUBE(event_type, dow7)
      |ORDER BY gid, etype, dow7""".stripMargin,
    "q216_mann_whitney" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 8 AS BIGINT) AS cohort,
      |         CASE event_type WHEN 'purchase' THEN 1 ELSE 2 END AS s,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
      |r AS (
      |  SELECT cohort, s,
      |         2 * rank() OVER (PARTITION BY cohort ORDER BY v)
      |           + count(*) OVER (PARTITION BY cohort, v) - 1 AS r_x2
      |  FROM x)
      |SELECT cohort,
      |  CAST(count(*) FILTER (WHERE s = 1) AS BIGINT) AS n1,
      |  CAST(count(*) FILTER (WHERE s = 2) AS BIGINT) AS n2,
      |  CAST(sum(r_x2) FILTER (WHERE s = 1)
      |       - count(*) FILTER (WHERE s = 1)
      |         * (count(*) FILTER (WHERE s = 1) + 1) AS BIGINT) AS u1_x2
      |FROM r GROUP BY cohort ORDER BY cohort""".stripMargin,
    "q217_ks_test" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |         CASE event_type WHEN 'purchase' THEN 1 ELSE 2 END AS s,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
      |cell AS (
      |  SELECT cohort, v,
      |         count(*) FILTER (WHERE s = 1) AS c1,
      |         count(*) FILTER (WHERE s = 2) AS c2
      |  FROM x GROUP BY cohort, v),
      |cum AS (
      |  SELECT cohort, v,
      |    sum(c1) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
      |    sum(c2) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2,
      |    sum(c1) OVER (PARTITION BY cohort) AS n1,
      |    sum(c2) OVER (PARTITION BY cohort) AS n2
      |  FROM cell),
      |dev AS (
      |  SELECT cohort, v, n1, n2, abs(f1 * n2 - f2 * n1) AS d,
      |         max(abs(f1 * n2 - f2 * n1)) OVER (PARTITION BY cohort) AS md
      |  FROM cum)
      |SELECT cohort, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(max(d) AS BIGINT) AS d_num,
      |  CAST(min(CASE WHEN d = md THEN v END) AS BIGINT) AS d_at
      |FROM dev GROUP BY cohort, n1, n2 ORDER BY cohort""".stripMargin,
    "q218_clamped_balance" -> """
      |WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type IN ('purchase', 'signup')
      |         THEN CAST(round(value * 100) AS BIGINT)
      |         ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
      |  FROM events WHERE value IS NOT NULL),
      |p AS (
      |  SELECT user_id, ts, event_id, delta,
      |    sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
      |  FROM e),
      |q AS (
      |  SELECT user_id, ts, event_id, delta,
      |    pre - least(0, min(pre) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS bal
      |  FROM p),
      |f AS (
      |  SELECT user_id, delta, bal,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM q)
      |SELECT user_id,
      |  CAST(max(CASE WHEN rn = 1 THEN bal END) AS BIGINT) AS final_c,
      |  CAST(max(bal) AS BIGINT) AS peak_c,
      |  CAST(count(*) FILTER (WHERE bal = 0 AND delta < 0) AS BIGINT)
      |    AS clamps,
      |  count(*) AS n_events
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q219_twap" -> """
      |WITH e AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d,
      |    epoch_us(ts) AS us, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |h AS (
      |  SELECT user_id, d, v,
      |    coalesce(lead(us) OVER (PARTITION BY user_id, d
      |        ORDER BY us, event_id),
      |      (d + 1) * 86400000000) - us AS held_one
      |  FROM e)
      |SELECT user_id, d,
      |  CAST(sum(v * held_one) // sum(held_one) AS BIGINT) AS twap_c,
      |  CAST(sum(held_one) AS BIGINT) AS held_us
      |FROM h GROUP BY user_id, d ORDER BY user_id, d""".stripMargin,
    "q220_rollup_revenue" -> """
      |SELECT coalesce(r_name, '(all)') AS region_name,
      |  coalesce(n_name, '(all)') AS nation_name,
      |  CAST(2 * GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS gid,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_c,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY gid, region_name, nation_name""".stripMargin,
    "q221_daily_pivot" -> """
      |SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |    AS BIGINT) AS d,
      |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
      |  count(*) FILTER (WHERE event_type IN
      |    ('click', 'error', 'purchase', 'signup', 'view')) AS n_total
      |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "q222_runs_test" -> """
      |WITH x AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(round(value * 100) AS BIGINT) >= 10000 AS hi
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT user_id, hi,
      |    CASE WHEN lag(hi) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) IS DISTINCT FROM hi
      |         THEN 1 ELSE 0 END AS b
      |  FROM x)
      |SELECT user_id,
      |  CAST(count(*) FILTER (WHERE hi) AS BIGINT) AS n_hi,
      |  CAST(count(*) FILTER (WHERE NOT hi) AS BIGINT) AS n_lo,
      |  CAST(sum(b) AS BIGINT) AS runs
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin)
}
