package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Quality, Udfs}
import graft.queries.SortBarrier._

/** Domain-operator surface over the synthetic tables (SURVEY.md §2.4–§2.8).
  *
  * The shop ETL semantics (promo parsing, unit standardization, discount
  * metrics, category cascade, quality scoring) are exercised through the
  * REAL engine code paths (the same UDFs/columns the adapters use) on inputs
  * synthesized deterministically from the TPC-H-ish tables; each oracle
  * recomputes the expected output analytically in SQL from the same
  * generator — an independent derivation, not a port of the Scala code.
  *
  * Money values flow through exact integer cents before aggregation/output
  * so the DuckDB compare is bit-stable.
  */
object Domain {

  /** Promotion mechanisms covering every pattern family in the registry,
    * keyed by `o_orderkey % 10`. Prices: pbb = (k%380)/100 + 0.2 €. */
  def q19PromoParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mechs = array(
      lit("2 voor 3.00"), lit("1+1 gratis"), lit("25% korting"), lit("-30%"),
      lit("2e halve prijs"), lit("2e gratis"), lit("- €0.50"),
      lit("vanaf €10"), lit("gratis bezorging"), lit("mega deal"))
    val df = graft.etl.Parallelism.spread(Tables.orders(spark, dir))
      .withColumn("pbb", (($"o_orderkey" % 19) + 1) * 20 / 100.0)
      .withColumn("mech", element_at(mechs, ($"o_orderkey" % 10).cast("int") + 1))
      .withColumn("p", Udfs.parsePromo($"mech", $"pbb", $"pbb"))
    df.select(
        $"o_orderkey",
        $"mech".as("mechanism"),
        $"p"("promo_type").as("promo_type"),
        round($"p"("effective_unit_price") * 100).cast("long").as("eff_cents"),
        coalesce($"p"("required_quantity"), lit(1.0)).as("required_qty"),
        round(coalesce($"p"("total_promotion_price"), $"pbb") * 100).cast("long")
          .as("total_cents"),
        coalesce($"p"("is_multi_purchase_required"), lit(false)).as("multi"))
      .sortedOnce($"o_orderkey")
  }

  /** Unit standardization + price-per-standard-unit (U1–U3) over aliases
    * keyed by `p_partkey % 12`; price = p_retailprice, amount = p_size. */
  def q20UnitStandardize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val units = array(
      lit("gram"), lit("kg"), lit("ml"), lit("cl"), lit("liter"), lit("stuks"),
      lit("per stuk"), lit("6 x 150g"), lit("12-pack"), lit("wasbeurten"),
      lit("onbekend"), lit("Meter"))
    // amount 1..5 and integer-euro price make every price/cf quotient land
    // far from half-cent rounding ties, so the DuckDB compare is bit-stable
    val df = Tables.part(spark, dir)
      .withColumn("unit_raw", element_at(units, ($"p_partkey" % 12).cast("int") + 1))
      .withColumn("amt", (($"p_partkey" % 5) + 1).cast("double"))
      .withColumn("price", round($"p_retailprice"))
      .withColumn("std", Udfs.standardizeQuantity($"amt", $"unit_raw"))
      .withColumn("ppu", Udfs.pricePerUnit($"price", $"std"("conversion_factor")))
    df.select(
        $"p_partkey", $"unit_raw",
        $"std"("unit").as("std_unit"),
        round($"std"("conversion_factor") * 1000).cast("long").as("cf_milli"),
        round($"ppu" * 100).cast("long").as("ppu_cents"))
      .orderBy($"p_partkey")
  }

  /** U4 discount metrics with exact-cents inputs keyed by `o_orderkey % 4`. */
  def q21DiscountMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val df = Tables.orders(spark, dir)
      .withColumn("orig", (($"o_orderkey" % 225) + 1) * 4 / 100.0 + 1.0)
      .withColumn("cur", $"orig" * (lit(1.0) - ($"o_orderkey" % 4) * 0.25))
      .withColumn("dm", Udfs.discountMetrics($"orig", $"cur"))
    df.select(
        $"o_orderkey",
        round($"dm"("amount") * 100).cast("long").as("amount_cents"),
        round($"dm"("percentage") * 10).cast("long").as("pct_deci"))
      .orderBy($"o_orderkey")
  }

  /** Category cascade (C1–C7) over a fixed input set keyed by
    * `p_partkey % 12`: exact, normalized, common-map, partial, ALDI special
    * case, fuzzy. The oracle is a literal truth table derived by hand from
    * the reference's normalizer semantics. */
  def q22CategoryNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cats = array(
      lit("Bakkerij"), lit("bakkerij"), lit("Zuivel, eieren"), lit("kaas"),
      lit("verse groenten"), lit("brood"), lit("Bakkerei"), lit("trots van aldi"),
      lit("aldi trots producten"), lit("wijn"), lit("Diepvriez"), lit("snacks"))
    val df = Tables.part(spark, dir)
      .withColumn("cat_raw", element_at(cats, ($"p_partkey" % 12).cast("int") + 1))
      .withColumn("c", Udfs.normalizeCategory($"p_name", $"cat_raw", lit("ALDI")))
    df.select($"p_partkey", $"cat_raw",
        $"c"("category").as("category"), $"c"("method").as("method"))
      .sortedOnce($"p_partkey")
  }

  /** Products synthesized from `part` (fields present/absent by partkey
    * bits) — the quality-scoring fixture shared by q23 and q49 so the two
    * oracles can never silently pin different inputs. */
  private[queries] def qualityFixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir).select(
      $"p_partkey",
      $"p_name".as("title"),
      when($"p_partkey" % 2 === 0, $"p_brand").otherwise(lit("")).as("brand"),
      when($"p_partkey" % 3 === 0, concat(lit("img/"), $"p_partkey"))
        .otherwise(lit("")).as("image_url"),
      when($"p_partkey" % 5 === 0, lit("Bakkerij")).otherwise(lit(null).cast("string"))
        .as("main_category"),
      ($"p_partkey" % 7 === 0).as("is_promotion"),
      lit("2 voor 3.00").as("promotion_mechanism"),
      ($"p_partkey" % 2 === 0).as("is_active"),
      when($"p_partkey" % 11 === 0, lit(0.0)).otherwise($"p_size".cast("double"))
        .as("quantity_amount"),
      lit("g").as("quantity_unit"),
      when($"p_partkey" % 13 === 0, lit(null).cast("double")).otherwise(lit(0.5))
        .as("conversion_factor"))
  }

  /** A4 quality scoring through the engine's scoring column on the shared
    * fixture. */
  def q23QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityFixture(spark, dir)
      .select($"p_partkey", Quality.score.cast("long").as("quality_score"))
      .orderBy($"p_partkey")
  }

  /** A9 promotion share ([[graft.etl.Analytics.promotionAnalysis]]) on a
    * shop/promo fixture synthesized from `part` by partkey bits. The
    * oracle compares the exact integer columns (n, n_promo, promo_bp);
    * the rounded display pct stays spec-only (2dp rounding of a binary
    * double is engine-dependent on ties). */
  def q340PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shops = array(lit("AH"), lit("JUMBO"), lit("ALDI"), lit("PLUS"))
    val unified = Tables.part(spark, dir).select(
      element_at(shops, ($"p_partkey" % 4).cast("int") + 1).as("shop_type"),
      ($"p_partkey" % 7 === 0).as("is_promotion"))
    graft.etl.Analytics.promotionAnalysis(unified)
      .select($"shop_type", $"n", $"n_promo", $"promo_bp")
      .orderBy($"shop_type")
  }

  /** A6 enricher deduct-from-100 rubric
    * ([[graft.etl.Analytics.enricherScore]], product-enricher.ts:425-503)
    * over the shared quality fixture extended with price columns — the
    * score is integer-valued, so the oracle twin is exact. */
  def q341EnricherScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityFixture(spark, dir)
      .withColumn("price_before_bonus",
        when($"p_partkey" % 17 === 0, lit(0.0)).otherwise(lit(2.5)))
      .withColumn("current_price",
        when($"p_partkey" % 19 === 0, lit(-1.0)).otherwise(lit(2.0)))
      .select($"p_partkey",
        graft.etl.Analytics.enricherScore.cast("long").as("enricher_score"))
      .orderBy($"p_partkey")
  }

  /** A13 error grouping with k deterministic examples
    * ([[graft.etl.Sinks.errorReport]], base.ts:626-667): errors
    * synthesized from `orders`, the examples array serialized via
    * array_join so the harness can hash it. */
  def q342ErrorReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val errs = Tables.orders(spark, dir)
      .filter($"o_orderkey" % 7 < 3)
      .select($"o_orderpriority".as("error_type"),
        $"o_orderkey".cast("string").as("product_id"))
    graft.etl.Sinks.errorReport(errs)
      .select($"error_type", $"n",
        array_join($"examples", ",").as("examples"))
      .orderBy($"n".desc, $"error_type")
  }

  /** A10 job-success-rate expression (postgres-adapter.ts:936-972) over the
    * events table treated as a job log: per event_type, percentage of
    * high-value events, ROUND(x,2) guarded by total>0. */
  def q24SuccessRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("total"),
        count(when($"value" > 100, 1)).as("success"))
      // no 2dp re-round on the quotient (decimal-tie trap — see q12); the
      // single exact-int division is bit-stable cross-engine
      .withColumn("success_rate",
        when($"total" > 0, $"success" * 100.0 / $"total").otherwise(lit(0.0)))
      .orderBy($"event_type")
  }

  /** JSON-path extraction over the schemaless props column (the raw.products
    * JSONB read path, §1.1): parse, bucket, aggregate — the generic-adapter
    * scan shape as an oracle-gated query. */
  def q33PropsParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy(($"k" % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"k_mod")
  }

  /** AS-OF join: each event matched to the user's most recent order at or
    * before the event time (ties: max orderkey). Union+window — one shuffle
    * on user_id, no range-join explosion. */
  def q34AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts")
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey".as("user_id"), $"o_orderdate", $"o_orderkey")
    graft.etl.TimeJoins.asofJoin(events, orders, "user_id", "ts",
        "o_orderdate", "o_orderkey")
      .select($"event_id", $"user_id", $"asof_o_orderkey")
      .orderBy($"event_id")
  }

  /** Forward as-of ([[graft.etl.TimeJoins.asofJoinForward]]): for each
    * event, the user's NEXT order at-or-after the event — same
    * union+window shape as q34's backward variant. */
  def q73AsofForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts")
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey".as("user_id"), $"o_orderdate", $"o_orderkey")
    graft.etl.TimeJoins.asofJoinForward(events, orders, "user_id", "ts",
        "o_orderdate", "o_orderkey")
      .select($"event_id", $"user_id", $"asoff_o_orderkey")
      .orderBy($"event_id")
  }

  /** Gap-based sessionization (24h gap) — session starts/ends as epoch
    * micros so the cross-engine compare never touches raw timestamps. */
  def q35Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.TimeJoins.sessionize(Tables.events(spark, dir), "user_id", "ts", "24 hours")
      .select($"user_id", unix_micros($"session_start").as("session_start_us"),
        $"n_events")
      .orderBy($"user_id", $"session_start_us")
  }

  /** Interval join ([[graft.etl.TimeJoins.rangeJoinBucketed]]): intervals
    * are 2h windows opened at every 10th event; each event of the same
    * user falling inside [start, start+2h) matches. Bucketed equi-join
    * (1h buckets → ≤3 buckets/interval), not a nested-loop range probe.
    * Every interval matches at least its opening event, so inner-join
    * aggregation covers all intervals. */
  def q74RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val twoHoursUs = 2L * 3600 * 1000000
    val events = Tables.events(spark, dir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("t_us"))
    val intervals = events.filter($"event_id" % 10 === 0)
      .select($"event_id".as("interval_id"), $"user_id",
        $"t_us".as("s_us"), ($"t_us" + twoHoursUs).as("e_us"))
    graft.etl.TimeJoins.rangeJoinBucketed(events, intervals, "user_id",
        "t_us", "s_us", "e_us", bucketWidthUs = 3600L * 1000000)
      .groupBy($"interval_id")
      .agg(count(lit(1)).as("n_points"), min($"event_id").as("min_event"),
        max($"event_id").as("max_event"))
      .orderBy($"interval_id")
  }

  /** Daily resample with zero-filled gaps
    * ([[graft.etl.TimeJoins.resampleDaily]]): per-user daily counts over
    * each user's own [first, last] span — the regularization every
    * rolling-window pass assumes. */
  def q85Resample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.TimeJoins.resampleDaily(Tables.events(spark, dir), "user_id", "ts")
      .orderBy($"user_id", $"day")
  }

  /** Retention/adoption shape: first-seen day per (user, event_type) →
    * newly adopted pairs per day → running cumulative (every user is
    * active from day one in this corpus, so the plain per-user grain
    * would collapse to a single row — the pair grain actually spreads).
    * The final window is global-ordered but runs on the DAY aggregate
    * (cardinality = span days, not events) — the single-partition window
    * is bounded by the calendar, not the data. */
  def q86NewUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("day", to_date(date_trunc("day", $"ts")))
      .groupBy($"user_id", $"event_type").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n_new"))
      .withColumn("cum_pairs", sum($"n_new").over(w))
      .orderBy($"day")
  }

  /** Running COUNT DISTINCT per user (event types seen so far): Spark
    * windows can't express count(DISTINCT) directly — the standard
    * rewrite marks each (user, type) first occurrence with row_number,
    * then running-sums the markers. One shuffle on user_id; both windows
    * share it. Deterministic via the (ts, event_id) tiebreak. */
  def q87RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byTime = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts"), $"event_id")
    val firstOfType = Window.partitionBy($"user_id", $"event_type")
      .orderBy(unix_micros($"ts"), $"event_id")
    Tables.events(spark, dir)
      .withColumn("_first", when(row_number().over(firstOfType) === 1, 1L)
        .otherwise(0L))
      .withColumn("types_so_far", sum($"_first")
        .over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .select($"event_id", $"user_id", $"types_so_far")
      .orderBy($"event_id")
  }

  /** 7-day rolling event count per user over the GAP-FILLED daily series
    * (composition proof: [[graft.etl.TimeJoins.resampleDaily]] feeds a
    * rows-frame window — only correct because the resample guarantees one
    * row per day; on the raw ragged series a ROWS frame would silently
    * span gaps). */
  def q88Rolling7d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day").rowsBetween(-6, 0)
    graft.etl.TimeJoins.resampleDaily(Tables.events(spark, dir), "user_id", "ts")
      .withColumn("n_7d", sum($"n").over(w))
      .orderBy($"user_id", $"day")
  }

  /** Full-outer reconciliation: per-user order count (even keys only, so
    * BOTH null directions occur) vs event count, keys coalesced — the
    * two-system diff report every migration runs. */
  def q90FullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).filter($"o_custkey" % 2 === 0)
      .groupBy($"o_custkey".as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("user_id"), "full_outer")
      .na.fill(0L, Seq("n_orders", "n_events"))
      .orderBy($"user_id")
  }

  /** Forward fill ([[graft.etl.TimeJoins.forwardFill]]): daily cents
    * totals on the gap-filled spine, missing days imputed by carry-
    * forward (nulls come from the spine join; day one always observes,
    * so no leading nulls at this grain). */
  def q91Locf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("day", to_date(date_trunc("day", $"ts")))
    val daily = ev.groupBy($"user_id", $"day")
      .agg(sum(round($"value" * 100).cast("long")).as("cents"))
    val spine = daily.groupBy($"user_id")
      .agg(min($"day").as("_d0"), max($"day").as("_d1"))
      .select($"user_id", explode(
        sequence($"_d0", $"_d1", expr("interval 1 day"))).as("day"))
    graft.etl.TimeJoins.forwardFill(
        spine.join(daily, Seq("user_id", "day"), "left"),
        "user_id", "day", "cents")
      .orderBy($"user_id", $"day")
  }

  /** Running high-water mark + drawdown per user: the monotone running
    * max (a different window aggregate than q9's running sum) and the
    * integer distance below it — the monitoring/backtest shape. */
  def q94Drawdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts"), $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("cents", round($"value" * 100).cast("long"))
      .withColumn("hwm_cents", max($"cents").over(w))
      .select($"event_id", $"user_id", $"hwm_cents",
        ($"hwm_cents" - $"cents").as("drawdown_cents"))
      .orderBy($"event_id")
  }

  /** T5 — the FULL CalculateFields sequential derivation (promo parse /
    * AH bypass → standardize quantity → price-per-standard-unit with the
    * promo effective price feeding the current variant → discount metrics;
    * calculate-fields.ts:20-123). q19–q21 pin the stages in isolation; this
    * pins their COMPOSITION. k = o_orderkey % 7 selects the branch:
    *  0 AH bypass (STRUCTURED_DISCOUNT: eff = current_price, req 1, multi F)
    *  1 "2 voor 3.00" X_FOR_Y parse feeding cpps
    *  2 "25% korting" percentage (2dp-rounded eff)
    *  3 non-promo passthrough (parsed_* stay null)
    *  4 conversion-factor 0.001 floor (0.5 mg)
    *  5 UNKNOWN mechanism fallback (eff = raw current_price)
    *  6 multi-segment MULTI_PROMO → top-level fallback pricing */
  def q44CalculateFields(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = ($"o_orderkey" % 7).cast("int")
    val cents = (($"o_orderkey" % 19) + 1) * 20
    val pbb = cents / lit(100.0)
    val cp = when(k.isin(0, 5), cents / lit(200.0)).otherwise(pbb)
    val input = graft.etl.Parallelism.spread(Tables.orders(spark, dir)).select(
      $"o_orderkey",
      when(k === 0, "AH").when(k.isin(4, 5), "ALDI").when(k === 2, "PLUS")
        .otherwise("JUMBO").as("shop_type"),
      k.isin(0, 1, 2, 5, 6).as("is_promotion"),
      when(k === 1, "2 voor 3.00").when(k === 2, "25% korting")
        .when(k === 5, "mega deal").when(k === 6, "2 voor 3.00; 25% korting")
        .when(k === 0, "structured bonus").otherwise("").as("promotion_mechanism"),
      pbb.as("price_before_bonus"),
      cp.as("current_price"),
      element_at(array(lit(2.0), lit(500.0), lit(3.0), lit(750.0), lit(0.5),
        lit(1.0), lit(4.0)), k + 1).as("quantity_amount"),
      element_at(array(lit("kg"), lit("g"), lit("stuks"), lit("ml"), lit("mg"),
        lit("stuk"), lit("pak")), k + 1).as("quantity_unit"),
      lit(null).cast("double").as("parsed_promotion_effective_unit_price"),
      lit(null).cast("double").as("parsed_promotion_required_quantity"),
      lit(null).cast("double").as("parsed_promotion_total_price"),
      lit(null).cast("boolean").as("parsed_promotion_is_multi_purchase_required"),
      lit(null).cast("double").as("discount_absolute"),
      lit(null).cast("double").as("discount_percentage"))
    graft.etl.CalculateFields(input).select(
      $"o_orderkey", $"shop_type",
      round($"parsed_promotion_effective_unit_price" * 100).cast("long").as("eff_cents"),
      $"parsed_promotion_required_quantity".as("req_qty"),
      round($"parsed_promotion_total_price" * 100).cast("long").as("total_cents"),
      $"parsed_promotion_is_multi_purchase_required".as("multi"),
      $"normalized_quantity_amount".as("norm_amt"),
      $"normalized_quantity_unit".as("norm_unit"),
      round($"conversion_factor" * 1000).cast("long").as("cf_milli"),
      round($"price_per_standard_unit" * 100).cast("long").as("pps_cents"),
      round($"current_price_per_standard_unit" * 100).cast("long").as("cpps_cents"),
      round($"discount_absolute" * 100).cast("long").as("disc_cents"),
      round($"discount_percentage" * 10).cast("long").as("pct_deci"))
      .sortedOnce($"o_orderkey")
  }

  // ------------------------------------------------------------ q159 rfm

  /** RFM segmentation ([[graft.etl.Analytics.rfmSegments]]): per customer
    * within their market segment, quintile bins of order recency /
    * frequency / monetary cents, rolled up to (segment, rfm_code,
    * n_entities) — the classic customer-value grid, with every ntile
    * window segment-partitioned and id-tiebroken so both engines bin
    * identically. */
  def q159Rfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_custkey",
        datediff($"o_orderdate", to_date(lit("1970-01-01"))).as("rec"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    graft.etl.Analytics.rfmSegments(t, "c_mktsegment", "o_custkey",
        "rec", "cents")
      .orderBy($"c_mktsegment", $"rfm_code")
  }

  // ------------------------------------------------------------ q160 abc

  /** Pareto / ABC classification ([[graft.etl.Analytics.abcClasses]]):
    * per brand, parts ranked by revenue into A (top 80 % of cents),
    * B (to 95 %), C (tail), compared cross-multiplied in decimal(38,0) —
    * the "which parts carry the revenue" inventory screen. */
  def q160Abc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_partkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    graft.etl.Analytics.abcClasses(t, "p_brand", "l_partkey", "cents")
      .orderBy($"p_brand", $"abc_class")
  }

  // ------------------------------------- q176 referential integrity

  /** Schema-wide FK audit ([[graft.etl.Validation.refIntegrity]]): child
    * totals, distinct keys, and orphan counts for the four relationships
    * of the star schema — the warehouse generalization of the
    * reference's per-row FK null checks. events.user_id→customer is the
    * deliberately-broken relationship (independent key domains), so the
    * audit must both pass and fail. */
  def q176RefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = graft.etl.Validation
    v.refIntegrity(Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey", "lineitem->orders")
      .unionByName(v.refIntegrity(Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey", "orders->customer"))
      .unionByName(v.refIntegrity(Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey", "customer->nation"))
      .unionByName(v.refIntegrity(Tables.events(spark, dir), "user_id",
        Tables.customer(spark, dir), "c_custkey", "events->customer"))
      .orderBy($"relationship")
  }

  /** Functional-dependency audit ([[graft.etl.Validation.fdAudit]]) over
    * four candidate FDs: two that hold (c_name→c_custkey — name
    * uniqueness; o_orderkey→o_orderstatus — key check) and two that are
    * violated (p_brand→p_type, source→lang), so the audit proves both
    * verdicts. q176 audits BETWEEN tables; this audits WITHIN one. */
  def q184FdAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = graft.etl.Validation
    v.fdAudit(Tables.customer(spark, dir), "c_name", "c_custkey",
        "customer: name->custkey")
      .unionByName(v.fdAudit(Tables.documents(spark, dir), "source", "lang",
        "doc: source->lang"))
      .unionByName(v.fdAudit(Tables.orders(spark, dir), "o_orderkey",
        "o_orderstatus", "orders: orderkey->status"))
      .unionByName(v.fdAudit(Tables.part(spark, dir), "p_brand", "p_type",
        "part: brand->type"))
      .orderBy($"fd")
  }

  /** Candidate-key discovery ([[graft.etl.Validation.keyAudit]]) on
    * lineitem: the composite (l_orderkey, l_linenumber) is the true
    * key; l_orderkey alone and (l_partkey, l_suppkey) both carry
    * duplicates — the audit that validates a MERGE/dedup key choice on
    * data instead of asserting it (q184 audits FDs; this audits
    * uniqueness). */
  def q309KeyDiscovery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Validation.keyAudit(Tables.lineitem(spark, dir),
        Seq(Seq("l_orderkey", "l_linenumber"), Seq("l_orderkey"),
          Seq("l_partkey", "l_suppkey")))
      .orderBy($"candidate")
  }

  /** Fulfillment-lag percentiles
    * ([[graft.etl.Analytics.exactPercentiles]]): order→ship lag in days
    * per order priority — exact nearest-rank P25/P50/P75, the SLA
    * readout ("does URGENT actually ship faster, and by how much at
    * the tail") over the order/lineitem join. */
  def q334FulfillmentLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lag = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_orderpriority",
        datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
          .cast("long").as("lag_days"))
    graft.etl.Analytics.exactPercentiles(lag, "o_orderpriority",
        "lag_days")
      .orderBy($"o_orderpriority")
  }

  /** Discount–quantity association ([[graft.etl.Mining.groupedCorr]])
    * per brand: Pearson sign + scaled r² between the line discount (bp)
    * and the ordered quantity — the "do discounts actually move volume
    * for this brand" screen, exact via the six-accumulator
    * sufficient-statistics fold. */
  def q335PriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"p_partkey" === $"l_partkey")
      .select($"p_brand",
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("disc_bp"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
    graft.etl.Mining.groupedCorr(li, "p_brand", "disc_bp", "qty")
      .orderBy($"p_brand")
  }

  /** Repeat-purchase cadence: exact nearest-rank P25/P50/P75 of the
    * days between a customer's consecutive orders, per market segment
    * ([[graft.etl.Analytics.exactPercentiles]] over the lag window) —
    * the replenishment-cycle readout behind any reorder-reminder or
    * churn-window choice. */
  def q336RepurchaseInterval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val gaps = Tables.orders(spark, dir)
      .withColumn("prev", lag($"o_orderdate", 1).over(w))
      .filter($"prev".isNotNull)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        datediff(to_date($"o_orderdate"), to_date($"prev"))
          .cast("long").as("gap_days"))
    graft.etl.Analytics.exactPercentiles(gaps, "c_mktsegment", "gap_days")
      .orderBy($"c_mktsegment")
  }

  /** Dead-stock audit: per brand, the parts that NEVER appear in a
    * lineitem (distinct ordered parts vs catalog, one left-semi-shaped
    * aggregate join) with the dead share in bp — the assortment-health
    * counterpart of q176's referential audit (orphans point child→
    * parent; dead stock is the parent rows nothing points AT). */
  def q339DeadStock(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ordered = Tables.lineitem(spark, dir)
      .select($"l_partkey").distinct()
    val flagged = Tables.part(spark, dir)
      .join(ordered, $"p_partkey" === $"l_partkey", "left")
      .select($"p_brand", when($"l_partkey".isNull, 1L).otherwise(0L)
        .as("dead"))
    flagged.groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), sum($"dead").as("n_dead"))
      .withColumn("dead_bp",
        expr("CAST(n_dead * 10000 div n_parts AS BIGINT)"))
      .orderBy($"p_brand")
  }

  /** Supplier-concentration HHI ([[graft.etl.Analytics.hhiBp]]): per
    * part type, how concentrated the supplier base is across lineitem
    * volume — the single-floor basis-point Herfindahl the "are we
    * over-reliant on one supplier" review asks for first. */
  def q333Hhi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), $"p_partkey" === $"l_partkey")
      .select($"p_type", $"l_suppkey")
    graft.etl.Analytics.hhiBp(li, "p_type", "l_suppkey")
      .orderBy($"p_type")
  }

  /** Rare-category collapse
    * ([[graft.etl.Analytics.collapseRareCategories]]) on part brands at
    * min support 80: the long-tail cap applied before encoding or
    * per-brand rollups — sub-threshold brands fold into `(other)` with
    * their row mass and absorbed-label count reported. */
  def q317RareCollapse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Analytics.collapseRareCategories(
        Tables.part(spark, dir), "p_brand", minCount = 80L)
      .orderBy($"category")
  }

  /** Nearest as-of ([[graft.etl.TimeJoins.asofJoinNearest]]): each event
    * matched to the user's CLOSEST order by calendar day, backward or
    * forward, ties backward — the `merge_asof(direction='nearest')`
    * member that completes the q34/q73/q205 family, still one
    * union+window shuffle. */
  def q289AsofNearest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val epoch = to_date(lit("1970-01-01"))
    val events = Tables.events(spark, dir).select($"event_id", $"user_id",
      datediff(to_date($"ts"), epoch).cast("long").as("d"))
    val orders = Tables.orders(spark, dir).select(
      $"o_custkey".as("user_id"),
      datediff(to_date($"o_orderdate"), epoch).cast("long").as("od"),
      $"o_orderkey")
    graft.etl.TimeJoins.asofJoinNearest(events, orders, "user_id", "d",
        "od", "o_orderkey")
      .select($"event_id", $"user_id", $"asofn_o_orderkey", $"asofn_gap")
      .orderBy($"event_id")
  }

  /** Missingness co-occurrence ([[graft.etl.Validation.nullPatternAudit]])
    * over a deterministically degraded event feed: `value` and `prop_k`
    * blank together on the event_id%7 stripe (a simulated feed outage —
    * lift ≫ 10⁶) while `ts_day` drops independently on the %13 stripe —
    * the pairwise structure a per-column null profile cannot see. */
  def q279NullPattern(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select(
      when($"event_id" % 7 === 0, lit(null).cast("double"))
        .otherwise($"value").as("value"),
      when(($"event_id" % 7 === 0) || ($"event_id" % 5 === 1),
        lit(null).cast("string"))
        .otherwise(get_json_object($"props", "$.k")).as("prop_k"),
      when($"event_id" % 13 === 0, lit(null).cast("long"))
        .otherwise(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long")).as("ts_day"))
    graft.etl.Validation.nullPatternAudit(e,
        Seq("value", "prop_k", "ts_day"))
      .orderBy($"col_a", $"col_b")
  }

  // ------------------------------------------- q509 omnibus audit

  /** EU-Omnibus reference-price audit (Directive 98/6/EC as amended):
    * an advertised "was €X" must be the LOWEST price of the prior 30
    * days. Listings are (supplier, part); the per-day unit price is
    * exact floored cents (round(extendedprice·100) div qty — qty is a
    * whole number in this schema). For each listing with a sale on its
    * last active day: the implied reference (price on the most recent
    * PRIOR sale day), the trailing-30-day minimum before that last day,
    * and a VIOLATION when a discount is claimed (last < ref) while the
    * reference overstates the omnibus baseline (ref > min30). Per
    * supplier: discounted listings, violations, violation bp, mean
    * overstatement cents. Every join keys on (supplier, part) — one
    * hash partitioning reused across the four listing-grain frames. */
  def q509OmnibusAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pd = Tables.lineitem(spark, dir)
      .filter($"l_quantity" >= 1)
      .groupBy($"l_suppkey", $"l_partkey",
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("d"))
      .agg(expr("CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT) " +
        "div CAST(l_quantity AS BIGINT)) AS BIGINT)").as("p"))
    val last = pd.groupBy($"l_suppkey", $"l_partkey")
      .agg(max($"d").as("dmax"))
    val j = pd.join(last, Seq("l_suppkey", "l_partkey"))
    val pLast = j.filter($"d" === $"dmax")
      .select($"l_suppkey", $"l_partkey", $"p".as("p_last"))
    val prior = j.filter($"d" < $"dmax" && $"d" >= $"dmax" - 30)
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(max($"d").as("dref"), min($"p").as("min30"))
    val ref = j.join(prior, Seq("l_suppkey", "l_partkey"))
      .filter($"d" === $"dref")
      .select($"l_suppkey", $"l_partkey", $"p".as("p_ref"), $"min30")
    pLast.join(ref, Seq("l_suppkey", "l_partkey"))
      .filter($"p_last" < $"p_ref") // a discount is being claimed
      .withColumn("_viol", ($"p_ref" > $"min30").cast("long"))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_discounted"),
        sum($"_viol").as("n_violations"),
        expr("sum(_viol) * 10000 div count(1)").as("violation_bp"),
        expr("CAST(sum(CASE WHEN _viol = 1 THEN p_ref - min30 ELSE 0 END)" +
          " AS BIGINT)").as("overstatement_cents"))
      .orderBy($"l_suppkey")
  }

  // ----------------------------------------- q510 assortment churn

  /** Assortment churn per supplier: listings (supplier, part) classed by
    * their first/last sale day against the corpus span — new arrivals
    * (first seen in the final third), delisted (silent for the last 30
    * days), still active (sold within the last week). The shelf-rotation
    * readout a retail feed is monitored by; one listing-grain aggregate
    * + a broadcast bounds row. */
  def q510AssortmentChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_partkey",
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
          .as("d"))
    val bounds = li.agg(min($"d").as("_mn"), max($"d").as("_mx"))
    li.groupBy($"l_suppkey", $"l_partkey")
      .agg(min($"d").as("f"), max($"d").as("l"))
      .crossJoin(broadcast(bounds))
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_listings"),
        sum(when($"l" >= $"_mx" - 7, 1L).otherwise(0L)).as("n_active"),
        expr("sum(CASE WHEN f > _mn + (_mx - _mn) * 2 div 3 THEN 1 " +
          "ELSE 0 END) * 10000 div count(1)").as("new_bp"),
        expr("sum(CASE WHEN l < _mx - 30 THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("delisted_bp"))
      .orderBy($"l_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q509_omnibus_audit" -> q509OmnibusAudit _,
    "q510_assortment_churn" -> q510AssortmentChurn _,
    "q184_fd_audit" -> q184FdAudit _,
    "q309_key_discovery" -> q309KeyDiscovery _,
    "q317_rare_collapse" -> q317RareCollapse _,
    "q333_hhi" -> q333Hhi _,
    "q334_fulfillment_lag" -> q334FulfillmentLag _,
    "q335_price_elasticity" -> q335PriceElasticity _,
    "q336_repurchase_interval" -> q336RepurchaseInterval _,
    "q339_dead_stock" -> q339DeadStock _,
    "q279_null_pattern" -> q279NullPattern _,
    "q289_asof_nearest" -> q289AsofNearest _,
    "q176_ref_integrity" -> q176RefIntegrity _,
    "q160_abc" -> q160Abc _,
    "q159_rfm" -> q159Rfm _,
    "q19_promo_parse" -> q19PromoParse _,
    "q20_unit_standardize" -> q20UnitStandardize _,
    "q21_discount_metrics" -> q21DiscountMetrics _,
    "q22_category_normalize" -> q22CategoryNormalize _,
    "q23_quality_score" -> q23QualityScore _,
    "q24_success_rate" -> q24SuccessRate _,
    "q340_promo_share" -> q340PromoShare _,
    "q341_enricher_score" -> q341EnricherScore _,
    "q342_error_report" -> q342ErrorReport _,
    "q33_props_parse" -> q33PropsParse _,
    "q34_asof_join" -> q34AsofJoin _,
    "q35_sessionize" -> q35Sessionize _,
    "q44_calculate_fields" -> q44CalculateFields _,
    "q73_asof_forward" -> q73AsofForward _,
    "q74_range_join" -> q74RangeJoin _,
    "q85_resample" -> q85Resample _,
    "q86_new_users" -> q86NewUsers _,
    "q87_running_distinct" -> q87RunningDistinct _,
    "q88_rolling_7d" -> q88Rolling7d _,
    "q90_full_outer" -> q90FullOuter _,
    "q91_locf" -> q91Locf _,
    "q94_drawdown" -> q94Drawdown _)

  val oracleSql: Map[String, String] = Map(
    "q509_omnibus_audit" -> """
      |WITH pd AS (
      |  SELECT l_suppkey, l_partkey,
      |    epoch_us(l_shipdate) // 86400000000 AS d,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      // CAST(l_quantity AS BIGINT)) AS p
      |  FROM lineitem WHERE l_quantity >= 1
      |  GROUP BY 1, 2, 3),
      |last_d AS (
      |  SELECT l_suppkey, l_partkey, max(d) AS dmax
      |  FROM pd GROUP BY 1, 2),
      |j AS (
      |  SELECT pd.*, dmax FROM pd
      |  JOIN last_d USING (l_suppkey, l_partkey)),
      |p_last AS (
      |  SELECT l_suppkey, l_partkey, p AS p_last FROM j WHERE d = dmax),
      |prior AS (
      |  SELECT l_suppkey, l_partkey, max(d) AS dref, min(p) AS min30
      |  FROM j WHERE d < dmax AND d >= dmax - 30 GROUP BY 1, 2),
      |ref AS (
      |  SELECT j.l_suppkey, j.l_partkey, j.p AS p_ref, prior.min30
      |  FROM j JOIN prior USING (l_suppkey, l_partkey)
      |  WHERE j.d = prior.dref),
      |scored AS (
      |  SELECT p_last.l_suppkey,
      |    CASE WHEN p_ref > min30 THEN 1 ELSE 0 END AS viol,
      |    p_ref - min30 AS over_c
      |  FROM p_last JOIN ref USING (l_suppkey, l_partkey)
      |  WHERE p_last < p_ref)
      |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_discounted,
      |  CAST(sum(viol) AS BIGINT) AS n_violations,
      |  CAST(sum(viol) * 10000 // count(*) AS BIGINT) AS violation_bp,
      |  CAST(sum(CASE WHEN viol = 1 THEN over_c ELSE 0 END) AS BIGINT)
      |    AS overstatement_cents
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "q510_assortment_churn" -> """
      |WITH li AS (
      |  SELECT l_suppkey, l_partkey,
      |    epoch_us(l_shipdate) // 86400000000 AS d
      |  FROM lineitem),
      |b AS (SELECT min(d) AS mn, max(d) AS mx FROM li),
      |per AS (
      |  SELECT l_suppkey, l_partkey, min(d) AS f, max(d) AS l
      |  FROM li GROUP BY 1, 2)
      |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_listings,
      |  CAST(sum(CASE WHEN l >= mx - 7 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_active,
      |  CAST(sum(CASE WHEN f > mn + (mx - mn) * 2 // 3 THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS new_bp,
      |  CAST(sum(CASE WHEN l < mx - 30 THEN 1 ELSE 0 END) * 10000
      |    // count(*) AS BIGINT) AS delisted_bp
      |FROM per, b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q340_promo_share" -> """
      |WITH u AS (
      |  SELECT CASE p_partkey % 4 WHEN 0 THEN 'AH' WHEN 1 THEN 'JUMBO'
      |      WHEN 2 THEN 'ALDI' ELSE 'PLUS' END AS shop_type,
      |    p_partkey % 7 = 0 AS is_promotion
      |  FROM part)
      |SELECT shop_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE is_promotion) AS BIGINT) AS n_promo,
      |  CAST(count(*) FILTER (WHERE is_promotion) * 10000 // count(*)
      |    AS BIGINT) AS promo_bp
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q341_enricher_score" -> """
      |SELECT p_partkey,
      |  CAST(greatest(100 - (
      |    CASE WHEN p_partkey % 2 <> 0 THEN 5 ELSE 0 END +
      |    CASE WHEN p_partkey % 3 <> 0 THEN 10 ELSE 0 END +
      |    CASE WHEN p_partkey % 5 <> 0 THEN 10 ELSE 0 END +
      |    CASE WHEN p_partkey % 17 = 0 THEN 20 ELSE 0 END +
      |    CASE WHEN p_partkey % 19 = 0 THEN 15 ELSE 0 END +
      |    CASE WHEN p_partkey % 11 = 0 THEN 10 ELSE 0 END +
      |    CASE WHEN p_partkey % 13 = 0 THEN 5 ELSE 0 END +
      |    CASE WHEN p_partkey % 2 <> 0 THEN 5 ELSE 0 END), 0)
      |    AS BIGINT) AS enricher_score
      |FROM part ORDER BY p_partkey""".stripMargin,
    "q342_error_report" -> """
      |WITH e AS (
      |  SELECT o_orderpriority AS error_type,
      |    CAST(o_orderkey AS VARCHAR) AS product_id
      |  FROM orders WHERE o_orderkey % 7 < 3)
      |SELECT error_type, CAST(count(*) AS BIGINT) AS n,
      |  array_to_string(list_slice(list_sort(list(product_id)), 1, 5), ',')
      |    AS examples
      |FROM e GROUP BY 1 ORDER BY n DESC, error_type""".stripMargin,
    "q339_dead_stock" -> """
      |WITH o AS (SELECT DISTINCT l_partkey FROM lineitem)
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(CASE WHEN o.l_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_dead,
      |  CAST(sum(CASE WHEN o.l_partkey IS NULL THEN 1 ELSE 0 END)
      |    * 10000 // count(*) AS BIGINT) AS dead_bp
      |FROM part LEFT JOIN o ON o.l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q335_price_elasticity" -> """
      |WITH b AS (
      |  SELECT p_brand,
      |    CAST(round(l_discount * 10000) AS BIGINT) AS x,
      |    CAST(round(l_quantity) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |      FROM b GROUP BY 1)
      |SELECT p_brand, CAST(n AS BIGINT) AS n,
      |  CAST(sign(n * sxy - sx * sy) AS BIGINT) AS corr_sign,
      |  CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000)
      |    // NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
      |    AS BIGINT) AS r2_scaled
      |FROM s ORDER BY p_brand""".stripMargin,
    "q336_repurchase_interval" -> """
      |WITH g AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day',
      |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
      |  FROM orders),
      |j AS (
      |  SELECT c_mktsegment, gap_days
      |  FROM g JOIN customer ON c_custkey = o_custkey
      |  WHERE gap_days IS NOT NULL),
      |r AS (
      |  SELECT c_mktsegment, gap_days,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY gap_days) AS rn,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM j)
      |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN rn = (n + 3) // 4 THEN gap_days END)
      |    AS BIGINT) AS p25,
      |  CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN gap_days END)
      |    AS BIGINT) AS p50,
      |  CAST(sum(CASE WHEN rn = (3 * n + 3) // 4 THEN gap_days END)
      |    AS BIGINT) AS p75
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q334_fulfillment_lag" -> """
      |WITH lag AS (
      |  SELECT o_orderpriority,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |r AS (
      |  SELECT o_orderpriority, lag_days,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY lag_days) AS rn,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM lag WHERE lag_days IS NOT NULL)
      |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN rn = (n + 3) // 4 THEN lag_days END)
      |    AS BIGINT) AS p25,
      |  CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN lag_days END)
      |    AS BIGINT) AS p50,
      |  CAST(sum(CASE WHEN rn = (3 * n + 3) // 4 THEN lag_days END)
      |    AS BIGINT) AS p75
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q333_hhi" -> """
      |WITH m AS (
      |  SELECT p_type, l_suppkey, CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  GROUP BY 1, 2)
      |SELECT p_type, CAST(count(*) AS BIGINT) AS n_members,
      |  CAST(sum(n) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(n AS HUGEINT) * n) * 10000
      |    // (CAST(sum(n) AS HUGEINT) * sum(n)) AS BIGINT) AS hhi_bp
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q317_rare_collapse" -> """
      |WITH c AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS c
      |           FROM part GROUP BY 1)
      |SELECT category, CAST(sum(c) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_raw_labels,
      |  category = '(other)' AS is_other
      |FROM (SELECT CASE WHEN c < 80 THEN '(other)' ELSE p_brand END
      |        AS category, c FROM c)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q309_key_discovery" -> """
      |WITH k1 AS (SELECT count(*) AS c FROM lineitem
      |            GROUP BY l_orderkey, l_linenumber),
      |k2 AS (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey),
      |k3 AS (SELECT count(*) AS c FROM lineitem
      |       GROUP BY l_partkey, l_suppkey)
      |SELECT * FROM (
      |  SELECT 'l_orderkey,l_linenumber' AS candidate,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(sum(c - 1) AS BIGINT) AS dup_rows,
      |    CAST(max(c) AS BIGINT) AS max_group,
      |    sum(c - 1) = 0 AS is_key
      |  FROM k1
      |  UNION ALL
      |  SELECT 'l_orderkey', CAST(sum(c) AS BIGINT),
      |    CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT),
      |    CAST(max(c) AS BIGINT), sum(c - 1) = 0
      |  FROM k2
      |  UNION ALL
      |  SELECT 'l_partkey,l_suppkey', CAST(sum(c) AS BIGINT),
      |    CAST(count(*) AS BIGINT), CAST(sum(c - 1) AS BIGINT),
      |    CAST(max(c) AS BIGINT), sum(c - 1) = 0
      |  FROM k3)
      |ORDER BY candidate""".stripMargin,
    "q289_asof_nearest" -> """
      |WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS d
      |  FROM events),
      |o AS MATERIALIZED (
      |  SELECT o_custkey AS user_id,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS od,
      |    o_orderkey
      |  FROM orders),
      |c AS (
      |  SELECT e.*,
      |    (SELECT max(od) FROM o
      |     WHERE o.user_id = e.user_id AND od <= d) AS bt,
      |    (SELECT min(od) FROM o
      |     WHERE o.user_id = e.user_id AND od > d) AS ft
      |  FROM e),
      |p AS (
      |  SELECT c.*,
      |    (SELECT max(o_orderkey) FROM o
      |     WHERE o.user_id = c.user_id AND od = bt) AS bp,
      |    (SELECT min(o_orderkey) FROM o
      |     WHERE o.user_id = c.user_id AND od = ft) AS fp
      |  FROM c)
      |SELECT event_id, user_id,
      |  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR d - bt <= ft - d)
      |       THEN bp ELSE fp END AS asofn_o_orderkey,
      |  CASE WHEN bt IS NOT NULL AND (ft IS NULL OR d - bt <= ft - d)
      |       THEN d - bt
      |       WHEN ft IS NOT NULL THEN ft - d END AS asofn_gap
      |FROM p ORDER BY event_id""".stripMargin,
    "q279_null_pattern" -> """
      |WITH f AS (
      |  SELECT
      |    CASE WHEN event_id % 7 = 0 OR value IS NULL
      |         THEN 1 ELSE 0 END AS fv,
      |    CASE WHEN event_id % 7 = 0 OR event_id % 5 = 1
      |           OR json_extract_string(props, '$.k') IS NULL
      |         THEN 1 ELSE 0 END AS fk,
      |    CASE WHEN event_id % 13 = 0 OR ts IS NULL
      |         THEN 1 ELSE 0 END AS ft
      |  FROM events),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(fv) AS BIGINT) AS nv, CAST(sum(fk) AS BIGINT) AS nk,
      |    CAST(sum(ft) AS BIGINT) AS nt,
      |    CAST(sum(fv * fk) AS BIGINT) AS bvk,
      |    CAST(sum(fv * ft) AS BIGINT) AS bvt,
      |    CAST(sum(fk * ft) AS BIGINT) AS bkt
      |  FROM f)
      |SELECT col_a, col_b, n, null_a, null_b, null_both,
      |  CAST(CAST(null_both AS HUGEINT) * n * 1000000
      |    // NULLIF(CAST(null_a AS HUGEINT) * null_b, 0) AS BIGINT)
      |    AS lift_ppm
      |FROM (
      |  SELECT 'prop_k' AS col_a, 'ts_day' AS col_b, n,
      |         nk AS null_a, nt AS null_b, bkt AS null_both FROM agg
      |  UNION ALL
      |  SELECT 'value', 'prop_k', n, nv, nk, bvk FROM agg
      |  UNION ALL
      |  SELECT 'value', 'ts_day', n, nv, nt, bvt FROM agg)
      |ORDER BY col_a, col_b""".stripMargin,
    "q184_fd_audit" -> """
      |SELECT 'customer: name->custkey' AS fd, * FROM (
      |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS violating_groups,
      |    CAST(sum(CASE WHEN c > 1 THEN r ELSE 0 END) AS BIGINT)
      |      AS violating_rows,
      |    CAST(max(c) AS BIGINT) AS max_card
      |  FROM (SELECT det, count(*) AS r, count(DISTINCT dep) AS c FROM
      |    (SELECT c_name AS det, c_custkey AS dep FROM customer
      |     WHERE c_name IS NOT NULL) GROUP BY 1))
      |UNION ALL
      |SELECT 'doc: source->lang', * FROM (
      |  SELECT CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN r ELSE 0 END) AS BIGINT),
      |    CAST(max(c) AS BIGINT)
      |  FROM (SELECT det, count(*) AS r, count(DISTINCT dep) AS c FROM
      |    (SELECT source AS det, lang AS dep FROM documents
      |     WHERE source IS NOT NULL) GROUP BY 1))
      |UNION ALL
      |SELECT 'orders: orderkey->status', * FROM (
      |  SELECT CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN r ELSE 0 END) AS BIGINT),
      |    CAST(max(c) AS BIGINT)
      |  FROM (SELECT det, count(*) AS r, count(DISTINCT dep) AS c FROM
      |    (SELECT o_orderkey AS det, o_orderstatus AS dep FROM orders
      |     WHERE o_orderkey IS NOT NULL) GROUP BY 1))
      |UNION ALL
      |SELECT 'part: brand->type', * FROM (
      |  SELECT CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN c > 1 THEN r ELSE 0 END) AS BIGINT),
      |    CAST(max(c) AS BIGINT)
      |  FROM (SELECT det, count(*) AS r, count(DISTINCT dep) AS c FROM
      |    (SELECT p_brand AS det, p_type AS dep FROM part
      |     WHERE p_brand IS NOT NULL) GROUP BY 1))
      |ORDER BY fd""".stripMargin,
    "q176_ref_integrity" -> """
      |WITH r1 AS (SELECT 'lineitem->orders' AS relationship,
      |    count(*) AS n_child, count(DISTINCT l_orderkey) AS n_child_keys,
      |    count(*) - count(p.k) AS n_orphans
      |  FROM lineitem LEFT JOIN
      |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
      |    ON l_orderkey = p.k
      |  WHERE l_orderkey IS NOT NULL),
      |r2 AS (SELECT 'orders->customer',
      |    count(*), count(DISTINCT o_custkey),
      |    count(*) - count(p.k)
      |  FROM orders LEFT JOIN
      |    (SELECT DISTINCT c_custkey AS k FROM customer) p
      |    ON o_custkey = p.k
      |  WHERE o_custkey IS NOT NULL),
      |r3 AS (SELECT 'customer->nation',
      |    count(*), count(DISTINCT c_nationkey),
      |    count(*) - count(p.k)
      |  FROM customer LEFT JOIN
      |    (SELECT DISTINCT n_nationkey AS k FROM nation) p
      |    ON c_nationkey = p.k
      |  WHERE c_nationkey IS NOT NULL),
      |r4 AS (SELECT 'events->customer',
      |    count(*), count(DISTINCT user_id),
      |    count(*) - count(p.k)
      |  FROM events LEFT JOIN
      |    (SELECT DISTINCT c_custkey AS k FROM customer) p
      |    ON user_id = p.k
      |  WHERE user_id IS NOT NULL)
      |SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
      |  UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
      |ORDER BY relationship""".stripMargin,
    "q159_rfm" -> """
      |WITH t AS (SELECT c_mktsegment AS seg, o_custkey AS k,
      |             date_diff('day', DATE '1970-01-01', o_orderdate) AS rec,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders JOIN customer ON o_custkey = c_custkey),
      |per AS (SELECT seg, k, max(rec) AS rec,
      |          CAST(count(*) AS BIGINT) AS freq,
      |          CAST(sum(cents) AS BIGINT) AS mon
      |        FROM t GROUP BY 1, 2),
      |b AS (SELECT seg,
      |        ntile(5) OVER (PARTITION BY seg ORDER BY rec, k) AS r,
      |        ntile(5) OVER (PARTITION BY seg ORDER BY freq, k) AS f,
      |        ntile(5) OVER (PARTITION BY seg ORDER BY mon, k) AS m
      |      FROM per)
      |SELECT seg AS c_mktsegment, r * 100 + f * 10 + m AS rfm_code,
      |  CAST(count(*) AS BIGINT) AS n_entities
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q160_abc" -> """
      |WITH t AS (SELECT p_brand, l_partkey AS k,
      |             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |           FROM lineitem JOIN part ON l_partkey = p_partkey),
      |per AS (SELECT p_brand, k, CAST(sum(cents) AS HUGEINT) AS v
      |        FROM t GROUP BY 1, 2),
      |w AS (SELECT p_brand, k, v,
      |        CAST(sum(v) OVER (PARTITION BY p_brand) AS HUGEINT)
      |          AS total,
      |        CAST(sum(v) OVER (PARTITION BY p_brand
      |          ORDER BY v DESC, k ROWS UNBOUNDED PRECEDING) AS HUGEINT)
      |          AS cum
      |      FROM per),
      |c AS (SELECT p_brand,
      |        CASE WHEN cum * 100 <= total * 80 THEN 'A'
      |             WHEN cum * 100 <= total * 95 THEN 'B'
      |             ELSE 'C' END AS abc_class,
      |        v
      |      FROM w)
      |SELECT p_brand, abc_class, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(v) AS BIGINT) AS class_value
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Analytic recomputation: k = o_orderkey%10 selects the pattern, so the
    // expected effective price/type follow from the promotion definitions.
    "q19_promo_parse" -> """
      |WITH base AS (
      |  SELECT o_orderkey, ((o_orderkey % 19) + 1) * 20/1e2 AS pbb,
      |         CAST(o_orderkey % 10 AS INT) AS k
      |  FROM orders)
      |SELECT o_orderkey,
      |  CASE k WHEN 0 THEN '2 voor 3.00' WHEN 1 THEN '1+1 gratis'
      |    WHEN 2 THEN '25% korting' WHEN 3 THEN '-30%'
      |    WHEN 4 THEN '2e halve prijs' WHEN 5 THEN '2e gratis'
      |    WHEN 6 THEN '- €0.50' WHEN 7 THEN 'vanaf €10'
      |    WHEN 8 THEN 'gratis bezorging' ELSE 'mega deal' END AS mechanism,
      |  CASE k WHEN 0 THEN 'X_FOR_Y' WHEN 1 THEN 'X_PLUS_Y_FREE'
      |    WHEN 2 THEN 'PERCENTAGE_DISCOUNT' WHEN 3 THEN 'PERCENTAGE_DISCOUNT'
      |    WHEN 4 THEN 'SECOND_HALF_PRICE' WHEN 5 THEN 'SECOND_FREE'
      |    WHEN 6 THEN 'FIXED_DISCOUNT' WHEN 7 THEN 'CONDITIONAL_SPEND'
      |    WHEN 8 THEN 'DELIVERY_PROMO' ELSE 'UNKNOWN' END AS promo_type,
      |  CAST(round(100 * round(CASE k
      |    WHEN 0 THEN 1.50 WHEN 1 THEN pbb*0.5 WHEN 2 THEN pbb*0.75
      |    WHEN 3 THEN pbb*0.7 WHEN 4 THEN pbb*0.75 WHEN 5 THEN pbb*0.5
      |    WHEN 6 THEN greatest(pbb-0.5, 0) ELSE pbb END, 2)) AS BIGINT) AS eff_cents,
      |  CASE k WHEN 0 THEN 2.0 WHEN 1 THEN 2.0 WHEN 4 THEN 2.0 WHEN 5 THEN 2.0
      |    ELSE 1.0 END AS required_qty,
      |  CAST(round(100 * round(CASE k
      |    WHEN 0 THEN 3.00 WHEN 1 THEN pbb WHEN 4 THEN pbb*1.5 WHEN 5 THEN pbb
      |    ELSE pbb END, 2)) AS BIGINT) AS total_cents,
      |  k IN (0,1,4,5) AS multi
      |FROM base ORDER BY o_orderkey""".stripMargin,
    "q20_unit_standardize" -> """
      |WITH base AS (
      |  SELECT p_partkey, round(p_retailprice) AS price,
      |         CAST(p_partkey % 5 AS DOUBLE) + 1 AS amt,
      |         CAST(p_partkey % 12 AS INT) AS k
      |  FROM part),
      |calc AS (
      |  SELECT p_partkey, price, k,
      |    CASE k WHEN 0 THEN 'gram' WHEN 1 THEN 'kg' WHEN 2 THEN 'ml'
      |      WHEN 3 THEN 'cl' WHEN 4 THEN 'liter' WHEN 5 THEN 'stuks'
      |      WHEN 6 THEN 'per stuk' WHEN 7 THEN '6 x 150g' WHEN 8 THEN '12-pack'
      |      WHEN 9 THEN 'wasbeurten' WHEN 10 THEN 'onbekend' ELSE 'Meter' END AS unit_raw,
      |    CASE k WHEN 0 THEN 'kg' WHEN 1 THEN 'kg' WHEN 2 THEN 'l' WHEN 3 THEN 'l'
      |      WHEN 4 THEN 'l' WHEN 7 THEN 'kg' WHEN 11 THEN 'm' ELSE 'stuk' END AS std_unit,
      |    CASE k WHEN 0 THEN greatest(amt/1000, 0.001)      -- g → kg
      |      WHEN 1 THEN greatest(amt, 0.001)                -- kg
      |      WHEN 2 THEN greatest(amt/1000, 0.001)           -- ml → l
      |      WHEN 3 THEN greatest(amt*10/1000, 0.001)        -- cl → l
      |      WHEN 4 THEN greatest(amt, 0.001)                -- l
      |      WHEN 7 THEN greatest(amt/1000, 0.001)           -- multi-pack g → kg
      |      WHEN 11 THEN greatest(amt, 0.001)               -- m
      |      ELSE greatest(amt, 1) END AS cf                 -- stuk floor 1
      |  FROM base)
      |SELECT p_partkey, unit_raw, std_unit,
      |  CAST(round(cf*1000) AS BIGINT) AS cf_milli,
      |  CAST(round(100 * least(round(price/cf, 2), 10000)) AS BIGINT) AS ppu_cents
      |FROM calc ORDER BY p_partkey""".stripMargin,
    "q21_discount_metrics" -> """
      |WITH base AS (
      |  SELECT o_orderkey, ((o_orderkey % 225) + 1) * 4/1e2 + 1.0 AS orig,
      |         1.0 - (o_orderkey % 4)*0.25 AS f
      |  FROM orders)
      |SELECT o_orderkey,
      |  CAST(round(100 * CASE WHEN f >= 1.0 OR orig*f <= 0 THEN 0
      |    ELSE round(orig - orig*f, 2) END) AS BIGINT) AS amount_cents,
      |  CAST(round(10 * CASE WHEN f >= 1.0 OR orig*f <= 0 THEN 0
      |    ELSE round((orig - orig*f)/orig*100, 1) END) AS BIGINT) AS pct_deci
      |FROM base ORDER BY o_orderkey""".stripMargin,
    // Truth table derived from the reference cascade by hand (shop=ALDI):
    //  Bakkerij/bakkerij → exact; 'Zuivel, eieren' → common map; 'kaas' →
    //  Zuivel (last-set-wins); 'verse groenten' → partial on 'groenten';
    //  'brood' → common; 'Bakkerei' → fuzzy; 'trots van aldi' → common (its
    //  normalized form is a map key); 'aldi trots producten' → ALDI special
    //  case default; 'wijn' → common; 'Diepvriez' → fuzzy; 'snacks' → common.
    "q22_category_normalize" -> """
      |SELECT p_partkey,
      |  CASE CAST(p_partkey % 12 AS INT)
      |    WHEN 0 THEN 'Bakkerij' WHEN 1 THEN 'bakkerij' WHEN 2 THEN 'Zuivel, eieren'
      |    WHEN 3 THEN 'kaas' WHEN 4 THEN 'verse groenten' WHEN 5 THEN 'brood'
      |    WHEN 6 THEN 'Bakkerei' WHEN 7 THEN 'trots van aldi'
      |    WHEN 8 THEN 'aldi trots producten' WHEN 9 THEN 'wijn'
      |    WHEN 10 THEN 'Diepvriez' ELSE 'snacks' END AS cat_raw,
      |  CASE CAST(p_partkey % 12 AS INT)
      |    WHEN 0 THEN 'Bakkerij' WHEN 1 THEN 'Bakkerij'
      |    WHEN 2 THEN 'Zuivel, eieren, boter' WHEN 3 THEN 'Zuivel, eieren, boter'
      |    WHEN 4 THEN 'Aardappel, groente, fruit' WHEN 5 THEN 'Bakkerij'
      |    WHEN 6 THEN 'Bakkerij' WHEN 7 THEN 'Aardappel, groente, fruit'
      |    WHEN 8 THEN 'Aardappel, groente, fruit' WHEN 9 THEN 'Wijn en bubbels'
      |    WHEN 10 THEN 'Diepvries' ELSE 'Chips, noten, toast, popcorn' END AS category,
      |  CASE CAST(p_partkey % 12 AS INT)
      |    WHEN 4 THEN 'partial' WHEN 6 THEN 'fuzzy' WHEN 8 THEN 'special_case'
      |    WHEN 10 THEN 'fuzzy' ELSE 'direct' END AS method
      |FROM part ORDER BY p_partkey""".stripMargin,
    "q23_quality_score" -> """
      |SELECT p_partkey, CAST(least(50
      |  + CASE WHEN p_partkey % 3 = 0 THEN 10 ELSE 0 END
      |  + CASE WHEN p_partkey % 5 = 0 THEN 5 ELSE 0 END
      |  + CASE WHEN p_partkey % 2 = 0 THEN 5 ELSE 0 END
      |  + CASE WHEN p_partkey % 7 = 0 THEN 10 ELSE 0 END
      |  + CASE WHEN p_partkey % 2 = 0 THEN 5 ELSE 0 END
      |  + CASE WHEN p_partkey % 11 <> 0 THEN 10 ELSE 0 END
      |  + CASE WHEN p_partkey % 13 <> 0 THEN 5 ELSE 0 END, 100) AS BIGINT)
      |  AS quality_score
      |FROM part ORDER BY p_partkey""".stripMargin,
    // sum_k is CAST back to BIGINT: DuckDB SUM(INT) widens to HUGEINT which
    // the driver's pandas bridge renders as float64, breaking the value hash
    // against Spark's int64 even when the numbers are identical.
    "q33_props_parse" -> """
      |SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_asof_join" -> """
      |SELECT e.event_id, e.user_id,
      |  (SELECT max(o.o_orderkey) FROM orders o
      |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |     AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
      |       WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts))
      |  AS asof_o_orderkey
      |FROM events e ORDER BY e.event_id""".stripMargin,
    "q73_asof_forward" -> """
      |SELECT e.event_id, e.user_id,
      |  (SELECT min(o.o_orderkey) FROM orders o
      |   WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      |     AND o.o_orderdate = (SELECT min(o2.o_orderdate) FROM orders o2
      |       WHERE o2.o_custkey = e.user_id AND o2.o_orderdate >= e.ts))
      |  AS asoff_o_orderkey
      |FROM events e ORDER BY e.event_id""".stripMargin,
    // Oracle is the direct inequality join; the engine side proves the
    // bucketed equi-join computes the same relation.
    "q74_range_join" -> """
      |SELECT i.interval_id, count(*) AS n_points,
      |  min(e.event_id) AS min_event, max(e.event_id) AS max_event
      |FROM (SELECT event_id AS interval_id, user_id,
      |        epoch_us(ts) AS s_us, epoch_us(ts) + 7200000000 AS e_us
      |      FROM events WHERE event_id % 10 = 0) i
      |JOIN (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events) e
      |  ON e.user_id = i.user_id AND e.t_us >= i.s_us AND e.t_us < i.e_us
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q85_resample" -> """
      |WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1))
      |SELECT s.user_id, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |FROM spine s LEFT JOIN daily d USING (user_id, day)
      |ORDER BY 1, 2""".stripMargin,
    "q86_new_users" -> """
      |WITH fd AS (
      |  SELECT user_id, event_type,
      |    min(CAST(date_trunc('day', ts) AS DATE)) AS day
      |  FROM events GROUP BY 1, 2),
      |nn AS (SELECT day, count(*) AS n_new FROM fd GROUP BY 1)
      |SELECT day, n_new,
      |  CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS cum_pairs
      |FROM nn ORDER BY day""".stripMargin,
    "q94_drawdown" -> """
      |SELECT event_id, user_id,
      |  max(CAST(round(value*1e2) AS BIGINT)) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING)
      |    AS hwm_cents,
      |  max(CAST(round(value*1e2) AS BIGINT)) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING)
      |    - CAST(round(value*1e2) AS BIGINT) AS drawdown_cents
      |FROM events ORDER BY event_id""".stripMargin,
    "q90_full_outer" -> """
      |SELECT coalesce(o.user_id, e.user_id) AS user_id,
      |  CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events
      |FROM (SELECT o_custkey AS user_id, count(*) AS n_orders FROM orders
      |      WHERE o_custkey % 2 = 0 GROUP BY 1) o
      |FULL JOIN (SELECT user_id, count(*) AS n_events FROM events
      |           GROUP BY 1) e
      |  ON o.user_id = e.user_id
      |ORDER BY user_id""".stripMargin,
    "q91_locf" -> """
      |WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(sum(CAST(round(value*1e2) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1))
      |SELECT s.user_id, s.day,
      |  CAST(last_value(d.cents IGNORE NULLS) OVER (PARTITION BY s.user_id
      |    ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cents
      |FROM spine s LEFT JOIN daily d USING (user_id, day)
      |ORDER BY s.user_id, s.day""".stripMargin,
    // DuckDB CAN window count(DISTINCT ...); the oracle uses it directly,
    // proving the marker-cumsum rewrite equals the textbook semantics.
    "q87_running_distinct" -> """
      |SELECT event_id, user_id,
      |  CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id
      |    ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS types_so_far
      |FROM events ORDER BY event_id""".stripMargin,
    "q88_rolling_7d" -> """
      |WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
      |        FROM daily GROUP BY 1)),
      |filled AS (
      |  SELECT s.user_id, s.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN daily d USING (user_id, day))
      |SELECT user_id, day, n,
      |  CAST(sum(n) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
      |FROM filled ORDER BY user_id, day""".stripMargin,
    "q35_sessionize" -> """
      |WITH x AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 24 HOUR
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q24_success_rate" -> """
      |SELECT event_type, count(*) AS total,
      |  count(*) FILTER (WHERE value > 100) AS success,
      |  CASE WHEN count(*) > 0
      |    THEN count(*) FILTER (WHERE value > 100) * 1e2 / count(*)
      |    ELSE 0 END AS success_rate
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Analytic recomputation of the full CalculateFields composition.
    // dprice (the price feeding cpps + discount metrics) = parsed effective
    // price when non-null/non-zero else current_price — replicated with the
    // same FP expression trees (incl. the parser's 2dp rounding) so every
    // cents output is tie-free.
    "q44_calculate_fields" -> """
      |WITH base AS (
      |  SELECT o_orderkey, CAST(o_orderkey % 7 AS INT) AS k,
      |         ((o_orderkey % 19) + 1) * 20 AS cents
      |  FROM orders),
      |s AS (
      |  SELECT *, cents/1e2 AS pbb,
      |    CASE WHEN k IN (0, 5) THEN cents/2e2 ELSE cents/1e2 END AS cp
      |  FROM base),
      |c AS (
      |  SELECT *,
      |    CASE k WHEN 0 THEN CAST(2 AS DOUBLE) WHEN 1 THEN CAST(0.5 AS DOUBLE)
      |      WHEN 2 THEN CAST(3 AS DOUBLE) WHEN 3 THEN CAST(0.75 AS DOUBLE)
      |      WHEN 4 THEN CAST(0.001 AS DOUBLE) WHEN 5 THEN CAST(1 AS DOUBLE)
      |      ELSE CAST(4 AS DOUBLE) END AS cf,
      |    CASE k WHEN 0 THEN cp WHEN 1 THEN CAST(1.5 AS DOUBLE)
      |      WHEN 2 THEN round(pbb*(1 - 25/1e2), 2) WHEN 5 THEN cp
      |      WHEN 6 THEN cp END AS eff
      |  FROM s),
      |d AS (SELECT *, coalesce(nullif(eff, 0), cp) AS dprice FROM c)
      |SELECT o_orderkey,
      |  CASE k WHEN 0 THEN 'AH' WHEN 2 THEN 'PLUS' WHEN 4 THEN 'ALDI'
      |    WHEN 5 THEN 'ALDI' ELSE 'JUMBO' END AS shop_type,
      |  CAST(round(eff*1e2) AS BIGINT) AS eff_cents,
      |  CASE WHEN k IN (0, 2, 5, 6) THEN CAST(1 AS DOUBLE)
      |       WHEN k = 1 THEN CAST(2 AS DOUBLE) END AS req_qty,
      |  CASE k WHEN 1 THEN CAST(300 AS BIGINT)
      |       WHEN 0 THEN CAST(cents//2 AS BIGINT) WHEN 5 THEN CAST(cents//2 AS BIGINT)
      |       WHEN 2 THEN CAST(cents AS BIGINT) WHEN 6 THEN CAST(cents AS BIGINT)
      |       END AS total_cents,
      |  CASE WHEN k = 1 THEN TRUE WHEN k IN (0, 2, 5, 6) THEN FALSE END AS multi,
      |  CASE k WHEN 0 THEN CAST(2 AS DOUBLE) WHEN 1 THEN CAST(0.5 AS DOUBLE)
      |    WHEN 2 THEN CAST(3 AS DOUBLE) WHEN 3 THEN CAST(0.75 AS DOUBLE)
      |    WHEN 4 THEN CAST(0.001 AS DOUBLE) WHEN 5 THEN CAST(1 AS DOUBLE)
      |    ELSE CAST(4 AS DOUBLE) END AS norm_amt,
      |  CASE k WHEN 2 THEN 'stuk' WHEN 3 THEN 'l' WHEN 5 THEN 'stuk'
      |    WHEN 6 THEN 'stuk' ELSE 'kg' END AS norm_unit,
      |  CAST(round(cf*1e3) AS BIGINT) AS cf_milli,
      |  CAST(round(round(pbb/cf, 2)*1e2) AS BIGINT) AS pps_cents,
      |  CAST(round(round(dprice/cf, 2)*1e2) AS BIGINT) AS cpps_cents,
      |  CASE WHEN k IN (0, 1, 2, 5, 6) THEN
      |    CAST(round(CASE WHEN dprice >= pbb THEN 0
      |                    ELSE round(pbb - dprice, 2) END * 1e2) AS BIGINT)
      |  END AS disc_cents,
      |  CASE WHEN k IN (0, 1, 2, 5, 6) THEN
      |    CAST(round(CASE WHEN dprice >= pbb THEN 0
      |                    ELSE round((pbb - dprice)/pbb*100, 1) END * 10) AS BIGINT)
      |  END AS pct_deci
      |FROM d ORDER BY o_orderkey""".stripMargin)
}
