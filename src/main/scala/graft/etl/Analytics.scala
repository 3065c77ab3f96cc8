package graft.etl

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Analytics surface (SURVEY.md §2.9 A5–A16) not already covered by the
  * query modules: the enricher's deduct-from-100 quality rubric, issue
  * statistics, category distribution, price comparison, promotion share.
  * All small aggregates over the unified table — one shuffle each, tiny
  * reduce sides.
  */
object Analytics {

  /** A6 — enricher quality score (product-enricher.ts:425-503): start at
    * 100, deduct for missing/defaulted fields. */
  val enricherScore: Column = {
    val deductions =
      when(coalesce(col("title"), lit("")) === "", 20).otherwise(0) +
      when(coalesce(col("image_url"), lit("")) === "", 10).otherwise(0) +
      when(col("main_category").isNull, 10).otherwise(0) +
      when(coalesce(col("brand"), lit("")) === "", 5).otherwise(0) +
      when(coalesce(col("price_before_bonus"), lit(0.0)) <= 0, 20).otherwise(0) +
      when(coalesce(col("current_price"), lit(0.0)) <= 0, 15).otherwise(0) +
      when(coalesce(col("quantity_amount"), lit(0.0)) <= 0 ||
        coalesce(col("quantity_unit"), lit("")) === "", 10).otherwise(0) +
      when(col("conversion_factor").isNull, 5).otherwise(0) +
      when(!col("is_active"), 5).otherwise(0)
    greatest(lit(100) - deductions, lit(0)).cast("double")
  }

  /** A7 — category distribution with share, sorted desc
    * (visualize-data.ts:102-118). */
  def categoryDistribution(unified: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    unified.groupBy(col("main_category")).agg(count(lit(1)).as("n"))
      .withColumn("pct", round(lit(100.0) * col("n") / sum(col("n")).over(w), 2))
      .orderBy(col("n").desc, col("main_category"))
  }

  /** A8 — price comparison per shop: 0<p<100 filter, avg, median, range
    * histogram (visualize-data.ts:123-162). */
  def priceComparison(unified: DataFrame): DataFrame =
    unified.filter(col("current_price") > 0 && col("current_price") < 100)
      .groupBy(col("shop_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("current_price")), 2).as("avg_price"),
        percentile_approx(col("current_price"), lit(0.5), lit(10000)).as("median_price"),
        count(when(col("current_price") < 2, 1)).as("b_lt_2"),
        count(when(col("current_price") >= 2 && col("current_price") < 5, 1)).as("b_2_5"),
        count(when(col("current_price") >= 5 && col("current_price") < 10, 1)).as("b_5_10"),
        count(when(col("current_price") >= 10, 1)).as("b_ge_10"))
      .orderBy(col("shop_type"))

  /** A9 — promotion share per shop (visualize-data.ts:167-180).
    * `promo_pct` is the reference's rounded display percentage;
    * `promo_bp` is the same share in exact integer basis points — the
    * cross-engine-stable column (2dp rounding of a binary double is
    * engine-dependent on ties, integer division is not). */
  def promotionAnalysis(unified: DataFrame): DataFrame =
    unified.groupBy(col("shop_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("is_promotion"), 1)).as("n_promo"),
        round(avg(col("is_promotion").cast("int")) * 100, 2).as("promo_pct"))
      .withColumn("promo_bp", expr("n_promo * 10000 div n"))
      .orderBy(col("shop_type"))

  /** A15 — issue statistics: counts by type/severity/shop + top-k
    * (issue-tracker.ts:203+). Issues arrive as the side-output columns the
    * pipeline emits (issue_type, severity, shop_type). */
  def issueStats(issues: DataFrame, topK: Int = 10): DataFrame =
    issues.groupBy(col("issue_type"), col("severity"), col("shop_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("issue_type"))
      .limit(topK)

  /** C9 — mapping-method distribution (ml-fallback-tracker analog): how
    * many rows went through direct/partial/fuzzy/ml/special_case. */
  def mappingMethodStats(withMethod: DataFrame): DataFrame =
    withMethod.groupBy(col("category_mapping_method")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)

  /** Sketch-based profile for interactive 100 TB exploration: the scale
    * variant of the exact reports above. `approx_count_distinct`
    * (HyperLogLog++, fixed-size mergeable state, relative error `rsd`) and
    * `approx_percentile` (bounded rank error via `accuracy`) replace exact
    * distinct/median, whose state grows with the value cardinality —
    * an exact COUNT(DISTINCT user) over 10¹¹ events shuffles every
    * distinct value; the sketch ships kilobytes per partition. Exactness
    * lives in the oracle-gated queries (q11 distinct, q38 median); this is
    * the explicitly-approximate fast path. */
  /** Exact nearest-rank percentiles (p25/p50/p75) per group over an
    * integer value column: the value at rank ⌈p·n⌉ — percentile_disc
    * semantics, so the result is always an actual data value and the
    * cross-engine compare never sees interpolation floats. Duplicate
    * values need no tiebreak: whichever duplicate lands on the target
    * rank, the picked VALUE is the same. One shuffle on the group key
    * (rank + count ride the same window sort); for the sketch-based
    * scale path over huge groups see [[approxProfile]]. */
  def exactPercentiles(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // nearest-rank SELECTION from a per-(group, value) count histogram:
    // the rank-r value is the unique v with cum(v) >= r and
    // cum(v) - c(v) < r — the cumsum window runs over DISTINCT VALUES
    // (bounded by the value domain), never a row-grain rank partitioned
    // by a possibly-low-cardinality group key (which would sort a whole
    // group in one task at scale).
    // NULLs would sort first and occupy ranks, silently skewing every
    // percentile; nearest-rank is defined over present values only
    val wv = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wv))
    val ns = hist.groupBy(col(groupCol)).agg(sum(col("_c")).as("_n"))
    val at = (target: Column) => sum(when(
      col("_cum") >= target && col("_cum") - col("_c") < target,
      col(valueCol)))
    hist.join(broadcast(ns), groupCol)
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"),
        at(expr("(_n + 3) div 4")).as("p25"),
        at(expr("(_n + 1) div 2")).as("p50"),
        at(expr("(3 * _n + 3) div 4")).as("p75"))
  }

  /** Interquartile-winsorized sum per group: values clamp to [p25, p75]
    * before summing — the robust-mean counterpart of [[iqrOutliers]]
    * (outliers are tamed, not dropped, so n stays the group size). Emits
    * (group, n, wsum) as integers; callers divide. Quartiles come from
    * [[exactPercentiles]] and join back as a one-row-per-group broadcast,
    * so the clamp pass is map-side. */
  def winsorizedStats(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val fences = exactPercentiles(df, groupCol, valueCol)
      .select(col(groupCol), col("p25"), col("p75"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(greatest(col("p25"), least(col("p75"), col(valueCol))))
          .as("wsum"))
  }

  /** Exact per-group mode (most frequent value, ties to the SMALLEST
    * value so the result is deterministic): two combiner-friendly
    * aggregations — (group, value) counts, then one lexicographic max of
    * struct(count, −value) per group. No window, no sort of the group's
    * full row set. */
  def modePerGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(max(struct(col("c"), (-col(valueCol)).as("nv"))).as("m"))
      .select(col(groupCol), (-col("m.nv")).as("mode_value"),
        col("m.c").as("mode_count"))

  /** Herfindahl–Hirschman concentration index per group: with member
    * masses n_i and total N, HHI = Σ(n_i/N)² — published in basis
    * points as the SINGLE floor ⌊Σn_i²·10⁴ / N²⌋ (never a sum of
    * already-floored shares). The standard market/supplier/source
    * concentration readout (1/k for k equals, 10000 for a monopoly) —
    * the square-weighted complement of [[giniCoefficientBp]], and the
    * number a "are we over-reliant on one supplier/source" review asks
    * for first. Σn_i² rides decimal(38,0); one member-level groupBy
    * folded map-side, then an enum-sized group fold. */
  def hhiBp(df: DataFrame, groupCol: String, memberCol: String): DataFrame =
    df.groupBy(col(groupCol), col(memberCol))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum(col("_n")).as("n_rows"),
        sum(col("_n").cast("decimal(38,0)") * col("_n")).as("_sq"))
      .select(col(groupCol), col("n_members"), col("n_rows"),
        expr("""CAST(_sq * 10000 div
                (CAST(n_rows AS DECIMAL(38,0)) * n_rows) AS BIGINT)""")
          .as("hhi_bp"))

  /** Knee/elbow detection per group — the "where does the curve bend"
    * answer that turns a ranked diagnostic (Zipf freq-by-rank, inertia
    * by k, coverage by vocab size) into a CUTOFF: the knee is the point
    * maximizing the distance to the chord between the curve's
    * endpoints, with distance compared by its exact cross-multiplied
    * numerator |Δy·x − Δx·y + x₂y₁ − y₂x₁| (the √(Δx²+Δy²) denominator
    * is constant per group — dividing would only add float noise).
    * Ties break to the smallest x. Endpoints via min/max(struct) —
    * `xCol` must be unique per group (a rank). One groupBy + one
    * broadcastable endpoint join + one argmax fold; products ride
    * decimal(38,0). */
  def kneePoint(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val ends = df.groupBy(col(groupCol)).agg(
      min(struct(col(xCol), col(yCol))).as("_lo"),
      max(struct(col(xCol), col(yCol))).as("_hi"))
    df.join(broadcast(ends), Seq(groupCol))
      .select(col(groupCol), col(xCol).as("_x"), col(yCol).as("_y"),
        col("_lo").getField(xCol).as("x1"),
        col("_lo").getField(yCol).as("y1"),
        col("_hi").getField(xCol).as("x2"),
        col("_hi").getField(yCol).as("y2"))
      .withColumn("_dn", expr(
        """abs((CAST(y2 AS DECIMAL(38,0)) - y1) * _x -
               (CAST(x2 AS DECIMAL(38,0)) - x1) * _y +
               CAST(x2 AS DECIMAL(38,0)) * y1 -
               CAST(y2 AS DECIMAL(38,0)) * x1)"""))
      .groupBy(col(groupCol))
      .agg(max(col("x1")).as("x1"), max(col("y1")).as("y1"),
        max(col("x2")).as("x2"), max(col("y2")).as("y2"),
        max(struct(col("_dn"), (-col("_x")).as("_nx"), col("_y").as("_ky")))
          .as("_k"))
      .select(col(groupCol), col("x1"), col("y1"), col("x2"), col("y2"),
        (-col("_k").getField("_nx")).as("knee_x"),
        col("_k").getField("_ky").as("knee_y"))
  }

  /** Rare-category collapse — the cardinality cap applied before any
    * one-hot/target encoding or per-category rollup melts down on a
    * long tail: categories with fewer than `minCount` rows fold into
    * the sentinel `(other)`; the output reports each surviving label's
    * row mass and how many raw labels it absorbed. The cutoff is on
    * COUNTS, so the transform is deterministic and the category map it
    * implies (label → label | other) is broadcastable to apply
    * anywhere. Two combiner-friendly aggregations over a
    * category-cardinality-sized intermediate — never row-sized. */
  def collapseRareCategories(df: DataFrame, catCol: String,
      minCount: Long): DataFrame = {
    val counts = df.groupBy(col(catCol)).agg(count(lit(1)).as("_c"))
    counts
      .withColumn("category",
        when(col("_c") < minCount, lit("(other)"))
          .otherwise(col(catCol).cast("string")))
      .groupBy(col("category"))
      .agg(sum(col("_c")).as("n"), count(lit(1)).as("n_raw_labels"))
      .withColumn("is_other", col("category") === "(other)")
  }

  /** Tukey-fence outlier rows per group: values outside
    * [p25 − k/2·IQR, p75 + k/2·IQR] (k in half-IQR steps keeps the
    * arithmetic integral — the classic 1.5·IQR fence is k=3). The
    * per-group quartiles come from [[exactPercentiles]] (grows-with-group
    * window state) and join back as a broadcast — the fence table has one
    * row per group, so the second pass over the data is map-side. */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 3): DataFrame = {
    val fences = exactPercentiles(df, groupCol, valueCol)
      .select(col(groupCol), col("p25"), col("p75"))
    val v = col(valueCol) * 2
    df.join(broadcast(fences), Seq(groupCol))
      .filter(v < col("p25") * 2 - (col("p75") - col("p25")) * k ||
              v > col("p75") * 2 + (col("p75") - col("p25")) * k)
      .drop("p25", "p75")
  }

  /** Per-column data profile of a frame: null count and exact distinct
    * count for each named column — the reconnaissance report a pipeline
    * runs before trusting a new source. One aggregation pass computes
    * every column's stats (no per-column scans); the single wide row is
    * then unpivoted driver-free via stack(). Exact distincts shuffle per
    * column — for 10¹¹-row sources swap in approx_count_distinct (see
    * [[approxProfile]]). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"))
    }
    val stackArgs = cols.map(c => s"'$c', `_nn_$c`, `_nd_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct)")
  }

  def approxProfile(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, rsd: Double = 0.05, accuracy: Int = 10000): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col(idCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol), array(lit(0.5), lit(0.95), lit(0.99)),
          lit(accuracy)).as("pcts"))
      .select(col(keyCol), col("n"), col("approx_distinct"),
        col("pcts").getItem(0).as("p50"),
        col("pcts").getItem(1).as("p95"),
        col("pcts").getItem(2).as("p99"))
      .orderBy(col(keyCol))

  /** 2-D skyline (Pareto frontier, minimizing both columns): rows no other
    * row dominates — q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y with at least
    * one strict. Equal (x, y) duplicates dominate nothing, so all copies of
    * a frontier point survive.
    *
    * The naive formulation is an O(n²) self-join. Scale shape instead:
    * (1) one shuffle reduces the data to (x, min y) — at most |distinct x|
    * rows, and dominance only depends on that pair; (2) a running strict-
    * prefix min over the reduced set keeps x-values whose min-y undercuts
    * every smaller x — that window is unpartitioned but runs over the
    * ALREADY-REDUCED table, bounded by value cardinality, not row count
    * (same trade as [[exactPercentiles]]' rank window, documented there);
    * (3) the tiny frontier broadcasts back to recover the original rows.
    * Both columns must be integral for exact cross-engine comparison. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perX = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol)).agg(min(col(yCol)).as("_ymin"))
    val prevBest = min(col("_ymin")).over(
      Window.orderBy(col(xCol)).rowsBetween(Window.unboundedPreceding, -1))
    // rename + alias both sides: frontier shares df's lineage, so qualified
    // names (not attribute references) are needed to disambiguate the join
    val frontier = perX.withColumn("_best", prevBest)
      .filter(col("_best").isNull || col("_ymin") < col("_best"))
      .select(col(xCol).as("_fx"), col("_ymin").as("_fy"))
    df.as("_sky_l").join(broadcast(frontier.as("_sky_r")),
        col(s"_sky_l.$xCol") === col("_sky_r._fx") &&
          col(s"_sky_l.$yCol") === col("_sky_r._fy"))
      .select(df.columns.map(c => col(s"_sky_l.$c")): _*)
  }

  /** RFM segmentation: per entity, quintile bins of recency / frequency /
    * monetary WITHIN its segment (ntile(5), ties broken by the entity id
    * so both engines bin identically), rolled up to
    * (segment, rfm_code = r·100 + f·10 + m, n_entities). Input is one row
    * per transaction with an integral recency index (e.g. day number — bin
    * 5 = most recent) and integral value (e.g. cents).
    *
    * Shape: one (segment, entity) sum shuffle, three ntile windows sharing
    * ONE segment partitioning + sort each, and an enum-sized final
    * groupBy. The windows are partitioned by segment — never global — so
    * the operator scales with the widest segment, not the table. */
  def rfmSegments(df: DataFrame, segCol: String, entityCol: String,
      recencyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(col(segCol), col(entityCol))
      .agg(max(col(recencyCol)).as("_rec"),
        count(lit(1)).as("_freq"),
        sum(col(valueCol)).as("_mon"))
    // quintiles via groupedGlobalRank + the exact ntile formula (three
    // range-partitioned rank passes) - a ntile window partitioned by the
    // low-cardinality segment key would sort every segment's whole
    // entity panel in ONE task
    val ns = broadcast(per.groupBy(col(segCol)).agg(count(lit(1)).as("_gn")))
    def addBin(d: DataFrame, c: String, out: String): DataFrame =
      Layout.groupedGlobalRank(d, Seq(segCol),
          Seq(col(c), col(entityCol)), "_rk")
        .withColumn(out, Layout.ntileFromRank("_rk", "_gn", 5).cast("int"))
        .drop("_rk")
    addBin(addBin(addBin(per.join(ns, segCol), "_rec", "_r"),
        "_freq", "_f"), "_mon", "_m")
      .groupBy(col(segCol),
        (col("_r") * 100 + col("_f") * 10 + col("_m")).as("rfm_code"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Pareto / ABC classification per group: rank items by value
    * descending (id-tiebroken), take the running value share, and class
    * A while cum ≤ 80 % of the group total, B while ≤ 95 %, else C —
    * compared cross-multiplied (cum·100 vs total·80) in decimal(38,0), so
    * no division and no floats. Output: (group, abc_class, n_items,
    * class_value) — the "which 20 % of parts carry 80 % of revenue"
    * screen. One (group, item) sum shuffle + a two-phase range-
    * partitioned prefix sum (see body — never a one-task-per-group
    * running-sum window) + the enum-sized rollup. */
  def abcClasses(df: DataFrame, groupCol: String, itemCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val per = df.groupBy(col(groupCol), col(itemCol))
      .agg(sum(col(valueCol)).cast(d38).as("_v"))
    // two-phase prefix sum (the budgetedSelect recipe): range-partition
    // the (group, value desc, item) order, run the prefix sum LOCALLY
    // per bucket, and add broadcast per-(group, bucket) offsets — a
    // running-sum window partitioned by a low-cardinality group key
    // would push every group through ONE task. localCheckpoint pins one
    // partitioner so the offset branch and the local branch cannot
    // sample different range boundaries (the globalRank caveat).
    val bucketed = per
      .repartitionByRange(64, col(groupCol), col("_v").desc, col(itemCol))
      .withColumn("_b", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy(col(groupCol), col("_b"))
      .orderBy(col("_v").desc, col(itemCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(sum(col("_v")).as("_bs"))
      .withColumn("_off", coalesce(
        sum(col("_bs")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0).cast(d38)))
      .select(col(groupCol), col("_b"), col("_off"))
    val tot = bucketed.groupBy(col(groupCol))
      .agg(sum(col("_v")).as("_total"))
    bucketed
      .withColumn("_lrun", sum(col("_v")).over(wLoc))
      .join(broadcast(offs), Seq(groupCol, "_b"))
      .join(broadcast(tot), Seq(groupCol))
      .withColumn("_cum", col("_lrun") + col("_off"))
      .withColumn("abc_class",
        when(col("_cum") * 100 <= col("_total") * 80, "A")
          .when(col("_cum") * 100 <= col("_total") * 95, "B")
          .otherwise("C"))
      .groupBy(col(groupCol), col("abc_class"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("_v")).cast("long").as("class_value"))
  }

  /** Weighted lower median per group: the smallest value v whose running
    * weight (ordered by value, then tiebreak columns) reaches half the
    * group's total weight — 2·W ≥ total at v, 2·(W−w) < total before it,
    * so exactly one row per group survives and the result is always an
    * actual data value (the unweighted analogue is [[exactPercentiles]]'
    * lower-median indexing). Ties in the value can order arbitrarily
    * without changing the answer — equal values swap freely inside the
    * running sum — the tiebreaks only make the ROW deterministic. One
    * shuffle on the group key; two windows share one sort. Weights must
    * be positive longs. Output: (group, total_weight, w_median). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tiebreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = (col(valueCol) +: tiebreak.map(col)).map(_.asc)
    val wRun = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("_cumw", sum(col(weightCol)).over(wRun))
      .withColumn("_totw", sum(col(weightCol)).over(wAll))
      .filter(col("_cumw") * 2 >= col("_totw") &&
        (col("_cumw") - col(weightCol)) * 2 < col("_totw"))
      .select(col(groupCol), col("_totw").as("total_weight"),
        col(valueCol).as("w_median"))
  }

  /** Largest-remainder (Hamilton) allocation: split exactly `slots`
    * integer slots across groups proportional to positive integer
    * weights — floor shares first (⌊wᵍ·slots/W⌋), then the leftover
    * slots go to the largest remainders (wᵍ·slots mod W, ties to the
    * smaller group key), so Σ alloc = slots exactly. This is the shard /
    * sampling-budget allocator: rates (q137-style bp sampling) drift off
    * the exact total; this never does. Two scalar aggregates broadcast
    * back + one window over the GROUP table (bounded by the number of
    * groups, not by data — callers pass an already-aggregated weight
    * table). Bound: wᵍ·slots within long. Output:
    * (group, weight, alloc). */
  def largestRemainderAlloc(weights: DataFrame, groupCol: String,
      weightCol: String, slots: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slots >= 0, s"slots must be >= 0, got $slots")
    val tot = weights.agg(sum(col(weightCol)).as("_W"))
    val base = weights.join(broadcast(tot))
      .withColumn("_floor", expr(s"($weightCol * ${slots}L) div _W"))
      .withColumn("_rem", expr(s"($weightCol * ${slots}L) % _W"))
    val left = base.agg((lit(slots) - sum(col("_floor"))).as("_L"))
    base.join(broadcast(left))
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_rem").desc, col(groupCol))))
      .select(col(groupCol), col(weightCol).as("weight"),
        (col("_floor") + when(col("_rk") <= col("_L"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Gini concentration coefficient per group, in bp: with the group's n
    * non-negative values sorted ascending (rank i from row_number,
    * id-tiebroken — equal values commute inside Σ i·xᵢ, so the tiebreak
    * never changes the sum), G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ),
    * cross-multiplied in decimal(38,0) and floor-scaled to bp — the
    * inequality/concentration audit (0 = uniform, →10000 = one value
    * holds everything). Distinct from the CLASSIFICATION Gini impurity
    * (q126): this is the Lorenz-curve statistic. One shuffle on the
    * group key; Σ i·xᵢ comes from the value histogram (see body) so no
    * row-grain per-group sort ever happens. Bound: Σ i·xᵢ ≤ n²·max(x)
    * — documented decimal(38,0) headroom to ~10¹⁵ rows of 10⁸ values. */
  /** Percentile of each scored row within a REFERENCE cohort's
    * distribution, per group — "where does this customer sit against the
    * benchmark segment", the score-calibration primitive: pct_bp =
    * (# reference values ≤ v) · 10⁴ div |reference|.
    *
    * The ≤-count reads off a per-(group, value) reference-count
    * histogram (see body) — inclusive at equal value, exactly the old
    * union-sort semantics. Groups without reference rows report NULL.
    * One value-grain shuffle; parallelism is the value domain, not the
    * group count. */
  def referencePercentile(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, isRef: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the <=-count comes from a per-(group, value) REF-count histogram
    // (every scored row's value is a histogram key because scored rows
    // contribute cells too, so the lookup is an equi-join) - the cumsum
    // runs over distinct values, never a row-grain running sum
    // partitioned by a possibly-low-cardinality group key. Inclusive
    // ties (ref rows count at equal value) exactly as the old
    // _ref-desc sort ordered them.
    val tagged = df.select(col(groupCol), col(idCol), col(valueCol),
      isRef.cast("int").as("_ref"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = tagged.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col("_ref")).as("_cr"))
      .withColumn("_le", sum(col("_cr")).over(wv))
      .select(col(groupCol), col(valueCol), col("_le"))
    val nref = broadcast(tagged.groupBy(col(groupCol))
      .agg(sum(col("_ref")).as("_nref")))
    tagged.filter(col("_ref") === 0)
      .join(cum, Seq(groupCol, valueCol))
      .join(nref, groupCol)
      .select(col(groupCol), col(idCol), col(valueCol),
        expr("_le * 10000L div NULLIF(_nref, 0)").as("pct_bp"))
  }

  /** Exact integer proration of a cents amount across a day span — the
    * revenue-calendarization step (recognize an order's value evenly over
    * its service days): day i of n gets cents div n, and the first
    * cents mod n days get one extra cent, so every span sums EXACTLY to
    * its input (the Hamilton allocation applied along time). Output one
    * row per (input row, day) — the explode is bounded by span length,
    * a calendar constant, not data size; rollup to months downstream.
    * Spans must satisfy endDay ≥ startDay (caller filters). */
  def prorateSpan(df: DataFrame, centsCol: String, startDayCol: String,
      endDayCol: String): DataFrame = {
    val n = col(endDayCol) - col(startDayCol) + 1
    df.withColumn("_n", n.cast("long"))
      .withColumn("_i", explode(sequence(lit(0L), col("_n") - 1)))
      .withColumn("day", col(startDayCol) + col("_i"))
      .withColumn("day_cents",
        expr(s"$centsCol div _n") +
          when(col("_i") < expr(s"$centsCol % _n"), 1L).otherwise(0L))
      .drop("_n", "_i")
  }

  def giniCoefficientBp(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    // sum(i*x) read off a per-(group, value) count histogram: rows with
    // value v occupy ranks _b+1.._b+c, so their contribution is
    // v*(c*_b + c(c+1)/2) - exact (c(c+1) is even), tie-order-invariant
    // by construction, and the cumsum window runs over DISTINCT VALUES
    // (bounded by the value domain), never a row-grain rank partitioned
    // by a low-cardinality group key (one-task-per-group sort at scale).
    // idCol is retained in the signature for source compatibility; the
    // histogram form never needs a tiebreak.
    val hist = df.groupBy(col(groupCol), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val wv = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist.withColumn("_b", coalesce(sum(col("_c")).over(wv), lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("_c")).cast(d38).as("_n"),
        sum(col("_v").cast(d38) * col("_c")).as("_s"),
        sum(expr(s"CAST(_v AS $d38) * (CAST(_c AS $d38) * _b " +
          s"+ (CAST(_c AS $d38) * (_c + 1)) div 2)")).as("_is"))
      .select(col(groupCol), col("_n").cast("long").as("n"),
        expr("CAST((((2 * _is) - ((_n + 1) * _s)) * 10000) div (_n * _s) AS BIGINT)")
          .as("gini_bp"))
  }

  /** Partition-key skew report — the pre-mortem for "one executor is
    * still running": per-key row counts reduced to the top-`k` heaviest
    * keys with their share (bp) plus the table-level skew factor
    * `max·n_keys div total` (1·10⁴ = perfectly even; the factor IS the
    * slowdown a naive hash partitioning eats). Two combiner-friendly
    * aggs + one broadcast one-row totals join; the top-k is
    * orderBy+limit over the per-key counts (a high-cardinality key
    * column makes that table itself huge — never a global window). */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("_total"),
      count(lit(1)).as("n_keys"), max(col("n")).as("max_n"))
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, never a single-partition window over every key; for the
    // skewed tables this op exists to audit, the per-key count table is
    // itself huge); the rank window then covers only the k survivors
    val top = counts.orderBy(col("n").desc, col(keyCol)).limit(k)
    val w = Window.orderBy(col("n").desc, col(keyCol))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("rk"), col(keyCol), col("n"),
        expr("n * 10000 div _total").as("share_bp"),
        col("n_keys"), col("max_n"),
        expr("max_n * n_keys * 10000 div _total").as("skew_bp"))
  }

  /** Column-level diff of two keyed snapshots — the migration-validation
    * report after any rewrite: rows added, rows removed, and FOR EACH
    * compared column how many common keys changed it (null-safe
    * equality). One full outer join on the key + one tiny aggregation;
    * output is long-form (metric, n) so a new column is a new row, not a
    * schema change. */
  def columnDiff(a: DataFrame, b: DataFrame, keyCol: String,
      cols: Seq[String]): DataFrame = {
    val an = a.select((keyCol +: cols).map(c =>
      col(c).as(s"a_$c")): _*)
    val bn = b.select((keyCol +: cols).map(c =>
      col(c).as(s"b_$c")): _*)
    val j = an.join(bn, col(s"a_$keyCol") === col(s"b_$keyCol"), "full")
    val added = count(when(col(s"a_$keyCol").isNull, lit(1))).as("added")
    val removed = count(when(col(s"b_$keyCol").isNull, lit(1))).as("removed")
    val changed = cols.map(c =>
      count(when(col(s"a_$keyCol").isNotNull && col(s"b_$keyCol").isNotNull
        && !(col(s"a_$c") <=> col(s"b_$c")), lit(1))).as(s"changed_$c"))
    val aggd = j.agg(added, (removed +: changed): _*)
    val metrics = ("added" -> col("added")) +: ("removed" -> col("removed")) +:
      cols.map(c => s"changed_$c" -> col(s"changed_$c"))
    aggd.select(explode(map(
      metrics.flatMap { case (name, c) => Seq(lit(name), c) }: _*))
      .as(Seq("metric", "n")))
  }

  /** Mix-vs-rate decomposition of a period-over-period metric change —
    * the "did revenue/order fall because the MIX moved to cheap segments
    * or because segments got CHEAPER?" BI staple. Inputs are per-segment
    * (period, n, sum) rows for exactly two periods; outputs, per
    * segment, both periods' share (ppm, floored) and rate (floored unit
    * per row) plus the two standard contribution terms
    *   mix_contrib  = (shareB − shareA) · rateA
    *   rate_contrib = shareB · (rateB − rateA)
    * in ppm·unit — every division an explicit floor at a documented
    * quantization point, so the decomposition is reproducible
    * bit-for-bit (the float version never sums the same twice). Two
    * combiner-friendly aggs + one broadcast one-row totals join. */
  def mixShift(df: DataFrame, segCol: String, periodCol: String,
      nCol: String, sumCol: String): DataFrame = {
    val tot = df.groupBy(col(periodCol))
      .agg(sum(col(nCol)).as("_tn"))
    val x = df.join(broadcast(tot), periodCol)
      .select(col(segCol), col(periodCol),
        col(nCol).as("_n"), col(sumCol).as("_s"),
        expr("_n * 1000000 div _tn").as("_share_ppm"),
        expr("_s div _n").as("_rate"))
    val a = x.filter(col(periodCol) === "A")
      .select(col(segCol), col("_n").as("n_a"), col("_s").as("s_a"),
        col("_share_ppm").as("share_a_ppm"), col("_rate").as("rate_a"))
    val b = x.filter(col(periodCol) === "B")
      .select(col(segCol), col("_n").as("n_b"), col("_s").as("s_b"),
        col("_share_ppm").as("share_b_ppm"), col("_rate").as("rate_b"))
    a.join(b, Seq(segCol), "full")
      .na.fill(0L, Seq("n_a", "s_a", "share_a_ppm", "n_b", "s_b",
        "share_b_ppm"))
      .na.fill(0L, Seq("rate_a", "rate_b"))
      .withColumn("mix_contrib",
        (col("share_b_ppm") - col("share_a_ppm")) * col("rate_a"))
      .withColumn("rate_contrib",
        col("share_b_ppm") * (col("rate_b") - col("rate_a")))
  }

  /** Fixed-basket (Laspeyres) price index per period — the inflation
    * tracker the reference's grocery domain exists to feed: with base
    * quantities q₀ frozen from the first period and each item's period
    * price p_t,
    *   index_bp = ⌊10⁴ · Σ p_t·q₀ / Σ p₀·q₀⌋
    * over the MATCHED basket (items priced in both the base and the
    * period — the standard matched-sample rule; an unmatched item would
    * silently reweight the basket). Item price per period is the
    * minimum observed unit price (an exact integer order statistic —
    * averages would be rationals); everything else is one cross-
    * multiplied fraction in decimal(38,0). Two keyed aggregations + a
    * broadcast base join. */
  def priceIndex(df: DataFrame, itemCol: String, periodCol: String,
      unitPriceCol: String, qtyCol: String): DataFrame = {
    val per = df.groupBy(col(itemCol).as("_i"), col(periodCol).as("_t"))
      .agg(min(col(unitPriceCol)).as("p"), sum(col(qtyCol)).as("q"))
    val base = per
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("_i"))
          .orderBy(col("_t"))))
      .filter(col("_rk") === 1)
      .select(col("_i"), col("p").as("p0"), col("q").as("q0"))
    per.join(base, Seq("_i"))
      .groupBy(col("_t").as(periodCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("p").cast("decimal(38,0)") * col("q0")).as("_num"),
        sum(col("p0").cast("decimal(38,0)") * col("q0")).as("_den"))
      .select(col(periodCol), col("n_items"),
        col("_num").cast("long").as("basket_t_c"),
        col("_den").cast("long").as("basket_0_c"),
        expr("CAST(_num * 10000 div NULLIF(_den, 0) AS BIGINT)")
          .as("index_bp"))
  }

  /** Empirical-Bayes (partial-pooling) rate smoothing: each group's
    * success rate shrunk toward the global rate with prior strength m
    * pseudo-observations,
    *   smoothed_ppm = ⌊(x·10⁶ + m·global_ppm) / (n + m)⌋
    * — the standard CTR/conversion smoothing that keeps a 1-of-1 item
    * from outranking a 980-of-1000 one. global_ppm is itself the
    * floored global fraction, so the whole pipeline is integer-exact;
    * groups with huge n converge to their raw rate, tiny n to the
    * global. One aggregation + a broadcast one-row join. */
  def ebSmoothedRate(df: DataFrame, groupCol: String, hitCol: Column,
      priorStrength: Long): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(hitCol, 1L).otherwise(0L)).as("x"))
    val g = per.agg(sum(col("x")).as("_gx"), sum(col("n")).as("_gn"))
      .select(expr("_gx * 1000000 div _gn").as("global_ppm"))
    per.join(broadcast(g))
      .select(col(groupCol), col("n"), col("x"),
        expr("x * 1000000 div n").as("raw_ppm"),
        col("global_ppm"),
        expr(s"(x * 1000000 + $priorStrength * global_ppm) " +
          s"div (n + $priorStrength)").as("smoothed_ppm"))
  }
}
