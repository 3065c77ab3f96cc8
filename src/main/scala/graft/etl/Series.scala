package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer time-series smoothing and anomaly flags.
  *
  * Both operators ride integer arithmetic end-to-end: an EWMA with dyadic
  * weights is an integer weighted sum, and a 3-sigma test squares through
  * the division (n·x − s)² > 9·(n·Σx² − s²), so the cross-engine compare
  * stays bit-exact and no float summation order can drift. Window frames
  * are per-key (`ROWS BETWEEN w PRECEDING AND CURRENT ROW`) — state is
  * O(w) per key and the only shuffle is the partition-by key, exactly the
  * shape that survives a 1000-executor scale-up.
  */
object Series {

  /** Truncated exponential moving average with dyadic weights: over the
    * last `halfLives` rows (current included), weight 2^(halfLives-1-i) for
    * the row i steps back. Emits the integer numerator and the weight sum
    * actually present (series heads have fewer rows), so callers divide —
    * or compare numerators directly, weights being equal at steady state. */
  def ewmaDyadic(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, halfLives: Int = 8): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
    val terms = (0 until halfLives).map { i =>
      val weight = 1L << (halfLives - 1 - i)
      val lagged = lag(col(valueCol), i).over(w)
      (coalesce(lagged * weight, lit(0L)),
        when(lagged.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    df.withColumn("ewma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("weight_sum", terms.map(_._2).reduce(_ + _))
  }

  /** Rolling 3-sigma anomaly flag over the previous `n`-row window
    * (current row EXCLUDED from the baseline — a spike must not inflate
    * the variance that judges it). Flag rows where
    * (m·x − s)² > sigmas²·(m·q − s²), i.e. |x − s/m| > sigmas·σ_pop,
    * evaluated entirely in integers; rows with fewer than `n` prior
    * observations are never flagged (flag = 0, warmup). */
  def rollingAnomaly(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, n: Int = 16, sigmas: Int = 3): DataFrame = {
    val base = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-n, -1)
    val x = col(valueCol)
    val m = count(x).over(base)
    val s = sum(x).over(base)
    val q = sum(x * x).over(base)
    val lhs = (m * x - s) * (m * x - s)
    val rhs = lit(sigmas.toLong * sigmas) * (m * q - s * s)
    df.withColumn("baseline_n", m)
      .withColumn("anomaly",
        when(m === n && lhs > rhs, lit(1)).otherwise(lit(0)))
  }

  /** Integer cents of a float money/value column — the shared exactness
    * recipe (round half-up at 2dp, then everything downstream integral). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact rolling lower-median over the previous `n` rows (current
    * included): collect the frame, sort, take element (len+1)/2 — the
    * LOWER median, so the result is always an actual data value and the
    * cross-engine compare stays integer-exact (an interpolated even-count
    * median would reintroduce floats). The collected frame lives only
    * inside the window operator — O(n) state per row position, same
    * per-key single-shuffle shape as [[ewmaDyadic]]; output is scalar, so
    * the array never crosses the operator boundary (or the harness, which
    * cannot hash arrays). */
  def rollingMedian(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, n: Int = 15, out: String = "roll_median"): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    val frame = array_sort(collect_list(col(valueCol)).over(w))
    df.withColumn(out, element_at(frame, ((size(frame) + 1) / 2).cast("int")))
  }

  /** Burst detection over an already-aggregated integer series: a tick
    * is a burst when its value is at least `num/den` times the exact
    * LOWER MEDIAN of the `n` PRIOR ticks (median, not mean — one
    * previous spike must not raise the baseline and mask the next one;
    * prior-only frame — the spike must not sit inside its own
    * baseline). Ticks with fewer than `n` priors report a NULL baseline
    * and never flag (the honest cold-start answer). The burst test
    * cross-multiplies (`v·den ≥ med·num`) so no division happens at
    * all. Same collect-sort-inside-the-window shape as
    * [[rollingMedian]]: O(n) state per row, one per-key shuffle. */
  def burstDays(daily: DataFrame, keyCol: String, dCol: String,
      xCol: String, n: Int = 7, num: Long = 3, den: Long = 2): DataFrame = {
    require(n >= 1 && num > 0 && den > 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dCol))
      .rowsBetween(-n, -1)
    val frame = array_sort(collect_list(col(xCol)).over(w))
    daily
      .withColumn("baseline_med",
        when(size(frame) === n,
          element_at(frame, ((size(frame) + 1) / 2).cast("int"))))
      .withColumn("burst",
        coalesce(col(xCol) * den >= col("baseline_med") * num, lit(false)))
  }

  /** Lag-k autocorrelation of an ALREADY-AGGREGATED integer series
    * (`tCol` = integral time index, `xCol` = integral value): for each lag
    * in 1..maxLag, Pearson sign + floor-scaled r² over the pairs
    * (x_t, x_{t+lag}), using the same decimal(38,0) sufficient-statistics
    * form as [[Mining.groupedCorr]] so both engines agree bit-for-bit.
    *
    * The caller reduces the raw table to the series first (one
    * combiner-friendly shuffle; ≤ one row per time tick), so the self-join
    * here runs on a calendar-bounded input — `maxLag` copies of a
    * day-count-sized table, broadcast on both sides at any data scale.
    * Missing ticks simply contribute no pair (pairs join on t+lag). */
  def acf(series: DataFrame, tCol: String, xCol: String,
      maxLag: Int, scale: Long = 10000): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    // the series is tick-bounded (tiny); checkpointing it keeps the raw
    // scan+aggregation from running once per join side
    val s = series.select(col(tCol).as("_t"), col(xCol).as("_x"))
      .localCheckpoint()
    val a = s
    val b = s.select(col("_t").as("_tb"), col("_x").as("_y"))
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, col("_tb") === col("_t") + col("lag"))
      .select(col("lag"), col("_x").as("x"), col("_y").as("y"))
    Mining.groupedCorr(pairs, "lag", "x", "y", scale)
  }

  /** CUSUM change-point screen per group: x_t = Σ `xCol` at tick t; with
    * n ticks summing to S, the deviation at tick t is n·x_t − S (the
    * mean-centered value scaled by n to stay integral), and cusum_t is its
    * running prefix sum in tick order. The reported change point is the tick maximizing |cusum|
    * (earliest tick wins ties) — the classic single-change-point estimate.
    * A flat series keeps |cusum| at 0; a level shift peaks at the shift.
    *
    * Shape: one combiner-friendly (group, tick) sum shuffle, two
    * windows over ONE per-group sort, and a final min(struct) argmin agg —
    * no self-join. Arithmetic rides decimal(38,0): |cusum| ≤ n·S, which
    * overflows Long for ~10⁹ ticks × 10¹⁰ total but stays well inside
    * 38 digits. Output cusum is cast to Long for the harness (exact while
    * n·S < 2⁶³ — any realistic calendar-bounded series). */
  def cusumChangepoint(df: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = df.groupBy(col(groupCol), col(tCol).as("_t"))
      .agg(sum(col(xCol)).cast(d38).as("_x"))
    val wAll = Window.partitionBy(col(groupCol))
    val wRun = wAll.orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("_n", sum(lit(1).cast(d38)).over(wAll))
      .withColumn("_s", sum(col("_x")).over(wAll))
      .withColumn("_cusum", sum(col("_n") * col("_x") - col("_s")).over(wRun))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).cast("long").as("n_ticks"),
        min(struct((-abs(col("_cusum"))).as("_negabs"),
          col("_t"), col("_cusum"))).as("_m"))
      .select(col(groupCol), col("n_ticks"),
        col("_m._t").as("cp_tick"),
        col("_m._cusum").cast("long").as("cusum"))
  }

  /** Theil–Sen robust trend per key: the LOWER median of all pairwise
    * slopes (x_j−x_i)·scale div (t_j−t_i) over t_i < t_j — the
    * outlier-resistant complement to the least-squares slope
    * ([[Mining]]'s grouped OLS), breakdown point 29%. Slopes are
    * truncating integer division (Spark `div` = DuckDB `//`), so both
    * engines rank identical integers; the median is the sorted-frame
    * (n+1) div 2 element with (t_i, t_j) tiebreaks — always an actual
    * pair's slope, never an interpolated float.
    *
    * O(n²) pairs per key, so the caller reduces to a bounded series
    * first (e.g. daily aggregates — calendar-bounded n, same contract as
    * [[acf]]); the self-join is then an equi-join on the key with tiny
    * per-key fan-out, and the median window sorts only each key's own
    * pairs. Output: (key, n_pairs, slope_bp). */
  def theilSenSlopeBp(series: DataFrame, keyCol: String, tCol: String,
      xCol: String, scale: Long = 10000): DataFrame = {
    val l = series.select(col(keyCol), col(tCol).as("_t1"), col(xCol).as("_x1"))
    val r = series.select(col(keyCol).as("_k2"), col(tCol).as("_t2"),
      col(xCol).as("_x2"))
    val pairs = l.join(r, col(keyCol) === col("_k2") && col("_t1") < col("_t2"))
      .withColumn("_slope_bp",
        expr(s"((_x2 - _x1) * ${scale}L) div (_t2 - _t1)"))
    val wOrd = Window.partitionBy(col(keyCol))
      .orderBy(col("_slope_bp"), col("_t1"), col("_t2"))
    val wAll = Window.partitionBy(col(keyCol))
    pairs.withColumn("_rn", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(col(keyCol), col("_n").as("n_pairs"),
        col("_slope_bp").as("slope_bp"))
  }

  /** Kendall tau-a rank correlation of an integer series against time,
    * in bp: over all pairs t_i < t_j, concordant means x_j > x_i,
    * discordant x_j < x_i, ties neither; τ_a = (c − d) / n_pairs. The
    * rank-based monotone-trend test beside [[theilSenSlopeBp]]'s slope —
    * same contract (caller collapses to a calendar-bounded series first,
    * so the pair join is an equi-join with tiny per-key fan-out), same
    * truncating scaling. Output:
    * (key, n_pairs, concordant, discordant, ties, tau_bp). */
  def kendallTauBp(series: DataFrame, keyCol: String, tCol: String,
      xCol: String): DataFrame = {
    val l = series.select(col(keyCol), col(tCol).as("_t1"), col(xCol).as("_x1"))
    val r = series.select(col(keyCol).as("_k2"), col(tCol).as("_t2"),
      col(xCol).as("_x2"))
    l.join(r, col(keyCol) === col("_k2") && col("_t1") < col("_t2"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_x2") > col("_x1"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("_x2") < col("_x1"), 1L).otherwise(0L)).as("discordant"))
      .select(col(keyCol), col("n_pairs"), col("concordant"),
        col("discordant"),
        (col("n_pairs") - col("concordant") - col("discordant")).as("ties"),
        expr("((concordant - discordant) * 10000L) div n_pairs").as("tau_bp"))
  }

  /** OHLC bars: per (key, fixed time bucket), the opening value (at the
    * earliest (ts, id) — the id breaks timestamp ties deterministically),
    * the high, the low, the close (latest (ts, id)), and the row count.
    * Values are expected pre-quantized (e.g. [[cents]]); open/close via
    * `min_by`/`max_by` over a (ts, id) struct — one combiner-friendly
    * groupBy shuffle on (key, bucket), no window sort. The candlestick /
    * downsampling primitive: 100 TB of ticks fold to one row per bucket
    * map-side before the shuffle. */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, bucketUs: Long): DataFrame =
    df.groupBy(col(keyCol), expr(s"$tsCol div ${bucketUs}L").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min_by(col(valCol), struct(col(tsCol), col(idCol))).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max_by(col(valCol), struct(col(tsCol), col(idCol))).as("close"))

  /** Rolling OLS slope of an integer series vs its time column, over the
    * trailing `n` rows per key, scaled ×10000 with floor division — the
    * windowed twin of `Mining.groupedSlope` (same closed form, same
    * truncating scaling, window sums instead of a group agg; windows of
    * fewer than 2 points — or degenerate equal-x frames — yield NULL via
    * the NULLIF'd denominator). One shuffle on the key; per-row state is
    * five running sums, so the frame never materializes. */
  def rollingSlopeBp(df: DataFrame, keyCol: String, tCol: String,
      xCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    df.select(col(keyCol), col(tCol), col(xCol))
      .withColumn("_cnt", count(lit(1)).over(w))
      .withColumn("_sx", sum(col(tCol)).over(w))
      .withColumn("_sy", sum(col(xCol)).over(w))
      .withColumn("_sxy", sum(col(tCol) * col(xCol)).over(w))
      .withColumn("_sxx", sum(col(tCol) * col(tCol)).over(w))
      .select(col(keyCol), col(tCol), col(xCol),
        expr("((_cnt * _sxy - _sx * _sy) * 10000L) div " +
          "NULLIF(_cnt * _sxx - _sx * _sx, 0L)").as("slope_bp"))
  }

  /** Day-of-week seasonal profile of an integer daily series (`dCol` =
    * epoch day, `xCol` = integral value): per weekday slot (d mod 7,
    * epoch-anchored — slot 0 is Thursday), the floored seasonal mean and
    * the largest absolute deviation of any single day from its slot mean
    * — the seasonal-naive decomposition's component table, used to judge
    * whether a weekly profile explains the series before reaching for
    * anything heavier. Two enum-sized aggregations (7 slots), the
    * residual join broadcasts the 7-row means back; everything integer
    * (floored mean ⇒ residuals within ±1 of the float decomposition,
    * engine-identical). Output: (dow, n_days, dow_mean, max_abs_resid). */
  /** Linear interpolation over daily gaps: expand each key's series to
    * every day in its own [min, max] span, keep observed values, and fill
    * the interior gaps with the floor-integer line between the
    * bracketing observations — x_prev + (x_next − x_prev)·(d − d_prev)
    * div (d_next − d_prev). The straight-line counterpart of
    * [[TimeJoins]]' LOCF forward-fill; span endpoints are observed by
    * construction, so every gap is bracketed and no null survives. The
    * day grid explodes from a per-key (min, max) aggregate — grid size is
    * keys × span days, never data rows — and the four bracketing columns
    * (prev/next value and day) ride two frames over one (key, day) sort.
    * Output: (key, day, x_fill, is_obs). */
  def interpolateDaily(daily: DataFrame, keyCol: String, dCol: String,
      xCol: String): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dCol)).as("_lo"), max(col(dCol)).as("_hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"))).as(dCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dCol))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next-observation lookups as a running window over the reversed day
    // order — an UnboundedFollowing frame re-aggregates [current, end]
    // per row, O(n²) per partition (see TimeJoins.asofJoinNearest); the
    // grid's days are unique per key, so the reversal is an exact total
    // order and `last` here equals `first` over the forward frame.
    val fwdRev = Window.partitionBy(col(keyCol)).orderBy(col(dCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, dCol), "left")
      .withColumn("_pv", last(col(xCol), ignoreNulls = true).over(back))
      .withColumn("_pd", last(when(col(xCol).isNotNull, col(dCol)),
        ignoreNulls = true).over(back))
      .withColumn("_nv", last(col(xCol), ignoreNulls = true).over(fwdRev))
      .withColumn("_nd", last(when(col(xCol).isNotNull, col(dCol)),
        ignoreNulls = true).over(fwdRev))
      .select(col(keyCol), col(dCol).as("day"),
        when(col(xCol).isNotNull, col(xCol))
          .otherwise(col("_pv") + expr(
            s"((_nv - _pv) * ($dCol - _pd)) div (_nd - _pd)"))
          .as("x_fill"),
        when(col(xCol).isNotNull, 1).otherwise(0).as("is_obs"))
  }

  /** Ingestion-gap report per key: contiguous runs of MISSING days inside
    * each key's [min, max] observed span — (key, gap_start, gap_end,
    * gap_days). The data-quality twin of [[interpolateDaily]] (which
    * fills values): this one tells you WHERE the feed went dark and for
    * how long, the first artifact an ingest on-call asks for.
    *
    * Shape: per-key span agg → day-grid explode → anti-join observed →
    * the islands trick (day − row_number is constant within a contiguous
    * run) → per-island fold. The grid explode is bounded by span days per
    * key (calendar-sized, not data-sized); every shuffle is keyed. */
  def gapReport(df: DataFrame, keyCol: String, dCol: String): DataFrame = {
    val obs = df.select(col(keyCol), col(dCol).cast("long").as("d")).distinct()
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col("d")).as("_lo"), max(col("d")).as("_hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"))).as("d"))
    val missing = grid.join(obs, Seq(keyCol, "d"), "left_anti")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("d"))
    missing
      .withColumn("_isl", col("d") - row_number().over(w))
      .groupBy(col(keyCol), col("_isl"))
      .agg(min(col("d")).as("gap_start"), max(col("d")).as("gap_end"),
        count(lit(1)).as("gap_days"))
      .select(col(keyCol), col("gap_start"), col("gap_end"), col("gap_days"))
  }

  def dowSeasonal(daily: DataFrame, dCol: String, xCol: String): DataFrame = {
    val slots = daily.select((col(dCol) % 7).as("dow"), col(xCol).as("_x"))
    val means = slots.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(_x) div count(1)").as("dow_mean"))
    slots.join(broadcast(means), Seq("dow"))
      .groupBy(col("dow"))
      .agg(first(col("n_days")).as("n_days"),
        first(col("dow_mean")).as("dow_mean"),
        max(abs(col("_x") - col("dow_mean"))).as("max_abs_resid"))
  }

  /** Rolling Pearson correlation between two aligned series over a
    * trailing ROWS window, with [[Mining.groupedCorr]]'s exact contract
    * (sign + floor-scaled r², decimal(38,0) sufficient statistics — no
    * float drift at any window position). Emits only full windows.
    *
    * Like [[acf]]/[[cusumChangepoint]], this operates on a TICK-BOUNDED
    * series (daily rollups: the domain is the calendar, not the data), so
    * the single ordered window is a bounded sort by construction — the
    * unbounded-key variant would partition by series id. */
  def rollingCorr(df: DataFrame, tCol: String, xCol: String, yCol: String,
      window: Int, scale: Long = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val w = Window.orderBy(col(tCol)).rowsBetween(-(window - 1), 0)
    val wn = Window.orderBy(col(tCol))
    df.select(col(tCol), col(xCol).cast(d38).as("_x"),
        col(yCol).cast(d38).as("_y"))
      .select(col(tCol),
        count(lit(1)).over(w).cast(d38).as("n"),
        sum(col("_x")).over(w).as("sx"), sum(col("_y")).over(w).as("sy"),
        sum(col("_x") * col("_y")).over(w).as("sxy"),
        sum(col("_x") * col("_x")).over(w).as("sxx"),
        sum(col("_y") * col("_y")).over(w).as("syy"),
        row_number().over(wn).as("rn"))
      .filter(col("rn") >= window)
      .select(col(tCol), col("n").cast("long").as("n"),
        expr("CAST(sign(n * sxy - sx * sy) AS BIGINT)").as("corr_sign"),
        expr(s"CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * $scale) " +
          "div NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0) " +
          "AS BIGINT)").as("r2_scaled"))
  }

  /** STL-lite decomposition of a keyed daily series into
    * trend + weekly seasonal + residual, entirely in exact fractions:
    * trend is the centered 7-day moving sum over 7 (null at the edges —
    * a short window would bias the level), the detrended value is
    * `v·7 − trend_num` over 7, the day-of-week seasonal component is the
    * mean detrended value of that weekday (`Σdet_num` over `7·m`, m =
    * contributing days), and the residual subtracts the two with the
    * common denominator 7·m: `res_num = det_num·m − seas_num`. The
    * decomposition identity v = trend + seasonal + residual holds
    * EXACTLY in the fractions — no float version can say that. Shapes:
    * one key-partitioned window + one (key, dow) agg broadcast back. */
  def stlLite(daily: DataFrame, keyCol: String, dCol: String,
      vCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dCol))
      .rowsBetween(-3, 3)
    val t = daily.select(col(keyCol), col(dCol), col(vCol).as("v"))
      .withColumn("_tn", sum(col("v")).over(w))
      .withColumn("_tc", count(lit(1)).over(w))
      .withColumn("trend_num", when(col("_tc") === 7, col("_tn")))
      .withColumn("det_num",
        when(col("_tc") === 7, col("v") * 7 - col("_tn")))
      .withColumn("dow", pmod(col(dCol), lit(7)))
      .drop("_tn", "_tc")
    val seas = t.filter(col("det_num").isNotNull)
      .groupBy(col(keyCol), col("dow"))
      .agg(sum(col("det_num")).as("seas_num"),
        (count(lit(1)) * 7).as("seas_den"))
    t.join(broadcast(seas), Seq(keyCol, "dow"), "left")
      .withColumn("res_num",
        col("det_num") * expr("seas_den div 7") - col("seas_num"))
      .withColumn("res_den", col("seas_den"))
  }

  /** Epoch-folding periodicity scan: for each candidate period p, fold
    * the per-tick series onto phase buckets `d mod p` and score how much
    * of the total variance the bucket means explain —
    * `score_milli ≈ 1000·SSB/SST`. A true period-p signal concentrates
    * variance between phase buckets (score → 1000); white noise spreads
    * it (score → 0). The integer-exact spectral proxy: folding is the
    * astronomy-standard period test and needs no sin/cos, so there is no
    * libm divergence between engines — the reason this is used here
    * instead of a periodogram.
    *
    * Arithmetic: A = Σ_b (S_b²·10⁶ div c_b) (ppm-scaled Σ S_b²/c_b,
    * floored per bucket — engine-identical), B = S²·10⁶ div n,
    * SSB_ppm = max(A − B, 0), SST_ppm = Q·10⁶ − B, score = SSB·1000 div
    * SST. Candidate periods broadcast; one aggregate per (key, period,
    * phase) then (key, period) — combiner-friendly, ticks×|periods| rows
    * in flight, never a global window. */
  def foldedPeriodScan(daily: DataFrame, keyCol: String, dCol: String,
      xCol: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      "candidate periods must be >= 2")
    val spark = daily.sparkSession
    import spark.implicits._
    val d = daily.select(col(keyCol).as("_k"), col(dCol).cast("long").as("_d"),
      col(xCol).cast("long").as("_x"))
    val per = periods.toDF("period")
    val buckets = d.crossJoin(broadcast(per))
      .groupBy(col("_k"), col("period"), pmod(col("_d"), col("period")).as("_b"))
      .agg(count(lit(1)).as("_c"), sum(col("_x")).as("_s"))
      .groupBy(col("_k"), col("period"))
      .agg(sum(expr(
        "CAST(CAST(_s AS DECIMAL(38,0)) * _s * 1000000 div _c AS DECIMAL(38,0))"))
        .as("_a"))
    val tot = d.groupBy(col("_k"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("_x")).as("_sum"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_q"))
      .withColumn("_bb", expr(
        "CAST(CAST(_sum AS DECIMAL(38,0)) * _sum * 1000000 div n_ticks " +
          "AS DECIMAL(38,0))"))
    buckets.join(tot, Seq("_k"))
      .withColumn("_sst", expr("_q * 1000000 - _bb"))
      .filter(col("_sst") > 0)
      .select(col("_k").as(keyCol), col("period"), col("n_ticks"),
        expr("CAST(greatest(_a - _bb, CAST(0 AS DECIMAL(38,0))) * 1000 " +
          "div _sst AS BIGINT)").as("score_milli"))
  }
}
