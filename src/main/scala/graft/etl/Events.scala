package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over (user, type, timestamp) streams — the
  * behavioral half of the events surface (the windowed/sessionized half
  * lives in [[TimeJoins]]). Reference analogue: the reference's
  * progress/monitoring events are append-only streams with per-job
  * counters (base.ts:626-667); these are the sequence-order operators a
  * warehouse runs on the same shape.
  *
  * Every operator shuffles once on the user (or group) key and computes
  * order-dependent state per key; nothing materializes a per-user list
  * larger than that user's own events. Timestamps ride as integral
  * microseconds throughout — interval arithmetic stays exact and the
  * cross-engine oracle can reproduce every comparison bit-for-bit.
  */
object Events {

  /** Markov transition counts: how often does a user's `prev` event type
    * lead to `curr`? One window (lag over user, ordered by time) + one
    * count shuffle. First events per user have no predecessor and are
    * excluded. The caller guarantees (user, ts) uniqueness — with ties the
    * lag order would be nondeterministic (pass a tiebreak column as
    * `tsCol` via struct if needed). */
  def transitionCounts(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    df.select(col(userCol),
        lag(col(typeCol), 1).over(w).as("prev_type"),
        col(typeCol).as("curr_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("curr_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Length-3 path counts (the trigram extension of [[transitionCounts]]):
    * every consecutive (t1, t2, t3) step triple per user, counted
    * globally. Two stacked lags on ONE user-partitioned window — same
    * single shuffle as the bigram pass; the output domain is |types|³,
    * data-size-independent. `tieCol` breaks equal-timestamp ordering so
    * the path set is deterministic. */
  def pathTrigrams(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    df.select(
        lag(col(typeCol), 2).over(w).as("t1"),
        lag(col(typeCol), 1).over(w).as("t2"),
        col(typeCol).as("t3"))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
  }

  /** Ordered funnel: per user, the furthest step of `steps` reached where
    * step i must STRICTLY follow the completion of step i−1 and every step
    * must land within `windowUs` microseconds of the step-0 completion.
    * Earliest-completion semantics: step 0 completes at the user's first
    * step-0 event; step i at the first qualifying event after step i−1.
    *
    * One shuffle (user groupBy); per-user state is that user's events,
    * folded in timestamp order by a codegen'd HOF — the state array holds
    * one timestamp per step, so the fold is O(events · steps) with no
    * quadratic re-evaluation (the lambda reads the accumulator, not the
    * source array). Steps must be distinct event types.
    *
    * Output: (user, furthest) with furthest in 0..steps.length. */
  def funnelFurthest(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      "funnel steps must be non-empty and distinct")
    val k = steps.length
    val evs = sort_array(collect_list(struct(
      unix_micros(col(tsCol)).as("us"), col(typeCol).as("t"))))
    // fold: slots(i) = completion time of step i, null until reached
    val folded = aggregate(
      evs,
      array(Seq.fill(k)(lit(null).cast("long")): _*),
      (acc, ev) => {
        val upd = (i: Int) => {
          val slot = element_at(acc, i + 1)
          val prereq =
            if (i == 0) lit(true)
            else element_at(acc, i).isNotNull && ev("us") > element_at(acc, i)
          val inWindow =
            if (i == 0) lit(true)
            else ev("us") <= element_at(acc, 1) + lit(windowUs)
          when(slot.isNull && ev("t") === lit(steps(i)) && prereq && inWindow,
            ev("us")).otherwise(slot)
        }
        array((0 until k).map(upd): _*)
      })
    df.groupBy(col(userCol).as("user"))
      .agg(folded.as("slots"))
      .select(col("user"),
        size(filter(col("slots"), s => s.isNotNull)).as("furthest"))
  }

  /** Weekly retention cohorts: users grouped by their first-activity day,
    * counted per whole-week offset in which they were active again. Two
    * shuffles (per-user min, then the cohort count); the distinct
    * (user, day) grain bounds state by active-days, not events. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = df.select(col(userCol).as("user"), to_date(col(tsCol)).as("day")).distinct()
    val first = days.groupBy(col("user")).agg(min(col("day")).as("cohort_day"))
    days.join(first, "user")
      .select(col("cohort_day"),
        (datediff(col("day"), col("cohort_day")) / 7).cast("int").as("week_offset"),
        col("user"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Longest consecutive-day activity streak per user (plus total active
    * days) — the engagement metric behind "N-day streak" features: the
    * islands trick (day − row_number is constant within a consecutive
    * run) over each user's distinct activity days, then a two-level fold.
    * All shuffles user-keyed; per-user state is the day sort, bounded by
    * calendar days, not events. */
  def activeStreaks(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(userCol).as("u"),
      datediff(to_date(col(tsCol)), to_date(lit("1970-01-01"))).as("d"))
      .distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("d"))
    days.withColumn("_isl", col("d") - row_number().over(w))
      .groupBy(col("u"), col("_isl"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col("u").as(userCol))
      .agg(sum(col("_len")).cast("long").as("n_active_days"),
        max(col("_len")).cast("long").as("longest_streak"))
  }

  /** Consecutive-period audience overlap per group — "how much of this
    * month's audience returns next month", as exact Jaccard in basis
    * points: distinct (group, period, user), per-period sizes, and an
    * intersection join on (group, user) restricted to period+1 — fan-out
    * per (group, user) is that user's period count (calendar-bounded),
    * never users². Periods present on both sides emit a row even at zero
    * overlap (the churn-cliff case a join-only formulation would drop). */
  def audienceOverlapByPeriod(df: DataFrame, groupCol: String,
      userCol: String, periodCol: String): DataFrame = {
    val d = df.select(col(groupCol).as("g"),
      col(periodCol).cast("long").as("p"), col(userCol).as("u")).distinct()
    val sizes = d.groupBy(col("g"), col("p")).agg(count(lit(1)).as("n"))
    val inter = d.as("a").join(d.as("b"),
        col("a.g") === col("b.g") && col("a.u") === col("b.u") &&
          col("b.p") === col("a.p") + 1)
      .groupBy(col("a.g").as("g"), col("a.p").as("p"))
      .agg(count(lit(1)).as("inter"))
    sizes.as("sa").join(sizes.as("sb"),
        col("sa.g") === col("sb.g") && col("sb.p") === col("sa.p") + 1)
      .select(col("sa.g").as("g"), col("sa.p").as("p"),
        col("sa.n").as("n_curr"), col("sb.n").as("n_next"))
      .join(inter, Seq("g", "p"), "left")
      .na.fill(0L, Seq("inter"))
      .select(col("g").as(groupCol), col("p").as("period"),
        col("n_curr"), col("n_next"), col("inter"),
        expr("inter * 10000L div (n_curr + n_next - inter)")
          .as("jaccard_bp"))
  }

  /** Growth accounting: classify every (user, active period) as new /
    * retained / resurrected via the user's previous active period, and
    * charge a churn event to period p+1 whenever a user active in p is
    * not active in p+1 (including after their last activity, up to the
    * corpus's max period). Per-period counts of the four states — the
    * standard active-user decomposition
    * (new + retained + resurrected − churned telescopes the MAU curve).
    *
    * Shape: distinct (user, period), one user-partitioned lag window,
    * plus churn rows derived from the SAME lag pass (interior gaps) and
    * the per-user max (tail churn) — no self-join; the one driver-free
    * global (max period) rides a broadcast one-row aggregate. All
    * shuffles are user- or period-keyed. */
  def growthAccounting(df: DataFrame, userCol: String,
      periodCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val act = df.select(col(userCol).as("u"),
      col(periodCol).cast("long").as("p")).distinct()
    val gmax = act.agg(max(col("p")).as("_gmax"))
    val lagged = act.withColumn("_prev",
      lag(col("p"), 1).over(Window.partitionBy(col("u")).orderBy(col("p"))))
    val states = lagged.select(col("p"),
      when(col("_prev").isNull, lit("new"))
        .when(col("p") - col("_prev") === 1, lit("retained"))
        .otherwise(lit("resurrected")).as("state"))
    val interiorChurn = lagged.filter(col("p") - col("_prev") > 1)
      .select((col("_prev") + 1).as("p"), lit("churned").as("state"))
    val tailChurn = act.groupBy(col("u")).agg(max(col("p")).as("_last"))
      .join(broadcast(gmax))
      .filter(col("_last") < col("_gmax"))
      .select((col("_last") + 1).as("p"), lit("churned").as("state"))
    states.unionByName(interiorChurn).unionByName(tailChurn)
      .groupBy(col("p").as("period"))
      .agg(
        sum(when(col("state") === "new", 1L).otherwise(0L))
          .cast("long").as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .cast("long").as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .cast("long").as("n_resurrected"),
        sum(when(col("state") === "churned", 1L).otherwise(0L))
          .cast("long").as("n_churned"))
  }

  /** Cohort LTV (lifetime-value) matrix — the revenue-weighted twin of
    * [[retentionCohorts]]: rows cohort by each user's FIRST period, and
    * every (cohort, age = period − cohort) cell reports active users and
    * summed revenue in integer cents. Reading a row left-to-right is the
    * cohort's cumulative-value curve; comparing rows at equal age is the
    * cohort-quality trend — the standard growth table, produced in long
    * form (no pivot) so the schema doesn't change when time advances.
    *
    * `periodCol` is any integral period index the caller derives (e.g.
    * year·12+month); keeping the calendar arithmetic caller-side makes
    * the operator calendar-agnostic. Shuffles: the first-period agg and
    * the cell agg, both on user/cohort keys, plus one user-keyed join —
    * co-partitioned with the agg before it, so AQE plans it without an
    * extra exchange. The distinct-user count per cell rides the same
    * (cohort, age) shuffle (count_distinct expands to a two-level agg). */
  def cohortLtvMatrix(df: DataFrame, userCol: String, periodCol: String,
      centsCol: String): DataFrame = {
    val rows = df.select(col(userCol).as("user"),
      col(periodCol).cast("long").as("period"),
      col(centsCol).cast("long").as("cents"))
    val first = rows.groupBy(col("user"))
      .agg(min(col("period")).as("cohort"))
    rows.join(first, "user")
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("age"))
      .agg(countDistinct(col("user")).as("active_users"),
        sum(col("cents")).cast("long").as("revenue_cents"))
  }

  /** Sweep-line maximum concurrency per group over half-open intervals
    * [startUs, endUs): unpivot to (+1 at start, −1 at end) deltas, running
    * sum in (time, delta) order, max per group. The RANGE window frame
    * (Spark's default with ORDER BY) makes equal-(t, delta) peers share one
    * cumulative value, so tie order cannot change the result; sorting the
    * −1 before the +1 at equal timestamps implements the half-open
    * semantics (an interval ending exactly when another starts never
    * overlaps it).
    *
    * The per-group running sum is inherently sequential in VALUE but not
    * in EXECUTION: deltas pre-aggregate to (group, t, d) grain (the
    * RANGE-frame tie semantics fall out for free — unique keys mean
    * every peer row shares one prefix), and the prefix sum rides the
    * two-phase range-bucketed spelling ([[Layout.addRunningSums]]) —
    * never a one-task sort per enum group (the q268 class; round-9 enum
    * lint). */
  def maxConcurrent(intervals: DataFrame, groupCol: String,
      startUsCol: String, endUsCol: String): DataFrame = {
    val deltas = intervals
      .select(col(groupCol), col(startUsCol).as("t"), lit(1L).as("d"))
      .union(intervals.select(col(groupCol), col(endUsCol).as("t"), lit(-1L).as("d")))
      .groupBy(col(groupCol), col("t"), col("d"))
      .agg(sum(col("d")).as("_dd"))
    val bucketed = Layout.bucketize(deltas,
      Seq(col(groupCol), col("t"), col("d")))
    Layout.addRunningSums(bucketed, Seq(groupCol),
        Seq(col("t"), col("d")), Seq(col("_dd") -> "running"))
      .groupBy(col(groupCol))
      .agg(max(col("running")).as("max_concurrent"))
  }

  /** CDC-log materialization — the snapshot a change stream implies:
    * per key, the LAST operation by (order, id) wins; a terminal delete
    * removes the key from the snapshot entirely (absent, not nulled).
    * This is the batch replay of a MERGE-ing sink (the q154 SCD-2 build
    * keeps every version; this keeps only current state — the table a
    * consumer actually queries). `n_ops` rides along so the snapshot
    * reports how much churn each surviving key absorbed. One
    * partitioned window, deterministic tiebreak, no state beyond the
    * sort. A NULL delete flag is an upsert, not a delete — the flag is
    * coalesced to false so three-valued logic can't silently drop a key
    * whose last op has an unknown flag. */
  def cdcApply(log: DataFrame, keyCol: String, orderCols: Seq[String],
      deleteCol: Column, valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val wAll = Window.partitionBy(col(keyCol))
    log
      .withColumn("_rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(wAll))
      .filter(col("_rn") === 1 && !coalesce(deleteCol, lit(false)))
      .select(col(keyCol) +: valueCols.map(col) :+ col("n_ops"): _*)
  }

  /** Idempotency / burst dedup: collapse retry storms and double-fires
    * into one logical event — events with the same key within `gapUs`
    * micros of the PREVIOUS event chain into one burst (gap-based, so a
    * long retry storm stays one burst however long it runs), and each
    * burst reports its first event plus the collapse count. The telemetry
    * twin of exact content dedup: duplicate SENDS have distinct payload
    * hashes but the same cause.
    *
    * Two key-partitioned windows (chain flag, then running burst id via
    * an explicit rows frame) and one burst-grain aggregate; ties on the
    * timestamp break by `tieCol` so burst boundaries are deterministic.
    * `tsUsCol` must be integral micros (same contract as scd2History). */
  /** Anchored horizon dedup — the BATCH TWIN of
    * [[graft.streaming.EventsStreaming.dedupStream]]'s
    * `dropDuplicatesWithinWatermark` contract (for in-event-time-order
    * arrival): per key, the first row is kept and becomes the anchor;
    * every later row within `horizonUs` of the anchor is a duplicate;
    * the first row MORE than `horizonUs` after the anchor is re-admitted
    * and becomes the new anchor. NOT the same as [[burstDedup]] (gap
    * from the PREVIOUS row — session semantics): a slow drip of
    * duplicates 1 min apart never re-admits under burst/session rules
    * but re-admits every horizon here, exactly like the streaming op
    * whose per-key state expires `horizonUs` after the KEPT arrival.
    *
    * The anchor recurrence is prefix-dependent (no closed window form),
    * so it rides a per-key sort_array(collect_list) + `aggregate` fold —
    * per-key state is that key's OWN occurrence list, i.e. the
    * duplicate multiplicity of one content key, not the table. A
    * pathological hot key is PRE-CAPPED (the contract every collect_list
    * site here carries): only the first `maxOccurrences` occurrences per
    * key (by ts, id) enter the fold, so no task ever materializes an
    * unbounded array; occurrences beyond the cap are IGNORED (neither
    * kept nor examined) and surface in the `overflow_n` side-output
    * column — a nonzero value says the key needs operational attention,
    * not a bigger array. One shuffle on the key (the rank window and the
    * fold aggregate share the hash(k) partitioning and sort).
    * Output: the kept rows as (key, event id, overflow_n), exploded
    * back out. */
  def horizonDedup(df: DataFrame, keyCol: String, tsUsCol: String,
      idCol: String, horizonUs: Long,
      maxOccurrences: Int = 1 << 20): DataFrame = {
    require(horizonUs >= 0 && maxOccurrences >= 1)
    val wk = Window.partitionBy(col("k")).orderBy(col("_us"), col("_id"))
    val occ = df
      .select(col(keyCol).as("k"), col(tsUsCol).as("_us"),
        col(idCol).as("_id"))
      .withColumn("_rn", row_number().over(wk))
      .groupBy(col("k"))
      // collect_list skips nulls, so the `when` IS the cap: over-cap rows
      // still flow through (they feed the overflow count) but never join
      // the array
      .agg(sort_array(collect_list(when(col("_rn") <= maxOccurrences,
          struct(col("_us").as("us"), col("_id").as("id"))))).as("_occ"),
        greatest(count(lit(1)) - maxOccurrences, lit(0L)).as("overflow_n"))
      .withColumn("_st", expr(
        s"""aggregate(
           |  slice(_occ, 2, size(_occ)),
           |  struct(_occ[0].us AS us, array(_occ[0].id) AS ids),
           |  (acc, x) -> IF(x.us - acc.us > ${horizonUs}L,
           |    struct(x.us AS us, concat(acc.ids, array(x.id)) AS ids),
           |    acc))""".stripMargin))
    occ.select(col("k").as(keyCol),
      explode(col("_st.ids")).as(idCol), col("overflow_n"))
  }

  def burstDedup(df: DataFrame, keyCols: Seq[String], tsUsCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    require(keyCols.nonEmpty && gapUs >= 0)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsUsCol), col(tieCol))
    val started = df
      .withColumn("_prev", lag(col(tsUsCol), 1).over(w))
      .withColumn("_start", col("_prev").isNull ||
        col(tsUsCol) - col("_prev") > gapUs)
    val withBurst = started.withColumn("burst_id",
      sum(when(col("_start"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBurst
      .groupBy((keyCols.map(col) :+ col("burst_id")): _*)
      .agg(min(col(tsUsCol)).as("ts_us"),
        min(struct(col(tsUsCol), col(tieCol))).as("_f"),
        count(lit(1)).as("burst_n"))
      .select((keyCols.map(col) :+ col("burst_id") :+ col("ts_us") :+
        col("_f").getField(tieCol).as(tieCol) :+ col("burst_n")): _*)
  }

  /** SCD-2 history build: each change event becomes a version row with a
    * half-open validity interval `[valid_from_us, valid_to_us)` in integer
    * micros — `valid_to_us` is the key's next change (exclusive), NULL with
    * `is_current = 1` for the latest version. One partitioned window; ties
    * on the timestamp are broken by `idCol` so the interval chain is
    * deterministic. Input `tsUsCol` must already be integral micros. */
  def scd2History(df: DataFrame, keyCol: String, idCol: String,
      tsUsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    df.withColumn("valid_to_us", lead(col(tsUsCol), 1).over(w))
      .withColumn("valid_from_us", col(tsUsCol))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1).otherwise(0))
  }

  /** First-touch attribution: credit each `creditType` event to the FIRST
    * event type of its session, where sessions break after `gapUs` micros
    * of inactivity (the lag/cumsum gaps-and-islands recipe — same session
    * ids any SQL engine derives from the same window order). Two windows
    * over one (user, time, id) sort + an enum-sized groupBy.
    * Output: (first_touch, n_purchases). */
  def firstTouchAttribution(df: DataFrame, userCol: String, idCol: String,
      typeCol: String, tsUsCol: String, gapUs: Long,
      creditType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsUsCol), col(idCol))
    val s = df
      .withColumn("_brk",
        when(lag(col(tsUsCol), 1).over(w).isNull ||
          col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1)
          .otherwise(0))
      .withColumn("_sid", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    s.withColumn("first_touch", first(col(typeCol)).over(
        Window.partitionBy(col(userCol), col("_sid"))
          .orderBy(col(tsUsCol), col(idCol))))
      .filter(col(typeCol) === creditType)
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  /** Merge overlapping-or-touching intervals per group (gaps-and-islands):
    * an interval opens a new island iff its start exceeds the max end seen
    * so far. Output: one row per island with its span and member count.
    * Both prefix passes (the exclusive running max of ends, then the
    * island-id cumsum of the new-island flags) ride the two-phase
    * range-bucketed spelling over one [[Layout.bucketize]] frame — a
    * group key with enum cardinality never funnels the whole table
    * through O(enum) sort tasks (the q268 class; round-9 enum lint).
    * Equal (start, end) duplicates are order-insensitive: whichever
    * lands second sees the first's end as prevMaxEnd and joins its
    * island. */
  def mergeIntervals(intervals: DataFrame, groupCol: String,
      startUsCol: String, endUsCol: String): DataFrame = {
    val sort = Seq(col(startUsCol), col(endUsCol))
    // aggregate to unique (group, start, end) keys FIRST: the two prefix
    // passes are independent window evaluations, and only a tie-free
    // total order guarantees they see the same row order (a duplicate
    // carrying the new-island flag in one pass but sorting after its
    // twin in the other would split the twins across islands)
    val grain = intervals.groupBy(col(groupCol) +: sort: _*)
      .agg(count(lit(1)).as("_cnt"))
    val bucketed = Layout.bucketize(grain, col(groupCol) +: sort)
    val flagged = Layout.addPrevMax(bucketed, Seq(groupCol), sort,
        col(endUsCol), "_pme")
      .withColumn("_new",
        when(col("_pme").isNull || col(startUsCol) > col("_pme"), 1L)
          .otherwise(0L))
    Layout.addRunningSums(flagged, Seq(groupCol), sort,
        Seq(col("_new") -> "island"))
      .groupBy(col(groupCol), col("island"))
      .agg(min(col(startUsCol)).as("island_start"),
        max(col(endUsCol)).as("island_end"),
        sum(col("_cnt")).as("n_intervals"))
  }

  /** Discrete survival life table for start→event conversion: per
    * day-offset k since each user's first `startType` event, how many
    * users were still at risk, how many converted (first `eventType` at
    * offset k), and how many left observation (censored — never
    * converted; their censor offset is the global horizon minus their
    * start). These are the exact integer inputs of the Kaplan–Meier
    * estimator — the estimator's running product is a float the caller
    * can fold in one pass over the ≤calendar-many output rows. An event
    * before the user's start (possible in synthetic/replayed streams) is
    * treated as unobserved → censored, documented here. Three
    * combiner-friendly aggregates + one reverse running sum over the
    * DAY-OFFSET table — calendar-bounded, so the single-partition window
    * is a constant-size tail, not a data-sized one. Output:
    * (day_k, at_risk, events, censored). */
  def lifeTable(df: DataFrame, userCol: String, typeCol: String,
      tsUsCol: String, startType: String, eventType: String): DataFrame = {
    val day = 86400000000L
    val starts = df.filter(col(typeCol) === startType)
      .groupBy(col(userCol)).agg(min(col(tsUsCol)).as("_s"))
    val firsts = df.filter(col(typeCol) === eventType)
      .groupBy(col(userCol)).agg(min(col(tsUsCol)).as("_p"))
    val horizon = df.agg(max(col(tsUsCol)).as("_c"))
    val perUser = starts
      .join(firsts, Seq(userCol), "left")
      .join(broadcast(horizon))
      .withColumn("_eday",
        when(col("_p") >= col("_s"), expr(s"(_p - _s) div ${day}L")))
      .select(col(userCol),
        coalesce(col("_eday"), expr(s"(_c - _s) div ${day}L")).as("_day"),
        when(col("_eday").isNotNull, 1L).otherwise(0L).as("_ev"))
    val byDay = perUser.groupBy(col("_day"))
      .agg(sum(col("_ev")).as("events"),
        sum(lit(1L) - col("_ev")).as("censored"))
    val w = Window.orderBy(col("_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay.withColumn("at_risk",
        sum(col("events") + col("censored")).over(w))
      .select(col("_day").as("day_k"), col("at_risk"), col("events"),
        col("censored"))
  }

  /** U-shaped (position-based) multi-touch attribution with EXACT cent
    * conservation: each purchase's cents split across the user's touches
    * in the preceding window — 40/20/40 across first/middles/last (solo
    * touch takes all, a pair splits evenly), integerized per purchase by
    * largest remainder so every purchase's credit sums to its cents to
    * the cent. The industry-standard middle ground between
    * first-touch (q155) and last-touch/PIT (q177), which over- and
    * under-credit discovery respectively.
    *
    * Scale shape: the touch×purchase pairing rides
    * [[TimeJoins.rangeJoinBucketed]] (bounded fan-out equi-join, never a
    * per-key nested loop); position weights scale by (m−2) so they stay
    * integral for any touch count m; the largest-remainder rank is a
    * per-purchase window bounded by that purchase's touch count.
    * Purchases with no touch in window report as `unattributed` — their
    * cents are NOT silently dropped. Only POSITIVE-cents purchases are
    * attributed: a refund/zero row would make `cents·wgt div wtot`
    * truncate toward zero in Spark but floor in DuckDB and drive
    * `left_over` negative, breaking both cent conservation and
    * cross-engine parity — refunds are a reversal stream, not a
    * conversion to credit. Output: one row per position class
    * (solo/first/middle/last/unattributed) with touch count and credited
    * cents. */
  def positionAttribution(events: DataFrame, purchaseType: String,
      touchType: String, windowUs: Long,
      bucketWidthUs: Long): DataFrame = {
    val p = events.filter(col("event_type") === purchaseType &&
        col("value").isNotNull)
      .select(col("user_id"), col("event_id").as("pid"),
        expr("unix_micros(ts)").as("pus"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("ws", col("pus") - windowUs)
    val t = events.filter(col("event_type") === touchType)
      .select(col("user_id"), col("event_id").as("tid"),
        expr("unix_micros(ts)").as("tus"))
    val j = TimeJoins.rangeJoinBucketed(t, p, "user_id", "tus", "ws",
      "pus", bucketWidthUs)
    val w = Window.partitionBy(col("pid")).orderBy(col("tus"), col("tid"))
    val wp = Window.partitionBy(col("pid"))
    val ranked = j
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(wp))
    val weighted = ranked
      .withColumn("pos",
        when(col("m") === 1, "solo")
          .when(col("rn") === 1, "first")
          .when(col("rn") === col("m"), "last")
          .otherwise("middle"))
      .withColumn("wgt",
        when(col("m") <= 2, lit(1L))
          .when(col("pos").isin("first", "last"),
            (col("m") - 2) * 40L)
          .otherwise(lit(20L)))
      .withColumn("wtot",
        when(col("m") === 1, lit(1L)).when(col("m") === 2, lit(2L))
          .otherwise((col("m") - 2) * 100L))
      .withColumn("base", expr("cents * wgt div wtot"))
      .withColumn("rem", expr("cents * wgt % wtot"))
    val wr = Window.partitionBy(col("pid"))
      .orderBy(col("rem").desc, col("rn"))
    val credited = weighted
      .withColumn("left_over",
        col("cents") - sum(col("base")).over(wp))
      .withColumn("rk", row_number().over(wr))
      .withColumn("credit_c",
        col("base") + when(col("rk") <= col("left_over"), 1L)
          .otherwise(0L))
    val byPos = credited.groupBy(col("pos"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_c")).as("credit_c"))
    val unattributed = p
      .join(j.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .agg(count(lit(1)).as("n_touches"),
        coalesce(sum(col("cents")), lit(0L)).as("credit_c"))
      .select(lit("unattributed").as("pos"), col("n_touches"),
        col("credit_c"))
    byPos.unionByName(unattributed)
  }

  /** Recency-decayed engagement score with NO floating-point decay:
    *   decayed = Σ value div 2^min(⌊age/halflife⌋, 40)
    * — exponential half-life decay quantized to whole halvings, so the
    * score is exact integer arithmetic (bit-shift halving), identical
    * cross-engine, and mergeable (it is a plain SUM of per-row terms —
    * partial aggregation, sketch-free incremental refresh). The cap at
    * 40 halvings floors ancient events to 0 without shift overflow.
    * The standard "recent activity matters more" ranking signal,
    * without the nondeterministic `exp()` the naive version reaches
    * for. */
  def decayedSum(df: DataFrame, keyCol: String, ageDaysCol: String,
      valueCol: String, halflifeDays: Long): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"""$valueCol div shiftleft(1L,
            CAST(least($ageDaysCol div $halflifeDays, 40L) AS INT))"""))
          .as("decayed_c"),
        sum(col(valueCol)).as("raw_c"))

  /** Event-lateness audit — the watermark-sizing report: per group the
    * exact nearest-rank P50/P95 and max of the arrival delay, plus the
    * share (bp) of events that would be DROPPED at each candidate
    * watermark. This is the number a streaming operator's watermark
    * must be read off from — guessing it either drops late data
    * silently or holds state forever. The nearest-rank selection rides
    * the two-phase range-bucketed rank ([[Layout.addRunningSums]] of
    * `lit(1)`) — a group key with enum cardinality (event types!) never
    * one-task-sorts the table (the q268 class; round-9 enum lint) —
    * plus one fold; delays integral (µs). Equal delays take arbitrary
    * adjacent ranks, which cannot change the selected VALUE. */
  def latenessAudit(df: DataFrame, groupCol: String, delayUsCol: String,
      thresholdsSec: Seq[Long]): DataFrame = {
    val at = (target: Column) =>
      sum(when(col("_rn") === target, col(delayUsCol)))
    val lateCols = thresholdsSec.map(t =>
      sum(when(col(delayUsCol) > t * 1000000L, 1L).otherwise(0L))
        .as(s"_c$t"))
    val filtered = df.filter(col(delayUsCol).isNotNull)
      .select(col(groupCol), col(delayUsCol))
    val ns = filtered.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val bucketed = Layout.bucketize(filtered,
      Seq(col(groupCol), col(delayUsCol)))
    val base = Layout.addRunningSums(bucketed, Seq(groupCol),
        Seq(col(delayUsCol)), Seq(lit(1L) -> "_rn"))
      .join(broadcast(ns), groupCol)
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"),
        (Seq(at(expr("(_n + 1) div 2")).as("p50_us"),
          at(expr("(19 * _n + 19) div 20")).as("p95_us"),
          max(col(delayUsCol)).as("max_us")) ++ lateCols): _*)
    thresholdsSec.foldLeft(base) { (acc, t) =>
      acc.withColumn(s"late_bp_$t",
          expr(s"_c$t * 10000 div n")).drop(s"_c$t")
    }
  }

  /** Exact trailing-window distinct actors per day (DAU + rolling WAU):
    * the reach metric HLL sketches usually approximate, exact and still
    * scale-safe because a distinct (user, active-day) row contributes to
    * at most `window` output days — dedupe to user-days first (the one
    * row-scale shuffle), explode each to the ≤`window` days it covers,
    * then one distinct-count per day. Output days cap at the observed
    * max (no partially-informed future rows); leading days keep their
    * honest partial windows. */
  def trailingDistinct(df: DataFrame, userCol: String, dayCol: String,
      window: Int = 7): DataFrame = {
    val ud = df.select(col(userCol).as("_u"), col(dayCol).as("_t"))
      .distinct()
    val mx = ud.agg(max(col("_t")).as("_mt"))
    val wau = ud
      .withColumn("d", explode(sequence(col("_t"),
        col("_t") + (window - 1))))
      .join(broadcast(mx)).filter(col("d") <= col("_mt"))
      .groupBy(col("d"))
      .agg(countDistinct(col("_u")).as("wau"))
    val dau = ud.groupBy(col("_t").as("d"))
      .agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("d"), "left")
      .select(col("d"), coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau"))
  }

  /** Nelson–Aalen cumulative hazard over a [[lifeTable]] frame: the
    * discrete hazard d_k/r_k per time step in floored micro-units, then
    * one ordered running sum — the survival-curve estimator that stays a
    * SUM (unlike Kaplan–Meier's product), so exact integer arithmetic
    * survives any number of steps and the per-term floor is the only
    * quantization (≤ steps·10⁻⁶, identical in both engines since every
    * term is nonnegative). The input table has one row per day offset —
    * bounded by the observation horizon, not the user count — so the
    * unpartitioned window matches [[lifeTable]]'s own at-risk scan. */
  def cumulativeHazard(lifeTable: DataFrame,
      dayCol: String = "day_k"): DataFrame = {
    val w = Window.orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lifeTable
      .withColumn("h_step_micro", expr("events * 1000000 div at_risk"))
      .withColumn("h_cum_micro", sum(col("h_step_micro")).over(w))
  }

  /** CDC-style snapshot diff: classify every key across two state
    * snapshots as `added` (only in `b`), `removed` (only in `a`),
    * `changed` (present in both, any compare column differs, null-safe),
    * or `unchanged`. The warehouse change-detection step the reference
    * performs row-at-a-time before its staging MERGE
    * (db-integration.ts:553-599, content-hash compare) — here one
    * full-outer equi-join on the key, so each side shuffles once and AQE
    * handles key skew; no driver-side state.
    *
    * Output: key + `change_type` + each compare column twice as
    * `old_<c>` / `new_<c>` (NULL on the absent side). Callers pass
    * snapshots already reduced to one row per key. */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val av = compareCols.foldLeft(a)((df, c) =>
      df.withColumnRenamed(c, s"old_$c"))
    val bv = compareCols.foldLeft(b)((df, c) =>
      df.withColumnRenamed(c, s"new_$c"))
      .withColumnRenamed(keyCol, "_bkey")
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    av.join(bv, col(keyCol) === col("_bkey"), "full_outer")
      .withColumn("change_type",
        when(col(keyCol).isNull, lit("added"))
          .when(col("_bkey").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn(keyCol, coalesce(col(keyCol), col("_bkey")))
      .drop("_bkey")
  }
}
