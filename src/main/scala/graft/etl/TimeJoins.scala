package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's surface (it has none —
  * SURVEY.md §2.10 note): an AS-OF join and gap-based sessionization, both
  * shaped for 100 TB.
  *
  * The as-of join uses the union+window technique instead of a range join:
  * tag both sides, sort within each key by (time, tag), and carry the last
  * seen right-side value forward. Cost = ONE shuffle on the key and a
  * linear window pass — no per-row range probe, no join explosion, and
  * skew only where a single key is hot (then salt by coarse time bucket).
  */
object TimeJoins {

  /** For each left row, the right row's `pick` value with the greatest
    * `rightTime` <= the left row's `leftTime` (per `key`); ties on time
    * resolve to the greatest `pick`. Left rows keep all their columns,
    * plus `asof_<pick>` (null when nothing precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
    val r = right.select(col(key), col(rightTime).as("_time"),
      col(pick).as("_pick")).withColumn("_tag", lit(0))
    // right rows sort before left rows at equal time (<= semantics);
    // multiple right rows at one time resolve to the max pick
    val w = Window.partitionBy(col(key))
      .orderBy(col("_time"), col("_tag"), col("_pick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asof_$pick", last(col("_pick"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_time", "_tag", "_pick")
  }

  /** As-of join with a max-staleness tolerance — the kdb/pandas
    * `merge_asof(tolerance=...)` semantics: each left row takes the
    * latest right row at or before its time ONLY if that row is within
    * `tolerance` time units; staler matches report NULL (a quote older
    * than the tolerance is not a usable quote). Also emits `asof_gap`
    * (left time − matched right time, NULL when unmatched/too stale) so
    * callers can audit staleness instead of re-deriving it.
    *
    * Same union+window single-shuffle shape as [[asofJoin]]; the matched
    * row's TIME rides the same window pass as its pick value (two `last`
    * calls over one sort — Spark computes them in one window frame), so
    * tolerance costs no extra shuffle. Times must be integral (cast
    * long); ties at equal time resolve to the max pick, as in
    * [[asofJoin]]. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String,
      tolerance: Long): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime).cast("long"))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
      .withColumn("_rt", lit(null).cast("long"))
    val r = right.select(col(key), col(rightTime).cast("long").as("_time"),
        col(pick).as("_pick"))
      .withColumn("_tag", lit(0))
      .withColumn("_rt", col("_time"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_time"), col("_tag"), col("_pick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_mp", last(col("_pick"), ignoreNulls = true).over(w))
      .withColumn("_mt", last(col("_rt"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .withColumn(s"asof_$pick",
        when(col("_time") - col("_mt") <= tolerance, col("_mp")))
      .withColumn("asof_gap",
        when(col("_time") - col("_mt") <= tolerance,
          col("_time") - col("_mt")))
      .drop("_time", "_tag", "_pick", "_rt", "_mp", "_mt")
  }

  /** Forward as-of: for each left row, the right row's `pick` value with
    * the SMALLEST `rightTime` >= the left row's `leftTime` (per `key`);
    * ties on time resolve to the smallest `pick`. Same union+window shape
    * as [[asofJoin]] — one shuffle, linear pass — with the window looking
    * forward instead of back. Output column `asoff_<pick>` (null when
    * nothing follows). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
    val r = right.select(col(key), col(rightTime).as("_time"),
      col(pick).as("_pick")).withColumn("_tag", lit(2))
    // right rows sort after left rows at equal time (>= semantics);
    // multiple right rows at one time resolve to the min pick.
    // Running `last` over the reversed total order, NOT
    // `first over (currentRow..unboundedFollowing)` — the latter frame
    // re-aggregates [current, end] per row, O(n²) per partition (see
    // [[asofJoinNearest]]); this is the O(n) streaming form with
    // identical tie semantics (equal-time rights, _tag 2, sort before
    // the left row descending → still visible; equal-time right ties
    // still resolve to the min pick).
    val w = Window.partitionBy(col(key))
      .orderBy(col("_time").desc, col("_tag").desc, col("_pick").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asoff_$pick", last(col("_pick"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_time", "_tag", "_pick")
  }

  /** Nearest as-of: each left row takes the right `pick` whose time is
    * CLOSEST — backward or forward, ties preferring the backward match
    * (the pandas `merge_asof(direction='nearest')` rule) — completing
    * the as-of family (backward [[asofJoin]], forward
    * [[asofJoinForward]], staleness-bounded [[asofJoinTolerance]]).
    *
    * Both candidates ride ONE tagged union and ONE sorted partition:
    * the backward `last` and forward `first` windows share the same
    * partitionBy/orderBy, so Catalyst plans a single sort — still the
    * single-shuffle as-of shape. Right rows at equal time sort before
    * the left row (backward catches exact matches with gap 0, which
    * beats any forward candidate anyway); equal-time right ties resolve
    * to the max pick like [[asofJoin]], forward ties to the min pick
    * like [[asofJoinForward]]. Times must be integral. Emits
    * `asofn_<pick>` and `asofn_gap` (absolute distance; both NULL when
    * the key has no right rows at all). */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime).cast("long"))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
      .withColumn("_rt", lit(null).cast("long"))
    val r = right.select(col(key), col(rightTime).cast("long").as("_time"),
        col(pick).as("_pick"))
      .withColumn("_tag", lit(0))
      .withColumn("_rt", col("_time"))
    val back = Window.partitionBy(col(key))
      .orderBy(col("_time"), col("_tag"), col("_pick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward candidate as a RUNNING window over the exact reversed total
    // order — semantically `first(..) over (currentRow..unboundedFollowing)`
    // on the ascending order, but Spark executes an UnboundedFollowing
    // frame by re-aggregating [current, end] for EVERY row: O(n²) per
    // partition (measured 74 s on q322's 1M-row/6-key input; 1.5 s this
    // way). The reversed running `last` is the O(n) streaming frame.
    // Tie sets agree: at equal _time the right rows (_tag 0) sort before
    // the left row ascending and after it descending, so neither variant
    // sees an equal-time right row, and among equal-time right rows both
    // resolve to the min _pick.
    val fwdRev = Window.partitionBy(col(key))
      .orderBy(col("_time").desc, col("_tag").desc, col("_pick").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nearer = col("_bt").isNotNull &&
      (col("_ft").isNull ||
        (col("_time") - col("_bt")) <= (col("_ft") - col("_time")))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_bp", last(col("_pick"), ignoreNulls = true).over(back))
      .withColumn("_bt", last(col("_rt"), ignoreNulls = true).over(back))
      .withColumn("_fp", last(col("_pick"), ignoreNulls = true).over(fwdRev))
      .withColumn("_ft", last(col("_rt"), ignoreNulls = true).over(fwdRev))
      .filter(col("_tag") === 1)
      .withColumn(s"asofn_$pick",
        when(nearer, col("_bp"))
          .otherwise(when(col("_ft").isNotNull, col("_fp"))))
      .withColumn("asofn_gap",
        when(nearer, col("_time") - col("_bt"))
          .otherwise(when(col("_ft").isNotNull,
            col("_ft") - col("_time"))))
      .drop("_time", "_tag", "_pick", "_rt", "_bp", "_bt", "_fp", "_ft")
  }

  /** Interval (range) join: each point row matched to every interval row
    * of the same `key` with `startUs <= timeUs < endUs`. All three time
    * columns are epoch-micros longs (exact integers — no timestamp
    * precision drift across engines).
    *
    * Spark plans a raw `ON key = key AND t >= s AND t < e` join as a
    * per-key nested loop (or worse, a broadcast nested loop when the key
    * is absent). Instead: bucket time by `bucketWidthUs`, explode each
    * interval to the buckets it overlaps, and equi-join points on
    * (key, bucket) before applying the exact predicate. An interval of
    * length L lands in at most L/width + 1 buckets, so the fan-out is
    * bounded and chosen by the caller — a plain shuffled hash join that
    * scales like any other equi-join. Pick `bucketWidthUs` near the
    * typical interval length (≈2 buckets per interval).
    *
    * Output: all point columns + all interval columns except `key`. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      key: String, timeUs: String, startUs: String, endUs: String,
      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    require(Set(timeUs, startUs, endUs).size == 3 && timeUs != key,
      "time/start/end/key column names must be distinct (the join resolves " +
        "them by name across the two sides)")
    val w = lit(bucketWidthUs)
    // floorDiv semantics for negative epochs: Spark's long `div` truncates
    // toward zero, so shift via `floor` on a fraction-free decimal path
    val bucketOf = (c: Column) => floor(c.cast("decimal(20,0)") / w).cast("long")
    // the interval side is renamed throughout: self-joins (points and
    // intervals derived from one source) would otherwise hit Spark's
    // ambiguous-attribute resolution on every join column
    val iv = intervals
      .filter(col(endUs) > col(startUs))
      .withColumn("_ibucket",
        explode(sequence(bucketOf(col(startUs)), bucketOf(col(endUs) - 1))))
      .withColumnRenamed(key, "_ikey")
    val pt = points.withColumn("_bucket", bucketOf(col(timeUs)))
    pt.join(iv, col(key) === col("_ikey") && col("_bucket") === col("_ibucket")
        && col(timeUs) >= col(startUs) && col(timeUs) < col(endUs))
      .drop("_ikey", "_bucket", "_ibucket")
  }

  /** Interval-overlap join: every pair of a-row and b-row on the same
    * `key` whose half-open intervals `[start, end)` overlap
    * (`a.start < b.end && b.start < a.end`). Same bucketing scheme as
    * [[rangeJoinBucketed]] — both sides explode to the time buckets they
    * cover and equi-join on (key, bucket), so Spark plans a plain shuffled
    * hash join instead of a per-key nested loop. A pair overlapping k
    * shared buckets would match k times; the extra
    * `bucket == bucketOf(greatest(a.start, b.start))` conjunct keeps
    * exactly one match per pair (the overlap's first bucket is shared by
    * construction) — dedup by arithmetic, not by a `distinct` shuffle.
    *
    * Output: all a columns + b's columns prefixed `b_` (b's key dropped).
    * Times are epoch-micros longs; pick `bucketWidthUs` near the typical
    * interval length. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, key: String,
      startCol: String, endCol: String, bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val w = lit(bucketWidthUs)
    val bucketOf = (c: Column) => floor(c.cast("decimal(20,0)") / w).cast("long")
    val bs = s"b_$startCol"
    val be = s"b_$endCol"
    val bv = b.columns.foldLeft(b)((df, c) => df.withColumnRenamed(c,
        if (c == key) "_bkey" else s"b_$c"))
      .filter(col(be) > col(bs))
      .withColumn("_bbucket",
        explode(sequence(bucketOf(col(bs)), bucketOf(col(be) - 1))))
    val av = a.filter(col(endCol) > col(startCol))
      .withColumn("_abucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol) - 1))))
    av.join(bv,
        col(key) === col("_bkey") && col("_abucket") === col("_bbucket") &&
          col(startCol) < col(be) && col(bs) < col(endCol) &&
          col("_abucket") === bucketOf(greatest(col(startCol), col(bs))))
      .drop("_bkey", "_abucket", "_bbucket")
  }

  /** Daily resample with gap filling: per-key daily row counts, with the
    * missing days inside each key's [first, last] span emitted as zeros —
    * the regularization step before any rolling/forecast pass. The day
    * spine is generated per key (sequence + explode: fan-out = span days,
    * no driver-side calendar), then left-joined back to the observed
    * counts — both joins shuffle on the same key, and AQE coalesces.
    * Output: key, day (date), n (long). */
  /** Trailing-window count feature: for each left row, how many right
    * rows fall in the half-open window [leftTime − window, leftTime) per
    * key — the point-in-time feature ("clicks in the last 24 h before
    * this purchase") that leaks nothing from the future.
    *
    * No range join: the count is a DIFFERENCE of two running counts,
    * cnt(< t) − cnt(< t − window), both read off ONE union+window pass —
    * each left row contributes two probe rows (at t and t − window) that
    * sort before right rows at equal time (strict-< semantics), a running
    * sum of the right-row indicator gives every probe its prefix count,
    * and a per-id fold subtracts the pair. One key shuffle + one id-keyed
    * fold; right rows are scanned once however wide the window is — the
    * shape that survives a 30-day window over 100 TB where a bucketed
    * range join would fan each right row into 30 buckets. `idCol` must
    * uniquely identify left rows. */
  def trailingCount(left: DataFrame, right: DataFrame, key: String,
      idCol: String, leftTime: String, rightTime: String,
      window: Long): DataFrame = {
    val r = right.select(col(key), col(rightTime).cast("long").as("_us"))
      .withColumn("_tag", lit(1))
      .withColumn("_id", lit(null).cast("long"))
      .withColumn("_sign", lit(0L))
    val probeA = left.select(col(key), col(idCol).cast("long").as("_id"),
        col(leftTime).cast("long").as("_us"))
      .withColumn("_tag", lit(0)).withColumn("_sign", lit(1L))
    val probeB = left.select(col(key), col(idCol).cast("long").as("_id"),
        (col(leftTime).cast("long") - window).as("_us"))
      .withColumn("_tag", lit(0)).withColumn("_sign", lit(-1L))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_us"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counted = r.unionByName(probeA, allowMissingColumns = true)
      .unionByName(probeB, allowMissingColumns = true)
      .withColumn("_cnt",
        sum(when(col("_tag") === 1, 1L).otherwise(0L)).over(w))
      .filter(col("_tag") === 0)
      .groupBy(col("_id").as(idCol))
      .agg(sum(col("_sign") * col("_cnt")).cast("long").as("trail_cnt"))
    left.join(counted, idCol)
  }

  def resampleDaily(events: DataFrame, key: String,
      timeCol: String): DataFrame = {
    val daily = events
      .withColumn("day", to_date(date_trunc("day", col(timeCol))))
      .groupBy(col(key), col("day")).agg(count(lit(1)).as("n"))
    val spine = daily.groupBy(col(key))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(key), explode(
        sequence(col("_d0"), col("_d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq(key, "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Forward fill (last observation carried forward): nulls in `valueCol`
    * replaced by the most recent non-null value within the key, ordered by
    * `orderCol` — the imputation step after [[resampleDaily]] puts nulls
    * on the day spine. One window pass over the key's existing shuffle;
    * rows before a key's first observation stay null. */
  def forwardFill(df: DataFrame, key: String, orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Gap-based sessions over an event stream (batch twin of streaming
    * session windows): session_window merges events whose gaps are below
    * `gap`. Output: key, session start/end, event count. */
  def sessionize(events: DataFrame, key: String, timeCol: String,
      gap: String): DataFrame =
    events.groupBy(col(key), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Bitemporal snapshot: per key, the version that was VALID at business
    * time `validAt` AS KNOWN at system time `knownAt` — the
    * reproduce-last-month's-report-with-last-month's-knowledge query that
    * a valid-time-only as-of cannot answer (a late-arriving correction
    * changes history; filtering on transaction time restores what the
    * system believed). Selection order inside the (≤validAt, ≤knownAt)
    * window: latest valid time wins, then the latest-recorded row among
    * same-valid-time versions, then the tiebreak column — one filter +
    * one key-partitioned window, a single shuffle. */
  def bitemporalAsOf(df: DataFrame, keyCol: String, validCol: String,
      txCol: String, tieCol: String, validAt: Long,
      knownAt: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(validCol).desc, col(txCol).desc, col(tieCol).desc)
    df.filter(col(validCol) <= validAt && col(txCol) <= knownAt)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }
}
