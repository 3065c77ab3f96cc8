package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distribution-comparison and sequential-scan statistics.
  *
  * These are the hypothesis-test / monitoring primitives a pipeline runs to
  * compare cohorts (did the treatment shift the metric?), audit feeds for
  * level breaks, and track stateful balances — all in integer arithmetic so
  * a cross-engine oracle matches bit-for-bit:
  *
  *  - Mann–Whitney U rides DOUBLED mid-ranks (`2·rank + ties − 1`), so tied
  *    values contribute exact integers instead of `.5` fractions.
  *  - The KS distance is kept as the unreduced fraction `max|F1·n2 − F2·n1|`
  *    over `n1·n2` — no float CDFs anywhere.
  *  - The floored running balance uses the prefix-min identity
  *    `clamp(p)_i = p_i − min(0, min_{j≤i} p_j)`, which turns an apparently
  *    sequential recurrence `c_i = max(0, c_{i−1} + d_i)` into two
  *    partitioned window sums — no per-key iteration, no mapGroups.
  *
  * Every window here is key-partitioned (cohort / user), never global, so
  * each operator is one shuffle on its key at any scale.
  */
object Stats {

  /** Tie-aware Mann–Whitney U between two samples inside each group.
    *
    * Input columns: `groupCol` (cohort key), `sampleCol` (1 or 2),
    * `valueCol` (integral metric). Returns per group: `n1`, `n2`, and
    * `u1_x2` = 2·U₁ — doubled so tied mid-ranks stay integral
    * (avg rank = rank + (ties−1)/2, so 2·avgRank = 2·rank + ties − 1;
    * U₁ = R₁ − n₁(n₁+1)/2 doubles to ΣR₁ₓ₂ − n₁(n₁+1)).
    */
  def mannWhitneyU(df: DataFrame, groupCol: String, sampleCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val wTies = Window.partitionBy(groupCol, valueCol)
    val ranked = df
      .select(col(groupCol), col(sampleCol), col(valueCol))
      .withColumn("r_x2",
        rank().over(w).cast("long") * 2 + count(lit(1)).over(wTies) - 1)
    ranked.groupBy(col(groupCol))
      .agg(
        count(when(col(sampleCol) === 1, lit(1))).as("n1"),
        count(when(col(sampleCol) === 2, lit(1))).as("n2"),
        sum(when(col(sampleCol) === 1, col("r_x2"))).as("r1_x2"))
      .select(col(groupCol), col("n1"), col("n2"),
        (col("r1_x2") - col("n1") * (col("n1") + 1)).as("u1_x2"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group, as an exact
    * fraction: `d_num = max_v |F1(v)·n2 − F2(v)·n1|` (denominator n1·n2),
    * plus `d_at`, the smallest value attaining the max. One shuffle on the
    * group key; the per-value collapse makes the windowed pass
    * distinct-value-bounded, not row-bounded. */
  def ksStatistic(df: DataFrame, groupCol: String, sampleCol: String,
      valueCol: String): DataFrame = {
    val cell = df.groupBy(col(groupCol), col(valueCol)).agg(
      count(when(col(sampleCol) === 1, lit(1))).as("c1"),
      count(when(col(sampleCol) === 2, lit(1))).as("c2"))
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val dev = cell
      .withColumn("f1", sum(col("c1")).over(wCum))
      .withColumn("f2", sum(col("c2")).over(wCum))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .withColumn("d", abs(col("f1") * col("n2") - col("f2") * col("n1")))
      .withColumn("md", max(col("d")).over(wAll))
    dev.groupBy(col(groupCol), col("n1"), col("n2"))
      .agg(max(col("d")).as("d_num"),
        min(when(col("d") === col("md"), col(valueCol))).as("d_at"))
  }

  /** Floor-at-zero running balance (inventory / credit semantics):
    * `c_i = max(0, c_{i−1} + delta_i)` per key, evaluated WITHOUT recursion
    * via the prefix-min identity `c_i = p_i − min(0, min_{j≤i} p_j)` where
    * `p` is the plain running sum. Proof by induction: if `delta_i` keeps
    * the balance positive the running min is unchanged; if it would push
    * below zero, `p_i` becomes the new min and the difference is exactly 0.
    * Appends `balance` to the input rows. */
  def clampedBalance(df: DataFrame, keyCol: String, orderCols: Seq[String],
      deltaCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("p_run", sum(col(deltaCol)).over(w))
      .withColumn("balance",
        col("p_run") - least(lit(0L), min(col("p_run")).over(w)))
      .drop("p_run")
  }

  /** Time-weighted average (LOCF weighting): each observation's value holds
    * from its timestamp to the next observation in the same (key, bucket),
    * the last one holding to the bucket end. Returns per (key, bucket):
    * `num` = Σ value·heldMicros, `held_us` = Σ heldMicros — the caller
    * divides (kept as the exact pair so integer flooring is explicit). */
  def timeWeighted(df: DataFrame, keyCol: String, bucketCol: String,
      tsUsCol: String, tieCol: String, valueCol: String,
      bucketEndUs: Column): DataFrame = {
    val w = Window.partitionBy(keyCol, bucketCol)
      .orderBy(col(tsUsCol), col(tieCol))
    df.withColumn("held_one",
        coalesce(lead(col(tsUsCol), 1).over(w), bucketEndUs) - col(tsUsCol))
      .groupBy(col(keyCol), col(bucketCol))
      .agg(sum(col(valueCol) * col("held_one")).as("num"),
        sum(col("held_one")).as("held_us"))
  }

  /** Two-sample Wasserstein-1 (earth mover's) distance per group, exact:
    * `W1 · n1 · n2 = Σ_i |F1(v_i)·n2 − F2(v_i)·n1| · (v_{i+1} − v_i)` over
    * the pooled distinct values — the area between the two un-normalized
    * CDFs. Completes the drift triad with [[ksStatistic]] (max gap) and
    * the TV distance (point-mass diff): EMD sees HOW FAR mass moved, not
    * just that it moved. Same shape as KS: per-value collapse, one
    * group-keyed window pass.
    *
    * Arithmetic: the accumulated `|F1·n2 − F2·n1|·gap` terms are bounded
    * by n1·n2·valueRange, which exceeds Long around 10⁹ rows of 10⁸-range
    * values — so the products and the final sum run in decimal(38,0)
    * (the repo's exact-arithmetic convention; see [[Series.rollingCorr]]) and
    * only the reported `w1_num` narrows back to long. */
  def wasserstein1(df: DataFrame, groupCol: String, sampleCol: String,
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cell = df.groupBy(col(groupCol), col(valueCol)).agg(
      count(when(col(sampleCol) === 1, lit(1))).as("c1"),
      count(when(col(sampleCol) === 2, lit(1))).as("c2"))
    val wCum = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOrd = Window.partitionBy(groupCol).orderBy(valueCol)
    val wAll = Window.partitionBy(groupCol)
    cell
      .withColumn("f1", sum(col("c1")).over(wCum))
      .withColumn("f2", sum(col("c2")).over(wCum))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .withColumn("gap",
        coalesce(lead(col(valueCol), 1).over(wOrd) - col(valueCol), lit(0L)))
      .groupBy(col(groupCol), col("n1"), col("n2"))
      .agg(sum(abs(col("f1").cast(d38) * col("n2").cast(d38)
          - col("f2").cast(d38) * col("n1").cast(d38))
        * col("gap").cast(d38)).as("w1d"))
      .select(col(groupCol), col("n1"), col("n2"),
        col("w1d").cast("long").as("w1_num"))
  }

  /** FIFO lot matching (first-in-first-out cost/consumption allocation)
    * WITHOUT sequential state: order supply lots and demand draws per key,
    * take cumulative-quantity prefix sums, and observe that FIFO assigns
    * demand j to supply i exactly where their half-open cumulative
    * intervals `[S_{i−1}, S_i)` and `[D_{j−1}, D_j)` intersect — the
    * matched quantity is the overlap length. The classic inventory
    * recurrence becomes one window pass per side plus one key-equi join
    * with a range predicate.
    *
    * Scale: the join is hash/sort-merge on the key; within a key the
    * overlap chain emits ≤ nS + nD − 1 matches, though the join evaluates
    * the per-key pair product before filtering — for heavy keys, bucketize
    * the cumulative axis exactly as the q74 range join does.
    *
    * Quantities must be NONNEGATIVE (negative quantities make the
    * cumulative intervals non-monotone and the intersection semantics
    * meaningless). A zero-quantity lot has an empty interval but can sit
    * strictly inside an opposite-side interval and satisfy the open-open
    * overlap predicate, so zero-qty match rows are filtered out of the
    * output explicitly. */
  def fifoMatch(supply: DataFrame, demand: DataFrame, keyCol: String,
      idCol: String, ordCols: Seq[String], qtyCol: String): DataFrame = {
    def ranges(df: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(keyCol).orderBy(ordCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(s"${side}_hi", sum(col(qtyCol)).over(w))
        .withColumn(s"${side}_lo", col(s"${side}_hi") - col(qtyCol))
        .select(col(keyCol), col(idCol).as(s"${side}_id"),
          col(s"${side}_lo"), col(s"${side}_hi"))
    }
    ranges(supply, "s").join(ranges(demand, "d"), Seq(keyCol))
      .filter(col("s_lo") < col("d_hi") && col("d_lo") < col("s_hi"))
      .select(col(keyCol), col("s_id"), col("d_id"),
        (least(col("s_hi"), col("d_hi")) -
          greatest(col("s_lo"), col("d_lo"))).as("qty"))
      .filter(col("qty") > 0)
  }

  /** Wald–Wolfowitz run counts per key over an ordered boolean sequence:
    * `n_hi`/`n_lo` and the number of maximal same-value runs. A run
    * boundary is a row whose predecessor (null-safe) differs — counted
    * with one partitioned lag, no iteration. */
  def runCounts(df: DataFrame, keyCol: String, orderCols: Seq[String],
      hiCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    df.withColumn("boundary",
        when(!(lag(col(hiCol), 1).over(w) <=> col(hiCol)), 1L).otherwise(0L))
      .groupBy(col(keyCol))
      .agg(
        count(when(col(hiCol), lit(1))).as("n_hi"),
        count(when(!col(hiCol), lit(1))).as("n_lo"),
        sum(col("boundary")).as("runs"))
  }
}
