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
    // doubled mid-ranks read off the per-(group, value) count histogram:
    // r_x2(v) = 2*(#smaller) + ties(v) + 1, identical to
    // 2*rank + ties - 1 on rows — the cumsum window runs over DISTINCT
    // values (bounded by the value domain), never a row-grain rank
    // partitioned by a low-cardinality cohort key
    val cell = df.select(col(groupCol), col(sampleCol), col(valueCol))
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(when(col(sampleCol) === 1, lit(1))).as("_c1"),
        count(when(col(sampleCol) === 2, lit(1))).as("_c2"),
        count(lit(1)).as("_c"))
    val wv = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    cell.withColumn("_b", coalesce(sum(col("_c")).over(wv), lit(0L)))
      .withColumn("_rx2", col("_b") * 2 + col("_c") + 1)
      .groupBy(col(groupCol))
      .agg(sum(col("_c1")).as("n1"), sum(col("_c2")).as("n2"),
        sum(col("_c1") * col("_rx2")).as("r1_x2"))
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

  /** Population stability index (PSI) from pre-aggregated histograms —
    * the production drift score beside [[ksStatistic]] (ordinal max-gap),
    * the TV distance (point mass), and [[wasserstein1]] (mass transport):
    * `PSI = Σ_bins (q_i − p_i)·ln(q_i/p_i)` over reference shares p and
    * actual shares q. Operating on counts (not rows) is the 100 TB shape:
    * the histogram is one combiner-friendly groupBy upstream; the PSI math
    * runs on an enum-sized table.
    *
    * Exact cross-engine form: Laplace-smoothed counts `a = ref+1`,
    * `b = act+1` (PSI is undefined on empty bins; +1 is the standard
    * fix), per-group totals na = Σa, nb = Σb, and each bin contributes
    * `(b·na − a·nb) · (⌊log₂(b·na)⌋ − ⌊log₂(a·nb)⌋)` — the share shift
    * times the FLOORED-bits log ratio (binary-digit counts, the q136
    * recipe: `length(bin(x)) − 1`), so both engines compute identical
    * integers; `psi_cb = 100·Σ/(na·nb)` is the reported centi-bits score.
    * Zero when actual ≡ reference. The Σ runs in decimal(38,0); the log
    * arguments b·na, a·nb stay in long (wraps only past ~9·10¹⁸ —
    * a 10⁹-row histogram bin against a 10⁹-row total). */
  def psiFromCounts(counts: DataFrame, groupCol: String, binCol: String,
      refCntCol: String, actCntCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val wAll = Window.partitionBy(groupCol)
    val t = counts
      .withColumn("_a", col(refCntCol) + 1L)
      .withColumn("_b", col(actCntCol) + 1L)
      .withColumn("na", sum(col("_a")).over(wAll))
      .withColumn("nb", sum(col("_b")).over(wAll))
      .withColumn("_bna", col("_b") * col("na"))
      .withColumn("_anb", col("_a") * col("nb"))
    t.withColumn("_term",
        (col("_bna").cast(d38) - col("_anb").cast(d38)) *
          (length(expr("bin(_bna)")) - length(expr("bin(_anb)"))).cast(d38))
      .groupBy(col(groupCol), col("na"), col("nb"))
      .agg(sum(col("_term")).as("_psi"))
      .select(col(groupCol), col("na"), col("nb"),
        col("_psi").cast("long").as("psi_bits_num"),
        // every term is >= 0 (share shift and floored log ratio share a
        // sign), so integral div == floor — exact cross-engine
        expr("CAST((_psi * 100) div (CAST(na AS DECIMAL(38,0)) * nb) " +
          "AS BIGINT)").as("psi_cb"))
  }

  /** KL(actual ‖ reference) drift per group over Laplace-smoothed count
    * cells — the fourth member of the drift family (PSI/TV/EMD/KS
    * exist): Σ p_i·log₂(p_i/q_i) with p = actual share, q = reference
    * share, quantized through DECOMPOSED floored bit-lengths
    *   term_i = b_i · (⌊log₂b_i⌋ + ⌊log₂na⌋ − ⌊log₂a_i⌋ − ⌊log₂nb⌋)
    * (bitlen per factor, never of a product — the b·na form overflows
    * long at 10⁹ rows). True KL is ≥ 0 but the quantized sum can dip a
    * few bits negative, and Spark's `div` truncates toward zero while
    * DuckDB's `//` floors — so the centibit ratio clamps at 0 before
    * dividing, keeping both engines on the nonnegative-floor path.
    * Same single-window shape as [[psiFromCounts]]. */
  def klFromCounts(counts: DataFrame, groupCol: String, binCol: String,
      refCntCol: String, actCntCol: String): DataFrame = {
    val wAll = Window.partitionBy(groupCol)
    val t = counts
      .withColumn("_a", col(refCntCol) + 1L)
      .withColumn("_b", col(actCntCol) + 1L)
      .withColumn("na", sum(col("_a")).over(wAll))
      .withColumn("nb", sum(col("_b")).over(wAll))
    t.withColumn("_term", col("_b") *
        (length(expr("bin(_b)")) + length(expr("bin(na)")) -
          length(expr("bin(_a)")) - length(expr("bin(nb)"))).cast("long"))
      .groupBy(col(groupCol), col("na"), col("nb"))
      .agg(sum(col("_term")).as("kl_bits_num"))
      .select(col(groupCol), col("na"), col("nb"), col("kl_bits_num"),
        expr("greatest(kl_bits_num, 0L) * 100 div nb").as("kl_cb"))
  }

  /** Jensen–Shannon divergence per group over the same Laplace-smoothed
    * count cells as [[klFromCounts]] — the SYMMETRIC, bounded (≤ 1 bit)
    * member of the drift family, the one to alert on when neither window
    * is privileged as "reference":
    *   JS = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2.
    * With integer counts a_i (ref) / b_i (act) and totals na / nb, the
    * mixture cell has the exact common-denominator form
    * m_i = a_i·nb + b_i·na over 2·na·nb, so each P-side log rewrites to
    * the BALANCED two-up/two-down ratio (same shape as [[klFromCounts]],
    * whose floored-bit-length errors cancel in expectation — an
    * unbalanced form like `1 + log a + log nb − log m` carries a
    * systematic −½-bit bias that the clamp would silently eat):
    *   log₂(p_i/m_i) = log₂a_i + log₂(2·na·nb) − log₂na − log₂m_i
    *   term_P,i = a_i·(bl(a_i) + bl(2·na·nb) − bl(na) − bl(m_i))
    *   term_Q,i = b_i·(bl(b_i) + bl(2·na·nb) − bl(nb) − bl(m_i)).
    * JS_cb = ⌊(ΣP·nb + ΣQ·na)·50 / (na·nb)⌋ clamped at 0 first (the
    * quantized sum can dip negative; Spark `div` truncates while DuckDB
    * `//` floors, so both engines must stay on the nonnegative path).
    * The final cross-multiplication rides decimal(38,0). Identical
    * distributions quantize to exactly 0.
    *
    * Unlike KL, the mixture forces bitlens OF products: m_i and 2·na·nb
    * must fit a long, i.e. per-group smoothed totals below ~2³¹ each —
    * ENFORCED at runtime: a group whose smoothed total reaches 2³¹
    * raises an error (raise_error on the _w path) rather than silently
    * overflowing into wrong bit-length terms. Drift runs on binned
    * histograms, so callers with larger windows pre-scale both count
    * columns by a common factor (shares are scale-invariant) before
    * calling. One window + one aggregation. */
  def jsFromCounts(counts: DataFrame, groupCol: String, binCol: String,
      refCntCol: String, actCntCol: String): DataFrame = {
    val wAll = Window.partitionBy(groupCol)
    val lim = 1L << 31
    val t = counts
      .withColumn("_a", col(refCntCol) + 1L)
      .withColumn("_b", col(actCntCol) + 1L)
      .withColumn("na", sum(col("_a")).over(wAll))
      .withColumn("nb", sum(col("_b")).over(wAll))
      .withColumn("_m", col("_a") * col("nb") + col("_b") * col("na"))
      .withColumn("_w",
        when(col("na") < lim && col("nb") < lim,
          col("na") * col("nb") * 2L)
          .otherwise(raise_error(concat(
            lit("jsFromCounts: per-group smoothed totals must stay " +
              "below 2^31 (pre-scale the counts); got na="),
            col("na"), lit(" nb="), col("nb")))))
    t.withColumn("_tp", col("_a") *
        (length(expr("bin(_a)")) + length(expr("bin(_w)")) -
          length(expr("bin(na)")) - length(expr("bin(_m)"))).cast("long"))
      .withColumn("_tq", col("_b") *
        (length(expr("bin(_b)")) + length(expr("bin(_w)")) -
          length(expr("bin(nb)")) - length(expr("bin(_m)"))).cast("long"))
      .groupBy(col(groupCol), col("na"), col("nb"))
      .agg(sum(col("_tp")).as("jsp_num"), sum(col("_tq")).as("jsq_num"))
      .select(col(groupCol), col("na"), col("nb"),
        col("jsp_num"), col("jsq_num"),
        expr("""CAST(greatest(
                  CAST(jsp_num AS DECIMAL(38,0)) * nb +
                  CAST(jsq_num AS DECIMAL(38,0)) * na, 0) * 50
                div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)""")
          .as("js_cb"))
  }

  /** Quantile treatment effect: per group, the exact nearest-rank
    * quantile of sample 1 minus sample 2 at each integer percent —
    * WHERE in the distribution the treatment moved mass, which a mean
    * difference cannot see (tails can shift oppositely and net to
    * zero; the distribution-level companion to the q216/q217 location
    * tests). One rank window per (group, side); every quantile pair
    * folds in a single aggregation, diffs exact integers. */
  def qte(df: DataFrame, groupCol: String, sideCol: String,
      valueCol: String, pcts: Seq[Int]): DataFrame = {
    // nearest-rank selection from the per-(group, side, value) count
    // histogram (cum(v) >= target, cum(v) - c(v) < target picks the
    // unique containing value) - the cumsum runs over distinct values,
    // never a row-grain rank partitioned by the low-cardinality
    // (group, side) key
    val wv = Window.partitionBy(col(groupCol), col(sideCol))
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(sideCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wv))
    val ns = hist.groupBy(col(groupCol), col(sideCol))
      .agg(sum(col("_c")).as("_n"))
    val t = hist.join(broadcast(ns), Seq(groupCol, sideCol))
    def hit(tgt: String) =
      col("_cum") >= expr(tgt) && col("_cum") - col("_c") < expr(tgt)
    val aggs =
      Seq(sum(when(col(sideCol) === 2, col("_c")).otherwise(0L)).as("n2")) ++
        pcts.flatMap { p =>
          val tgt = s"((_n * $p + 99) div 100)"
          Seq(
            sum(when(col(sideCol) === 1 && hit(tgt),
              col(valueCol))).as(s"q1_p$p"),
            sum(when(col(sideCol) === 2 && hit(tgt),
              col(valueCol))).as(s"q2_p$p"))
        }
    val base = t.groupBy(col(groupCol))
      .agg(sum(when(col(sideCol) === 1, col("_c")).otherwise(0L)).as("n1"),
        aggs: _*)
    pcts.foldLeft(base) { (acc, p) =>
      acc.withColumn(s"qte_p$p", col(s"q1_p$p") - col(s"q2_p$p"))
    }
  }

  /** Difference-in-differences per group: the 2×2 (treated × post) cell
    * means of `valueCol`, and the causal contrast
    *   DiD = (m̄₁₁ − m̄₁₀) − (m̄₀₁ − m̄₀₀)
    * — the parallel-trends estimator that a naive post-period mean
    * comparison silently confounds with pre-existing level gaps. All
    * four cell sums/counts are exposed, and the contrast is published as
    * an exact-integer quantization: with the common denominator
    * D = n₁₁·n₁₀·n₀₁·n₀₀ and numerator
    * N = (s₁₁n₁₀−s₁₀n₁₁)·n₀₁·n₀₀ − (s₀₁n₀₀−s₀₀n₀₁)·n₁₁·n₁₀,
    *   did_milli = sign(N) · (|N|·1000 div D)
    * (sign-split so Spark's truncate-toward-zero `div` and DuckDB's
    * flooring `//` agree on the negative path — both see nonnegative
    * operands). Cross-products ride decimal(38,0): cents sums ~10⁹ ×
    * n³ ~10¹⁵ × 10³ stays far inside 38 digits to ~10⁵ rows per cell;
    * any empty cell yields NULL (NULLIF) rather than a fake zero.
    * One map-side-combined aggregation — no window, no join. */
  def diffInDiff(df: DataFrame, groupCol: String, treatCol: Column,
      postCol: Column, valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def cell(t: Int, p: Int, f: Column) =
      sum(when(treatCol === (t == 1) && postCol === (p == 1), f))
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        cell(0, 0, lit(1L)).cast(d38).as("n00"),
        cell(0, 1, lit(1L)).cast(d38).as("n01"),
        cell(1, 0, lit(1L)).cast(d38).as("n10"),
        cell(1, 1, lit(1L)).cast(d38).as("n11"),
        cell(0, 0, col(valueCol)).cast(d38).as("s00"),
        cell(0, 1, col(valueCol)).cast(d38).as("s01"),
        cell(1, 0, col(valueCol)).cast(d38).as("s10"),
        cell(1, 1, col(valueCol)).cast(d38).as("s11"))
    agg
      .withColumn("_num",
        expr("""(s11 * n10 - s10 * n11) * n01 * n00 -
                (s01 * n00 - s00 * n01) * n11 * n10"""))
      .withColumn("_den", expr("NULLIF(n11 * n10 * n01 * n00, 0)"))
      .select(col(groupCol),
        col("n00").cast("long").as("n00"), col("n01").cast("long").as("n01"),
        col("n10").cast("long").as("n10"), col("n11").cast("long").as("n11"),
        col("s00").cast("long").as("s00"), col("s01").cast("long").as("s01"),
        col("s10").cast("long").as("s10"), col("s11").cast("long").as("s11"),
        expr("""CAST(CAST(sign(_num) AS BIGINT) *
                CAST(abs(_num) * 1000 div _den AS BIGINT) AS BIGINT)""")
          .as("did_milli"))
  }

  /** CUPED variance reduction for an A/B readout, quantized to exact
    * integers: over UNIT-level rows (one per user: pre-period covariate
    * x, experiment metric y, boolean arm), the pooled regression
    * adjustment θ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is applied to the
    * treatment–control mean gap:
    *   adj_dy = (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c)
    * — because pre-period behavior predicts in-period behavior, the
    * adjusted gap has (1−ρ²)× the variance of the raw one, i.e. the
    * same experiment decides in a fraction of the runtime. Published as
    * the quantized chain θ_milli, dx_milli, dy_milli (each a sign-split
    * truncated milli-ratio — Spark's truncating `div` and DuckDB's
    * flooring `//` agree on the |·| path), with
    *   adj_dy_milli = dy_milli − sign·(|θ_milli·dx_milli| div 1000):
    * a deterministic estimator both engines and any re-run reproduce
    * bit-for-bit (the ~1e-3 quantization is noise next to sampling
    * error). Cross-products ride decimal(38,0): cents-scale x/y hold
    * exactness to ~10⁸ units. Zero covariate variance or an empty arm
    * yields NULL (NULLIF) rather than a fake zero. One map-side
    * combined aggregation — no window, no join, no second pass. */
  def cuped(df: DataFrame, groupCol: String, armCol: Column,
      xCol: String, yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col(xCol).cast(d38)).as("sx"),
      sum(col(yCol).cast(d38)).as("sy"),
      sum(col(xCol).cast(d38) * col(xCol)).as("sxx"),
      sum(col(xCol).cast(d38) * col(yCol)).as("sxy"),
      sum(when(armCol, 1L).otherwise(0L)).cast(d38).as("n_t"),
      sum(when(armCol, col(xCol)).otherwise(0L)).cast(d38).as("sx_t"),
      sum(when(armCol, col(yCol)).otherwise(0L)).cast(d38).as("sy_t"))
    def milli(num: String, den: String, as: String) =
      expr(s"""CAST(CAST(sign($num) AS BIGINT) *
               CAST(abs($num) * 1000 div NULLIF($den, 0) AS BIGINT)
               AS BIGINT)""").as(as)
    agg
      .withColumn("n_c", col("n") - col("n_t"))
      .withColumn("sx_c", col("sx") - col("sx_t"))
      .withColumn("sy_c", col("sy") - col("sy_t"))
      .select(col(groupCol),
        col("n_t").cast("long").as("n_t"), col("n_c").cast("long").as("n_c"),
        milli("n * sxy - sx * sy", "n * sxx - sx * sx", "theta_milli"),
        milli("sx_t * n_c - sx_c * n_t", "n_t * n_c", "dx_milli"),
        milli("sy_t * n_c - sy_c * n_t", "n_t * n_c", "dy_milli"))
      .withColumn("adj_dy_milli",
        col("dy_milli") - expr(
          """CAST(sign(CAST(theta_milli AS DECIMAL(38,0)) * dx_milli)
               AS BIGINT) *
             CAST(abs(CAST(theta_milli AS DECIMAL(38,0)) * dx_milli)
               div 1000 AS BIGINT)"""))
  }

  /** Nearest-score matching with replacement + the ATT readout — the
    * observational-data counterpart of [[diffInDiff]]/[[cuped]] (no
    * randomized assignment needed): every treated unit is matched to
    * its nearest control BY SCORE (the propensity/covariate axis;
    * ties backward-and-equal, the [[TimeJoins.asofJoinNearest]]
    * contract with score as "time"), and the average
    * treatment-effect-on-treated is the exact matched-pair gap
    *   att_milli = sign · (|Σy_t − Σy_match|·1000 div n_matched).
    * `max_gap` exposes the worst score distance — the caliper check:
    * a large value says some treated units matched far-away controls
    * and the estimate should not be trusted at face value. Groups with
    * no controls report n_matched = 0 and NULL ATT.
    *
    * Shape: matching depends only on the SCORE VALUE, so both sides
    * aggregate to (group, score) grain first — treated to (count, Σy),
    * controls to the tie-rule picks (max y for the backward candidate,
    * min y for the forward, the [[TimeJoins.asofJoinNearest]] tie
    * contract) — and the nearest-match resolution runs as the same
    * tagged-union window over the GRAIN table, whose size is the score
    * domain × groups (matching covariates are coarse by construction:
    * propensity buckets, not raw floats), never the row count. The old
    * spelling windowed the raw rows partitioned by the enum group key —
    * a one-task sort per group at scale (the q268 class; round-9 enum
    * lint). */
  def scoreMatchAtt(df: DataFrame, groupCol: String, armCol: Column,
      scoreCol: String, yCol: String): DataFrame = {
    val treated = df.filter(armCol)
      .select(col(groupCol), col(scoreCol).cast("long").as("_s"),
        col(yCol).as("y_t"))
      .groupBy(col(groupCol), col("_s"))
      .agg(count(lit(1)).as("_nt"), sum(col("y_t")).as("_syt"))
    val controls = df.filter(!armCol)
      .select(col(groupCol), col(scoreCol).cast("long").as("_cs"),
        col(yCol).as("yc"))
      .groupBy(col(groupCol), col("_cs"))
      // the as-of tie rules: backward resolves equal-score ties to the
      // MAX pick, forward to the MIN — at score grain those are the only
      // two values a match can ever take
      .agg(max(col("yc")).as("_ycmax"), min(col("yc")).as("_ycmin"))
    val back = Window.partitionBy(col(groupCol))
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdRev = Window.partitionBy(col(groupCol))
      .orderBy(col("_t").desc, col("_tag").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = treated.select(col(groupCol), col("_s").as("_t"),
        lit(1).as("_tag"), col("_nt"), col("_syt"),
        lit(null).cast("long").as("_ycmax"),
        lit(null).cast("long").as("_ycmin"))
      .unionByName(controls.select(col(groupCol), col("_cs").as("_t"),
        lit(0).as("_tag"), lit(null).cast("long").as("_nt"),
        lit(null).cast("long").as("_syt"), col("_ycmax"), col("_ycmin")))
      .withColumn("_bp", last(when(col("_tag") === 0, col("_ycmax")),
        ignoreNulls = true).over(back))
      .withColumn("_bt", last(when(col("_tag") === 0, col("_t")),
        ignoreNulls = true).over(back))
      .withColumn("_fp", last(when(col("_tag") === 0, col("_ycmin")),
        ignoreNulls = true).over(fwdRev))
      .withColumn("_ft", last(when(col("_tag") === 0, col("_t")),
        ignoreNulls = true).over(fwdRev))
      .filter(col("_tag") === 1)
    val nearer = col("_bt").isNotNull &&
      (col("_ft").isNull ||
        (col("_t") - col("_bt")) <= (col("_ft") - col("_t")))
    grid
      .withColumn("_match", when(nearer, col("_bp"))
        .otherwise(when(col("_ft").isNotNull, col("_fp"))))
      .withColumn("_gap", when(nearer, col("_t") - col("_bt"))
        .otherwise(when(col("_ft").isNotNull, col("_ft") - col("_t"))))
      .groupBy(col(groupCol))
      .agg(sum(col("_nt")).as("n_treated"),
        sum(when(col("_match").isNotNull, col("_nt")).otherwise(0L))
          .as("n_matched"),
        sum(when(col("_match").isNotNull, col("_syt")).otherwise(0L))
          .as("sy_t"),
        sum(coalesce(col("_match") * col("_nt"), lit(0L))).as("sy_c"),
        max(col("_gap")).as("max_gap"))
      .withColumn("att_milli",
        expr("""CAST(CAST(sign(sy_t - sy_c) AS BIGINT) *
                CAST(abs(sy_t - sy_c) * 1000 div NULLIF(n_matched, 0)
                  AS BIGINT) AS BIGINT)"""))
  }

  /** Sample-ratio-mismatch check — the FIRST gate on any A/B readout
    * (a biased assignment invalidates every downstream metric before
    * it's computed): per group, the distinct-unit count in each arm of
    * a 50/50 split and the one-degree chi-square statistic
    *   χ²_milli = (n₀−n₁)²·1000 div (n₀+n₁)
    * (for equal expected counts, (n₀−E)²/E + (n₁−E)²/E reduces to
    * exactly (n₀−n₁)²/n — integer-exact, no float CDF), flagged at the
    * 5% critical value 3.841. Run per SEGMENT (the groupCol), this
    * catches differential logging loss that a whole-experiment check
    * averages away. Units dedupe first (assignment is per unit, not
    * per event): one (group, unit) groupBy, then an enum-sized fold.
    * (n₀−n₁)² passes a long to ~3·10⁹ units per group.
    *
    * A unit observed in BOTH arms (a dual-assignment logging bug —
    * exactly the failure family this gate exists to surface) is counted
    * in arm 1 for n0/n1 AND reported in `n_mixed`; a nonzero n_mixed
    * means the assignment log itself is broken and the chi-square is
    * moot. */
  def srmCheck(df: DataFrame, groupCol: String, armCol: Column,
      unitCol: String): DataFrame = {
    val units = df.groupBy(col(groupCol), col(unitCol))
      .agg(max(when(armCol, 1L).otherwise(0L)).as("_arm"),
        min(when(armCol, 1L).otherwise(0L)).as("_armMin"))
    units.groupBy(col(groupCol))
      .agg(sum(lit(1L) - col("_arm")).as("n0"), sum(col("_arm")).as("n1"),
        sum(when(col("_arm") =!= col("_armMin"), 1L).otherwise(0L))
          .as("n_mixed"))
      .withColumn("chi2_milli",
        expr("(n0 - n1) * (n0 - n1) * 1000 div (n0 + n1)"))
      .withColumn("srm", col("chi2_milli") > 3841L)
  }

  /** Split-conformal calibration: per group, the nonconformity-score
    * radius q̂ = the ⌈(n+1)·(1−α)⌉-th smallest score (the
    * finite-sample-valid conformal quantile — guaranteeing ≥ 1−α
    * coverage for exchangeable data), for each requested integer
    * `alphaPct`, plus the achieved on-set coverage in bp. Exact order
    * statistics via one rank window per group (ties broken by the score
    * itself — equal scores give the same radius either way); no
    * distributional assumption anywhere, which is the point of
    * conformal. Per alpha the output carries the conformal rank k_aXX
    * actually used and `radius_aXX`, NULL when ⌈(n+1)(1−α)⌉ > n (the
    * calibration set too small for that α — the honest answer, not the
    * max). */
  def conformalRadius(df: DataFrame, groupCol: String, scoreCol: String,
      alphaPcts: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df.filter(col(scoreCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
    val aggs = alphaPcts.flatMap { a =>
      val target = s"((_n + 1) * ${100 - a} + 99) div 100"
      Seq(
        max(expr(target)).as(s"k_a$a"),
        sum(when(col("_rn") === expr(target), col(scoreCol)))
          .as(s"radius_a$a"))
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"), aggs: _*)
  }

  /** Pinball (quantile) loss of a point forecast at integer percent
    * quantiles — the eval metric for quantile regressors and P50/P90
    * SLA forecasts, as the exact fraction
    *   loss = Σ [y ≥ ŷ: q·(y−ŷ); else (100−q)·(ŷ−y)] / (100·n).
    * One map-side-combined aggregation per (group, q). */
  def pinballLoss(df: DataFrame, groupCol: String, actualCol: String,
      predCol: String, quantiles: Seq[Int]): DataFrame = {
    val qs = explode(array(quantiles.map(lit): _*)).as("q")
    df.select(col(groupCol), col(actualCol).as("_y"), col(predCol).as("_p"), qs)
      .groupBy(col(groupCol), col("q"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y") >= col("_p"), col("q") * (col("_y") - col("_p")))
          .otherwise((lit(100) - col("q")) * (col("_p") - col("_y"))))
          .as("loss_num"))
      .withColumn("loss_den", lit(100L) * col("n"))
  }

  /** Variance-to-mean dispersion index per group in exact integers — the
    * overdispersion screen for count data (Poisson ⇒ D ≈ 1; D ≫ 1 says
    * the count column is burstier than the model assumes):
    *   D = s²/x̄ = n·(n·Σx² − (Σx)²) / (n·(n−1)·Σx)
    * as a num/den fraction with every product in decimal(38,0)
    * (Σx² reaches n·max², the cross terms n²·max²). Null fraction for
    * groups with n < 2 or Σx = 0. One aggregation. */
  def dispersionIndex(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol)).cast(d38).as("_s"),
        sum(col(valCol).cast(d38) * col(valCol)).as("_s2"))
      .select(col(groupCol), col("n"), col("_s").cast("long").as("sum_x"),
        when(col("n") >= 2 && col("_s") =!= 0,
          col("n").cast(d38) *
            (col("n") * col("_s2") - col("_s") * col("_s"))).as("d_num"),
        when(col("n") >= 2 && col("_s") =!= 0,
          col("n").cast(d38) * (col("n") - 1) * col("_s")).as("d_den"))
  }

  /** Cramér's V² of a two-way contingency table — the normalized
    * strength-of-association summary over [[mutualInfoBits]]'s grid (χ²
    * alone grows with N; V² is comparable across tables). Per-cell χ²
    * terms are floored to centi-units — (o·N − r·c)²·100 div (N·r·c),
    * nonneg so floor ≡ truncate on both engines — then
    * v2_ppm = χ²_cb · 10⁴ div (N·(min(rows,cols)−1)). Products run in
    * decimal(38,0). One cell agg + broadcast marginals. */
  def cramersV2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("n_xy"))
    val rx = cells.groupBy(col(xCol)).agg(sum(col("n_xy")).as("r_x"))
    val cy = cells.groupBy(col(yCol)).agg(sum(col("n_xy")).as("c_y"))
    val n = cells.agg(sum(col("n_xy")).as("_n"),
      countDistinct(col(xCol)).as("_kr"), countDistinct(col(yCol)).as("_kc"))
    // DENSE marginal grid, not just observed cells: an EMPTY cell still
    // contributes (0 − e)²/e = e to χ² — dropping absent combinations
    // silently understates association exactly where it is strongest
    rx.crossJoin(broadcast(cy))
      .join(cells, Seq(xCol, yCol), "left")
      .withColumn("n_xy", coalesce(col("n_xy"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("_d",
        col("n_xy").cast(d38) * col("_n") - col("r_x").cast(d38) * col("c_y"))
      .withColumn("_chi_cb",
        expr("CAST((_d * _d * 100) div (CAST(_n AS DECIMAL(38,0))" +
          " * r_x * c_y) AS BIGINT)"))
      .groupBy(col("_n").as("n_total"), col("_kr").as("k_rows"),
        col("_kc").as("k_cols"))
      .agg(sum(col("_chi_cb")).as("chi2_cb"))
      .withColumn("v2_ppm", expr(
        "chi2_cb * 10000 div (n_total * (least(k_rows, k_cols) - 1))"))
  }

  /** Cochran–Mantel–Haenszel per-stratum terms — the stratified 2×2 A/B
    * test that a plain pooled χ² gets WRONG under confounding (Simpson's
    * pattern: every stratum can favor treatment while the pool favors
    * control). Per stratum: the four margins and the CMH term
    * `a·n − r1·c1` over `n` as an exact fraction, plus the floored ppm
    * form (`term_num·10⁶ div n` — per-stratum floor then sum is the
    * documented quantization; a common denominator Πn_k explodes).
    * One combiner-friendly aggregation. */
  def cmhTerms(df: DataFrame, stratumCol: String, treatCol: String,
      outcomeCol: String): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n"),
        count(when(col(treatCol) && col(outcomeCol), lit(1))).as("a"),
        count(when(col(treatCol), lit(1))).as("r1"),
        count(when(col(outcomeCol), lit(1))).as("c1"))
      .select(col(stratumCol), col("n"), col("a"), col("r1"), col("c1"),
        (col("a") * col("n") - col("r1") * col("c1")).as("term_num"),
        col("n").as("term_den"),
        expr("(a * n - r1 * c1) * 1000000 div n").as("term_ppm"))

  /** Isotonic regression (the PAV fit) over pre-aggregated ordered bins —
    * the monotone calibration curve next to the q141 reliability diagram:
    * given per-bin label sums and counts ordered by `binCol`, the L2
    * isotonic fit at bin i is the classic minimax identity
    * `ŷ_i = max_{j≤i} min_{k≥i} avg(j..k)` — exactly what
    * pool-adjacent-violators produces, with no sequential state.
    *
    * Scale: PAV is inherently sequential over bins, so the operator runs
    * on the HISTOGRAM (B bins — deciles, score buckets; enum-sized), not
    * the rows: prefix sums via one window, interval averages for the
    * O(B²) (j,k) pairs, then the minimax via two tiny grouped passes
    * (O(B³) intermediate rows — trivial for calibration-sized B). Row
    * aggregation upstream is the only real shuffle.
    *
    * Exactness: interval averages are compared as FLOORED scaled
    * integers `(S_k − S_{j−1})·10⁹ div (C_k − C_{j−1})` in long — both
    * engines floor the same nonnegative fractions, so min/max pick
    * identical values bit-for-bit; `y_fit_ppb` is the fit in
    * parts-per-billion of the label unit. Bound: label sums must stay
    * under ~9·10⁹ (10⁹ scale × long range) — re-scale upstream past
    * that. */
  def isotonicFit(bins: DataFrame, groupCol: String, binCol: String,
      sumCol: String, cntCol: String): DataFrame = {
    val wCum = Window.partitionBy(groupCol).orderBy(binCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins.select(col(groupCol), col(binCol),
        col(sumCol).cast("long").as("_s"), col(cntCol).cast("long").as("_c"))
      .withColumn("_ss", sum(col("_s")).over(wCum))
      .withColumn("_cc", sum(col("_c")).over(wCum))
      .withColumn("_ss0", col("_ss") - col("_s"))
      .withColumn("_cc0", col("_cc") - col("_c"))
    val j = pre.select(col(groupCol), col(binCol).as("_j"),
      col("_ss0"), col("_cc0"))
    val k = pre.select(col(groupCol), col(binCol).as("_k"),
      col("_ss"), col("_cc"))
    val pairs = j.join(k, Seq(groupCol)).filter(col("_j") <= col("_k"))
      .select(col(groupCol), col("_j"), col("_k"),
        expr("(_ss - _ss0) * 1000000000 div (_cc - _cc0)").as("_av"))
    val i = pre.select(col(groupCol), col(binCol).as("_i"))
    pairs.join(i, Seq(groupCol))
      .filter(col("_j") <= col("_i") && col("_k") >= col("_i"))
      .groupBy(col(groupCol), col("_i"), col("_j"))
      .agg(min(col("_av")).as("_mn"))
      .groupBy(col(groupCol), col("_i"))
      .agg(max(col("_mn")).as("y_fit_ppb"))
      .select(col(groupCol), col("_i").as("bin"), col("y_fit_ppb"))
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

  /** McNemar's paired test counts per group: two classifiers scored on the
    * SAME rows, reduced to the discordant-pair counts the test is built on
    * — `b` (A right, B wrong), `c` (A wrong, B right) — plus the χ²-shaped
    * statistic as the exact fraction (b−c)² / (b+c). The standard check
    * for "did the new model actually change anything?" on paired eval
    * sets; concordant pairs carry no signal and are reported only as n.
    * One shuffle (the group agg, map-side combined). */
  def mcnemar(df: DataFrame, groupCol: String, truthCol: String,
      predACol: String, predBCol: String): DataFrame = {
    val okA = col(predACol) === col(truthCol)
    val okB = col(predBCol) === col(truthCol)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        count(when(okA && !okB, lit(1))).as("b"),
        count(when(!okA && okB, lit(1))).as("c"))
      .select(col(groupCol), col("n"), col("b"), col("c"),
        ((col("b") - col("c")) * (col("b") - col("c"))).as("stat_num"),
        (col("b") + col("c")).as("stat_den"))
  }

  /** Brier-score reliability decomposition over integer-percent forecasts:
    * per forecast bin (the stated probability in hundredths, 0..100), the
    * count, the positive count, and the bin's reliability term
    * (p̂_b − ȳ_b)² · n_b as the exact fraction
    * (p100·n_b − 100·s_b)² / (10000·n_b), plus the resolution term
    * (ȳ_b − ȳ)² · n_b as (s_b·N − S·n_b)² / (n_b·N²). Summing num/den
    * across bins recovers the classic REL/RES decomposition; per-bin rows
    * keep every denominator exact (no cross-bin common denominator) and
    * make the curve inspectable. One shuffle. */
  def brierDecomposition(df: DataFrame, p100Col: String,
      posCol: String): DataFrame = {
    val agg = df.groupBy(col(p100Col).as("p100"))
      .agg(count(lit(1)).as("n"),
        count(when(col(posCol), lit(1))).as("s"))
    val tot = agg.agg(sum(col("n")).as("_tn"), sum(col("s")).as("_ts"))
    // the squared diffs reach (100·N)² and N⁴-scale denominators — far past
    // long at 10⁹ rows, so every product goes through decimal(38,0) (the
    // repo's exact-arithmetic convention; oracle side uses HUGEINT)
    val relDiff = (col("p100") * col("n") - lit(100) * col("s"))
      .cast("decimal(38,0)")
    val resDiff = (col("s").cast("decimal(38,0)") * col("_tn") -
      col("_ts").cast("decimal(38,0)") * col("n"))
    agg.crossJoin(broadcast(tot))
      .select(col("p100"), col("n"), col("s"),
        (relDiff * relDiff).as("rel_num"),
        (lit(10000L) * col("n")).cast("decimal(38,0)").as("rel_den"),
        (resDiff * resDiff).as("res_num"),
        (col("n").cast("decimal(38,0)") * col("_tn") * col("_tn"))
          .as("res_den"))
  }

  /** Expected calibration error per model group, exactly: rows carry a
    * stated confidence in hundredths and a correctness flag; bucketing by
    * `p100 div 10` (the standard 10-bin ECE), the per-bin gap
    * |acc_b − conf_b| weighted by n_b/N telescopes to ONE exact fraction
    *   ece = Σ_b |100·s_b − P_b| / (100·N)
    * with P_b = Σ p100 in the bin — mean-of-bin confidence, not the bin
    * center, so the score is exact rather than bucketing-biased. Output:
    * n, ece_num, ece_den, and basis points. Two shuffles (bin agg, group
    * agg), both map-side combined. */
  def ece(df: DataFrame, groupCol: String, p100Col: String,
      correctCol: String): DataFrame =
    df.groupBy(col(groupCol),
        expr(s"CAST($p100Col AS BIGINT) div 10").as("_bin"))
      .agg(count(lit(1)).as("_n"),
        count(when(col(correctCol), lit(1))).as("_s"),
        sum(col(p100Col).cast("long")).as("_p"))
      .groupBy(col(groupCol))
      .agg(sum(col("_n")).as("n"),
        sum(abs(lit(100) * col("_s") - col("_p"))).as("ece_num"))
      .select(col(groupCol), col("n"), col("ece_num"),
        (lit(100L) * col("n")).as("ece_den"),
        expr("ece_num * 10000 div (100 * n)").as("ece_bp"))

  /** Pointwise mutual-information cells of a two-way contingency table in
    * floored-log₂ integers: for each (x, y) cell, the joint count, the
    * marginals, and the quantized PMI
    *   pmi_bits = (⌊log₂n_xy⌋ + ⌊log₂N⌋) − (⌊log₂r_x⌋ + ⌊log₂c_y⌋)
    * via the `length(bin(·))` recipe — the log of each FACTOR, not of the
    * product n_xy·N (which reaches N² and overflows long at 10⁹ rows);
    * the decomposed form is within ±1 bit of the product's floor-log and
    * identically computed on any engine, which is what matters for the
    * gate. The cell's MI contribution numerator is n_xy·pmi_bits
    * (denominator N); summing across cells gives quantized MI — the
    * "does this column predict that one" feature-selection screen. Empty
    * cells contribute nothing (lim x·log x = 0). Shuffles: cell agg +
    * two broadcast marginal joins. */
  def mutualInfoBits(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("n_xy"))
    val rx = cells.groupBy(col(xCol)).agg(sum(col("n_xy")).as("r_x"))
    val cy = cells.groupBy(col(yCol)).agg(sum(col("n_xy")).as("c_y"))
    val n = cells.agg(sum(col("n_xy")).as("_n"))
    cells.join(broadcast(rx), xCol).join(broadcast(cy), yCol)
      .crossJoin(broadcast(n))
      .select(col(xCol), col(yCol), col("n_xy"), col("r_x"), col("c_y"),
        col("_n").as("n_total"),
        (length(expr("bin(n_xy)")) + length(expr("bin(_n)")) -
          length(expr("bin(r_x)")) - length(expr("bin(c_y)")))
          .cast("long").as("pmi_bits"))
      .withColumn("mi_num", col("n_xy") * col("pmi_bits"))
  }

  /** Welch's unequal-variance t statistic per group, integer-exact.
    *
    * For arms 1/2 with counts nᵢ, sums sᵢ, sum-of-squares qᵢ (all integral
    * — cents), Welch's t² is the exact rational
    *
    *   t² = (m₁−m₂)² / (v₁/n₁ + v₂/n₂)
    *      = (s₁n₂ − s₂n₁)²·(n₁−1)(n₂−1) / C ,
    *   C  = (n₁q₁ − s₁²)·n₂²(n₂−1) + (n₂q₂ − s₂²)·n₁²(n₁−1) ,
    *
    * emitted as the floored basis-point value `t2_bp = 10⁴·num div C` in
    * decimal(38,0) arithmetic — no float means, no float variances, so the
    * DuckDB twin matches bit-for-bit. `diff_num = s₁n₂ − s₂n₁` carries the
    * direction (its sign is the sign of m₁−m₂). Degenerate groups are
    * explicit, not silent: an arm with < 2 observations drops the group
    * (no variance estimate exists), and C = 0 (both arms constant) yields
    * NULL t2_bp rather than a division blow-up.
    *
    * Magnitude bound (decimal 38): num ≈ (Σ|x|)²·n⁴ must stay below
    * 10³⁴ — with cent values ≤10⁶ that holds for arm sizes up to ~10⁴;
    * shard larger cohorts into subgroups first (t² is shift-invariant, so
    * callers can also center values to shrink Σ|x|). One combiner-friendly
    * groupBy — a single shuffle at any scale. */
  def welchT(df: DataFrame, groupCol: String, armCol: Column,
      valueCol: Column): DataFrame = {
    val d = df.select(col(groupCol), armCol.as("_arm"),
      valueCol.cast("long").as("_v"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = d.groupBy(col(groupCol)).agg(
      count(when(col("_arm") === 1, 1)).as("n1"),
      count(when(col("_arm") === 2, 1)).as("n2"),
      sum(when(col("_arm") === 1, col("_v")).otherwise(0L)).as("s1"),
      sum(when(col("_arm") === 2, col("_v")).otherwise(0L)).as("s2"),
      sum(when(col("_arm") === 1, dec(col("_v")) * dec(col("_v")))
        .otherwise(dec(lit(0)))).as("q1"),
      sum(when(col("_arm") === 2, dec(col("_v")) * dec(col("_v")))
        .otherwise(dec(lit(0)))).as("q2"))
    g.filter(col("n1") >= 2 && col("n2") >= 2)
      .withColumn("diff_num", col("s1") * col("n2") - col("s2") * col("n1"))
      .withColumn("_c",
        (dec(col("n1")) * col("q1") - dec(col("s1")) * dec(col("s1"))) *
          dec(col("n2")) * dec(col("n2")) * dec(col("n2") - 1) +
        (dec(col("n2")) * col("q2") - dec(col("s2")) * dec(col("s2"))) *
          dec(col("n1")) * dec(col("n1")) * dec(col("n1") - 1))
      .withColumn("_num", dec(col("diff_num")) * dec(col("diff_num")) *
        dec(col("n1") - 1) * dec(col("n2") - 1))
      .select(col(groupCol), col("n1"), col("n2"), col("diff_num"),
        when(col("_c") > 0,
          expr("CAST(_num * 10000 div _c AS BIGINT)")).as("t2_bp"))
  }

  /** Brown–Forsythe variance-homogeneity test per series, integer-exact
    * up to a documented quantization.
    *
    * Per series, across its groups: zᵢⱼ = |xᵢⱼ − med(group j)| with the
    * LOWER median (exact integer, engine-deterministic), then the
    * one-way-ANOVA F on z via
    *
    *   ssb_q = Σⱼ ⌊Sⱼ²/nⱼ⌋ − ⌊S²/N⌋  (clamped at 0),
    *   ssw_q = Σⱼ Qⱼ − Σⱼ ⌊Sⱼ²/nⱼ⌋,
    *   f_milli = ⌊1000·(N−k)·ssb_q / ((k−1)·ssw_q)⌋ ,
    *
    * with Sⱼ = Σz, Qⱼ = Σz² per group, all products decimal(38,0). The
    * per-group floors quantize SSB/SSW by < k absolute — harmless at test
    * scale and the price of a bit-exact cross-engine statistic (no float
    * means ever form). The clamp keeps every division's operands
    * non-negative, so Spark's trunc-toward-zero `div` and the oracle's
    * floor agree (q397's negative-division pitfall, routed around the
    * same way). k = 1 series drop (no between-group variance exists);
    * ssw_q = 0 (every group constant) yields NULL f_milli loudly.
    *
    * Why this test: the variance-equality gate run before trusting a
    * pooled-variance readout (q308/q311/q377 feed on the same arms) —
    * median-centered, so heavy tails don't fake a variance difference
    * the way Levene-on-means would. Plan: one window pass for medians
    * (key-partitioned, same key as the join that follows), two
    * combiner-friendly aggregations — two key shuffles total. */
  def brownForsythe(df: DataFrame, seriesCol: String, groupCol: String,
      valueCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), col(groupCol).as("_g"),
      valueCol.cast("long").as("_v"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col("_s"), col("_g")).orderBy(col("_v"))
    val wn = Window.partitionBy(col("_s"), col("_g"))
    val med = d.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wn))
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(col("_s"), col("_g"), col("_v").as("_med"))
    val z = d.join(med, Seq("_s", "_g"))
      .withColumn("_z", abs(col("_v") - col("_med")))
    val g = z.groupBy(col("_s"), col("_g"))
      .agg(count(lit(1)).as("nj"), sum(col("_z")).as("sj"),
        sum(dec(col("_z")) * dec(col("_z"))).as("qj"))
      .withColumn("_t", expr(
        "CAST(CAST(sj AS DECIMAL(38,0)) * sj div nj AS DECIMAL(38,0))"))
    g.groupBy(col("_s"))
      .agg(count(lit(1)).as("n_groups"), sum(col("nj")).as("n_total"),
        sum(col("sj")).as("_s_all"), sum(col("_t")).as("_t_all"),
        sum(col("qj")).as("_q_all"))
      .filter(col("n_groups") >= 2)
      .withColumn("_ssb", greatest(col("_t_all") -
        expr("CAST(_s_all AS DECIMAL(38,0)) * _s_all div n_total"),
        lit(0).cast("decimal(38,0)")))
      .withColumn("_ssw", col("_q_all") - col("_t_all"))
      .select(col("_s").as(seriesCol), col("n_groups"), col("n_total"),
        col("_ssb").cast("long").as("ssb_q"),
        col("_ssw").cast("long").as("ssw_q"),
        when(col("_ssw") > 0, expr(
          """CAST(_ssb * 1000 * (n_total - n_groups)
             div ((n_groups - 1) * _ssw) AS BIGINT)""")).as("f_milli"))
  }

  /** Delete-one-group jackknife for a ratio metric θ = ΣY/ΣN per series
    * — the standard-error machinery for the ratio readouts (revenue per
    * session, tokens per doc) where the naive per-row variance is wrong
    * because both numerator and denominator are random. Groups are the
    * independence units (user buckets, shards); per series:
    *
    *   θ̂_milli     = ⌊10³·S/N⌋
    *   θ̂₍g₎_milli  = ⌊10³·(S−s_g)/(N−n_g)⌋    (leave group g out)
    *   var_jk_q    = ⌊(G−1)·(Σθ̂₍g₎² − ⌊(Σθ̂₍g₎)²/G⌋) / G⌋
    *
    * (the Σ(θ−θ̄)² identity form — no float mean ever forms), all in
    * milli and milli² — the scale is chosen so var_jk_q stays inside
    * BIGINT for cent-sized ratios (ppm² overflows Long at θ ~ 10¹⁰,
    * measured on the events feed) — integer-exact up to the per-term
    * floors
    * (sub-ppm, far below any real sampling noise). Numerator and
    * denominator must be non-negative (cents/counts) so every floored
    * division has non-negative operands and the two engines' division
    * semantics agree. A group that carries
    * the WHOLE denominator (N = n_g) makes θ̂₍g₎ undefined: the series
    * reports NULL variance and a nonzero n_degenerate rather than a
    * fake number. Plan: one (series, group) combiner aggregation, one
    * series-level fold of G-row partials — two shuffles, both tiny. */
  def jackknifeRatio(df: DataFrame, seriesCol: String, groupCol: String,
      numCol: Column, denCol: Column): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = df.select(col(seriesCol).as("_s"), col(groupCol).as("_g"),
        numCol.cast("long").as("_y"), denCol.cast("long").as("_n"))
      .groupBy(col("_s"), col("_g"))
      .agg(sum(col("_y")).as("sg"), sum(col("_n")).as("ng"))
    val tot = g.groupBy(col("_s"))
      .agg(sum(col("sg")).as("s_all"), sum(col("ng")).as("n_all"),
        count(lit(1)).as("g_cnt"))
    val loo = g.join(tot, Seq("_s"))
      .withColumn("theta_g", when(col("n_all") =!= col("ng"), expr(
        """CAST(CAST(s_all - sg AS DECIMAL(38,0)) * 1000
           div (n_all - ng) AS BIGINT)""")))
    loo.groupBy(col("_s"), col("s_all"), col("n_all"), col("g_cnt"))
      .agg(count(when(col("theta_g").isNull, 1)).as("n_degenerate"),
        sum(col("theta_g")).as("_st"),
        sum(dec(col("theta_g")) * dec(col("theta_g"))).as("_qt"))
      .withColumn("theta_milli", expr(
        "CAST(CAST(s_all AS DECIMAL(38,0)) * 1000 div n_all AS BIGINT)"))
      .withColumn("var_jk_q", when(col("n_degenerate") === 0, expr(
        """CAST((g_cnt - 1) * (_qt - CAST(_st AS DECIMAL(38,0)) * _st
           div g_cnt) div g_cnt AS BIGINT)""")))
      .select(col("_s").as(seriesCol), col("g_cnt").as("n_groups"),
        col("n_degenerate"), col("theta_milli"), col("var_jk_q"))
  }

  /** Mann–Kendall trend test per series, integer-exact: over the
    * time-ordered values, S = Σ_{i<j} sign(xⱼ − xᵢ) (positive S = rising
    * trend), with the exact tie-corrected null variance scaled by 18 to
    * stay integral:
    *
    *   var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) ,
    *   trend_milli = sign(S)·⌊1000·18·S² / var18⌋   (≈ 1000·z², signed)
    *
    * — the distribution-free "is this metric drifting" gate that needs
    * no level assumption (complements q157's CUSUM, which needs a
    * baseline, and q165's Theil–Sen, which estimates the slope this
    * test decides is real). Pair generation is a within-series
    * self-join on the time index — O(n²) per series where n is the
    * SERIES LENGTH (calendar-bounded: daily grain ⇒ n stays O(10²-10³)
    * no matter how many raw rows fed the daily aggregate upstream, so
    * the quadratic is in time, not data). All-tied series (var18 = 0)
    * report NULL loudly. */
  def mannKendall(df: DataFrame, seriesCol: String, timeCol: Column,
      valueCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), timeCol.cast("long").as("_t"),
      valueCol.cast("long").as("_v"))
    val s = d.as("a").join(d.as("b"),
        col("a._s") === col("b._s") && col("a._t") < col("b._t"))
      .select(col("a._s").as("_s"),
        signum(col("b._v") - col("a._v")).cast("long").as("_sgn"))
      .groupBy(col("_s")).agg(sum(col("_sgn")).as("s_stat"))
    val base = d.groupBy(col("_s")).agg(count(lit(1)).as("n"))
    val ties = d.groupBy(col("_s"), col("_v"))
      .agg(count(lit(1)).as("_t_sz"))
      .filter(col("_t_sz") > 1)
      .groupBy(col("_s"))
      .agg(sum(col("_t_sz") * (col("_t_sz") - 1) *
        (lit(2) * col("_t_sz") + 5)).as("_tie_mass"))
    base.join(s, Seq("_s"), "left").join(ties, Seq("_s"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18", col("n") * (col("n") - 1) *
        (lit(2) * col("n") + 5) - coalesce(col("_tie_mass"), lit(0L)))
      .select(col("_s").as(seriesCol), col("n"), col("s_stat"),
        col("var18"),
        when(col("var18") > 0, signum(col("s_stat")).cast("long") *
          expr("CAST(18000 * s_stat * s_stat div var18 AS BIGINT)"))
          .as("trend_milli"))
  }

  /** Exact binomial sign test per (family, key) cell — a REAL p-value
    * with zero distributional approximation, computable bit-exactly in
    * both engines: among the cell's trials, ties with the reference are
    * discarded (the standard sign-test convention), m = kept trials,
    * x = trials strictly above the reference, and the one-sided upper
    * tail under H₀: P(X ≥ x | Bin(m, ½)) is the exact rational
    *
    *   p_ppm = ⌊10⁶ · Σ_{j=x}^{m} C(m,j) / 2^m⌋ ,
    *
    * every term an exact Long (factorials stay integral through m = 20 —
    * the `maxN` guard raises loudly past that rather than silently
    * overflow). m = 0 (all ties) gives p_ppm = 10⁶: no evidence, never a
    * fake rejection. The caller caps trials per cell upstream (earliest-k
    * by a deterministic order — see q402); small-m exactness is the
    * point: this is the test that stays honest exactly where the normal
    * approximation lies. One combiner-friendly groupBy. */
  def signTestPpm(df: DataFrame, familyCol: String, keyCol: String,
      valueCol: Column, refCol: Column, maxN: Int = 20): DataFrame = {
    require(maxN >= 1 && maxN <= 20, s"maxN must be in [1,20]: $maxN")
    val d = df.select(col(familyCol).as("family"), col(keyCol).as("key"),
      valueCol.cast("long").as("_v"), refCol.cast("long").as("_ref"))
    d.groupBy(col("family"), col("key"))
      .agg(count(when(col("_v") =!= col("_ref"), 1)).as("_m"),
        count(when(col("_v") > col("_ref"), 1)).as("x"))
      .withColumn("m", when(col("_m") > maxN, expr(
          s"CAST(raise_error('signTestPpm: cell exceeds maxN=$maxN trials') AS BIGINT)"))
        .otherwise(col("_m")))
      .withColumn("p_ppm",
        expr("""CAST(aggregate(sequence(x, m), 0L, (acc, j) ->
                 acc + factorial(CAST(m AS INT))
                   div (factorial(CAST(j AS INT))
                        * factorial(CAST(m - j AS INT))))
               * 1000000L div shiftleft(1L, CAST(m AS INT)) AS BIGINT)"""))
      .select(col("family"), col("key"), col("m"), col("x"), col("p_ppm"))
  }

  /** Benjamini–Hochberg step-up FDR control over ppm-quantized p-values,
    * per family: rank hypotheses by (p asc, key asc), find the largest
    * rank i with pᵢ·m_tests ≤ i·α (all-integer cross-multiply — no
    * division ever happens), and reject every rank ≤ that cutoff —
    * including hypotheses whose own p missed the line (the step-up
    * property naive per-row thresholding gets wrong). The multiple-
    * comparisons gate run over a metrics panel before any single
    * "significant" cell is believed; controls FDR at α under
    * independence / PRDS.
    *
    * Plan: two window passes per family (rank, then the family-wide
    * cutoff max) — the family is the hypothesis panel, thousands of rows
    * at most by construction; data-scale work happened upstream in
    * whatever produced the p-values. */
  def bhFdr(df: DataFrame, familyCol: String, keyCol: String,
      pCol: Column, alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm <= 1000000L, s"alphaPpm: $alphaPpm")
    val d = df.select(col(familyCol).as("family"), col(keyCol).as("key"),
      pCol.cast("long").as("p_ppm"))
    val wr = Window.partitionBy(col("family"))
      .orderBy(col("p_ppm").asc, col("key").asc)
    val wf = Window.partitionBy(col("family"))
    d.withColumn("rank", row_number().over(wr).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wf))
      .withColumn("_ok",
        when(col("p_ppm") * col("m_tests") <= col("rank") * alphaPpm,
          col("rank")))
      .withColumn("_cut", max(col("_ok")).over(wf))
      .select(col("family"), col("key"), col("p_ppm"), col("rank"),
        col("m_tests"),
        (col("rank") <= coalesce(col("_cut"), lit(0L))).as("rejected"))
  }

  /** Copeland aggregation of pairwise preferences — the tournament-style
    * ranking pass a preference-data pipeline (RLHF comparisons, A/B
    * product face-offs) runs before trusting any scalar score: for every
    * unordered item pair, the majority direction across all observed
    * (winner, loser) duels; per item, majority wins/losses/ties and the
    * Copeland score (wins − losses). Majority ties are REPORTED, not
    * silently dropped — a heavily-contested pair is exactly what this
    * audit exists to surface (a Bradley–Terry fit would hide it in a
    * mid-range weight).
    *
    * Plan: raw duel counts are two combiner-friendly aggregations; the
    * majority table is one aggregation on the canonical (least, greatest)
    * pair key; the per-item fold is a union of the two pair sides — item
    * cardinality output, duel-count shuffle, no self-joins (the caller
    * materializes duels; see q383 for the bounded per-group generation
    * shape). */
  def copelandPrefs(prefs: DataFrame, winCol: String,
      loseCol: String): DataFrame = {
    val p = prefs.select(col(winCol).as("_w"), col(loseCol).as("_l"))
    val rawW = p.groupBy(col("_w").as("item"))
      .agg(count(lit(1)).as("raw_wins"))
    val rawL = p.groupBy(col("_l").as("item"))
      .agg(count(lit(1)).as("raw_losses"))
    val pair = p.select(least(col("_w"), col("_l")).as("a"),
        greatest(col("_w"), col("_l")).as("b"),
        when(col("_w") < col("_l"), 1L).otherwise(0L).as("_lo"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("_lo")).as("w_lo"),
        (count(lit(1)) - sum(col("_lo"))).as("w_hi"))
    val sideA = pair.select(col("a").as("item"),
      when(col("w_lo") > col("w_hi"), 1L).otherwise(0L).as("_mw"),
      when(col("w_lo") < col("w_hi"), 1L).otherwise(0L).as("_ml"),
      when(col("w_lo") === col("w_hi"), 1L).otherwise(0L).as("_mt"))
    val sideB = pair.select(col("b").as("item"),
      when(col("w_hi") > col("w_lo"), 1L).otherwise(0L).as("_mw"),
      when(col("w_hi") < col("w_lo"), 1L).otherwise(0L).as("_ml"),
      when(col("w_lo") === col("w_hi"), 1L).otherwise(0L).as("_mt"))
    val maj = sideA.unionByName(sideB).groupBy(col("item"))
      .agg(sum(col("_mw")).as("maj_wins"), sum(col("_ml")).as("maj_losses"),
        sum(col("_mt")).as("maj_ties"))
    rawW.join(rawL, Seq("item"), "full_outer")
      .join(maj, Seq("item"), "full_outer")
      .select(col("item"),
        coalesce(col("raw_wins"), lit(0L)).as("raw_wins"),
        coalesce(col("raw_losses"), lit(0L)).as("raw_losses"),
        coalesce(col("maj_wins"), lit(0L)).as("maj_wins"),
        coalesce(col("maj_losses"), lit(0L)).as("maj_losses"),
        coalesce(col("maj_ties"), lit(0L)).as("maj_ties"))
      .withColumn("copeland", col("maj_wins") - col("maj_losses"))
  }

  /** Offline single change-point detection per group (binary-segmentation
    * step 1): over the group's series in `orderCol` order with integral
    * `valueCol`, pick the split after position k (1 ≤ k < D) maximizing
    * the between-segment sum of squares
    *
    *   G(k) = (S_k·D − T·k)² / (k·(D−k)·D) ,    S_k = prefix sum, T = S_D,
    *
    * quantized as `score_q = 10⁴·(S_k·D − T·k)² div (k·(D−k)·D)` in
    * decimal(38,0) (the cross-product reaches (T·D)², far past long at
    * realistic daily volumes). Argmax is decided ON THE QUANTIZED score
    * with smallest-k tie-break, so the selection itself is cross-engine
    * deterministic — no float comparisons anywhere. Emits the split
    * position, the `orderCol` value at the split, the score, and both
    * segment means (floored ×100).
    *
    * Plan: one key-partitioned running-sum window, one row_number argmax
    * window, both on the group key — two shuffles total, no global sort,
    * no driver iteration; D per group is the series length (days), never
    * raw row counts. */
  def changePoint(df: DataFrame, groupCol: String, orderCol: Column,
      valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_idx"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pre = df.select(col(groupCol), orderCol.as("_idx"),
        valueCol.cast("long").as("_y"))
      .withColumn("_k", row_number().over(w))
      .withColumn("_sk", sum(col("_y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = pre.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_d"), sum(col("_y")).as("_t"))
    val scored = pre.join(tot, Seq(groupCol))
      .filter(col("_k") < col("_d"))
      .withColumn("_num",
        (dec(col("_sk")) * dec(col("_d")) - dec(col("_t")) * dec(col("_k"))))
      .withColumn("score_q", expr(
        """CAST(_num * _num * 10000 div
          |(CAST(_k AS DECIMAL(38,0)) * (_d - _k) * _d) AS BIGINT)"""
          .stripMargin))
    val pick = Window.partitionBy(col(groupCol))
      .orderBy(col("score_q").desc, col("_k").asc)
    scored.withColumn("_rn", row_number().over(pick))
      .filter(col("_rn") === 1)
      .select(col(groupCol), col("_d").as("n_points"),
        col("_k").cast("long").as("split_k"), col("_idx").as("split_idx"),
        col("score_q"),
        expr("_sk * 100 div _k").as("left_mean_x100"),
        expr("(_t - _sk) * 100 div (_d - _k)").as("right_mean_x100"))
  }

  /** Bradley–Terry strength fit over pairwise preference outcomes — the
    * model a preference-data pipeline fits before turning duels (human
    * A-vs-B judgments, within-order brand duels) into scalar rewards.
    * Complements [[copelandPrefs]]: Copeland ranks by majority edges,
    * Bradley–Terry weighs HOW OFTEN and AGAINST WHOM.
    *
    * Runs `iters` minorization–maximization steps from the uniform start,
    * fully quantized so the fit is engine-deterministic:
    * strengths live in ppm of the mean (uniform start = 10⁶), each MM
    * step computes, with every product widened to decimal(38,0) and every
    * division floored,
    *
    *   termQ(i,j) = ⌊n_ij · 10⁹ / (s_i + s_j)⌋     (term × 10³)
    *   raw_i      = ⌊W_i · 10⁹ / Σ_j termQ(i,j)⌋   (unnormalized ppm)
    *   s_i'       = ⌊raw_i · N · 10⁶ / Σ raw⌋      (re-mean to 10⁶)
    *
    * A zero-win item collapses to strength 0 (the true MM fixed point —
    * surfaced, not smoothed; add pseudo-duels upstream if you want
    * regularization). termQ ≥ 1 whenever n_ij ≥ 1 and Σs ≤ 10⁹, i.e. up
    * to ~10³ items post-normalization — beyond that raise the 10⁹ scale.
    *
    * Shape: the duel table folds ONCE to a canonical-pair aggregate
    * (≤ N² rows) and an N-row item base, both localCheckpoint'ed —
    * without the barrier every MM step re-derives them and the raw duel
    * input is re-scanned ~7× (measured 52 s → 2 s on q393's ~1M-duel
    * input at sf0.1). Each MM step is then two broadcast joins of the
    * N-row strength table onto pairs, one combiner groupBy, and a
    * one-row broadcast normalizer — iters · O(pairs) work on the
    * materialized aggregates, no driver loops, no floats. */
  def bradleyTerry(prefs: DataFrame, winCol: String, loseCol: String,
      iters: Int = 2): DataFrame = {
    val (_, base, fitted) = btFit(prefs, winCol, loseCol, iters)
    base.join(fitted, Seq("item"))
      .select(col("item"), col("wins"), col("games"),
        col("s").as("strength_ppm"))
  }

  /** Shared fit core for [[bradleyTerry]] / [[btResiduals]]: the
    * localCheckpointed canonical-pair aggregate (a, b, n_ab, w_a), the
    * per-item wins/games base, and the fitted strengths — so the
    * residual diagnostics never re-derive the (possibly expensive) duel
    * input a second time. */
  private def btFit(prefs: DataFrame, winCol: String, loseCol: String,
      iters: Int): (DataFrame, DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one MM step")
    val d38 = "decimal(38,0)"
    val p = prefs.select(col(winCol).as("_w"), col(loseCol).as("_l"))
    // One pass over the (possibly expensive) duel input: canonical-pair
    // counts with per-side win splits, from which wins/games per item
    // derive without re-scanning prefs. The checkpoint is the iteration
    // barrier — pair/base feed every MM step and the final join.
    val pair = p.select(least(col("_w"), col("_l")).as("a"),
        greatest(col("_w"), col("_l")).as("b"),
        when(col("_w") < col("_l"), 1L).otherwise(0L).as("_aw"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"), sum(col("_aw")).as("w_a"))
      .localCheckpoint()
    val base = pair.select(col("a").as("item"), col("w_a").as("w"),
        col("n_ab"))
      .unionByName(pair.select(col("b").as("item"),
        (col("n_ab") - col("w_a")).as("w"), col("n_ab")))
      .groupBy(col("item"))
      .agg(sum(col("w")).as("wins"), sum(col("n_ab")).as("games"))
      .localCheckpoint()
    val init = base.select(col("item"), lit(1000000L).as("s"))
    val fitted = (1 to iters).foldLeft(init) { (s, _) =>
      val withS = pair
        .join(broadcast(s.select(col("item").as("a"), col("s").as("s_a"))), Seq("a"))
        .join(broadcast(s.select(col("item").as("b"), col("s").as("s_b"))), Seq("b"))
        .withColumn("_tq",
          expr(s"CAST(CAST(n_ab AS $d38) * 1000000000 div (s_a + s_b) AS BIGINT)"))
      val denom = withS.select(col("a").as("item"), col("_tq"))
        .unionByName(withS.select(col("b").as("item"), col("_tq")))
        .groupBy(col("item")).agg(sum(col("_tq")).as("_den"))
      val raw = base.join(denom, Seq("item"), "left")
        .withColumn("_raw", coalesce(
          expr(s"CAST(CAST(wins AS $d38) * 1000000000 div _den AS BIGINT)"),
          lit(0L)))
      val tot = raw.agg(sum(col("_raw")).as("_tot"),
        count(lit(1)).as("_n"))
      raw.crossJoin(broadcast(tot))
        .select(col("item"), expr(
          s"CAST(CAST(_raw AS $d38) * _n * 1000000 div NULLIF(_tot, 0) AS BIGINT)")
          .as("s"))
    }
    (pair, base, fitted)
  }

  /** Per-item Bradley–Terry fit residuals — the diagnostic next to
    * [[bradleyTerry]]: the cycle rate (q484) says the comparisons admit
    * no total order; THIS says where the fitted order breaks. For every
    * canonical pair (a, b) the fitted expectation of a's wins is
    *   e_a = ⌊n_ab · s_a · 10³ div (s_a + s_b)⌋   (milli-wins, floored
    * identically on both engines; e_b by its own floored division so the
    * two sides stay definition-symmetric), and per item the L1 residual
    * Σ |w·10³ − e| accumulates over that item's pairs. resid_bp =
    * resid_milli·10 div games is the mean absolute per-game deviation —
    * an arm whose duels the fit can't explain (cyclic sub-tournament,
    * intransitive raters) reads high while well-ordered arms read near
    * 0. A pair where both strengths floored to 0 yields NULL e (skipped
    * by the sums on both engines). Shape: the duel fold + 2 MM steps
    * from [[bradleyTerry]], one more canonical-pair aggregate, two
    * broadcast strength joins (the item domain is enum-sized by the
    * [[graft.etl.Preference.majorityEdges]] contract), one item
    * aggregate. */
  def btResiduals(prefs: DataFrame, winCol: String, loseCol: String,
      iters: Int = 2): DataFrame = {
    val d38 = "decimal(38,0)"
    // the pair table is bradleyTerry's own localCheckpointed aggregate —
    // reusing it (instead of re-deriving from prefs) drops one full pass
    // over the duel input (a self-join for q513): measured 5.0 -> 4.0 s
    // min at sf0.1
    val (pair, _, fitted) = btFit(prefs, winCol, loseCol, iters)
    val s = fitted.select(col("item"), col("s").as("strength_ppm"))
    val withS = pair
      .join(broadcast(s.select(col("item").as("a"),
        col("strength_ppm").as("s_a"))), Seq("a"))
      .join(broadcast(s.select(col("item").as("b"),
        col("strength_ppm").as("s_b"))), Seq("b"))
      .withColumn("e_a", expr("CASE WHEN s_a + s_b > 0 THEN " +
        s"CAST(CAST(n_ab AS $d38) * s_a * 1000 div (s_a + s_b) " +
        "AS BIGINT) END"))
      .withColumn("e_b", expr("CASE WHEN s_a + s_b > 0 THEN " +
        s"CAST(CAST(n_ab AS $d38) * s_b * 1000 div (s_a + s_b) " +
        "AS BIGINT) END"))
    val sides = withS.select(col("a").as("item"), col("n_ab"),
        col("w_a").as("w"), col("e_a").as("e"))
      .unionByName(withS.select(col("b").as("item"), col("n_ab"),
        (col("n_ab") - col("w_a")).as("w"), col("e_b").as("e")))
    sides.groupBy(col("item"))
      .agg(sum(col("n_ab")).as("games"), sum(col("w")).as("wins"),
        sum(col("e")).as("exp_milli"),
        sum(abs(col("w") * 1000 - col("e"))).as("resid_milli"))
      .withColumn("resid_bp", expr("resid_milli * 10 div games"))
  }

  /** Kruskal–Wallis H per series: the k-sample generalization of
    * [[mannWhitneyU]] — "do the k arms draw from the same distribution?"
    * on ranks, so a single heavy-tailed arm can't dominate the way it
    * does in the pooled-variance F readouts.
    *
    * Integer-exact via the doubled-mid-rank trick (`hr = 2·rank + ties − 1`
    * — same as Mann–Whitney, so tied values contribute whole numbers):
    * with HRg = Σ hr over arm g,
    *   Σ R²/n = Σ HRg²/(4·ng)   →   qg = HRg²·1000 div ng   (milli, floored
    *   identically by both engines), and the tie-corrected readout is
    *   h_milli = (3·Σqg − 3000·N(N+1)²)·(N³−N)
    *               div (N(N+1)·(N³−N−ΣT)),  T = t³−t per tie group.
    * All cross-multiplies in decimal(38,0); per-arm floors are
    * engine-identical (`div` here, `//` in the oracle), so the result is
    * reproducible bit-for-bit. One shuffle on the series key; ranks come
    * from the distinct-value histogram, never a row-grain sort. */
  def kruskalWallis(df: DataFrame, seriesCol: String, groupCol: String,
      valueCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), col(groupCol).as("_g"),
      valueCol.cast("long").as("_v"))
    // doubled mid-ranks per VALUE (same histogram recipe as
    // mannWhitneyU): hr(v) = 2*(#smaller) + ties(v) + 1; per-arm rank
    // sums are then sum(c_g(v) * hr(v)) - the cumsum runs over distinct
    // values, never a row-grain rank partitioned by the series key
    val vtot = d.groupBy(col("_s"), col("_v")).agg(count(lit(1)).as("_t"))
    val wv = Window.partitionBy(col("_s")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val hr = vtot
      .withColumn("_b", coalesce(sum(col("_t")).over(wv), lit(0L)))
      .withColumn("_hr", col("_b") * 2 + col("_t") + 1)
      .select(col("_s"), col("_v"), col("_hr"))
    val arms = d.groupBy(col("_s"), col("_g"), col("_v"))
      .agg(count(lit(1)).as("_cg"))
      .join(hr, Seq("_s", "_v"))
      .groupBy(col("_s"), col("_g"))
      .agg(sum(col("_cg")).as("_n"), sum(col("_cg") * col("_hr")).as("_hrs"))
      .withColumn("_q", expr(
        "CAST(CAST(_hrs AS DECIMAL(38,0)) * _hrs * 1000 div _n " +
          "AS DECIMAL(38,0))"))
    val ties = vtot
      .groupBy(col("_s"))
      .agg(sum(expr("CAST(_t AS DECIMAL(38,0)) * _t * _t - _t")).as("_tsum"))
    arms.groupBy(col("_s"))
      .agg(count(lit(1)).as("n_groups"), sum(col("_n")).as("n_total"),
        sum(col("_q")).as("_qsum"))
      .filter(col("n_groups") >= 2)
      .join(ties, Seq("_s"))
      .withColumn("_nn", col("n_total").cast("decimal(38,0)"))
      .withColumn("_cube", expr("_nn * _nn * _nn - _nn"))
      .filter(col("_cube") > col("_tsum")) // all-tied series: H undefined
      .select(col("_s").as(seriesCol), col("n_groups"), col("n_total"),
        col("_tsum").cast("long").as("tie_t"),
        // greatest(…, 0): per-arm floors can push the numerator a few
        // milli-units below zero where H ≈ 0, and Spark's `div` truncates
        // toward zero while DuckDB's `//` floors — clamping (H is
        // mathematically ≥ 0) keeps both engines identical
        expr("CAST(greatest(3 * _qsum - 3000 * _nn * (_nn + 1) * (_nn + 1), " +
          "CAST(0 AS DECIMAL(38,0))) " +
          "* _cube div (_nn * (_nn + 1) * (_cube - _tsum)) AS BIGINT)")
          .as("h_milli"))
  }

  /** Cochran–Armitage trend test per series: is a binary outcome rate
    * MONOTONICALLY drifting across ordered dose groups (scores 0..k−1)?
    * The gate between "rates differ somewhere" (chi², q130) and "rates
    * drift WITH the ordering" — the question that matters for bucketed
    * exposure ladders (spend tiers, latency buckets, model-size rungs).
    *
    * Exact integer form: with per-group size n_g, positives r_g, totals
    * N, R, and score moments Sx = Σ x·n, Sxx = Σ x²·n, Sr = Σ x·r:
    *   U = N·Sr − R·Sx          (trend numerator; sign = direction)
    *   V = R·(N−R)·(N·Sxx − Sx²)
    *   Z² = N·U²/V  →  z2_milli = 1000·N·U² div V  in decimal(38,0).
    * Single aggregate per series — one shuffle, map-side partial. */
  def cochranArmitage(df: DataFrame, seriesCol: String, scoreCol: Column,
      positiveCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"),
      scoreCol.cast("long").as("_x"),
      when(positiveCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    d.groupBy(col("_s"))
      .agg(count(lit(1)).as("n_total"), sum(col("_y")).as("n_pos"),
        sum(col("_x")).as("_sx"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _y")).as("_sr"))
      .withColumn("_u", expr(
        "CAST(n_total AS DECIMAL(38,0)) * _sr - CAST(n_pos AS DECIMAL(38,0)) * _sx"))
      .withColumn("_v", expr(
        "CAST(n_pos AS DECIMAL(38,0)) * (n_total - n_pos) " +
          "* (CAST(n_total AS DECIMAL(38,0)) * _sxx - _sx * _sx)"))
      .filter(col("_v") > 0)
      .select(col("_s").as(seriesCol), col("n_total"), col("n_pos"),
        signum(col("_u")).cast("int").as("trend_sign"),
        expr("CAST(1000 * CAST(n_total AS DECIMAL(38,0)) * _u * _u div _v " +
          "AS BIGINT)").as("z2_milli"))
  }

  /** Krippendorff's alpha (nominal) per series: chance-corrected
    * agreement for ≥2 raters with missing ratings allowed — the
    * label-quality gate for crowd/model-ensemble annotation that Cohen's
    * kappa (q142, exactly 2 fixed raters) can't cover. Units with a
    * single rating drop out (they carry no pair information), exactly as
    * the coincidence-matrix construction prescribes.
    *
    * Exact integer form: with n_uc ratings of category c on unit u,
    * m_u = Σ_c n_uc (only m_u ≥ 2 kept), n = Σ m_u, n_c category totals:
    *   S  = Σ_u [ 10⁶ · Σ_c n_uc·(m_u − n_uc) div (m_u − 1) ]
    *        (observed-disagreement mass, floored per unit — engine-equal)
    *   E  = Σ_c n_c·(n − n_c)       (expected-disagreement mass)
    * and since D_o = S/(10⁶·n), D_e = E/(n·(n−1)):
    *   alpha_ppm = 10⁶ − (S·(n−1) div E).
    * Two shuffles (unit-grain then series-grain), both combiner-friendly;
    * the per-unit m_u window is (series, unit)-partitioned, never global. */
  def krippendorffAlpha(df: DataFrame, seriesCol: String, unitCol: String,
      categoryCol: Column): DataFrame = {
    val cell = df.select(col(seriesCol).as("_s"), col(unitCol).as("_u"),
        categoryCol.cast("string").as("_c"))
      .groupBy(col("_s"), col("_u"), col("_c"))
      .agg(count(lit(1)).as("_nuc"))
    val wu = Window.partitionBy(col("_s"), col("_u"))
    val units = cell.withColumn("_m", sum(col("_nuc")).over(wu))
      .filter(col("_m") >= 2)
    val so = units.groupBy(col("_s"), col("_u"), col("_m"))
      .agg(sum(expr("CAST(_nuc AS DECIMAL(38,0)) * (_m - _nuc)")).as("_dis"))
      .withColumn("_su", expr(
        "CAST(1000000 * _dis div (_m - 1) AS DECIMAL(38,0))"))
      .groupBy(col("_s"))
      .agg(sum(col("_su")).as("_ss"), sum(col("_m")).as("n_ratings"),
        count(lit(1)).as("n_units"))
    val ws = Window.partitionBy(col("_s"))
    val e = units.groupBy(col("_s"), col("_c"))
      .agg(sum(col("_nuc")).as("_nc"))
      .withColumn("_n", sum(col("_nc")).over(ws))
      .groupBy(col("_s"))
      .agg(sum(expr("CAST(_nc AS DECIMAL(38,0)) * (_n - _nc)")).as("_e"))
    so.join(e, Seq("_s"))
      .filter(col("_e") > 0)
      .select(col("_s").as(seriesCol), col("n_units"), col("n_ratings"),
        expr("CAST(1000000 - _ss * (n_ratings - 1) div _e AS BIGINT)")
          .as("alpha_ppm"))
  }

  /** Simpson-reversal detector per series: does the pooled
    * treatment-vs-control success-rate comparison point the OPPOSITE way
    * from every stratum's own comparison? The confounding tripwire that
    * must fire before any pooled uplift number (q308/q311/q316) is read
    * across a shifted mix — the aggregation-bias twin of q264's mix-shift
    * decomposition.
    *
    * Sign of a rate comparison a/n vs b/m is sign(a·m − b·n): integer
    * cross-multiply, no division anywhere. Emits the pooled sign, the
    * per-stratum sign census (pos/neg/zero), and `reversal` = pooled
    * nonzero AND every nonzero stratum sign opposite to it (the classic
    * full paradox, not mere heterogeneity). Two combiner-friendly
    * aggregates on (series, stratum) then series. */
  def simpsonReversal(df: DataFrame, seriesCol: String, stratumCol: String,
      treatedCol: Column, successCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), col(stratumCol).as("_g"),
      when(treatedCol, lit(1L)).otherwise(lit(0L)).as("_t"),
      when(successCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    val strata = d.groupBy(col("_s"), col("_g"))
      .agg(sum(when(col("_t") === 1, col("_y"))).as("a"),
        sum(when(col("_t") === 1, lit(1L))).as("n1"),
        sum(when(col("_t") === 0, col("_y"))).as("b"),
        sum(when(col("_t") === 0, lit(1L))).as("n0"))
      .filter(col("n1") > 0 && col("n0") > 0)
      .withColumn("_sg", signum(expr(
        "CAST(a AS DECIMAL(38,0)) * n0 - CAST(b AS DECIMAL(38,0)) * n1"))
        .cast("int"))
    val pooled = strata.groupBy(col("_s"))
      .agg(sum(col("a")).as("_a"), sum(col("n1")).as("_n1"),
        sum(col("b")).as("_b"), sum(col("n0")).as("_n0"),
        sum(when(col("_sg") > 0, lit(1L)).otherwise(lit(0L))).as("strata_pos"),
        sum(when(col("_sg") < 0, lit(1L)).otherwise(lit(0L))).as("strata_neg"),
        sum(when(col("_sg") === 0, lit(1L)).otherwise(lit(0L))).as("strata_zero"),
        count(lit(1)).as("n_strata"))
      .withColumn("pooled_sign", signum(expr(
        "CAST(_a AS DECIMAL(38,0)) * _n0 - CAST(_b AS DECIMAL(38,0)) * _n1"))
        .cast("int"))
    pooled.select(col("_s").as(seriesCol), col("n_strata"),
      col("strata_pos"), col("strata_neg"), col("strata_zero"),
      col("pooled_sign"),
      (col("pooled_sign") === 1 && col("strata_pos") === 0 &&
        col("strata_neg") > 0 ||
        col("pooled_sign") === -1 && col("strata_neg") === 0 &&
          col("strata_pos") > 0).as("reversal"))
  }

  /** Subgroup fairness gaps of a binary decision per series: for each
    * protected group, the selection rate, true-positive rate, and
    * false-positive rate in basis points, each with its gap against the
    * series-overall rate — demographic-parity and equalized-odds reads
    * in one table. The audit a curation gate (or any classifier whose
    * output feeds training data) must pass per language/source before
    * its decisions ship: a length-based keep rule that silently selects
    * one language 30 bp harder IS a dataset bias.
    *
    * Integer-exact: every rate is `hits·10⁴ div n` and every gap a
    * difference of two such floored rates; overall rates come from a
    * series-partitioned window over the group aggregates (no second
    * shuffle). TPR/FPR are NULL where the group has no positives /
    * negatives — surfaced, not coalesced to 0, so an all-positive group
    * can't masquerade as fpr_gap = 0. */
  def fairnessGaps(df: DataFrame, seriesCol: String, groupCol: String,
      predCol: Column, labelCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), col(groupCol).as("_g"),
      when(predCol, lit(1L)).otherwise(lit(0L)).as("_p"),
      when(labelCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    val g = d.groupBy(col("_s"), col("_g"))
      .agg(count(lit(1)).as("n"), sum(col("_p")).as("_np"),
        sum(col("_y")).as("_ny"),
        sum(col("_p") * col("_y")).as("_tp"),
        sum(col("_p") * (lit(1L) - col("_y"))).as("_fp"))
    val ws = Window.partitionBy(col("_s"))
    g.withColumn("_tn", sum(col("n")).over(ws))
      .withColumn("_tnp", sum(col("_np")).over(ws))
      .withColumn("_tny", sum(col("_ny")).over(ws))
      .withColumn("_ttp", sum(col("_tp")).over(ws))
      .withColumn("_tfp", sum(col("_fp")).over(ws))
      .select(col("_s").as(seriesCol), col("_g").as(groupCol), col("n"),
        expr("_np * 10000 div n").as("sel_bp"),
        expr("_tp * 10000 div NULLIF(_ny, 0)").as("tpr_bp"),
        expr("_fp * 10000 div NULLIF(n - _ny, 0)").as("fpr_bp"),
        expr("_np * 10000 div n - _tnp * 10000 div _tn").as("sel_gap_bp"),
        expr("_tp * 10000 div NULLIF(_ny, 0) " +
          "- _ttp * 10000 div NULLIF(_tny, 0)").as("tpr_gap_bp"),
        expr("_fp * 10000 div NULLIF(n - _ny, 0) " +
          "- _tfp * 10000 div NULLIF(_tn - _tny, 0)").as("fpr_gap_bp"))
  }

  /** Standardized-mean-difference covariate balance per series: did the
    * randomization actually balance a pre-treatment covariate across the
    * two arms? The gate read BEFORE trusting CUPED (q311) or
    * diff-in-diff (q308) adjustments built on that covariate —
    * |SMD| > 0.1 (smd2_milli > 10) is the standard imbalance flag.
    *
    * Milli-scaled exact pipeline (floors engine-identical):
    *   m_milli  = S·10³ div n                   (per-arm mean)
    *   v_milli  = (Q·10³·n − S²·10³) div (n·(n−1))   (sample variance)
    *   d_milli  = m1 − m0,  vp_milli = (v1+v0) div 2
    *   smd2_milli = d_milli² div (vp_milli·10³)·10³ → d_milli² div
    *   vp_milli, since (d·10⁻³)²/(vp·10⁻³) = d²/(10³·vp).
    * One combiner-friendly aggregate on (series, arm); decimal(38,0)
    * cross-multiplies for the variance numerator. */
  def smdBalance(df: DataFrame, seriesCol: String, treatedCol: Column,
      valueCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"),
      when(treatedCol, lit(1)).otherwise(lit(0)).as("_t"),
      valueCol.cast("long").as("_v"))
    val arms = d.groupBy(col("_s"), col("_t"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_sum"),
        sum(expr("CAST(_v AS DECIMAL(38,0)) * _v")).as("_q"))
      .filter(col("_n") >= 2)
      .withColumn("_m_milli", expr(
        "CAST(CAST(_sum AS DECIMAL(38,0)) * 1000 div _n AS BIGINT)"))
      .withColumn("_v_milli", expr(
        "CAST((_q * 1000 * _n - CAST(_sum AS DECIMAL(38,0)) * _sum * 1000) " +
          "div (CAST(_n AS DECIMAL(38,0)) * (_n - 1)) AS BIGINT)"))
    val t1 = arms.filter(col("_t") === 1).select(col("_s"),
      col("_n").as("n1"), col("_m_milli").as("_m1"), col("_v_milli").as("_v1"))
    val t0 = arms.filter(col("_t") === 0).select(col("_s"),
      col("_n").as("n0"), col("_m_milli").as("_m0"), col("_v_milli").as("_v0"))
    t1.join(t0, Seq("_s"))
      .withColumn("_vp", expr("(_v1 + _v0) div 2"))
      .filter(col("_vp") > 0)
      .select(col("_s").as(seriesCol), col("n1"), col("n0"),
        (col("_m1") - col("_m0")).as("d_milli"),
        expr("CAST(CAST(_m1 - _m0 AS DECIMAL(38,0)) * (_m1 - _m0) " +
          "div _vp AS BIGINT)").as("smd2_milli"))
  }

  /** Matthews correlation per series: the single balanced summary of a
    * binary confusion matrix that stays honest under class imbalance
    * (where accuracy and even F1 — q202 — flatter the majority class).
    * MCC needs a square root, so the exact emission is the SIGNED SQUARE
    * in milli: `mcc_sign = sign(TP·TN − FP·FN)` and
    * `mcc2_milli = (TP·TN − FP·FN)²·1000 div
    * ((TP+FP)(TP+FN)(TN+FP)(TN+FN))` — |MCC| ≥ 0.3 reads as
    * mcc2_milli ≥ 90. NULL (not 0) when any margin is empty: an
    * all-one-class slice has no correlation to report. One
    * combiner-friendly aggregate. */
  def matthewsCorr(df: DataFrame, seriesCol: String, predCol: Column,
      labelCol: Column): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"),
      when(predCol, lit(1L)).otherwise(lit(0L)).as("_p"),
      when(labelCol, lit(1L)).otherwise(lit(0L)).as("_y"))
    d.groupBy(col("_s"))
      .agg(sum(col("_p") * col("_y")).as("tp"),
        sum(col("_p") * (lit(1L) - col("_y"))).as("fp"),
        sum((lit(1L) - col("_p")) * col("_y")).as("fn"),
        sum((lit(1L) - col("_p")) * (lit(1L) - col("_y"))).as("tn"))
      .withColumn("_num", expr(
        "CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn"))
      .withColumn("_den", expr(
        "CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn) * (tn + fp) * (tn + fn)"))
      .select(col("_s").as(seriesCol), col("tp"), col("fp"), col("fn"),
        col("tn"), signum(col("_num")).cast("int").as("mcc_sign"),
        expr("CAST(CASE WHEN _den > 0 THEN _num * _num * 1000 div _den " +
          "END AS BIGINT)").as("mcc2_milli"))
  }

  /** Two-arm sample-size (power) plan per series: the n-per-arm a 5%-MDE
    * two-sided test at α=0.05 / power 0.80 needs, from the series' own
    * observed variance — the "can this experiment even resolve a 5%
    * lift?" table read before any A/B on the metric is launched.
    *
    * n = C·σ²/δ² with C = 2·(z₀.₉₇₅ + z₀.₈)² ≈ 15.697 precomputed as a
    * cross-engine milli literal (same treatment as the NDCG log weights:
    * constants, not libm calls). With C = c_milli/10³, σ² = v_milli/10³
    * and δ² = d_milli²/10⁶ the milli scales cancel exactly:
    *   n_required = c_milli·v_milli div δ_milli².
    * Zero-mean series (δ = 0) are surfaced with NULL, not dropped. */
  def samplePowerPlan(df: DataFrame, seriesCol: String, valueCol: Column,
      mdeMilli: Long = 50L, cMilli: Long = 15697L): DataFrame = {
    val d = df.select(col(seriesCol).as("_s"), valueCol.cast("long").as("_v"))
    d.groupBy(col("_s"))
      .agg(count(lit(1)).as("n_obs"), sum(col("_v")).as("_sum"),
        sum(expr("CAST(_v AS DECIMAL(38,0)) * _v")).as("_q"))
      .filter(col("n_obs") >= 2)
      .withColumn("mean_milli", expr(
        "CAST(CAST(_sum AS DECIMAL(38,0)) * 1000 div n_obs AS BIGINT)"))
      .withColumn("var_milli", expr(
        "CAST((_q * 1000 * n_obs - CAST(_sum AS DECIMAL(38,0)) * _sum * 1000)" +
          " div (CAST(n_obs AS DECIMAL(38,0)) * (n_obs - 1)) " +
          "AS BIGINT)"))
      .withColumn("delta_milli",
        expr(s"abs(mean_milli) * $mdeMilli div 1000"))
      .select(col("_s").as(seriesCol), col("n_obs"), col("mean_milli"),
        col("var_milli"), col("delta_milli"),
        expr(s"CAST(CAST($cMilli AS DECIMAL(38,0)) * var_milli " +
          "div NULLIF(CAST(delta_milli AS DECIMAL(38,0)) * delta_milli, 0) " +
          "AS BIGINT)").as("n_required"))
  }
}
