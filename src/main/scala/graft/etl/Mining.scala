package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical mining operators over grouped data — regression, impurity,
  * ranking quality, set overlap, and clustering assignment. Part of the
  * training-data-pipeline surface beyond the reference (its analytics stop
  * at GROUP BY counts/averages, e.g. visualize-data.ts:102-180).
  *
  * Exactness pattern: every output is an integer count or a pre-scaled
  * integer ratio computed with cross-multiplication instead of division
  * (the repo-wide recipe — see q95 TF-IDF, q118 PMI), so the DuckDB oracle
  * re-derives each row bit-for-bit. Sums that can exceed Long at corpus
  * scale run in decimal(38,0) and only the final quotient narrows back.
  */
object Mining {

  /** Per-group OLS slope as a pre-scaled integer ratio:
    * slope_scaled = (n·Σxy − Σx·Σy) · scale div (n·Σx² − (Σx)²).
    *
    * One combiner-friendly groupBy carries the five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) — the classic single-pass regression shape; no
    * second pass, no centering join. Sums run in decimal(38,0): at 10¹²
    * rows Σxy and n·Σxy overflow Long long before the data is "big".
    * Groups with zero x-variance yield NULL (NULLIF guards the quotient —
    * same on the oracle side). */
  def groupedSlope(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col(xCol).cast(d38)).as("sx"),
        sum(col(yCol).cast(d38)).as("sy"),
        sum((col(xCol).cast(d38) * col(yCol).cast(d38))).as("sxy"),
        sum((col(xCol).cast(d38) * col(xCol).cast(d38))).as("sxx"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        expr(s"CAST(((n * sxy - sx * sy) * $scale) div " +
          "NULLIF(n * sxx - sx * sx, 0) AS BIGINT)").as("slope_scaled"))
  }

  /** Grouped two-feature OLS — y = b0 + b1·x1 + b2·x2 per group — solved
    * EXACTLY by Cramer's rule over the 3×3 normal equations, the
    * multivariate sibling of [[groupedSlope]]: one combiner-friendly pass
    * collects the nine sufficient statistics (n, Σx1, Σx2, Σx1², Σx2²,
    * Σx1x2, Σy, Σx1y, Σx2y), then each coefficient is a ratio of integer
    * determinants, emitted floor-scaled
    * (`det_i·scale div det`; truncation toward zero on both engines).
    * Everything runs in decimal(38,0); the triple-product determinants
    * reach n³·max(x)⁴·max(y), so keep feature magnitudes small (ranks,
    * calendar indices, bounded codes) — the usual preprocessing for
    * exact-arithmetic regression. Singular groups (collinear features,
    * n < 3) yield NULL via the NULLIF'd determinant. */
  def ols2(df: DataFrame, groupCol: String, x1Col: String, x2Col: String,
      yCol: String, scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col(x1Col).cast(d38)).as("s1"),
        sum(col(x2Col).cast(d38)).as("s2"),
        sum(col(x1Col).cast(d38) * col(x1Col)).as("s11"),
        sum(col(x2Col).cast(d38) * col(x2Col)).as("s22"),
        sum(col(x1Col).cast(d38) * col(x2Col)).as("s12"),
        sum(col(yCol).cast(d38)).as("sy"),
        sum(col(x1Col).cast(d38) * col(yCol)).as("s1y"),
        sum(col(x2Col).cast(d38) * col(yCol)).as("s2y"))
      .withColumn("_det", expr(
        "n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)" +
          " + s2 * (s1 * s12 - s11 * s2)"))
      .withColumn("_d0", expr(
        "sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)" +
          " + s2 * (s1y * s12 - s11 * s2y)"))
      .withColumn("_d1", expr(
        "n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)" +
          " + s2 * (s1 * s2y - s1y * s2)"))
      .withColumn("_d2", expr(
        "n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)" +
          " + sy * (s1 * s12 - s11 * s2)"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        expr(s"CAST((_d0 * $scale) div NULLIF(_det, 0) AS BIGINT)")
          .as("b0_scaled"),
        expr(s"CAST((_d1 * $scale) div NULLIF(_det, 0) AS BIGINT)")
          .as("b1_scaled"),
        expr(s"CAST((_d2 * $scale) div NULLIF(_det, 0) AS BIGINT)")
          .as("b2_scaled"))
  }

  /** Per-group Gini impurity of a categorical distribution, scaled:
    * gini_scaled = (N² − Σc²) · scale div N². Two combiner-friendly
    * shuffles — (group, category) counts, then per-group Σc² — with
    * decimal(38,0) squares (c² overflows Long past ~3·10⁹ rows per
    * category). 0 = pure group, → scale·(1−1/k) for uniform k classes. */
  def giniImpurity(df: DataFrame, groupCol: String, catCol: String,
      scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("_cc"))
      .groupBy(col(groupCol))
      .agg(sum(col("_cc")).cast(d38).as("n"),
        sum(col("_cc").cast(d38) * col("_cc").cast(d38)).as("ss"),
        count(lit(1)).as("n_cats"))
      .select(col(groupCol), col("n").cast("long").as("n"), col("n_cats"),
        expr(s"CAST(((n * n - ss) * $scale) div (n * n) AS BIGINT)")
          .as("gini_scaled"))
  }

  /** Per-group reciprocal rank of the first relevant row (the MRR
    * numerator), as scale div rank — exact integers. `rankCols` is the
    * deterministic ranking order (include a tiebreaker); `relevant` marks
    * hit rows. One partitioned window pass + one aggregate: the window
    * ranks inside each group in parallel, nothing global. Groups with no
    * relevant rows report rank NULL and rr_scaled NULL. */
  def firstRelevantRank(df: DataFrame, groupCol: String,
      rankCols: Seq[org.apache.spark.sql.Column], relevant: org.apache.spark.sql.Column,
      scale: Long = 1000000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(rankCols: _*)
    df.withColumn("_rk", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(min(when(relevant, col("_rk"))).cast("long").as("first_rank"),
        sum(when(relevant, lit(1)).otherwise(lit(0))).cast("long")
          .as("n_relevant"))
      .select(col(groupCol), col("first_rank"), col("n_relevant"),
        expr(s"CAST($scale div first_rank AS BIGINT)").as("rr_scaled"))
  }

  /** Exact pairwise Jaccard between per-group element SETS (e.g. the user
    * populations of each event type), in basis points:
    * jaccard_bp = |A∩B| · 10000 div |A∪B|.
    *
    * Shape: distinct (group, elem), then a self-join ON THE ELEMENT KEY —
    * fan-out per element is (groups-per-element choose 2), bounded by the
    * GROUP DOMAIN squared, not the data. Exact and shuffle-bounded for
    * enum-like group domains (event types, languages, sources); for
    * unbounded group domains use the MinHash family in [[Similarity]]
    * instead — that is the documented boundary between the two. */
  def groupSetJaccard(df: DataFrame, groupCol: String,
      elemCol: String): DataFrame = {
    val d = df.select(col(groupCol).as("g"), col(elemCol).as("e"))
      .filter(col("g").isNotNull && col("e").isNotNull).distinct()
    val sizes = d.groupBy(col("g")).agg(count(lit(1)).as("sz"))
    val inter = d.as("a").join(d.as("b"),
        col("a.e") === col("b.e") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("g").as("g_a"), col("sz").as("size_a")), "g_a")
      .join(sizes.select(col("g").as("g_b"), col("sz").as("size_b")), "g_b")
      .select(col("g_a"), col("g_b"), col("inter"),
        (col("size_a") + col("size_b") - col("inter")).as("union_size"),
        expr("CAST(inter * 10000 div (size_a + size_b - inter) AS BIGINT)")
          .as("jaccard_bp"))
  }

  /** Per-token χ² association with a binary document label (the classic
    * feature-selection screen): for each token, the 2×2 contingency table
    * (has-token × label) over DISTINCT (doc, token) pairs, and
    * chi2_scaled = N·(ad−bc)² · scale div ((a+b)(c+d)(a+c)(b+d)).
    *
    * Shuffles: one distinct (doc, token), one per-token count — both
    * combiner-friendly; the two scalar totals (N, L) broadcast. Exactness
    * bound: N·(ad−bc)² ≤ N⁵/16 must fit decimal(38,0) ⇒ exact up to
    * ~5·10⁷ docs per computation; past that, shard by doc-hash and χ²
    * each shard (additivity does not hold exactly, but screening does) —
    * documented rather than silently floated. `minDocs` floors the
    * per-token document frequency so the output is vocabulary-bounded. */
  def chi2TokenLabel(docs: DataFrame, idCol: String, textCol: String,
      label: org.apache.spark.sql.Column, minDocs: Long = 50,
      scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    val docTok = docs
      .select(col(idCol), label.cast("int").as("_lbl"),
        explode(Corpus.tokensOf(col(textCol))).as("token"))
      .distinct()
    val totals = docs.agg(count(lit(1)).cast(d38).as("nn"),
      sum(label.cast("int")).cast(d38).as("ll"))
    val perTok = docTok.groupBy(col("token"))
      .agg(count(lit(1)).cast(d38).as("nt"),
        sum(col("_lbl")).cast(d38).as("a"))
      .filter(col("nt") >= minDocs)
    perTok.join(broadcast(totals))
      .select(col("token"), col("nt").cast("long").as("n_docs"),
        col("a").cast("long").as("n_label_docs"),
        expr(("CAST((nn * (a * (nn - ll - nt + a) - (nt - a) * (ll - a)) " +
          "* (a * (nn - ll - nt + a) - (nt - a) * (ll - a)) * %d) div " +
          "NULLIF(nt * (nn - nt) * ll * (nn - ll), 0) AS BIGINT)")
          .format(scale)).as("chi2_scaled"))
  }

  /** Cohort drift screen: for each group, compare a binary cohort split
    * (e.g. even/odd user id, this-week/last-week) on an integer measure —
    * mean gap and variance ratio, both as scaled integer ratios from
    * single-pass sufficient statistics (n, S, Q per cohort, one shuffle).
    *
    * mean_gap_scaled = |S₁n₂ − S₂n₁| · scale div (n₁n₂)  (shift-exact)
    * var_ratio_scaled = (n₁Q₁−S₁²)·n₂²(n₂−1) · scale div
    *                    ((n₂Q₂−S₂²)·n₁²(n₁−1))  — the F-statistic.
    * Exactness bound: the var-ratio numerator is ~n³Q·scale; decimal(38,0)
    * holds it for cohorts up to ~10⁶ rows at cents-scale values — beyond
    * that, screen on hash-sampled cohorts (documented, not floated).
    * Cohorts with n < 2 or zero variance yield NULL (NULLIF guard). */
  def cohortDrift(df: DataFrame, groupCol: String,
      cohort: org.apache.spark.sql.Column, valueCol: String,
      scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = col(valueCol).cast(d38)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        sum(when(cohort, 1).otherwise(0)).cast(d38).as("n1"),
        sum(when(!cohort, 1).otherwise(0)).cast(d38).as("n2"),
        sum(when(cohort, v).otherwise(lit(0).cast(d38))).as("s1"),
        sum(when(!cohort, v).otherwise(lit(0).cast(d38))).as("s2"),
        sum(when(cohort, v * v).otherwise(lit(0).cast(d38))).as("q1"),
        sum(when(!cohort, v * v).otherwise(lit(0).cast(d38))).as("q2"))
      .select(col(groupCol),
        col("n1").cast("long").as("n_a"), col("n2").cast("long").as("n_b"),
        expr(s"CAST((abs(s1 * n2 - s2 * n1) * $scale) div " +
          "NULLIF(n1 * n2, 0) AS BIGINT)").as("mean_gap_scaled"),
        expr(s"CAST(((n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1) * $scale) div " +
          "NULLIF((n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1), 0) AS BIGINT)")
          .as("var_ratio_scaled"))
  }

  /** Per-group ROC AUC, exact with ties (Mann–Whitney):
    * auc_scaled = (2·won + tied) · scale div (2·n_pos·n_neg), where won =
    * #(pos,neg) pairs with pos score strictly higher and tied = #equal-score
    * pairs. Nothing per-pair is materialized: rows collapse to DISTINCT
    * (group, score) counts first (one combiner-friendly shuffle), a window
    * over the distinct-score table — far smaller than the data — carries
    * the running negative count, and one final groupBy folds the pair
    * counts. The per-row window sort a rank-sum formulation needs never
    * happens; the oracle derives the same rational from midrank sums
    * (2·midrank = 2·rank + tie_count − 1), a genuinely different route to
    * the identical floor. won ≤ n_pos·n_neg ~ n²/4 overflows Long past
    * ~6·10⁹ rows per group, so pair counts run in decimal(38,0). Groups
    * with no positives or no negatives yield NULL (NULLIF guard). */
  def groupAuc(df: DataFrame, groupCol: String, scoreCol: String,
      label: org.apache.spark.sql.Column, scale: Long = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val byScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("_g"), col(scoreCol).as("_s"))
      .agg(sum(when(label, 1).otherwise(0)).cast(d38).as("_p"),
        sum(when(!label, 1).otherwise(0)).cast(d38).as("_q"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("_qb", coalesce(sum(col("_q")).over(w), lit(0).cast(d38)))
      .groupBy(col("_g"))
      .agg(sum(col("_p")).as("np"), sum(col("_q")).as("nq"),
        sum(col("_p") * col("_qb")).as("won"),
        sum(col("_p") * col("_q")).as("tied"))
      .select(col("_g").as(groupCol),
        col("np").cast("long").as("n_pos"), col("nq").cast("long").as("n_neg"),
        expr(s"CAST(((2 * won + tied) * $scale) div " +
          "NULLIF(2 * np * nq, 0) AS BIGINT)").as("auc_scaled"))
  }

  /** Per-group cumulative gains / lift table — the campaign-targeting
    * readout beside [[groupAuc]]'s single number: rank by score
    * descending (idCol tiebreak, fully deterministic), cut into `bins`
    * equal-depth ntiles, and report per bin the cumulative capture of
    * positives (gain) and its ratio to random targeting (lift):
    *   gain_bp = cum_pos · 10⁴ div total_pos
    *   lift_bp = cum_pos · total_n · 10⁴ div (cum_n · total_pos).
    * "Top decile captures 3.4× its share" is this table's first row.
    * Cross-products ride decimal(38,0) (cum_pos·total_n·10⁴ passes a
    * long only to ~10⁷ rows/group); groups with zero positives yield
    * NULL (NULLIF). Shape: one range-partitioned
    * [[Layout.groupedGlobalRank]] over the rows (never a one-task-
    * per-group window sort), a bin-level groupBy (combiner-friendly),
    * then windows over the `bins`-row-per-group table. */
  def liftCurve(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, labelCol: Column, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ntile via groupedGlobalRank + the exact ntile formula - never a
    // row-grain window partitioned by the (possibly enum) group key
    val d2 = df.withColumn("_l", when(labelCol, 1L).otherwise(0L))
    val ranked = Layout.groupedGlobalRank(d2, Seq(groupCol),
      Seq(col(scoreCol).desc, col(idCol)), "_r")
    val ns = broadcast(d2.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_gn")))
    val per = ranked.join(ns, groupCol)
      .withColumn("bin", Layout.ntileFromRank("_r", "_gn", bins).cast("int"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_l")).as("n_pos"))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    per
      .withColumn("cum_n", sum(col("n")).over(wc))
      .withColumn("cum_pos", sum(col("n_pos")).over(wc))
      .withColumn("tot_n", sum(col("n")).over(wAll))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .select(col(groupCol), col("bin"), col("n"), col("n_pos"),
        col("cum_n"), col("cum_pos"),
        expr("CAST(cum_pos * 10000 div NULLIF(tot_pos, 0) AS BIGINT)")
          .as("gain_bp"),
        expr("""CAST(CAST(cum_pos AS DECIMAL(38,0)) * tot_n * 10000
                div NULLIF(CAST(cum_n AS DECIMAL(38,0)) * tot_pos, 0)
                AS BIGINT)""").as("lift_bp"))
  }

  /** Per-group Qini (uplift) curve — [[liftCurve]]'s causal sibling:
    * with units ranked by uplift score and cut into `bins` ntiles, the
    * cumulative incremental positives the TREATED side shows over the
    * control baseline scaled to the treated depth:
    *   qini_milli = cum_pos_t·1000 − ⌊cum_pos_c·cum_n_t·1000 / cum_n_c⌋
    * — the targeting readout when the action has a cost: a model can
    * have great lift (q306) and zero uplift if it merely finds people
    * who convert anyway. The division operand is nonnegative (floor =
    * truncate cross-engine); the subtraction carries the sign exactly.
    * Cross-products ride decimal(38,0); an all-control prefix yields
    * NULL (NULLIF) rather than a fake zero. Same shape as [[liftCurve]]:
    * one range-partitioned grouped rank, one bins-sized cumulative. */
  def qiniCurve(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, treatCol: Column, labelCol: Column,
      bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // same scale-safe ntile spelling as liftCurve
    val d2 = df
      .withColumn("_t", when(treatCol, 1L).otherwise(0L))
      .withColumn("_l", when(labelCol, 1L).otherwise(0L))
    val ranked = Layout.groupedGlobalRank(d2, Seq(groupCol),
      Seq(col(scoreCol).desc, col(idCol)), "_r")
    val ns = broadcast(d2.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_gn")))
    val per = ranked.join(ns, groupCol)
      .withColumn("bin", Layout.ntileFromRank("_r", "_gn", bins).cast("int"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("_t")).as("n_t"), sum(lit(1L) - col("_t")).as("n_c"),
        sum(col("_t") * col("_l")).as("pos_t"),
        sum((lit(1L) - col("_t")) * col("_l")).as("pos_c"))
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum_n_t", sum(col("n_t")).over(wc))
      .withColumn("cum_n_c", sum(col("n_c")).over(wc))
      .withColumn("cum_pos_t", sum(col("pos_t")).over(wc))
      .withColumn("cum_pos_c", sum(col("pos_c")).over(wc))
      .select(col(groupCol), col("bin"), col("n"),
        col("cum_n_t"), col("cum_n_c"), col("cum_pos_t"), col("cum_pos_c"),
        expr("""CAST(cum_pos_t * 1000 -
                CAST(CAST(cum_pos_c AS DECIMAL(38,0)) * cum_n_t * 1000
                  div NULLIF(cum_n_c, 0) AS BIGINT) AS BIGINT)""")
          .as("qini_milli"))
  }

  /** Per-group average precision (area under the precision–recall
    * curve, the rank metric that — unlike [[groupAuc]] — ignores the
    * true-negative ocean, so it is the one to trust under class
    * imbalance): with rows ranked by (score DESC, id), each positive at
    * rank k contributes precision@k = tp_k/k, and
    *   ap_ppm = Σ_pos ⌊tp_k · 10⁶ / k⌋ div n_pos.
    * The per-term floor is applied identically by both engines
    * (operands nonnegative, so Spark's truncating `div` IS the floor),
    * making the quantized sum bit-exact cross-engine. One per-group
    * rank window carries tp_k as a running sum; one groupBy folds the
    * terms. Groups with no positives yield NULL (NULLIF). */
  def averagePrecision(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, labelCol: Column): DataFrame = {
    // rank and running-TP ride ONE two-phase range-bucketed pass
    // (Layout.addRunningSums) along the (score desc, id) total order —
    // a rank window partitioned by an enum group key would sort each
    // whole group in one task (the q268 class; round-9 enum lint)
    val sort = Seq(col(scoreCol).desc, col(idCol))
    val bucketed = Layout.bucketize(
      df.withColumn("_l", when(labelCol, 1L).otherwise(0L))
        .select(col(groupCol), col(scoreCol), col(idCol), col("_l")),
      col(groupCol) +: sort)
    Layout.addRunningSums(bucketed, Seq(groupCol), sort,
        Seq(lit(1L) -> "_k", col("_l") -> "_tp"))
      .withColumn("_term",
        when(col("_l") === 1L, expr("_tp * 1000000 div _k"))
          .otherwise(0L))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("_l")).as("n_pos"),
        sum(col("_term")).as("_s"))
      .select(col(groupCol), col("n"), col("n_pos"),
        expr("CAST(_s div NULLIF(n_pos, 0) AS BIGINT)").as("ap_ppm"))
  }

  /** Per-group Pearson correlation as sign + scaled r², exact:
    * r2_scaled = (nΣxy−ΣxΣy)² · scale div ((nΣxx−(Σx)²)(nΣyy−(Σy)²)),
    * corr_sign = sign(nΣxy−ΣxΣy). r itself needs a square root, which no
    * integer crosses engines; (sign, r²) carries the same information
    * exactly. Same single-pass sufficient-statistics shape as
    * [[groupedSlope]] — one combiner-friendly shuffle, six accumulators.
    * Exactness bound: the squared covariance numerator must fit
    * decimal(38,0) ⇒ |nΣxy−ΣxΣy| < ~3·10¹⁶ at scale 10⁴ — holds for
    * day-index × cents data to ~10⁸ rows per group; past that, center x/y
    * first (shift-invariance makes that exactness-preserving). Zero
    * variance on either axis yields NULL (NULLIF guard). */
  def groupedCorr(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast(d38).as("n"),
        sum(col(xCol).cast(d38)).as("sx"),
        sum(col(yCol).cast(d38)).as("sy"),
        sum(col(xCol).cast(d38) * col(yCol).cast(d38)).as("sxy"),
        sum(col(xCol).cast(d38) * col(xCol).cast(d38)).as("sxx"),
        sum(col(yCol).cast(d38) * col(yCol).cast(d38)).as("syy"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        expr("CAST(sign(n * sxy - sx * sy) AS BIGINT)").as("corr_sign"),
        expr(s"CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * $scale) " +
          "div NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0) " +
          "AS BIGINT)").as("r2_scaled"))
  }

  /** Per-group floored-entropy diversity of a categorical distribution,
    * in hundredths of a bit: ent = Σ_k c_k·(⌊log₂N⌋−⌊log₂c_k⌋) · scale
    * div N. The logs are binary-digit counts (`length(bin(x))`, the
    * [[Vocab.unigramSurprisal]] recipe), so both engines compute the
    * identical integer — no float log anywhere. Each term's digit-count
    * difference brackets log₂(N/c) within ±1 bit, so the result is within
    * one bit of true Shannon entropy and exactly 0 for a pure group — the
    * corpus-diversity screen (is one source dominating a language?),
    * where the ranking matters and a bit of bias does not. Two combiner-friendly
    * shuffles + one category-cardinality window; Σ c·bits ≤ 64·N fits
    * Long to ~10¹⁷ rows per group. */
  def flooredEntropy(df: DataFrame, groupCol: String, catCol: String,
      scale: Long = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = df.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol))
    cc.withColumn("_n", sum(col("_c")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"), count(lit(1)).as("n_cats"),
        sum(col("_c") *
          (length(expr("bin(_n)")) - length(expr("bin(_c)")))).as("_eb"))
      .select(col(groupCol), col("n").cast("long").as("n"), col("n_cats"),
        expr(s"CAST(_eb * $scale div n AS BIGINT)").as("ent_bits_x100"))
  }

  /** Market-basket pair counts with exact integer lift:
    * lift_scaled = N·c_xy · scale div (c_x·c_y) over DISTINCT
    * (basket, item) pairs. The self-join is ON THE BASKET KEY, so fan-out
    * per basket is C(size, 2) — bounded by basket size squared, never by
    * the item domain; `maxBasket` drops pathological baskets (a carted
    * crawler, a catalog-sized order) BEFORE the join, making the bound a
    * constructed property rather than a hope. One scalar basket count
    * broadcasts; N·c_xy·scale runs in decimal(38,0) (~10¹⁸·10⁴ overflows
    * Long at corpus scale). */
  def basketPairLift(df: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 64, scale: Long = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val d0 = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it"))
      .filter(col("_bk").isNotNull && col("_it").isNotNull).distinct()
    // four consumers (scalar count, item marginals, both self-join sides):
    // materialize once instead of recomputing the distinct+window subtree
    // per consumer — the repo-wide localCheckpoint pattern for self-joins
    val d = d0.withColumn("_bs",
        count(lit(1)).over(Window.partitionBy(col("_bk"))))
      .filter(col("_bs") <= maxBasket).drop("_bs").localCheckpoint()
    val nb = d.agg(countDistinct(col("_bk")).cast(d38).as("n_baskets"))
    val ix = d.groupBy(col("_it")).agg(count(lit(1)).as("_cx"))
    d.as("a").join(d.as("b"),
        col("a._bk") === col("b._bk") && col("a._it") < col("b._it"))
      .groupBy(col("a._it").as("item_a"), col("b._it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(ix.select(col("_it").as("item_a"), col("_cx").as("n_a")),
        "item_a")
      .join(ix.select(col("_it").as("item_b"), col("_cx").as("n_b")),
        "item_b")
      .join(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets").cast("long").as("n_baskets"),
        expr(s"CAST((n_baskets * n_ab * $scale) div " +
          s"(CAST(n_a AS $d38) * n_b) AS BIGINT)").as("lift_scaled"))
  }

  /** Per-group Cohen's kappa between two categorical labelings (the
    * annotator-agreement gate of a labeling pipeline), exact:
    * kappa_scaled = (N·agree − Σ_k r_k·c_k) · scale div (N² − Σ_k r_k·c_k)
    * — the (p_o − p_e)/(1 − p_e) rational cross-multiplied by N².
    *
    * Three combiner-friendly shuffles (per-group totals, per-(group,label)
    * marginals for each rater) and a marginal join on the LABEL key, so
    * cost is bounded by group·label-domain cardinality, not pairs.
    * Products run in decimal(38,0) (r_k·c_k ~ N² overflows Long past
    * ~3·10⁹ rows per group). Negative kappa truncates toward zero on both
    * engines; a degenerate group (both raters constant, same label) has
    * p_e = 1 and yields NULL. */
  def cohenKappa(df: DataFrame, groupCol: String, aCol: String,
      bCol: String, scale: Long = 10000): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(groupCol).as("_g"), col(aCol).as("_a"), col(bCol).as("_b"))
    val totals = base.groupBy(col("_g"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(when(col("_a") === col("_b"), 1).otherwise(0)).cast(d38)
          .as("agree"))
    val ra = base.groupBy(col("_g"), col("_a").as("_k"))
      .agg(count(lit(1)).cast(d38).as("_r"))
    val cb = base.groupBy(col("_g"), col("_b").as("_k"))
      .agg(count(lit(1)).cast(d38).as("_c"))
    val pe = ra.join(cb, Seq("_g", "_k"))
      .groupBy(col("_g")).agg(sum(col("_r") * col("_c")).as("rc"))
    totals.join(pe, Seq("_g"), "left")
      .select(col("_g").as(groupCol), col("n").cast("long").as("n"),
        col("agree").cast("long").as("n_agree"),
        expr(s"CAST(((n * agree - coalesce(rc, 0)) * $scale) div " +
          "NULLIF(n * n - coalesce(rc, 0), 0) AS BIGINT)")
          .as("kappa_scaled"))
  }

  /** K-means assignment step on quantized embeddings ([[Similarity.quantize]]
    * — integer distances are exact and engine-order-independent).
    * Deterministic seeding: the k lowest-id vectors are the centroids (the
    * reproducible-pipeline convention; k-means++ would randomize the
    * oracle away). Each vector joins the BROADCAST k-row centroid table
    * (bounded by the k parameter — same family as the 16-row IVF centroid
    * fetch), squared distance is an integer fold, and argmin is
    * min(struct(dist², centroid)) inside one combiner-friendly groupBy —
    * no per-vector window sort. The centroid-update half of Lloyd's loop
    * is the trivial groupBy(cluster) mean; assignment is the scale-bearing
    * part. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = emb.select(col(idCol).as("vid"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val cents = q.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"), col("qv").as("cv"))
    q.crossJoin(broadcast(cents))
      .withColumn("dist2",
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v))
      .groupBy(col("vid"))
      .agg(min(struct(col("dist2"), col("cid"))).as("m"))
      .select(col("vid").as(idCol), col("m.cid").as("cluster"),
        col("m.dist2").as("dist2"))
  }

  /** Cost-optimal decision threshold: given integer costs per false
    * positive and false negative, the score cutoff (predict positive
    * when score > t) minimizing total cost per group — the DECISION
    * step after AUC (q140) / calibration (q141) / confusion (q202)
    * describe how the scores behave. Candidates are the distinct scores
    * plus the all-positive corner (t = min−1); rows collapse to
    * (group, score) BEFORE the one ordered window (bounded by distinct
    * scores, not rows); cost is exact integer; argmin is a min(struct)
    * fold with ties to the smaller threshold. */
  def bestThreshold(df: DataFrame, groupCol: String, scoreCol: String,
      labelCol: Column, costFp: Long, costFn: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = df.select(col(groupCol), col(scoreCol).as("_s"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .groupBy(col(groupCol), col("_s"))
      .agg(count(lit(1)).as("_c"), sum(col("_y")).as("_p"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = cell
      .withColumn("cp", sum(col("_p")).over(w))
      .withColumn("cn", sum(col("_c") - col("_p")).over(w))
      .withColumn("tp", sum(col("_p")).over(wAll))
      .withColumn("tn", sum(col("_c") - col("_p")).over(wAll))
    val cand = cum.select(col(groupCol), col("_s").as("thr"),
      col("cp").as("fn_at"), (col("tn") - col("cn")).as("fp_at"),
      col("tp"), col("tn"))
    val allPos = cum.groupBy(col(groupCol))
      .agg((min(col("_s")) - 1).as("thr"), lit(0L).as("fn_at"),
        max(col("tn")).as("fp_at"), max(col("tp")).as("tp"),
        max(col("tn")).as("tn"))
    cand.unionByName(allPos)
      .withColumn("cost",
        lit(costFn) * col("fn_at") + lit(costFp) * col("fp_at"))
      .groupBy(col(groupCol))
      .agg(min(struct(col("cost"), col("thr"), col("fn_at"),
          col("fp_at"))).as("_b"),
        max(col("tp")).as("n_pos"), max(col("tn")).as("n_neg"))
      .select(col(groupCol),
        col("_b").getField("thr").as("threshold"),
        col("_b").getField("cost").as("cost"),
        col("_b").getField("fn_at").as("fn_at"),
        col("_b").getField("fp_at").as("fp_at"),
        col("n_pos"), col("n_neg"))
  }

  /** Multinomial Naive Bayes text classifier, trained AND applied in one
    * declarative plan, reported as the resubstitution confusion matrix —
    * the vocabulary-driven classifier (language ID, source routing,
    * topic gating) expressed with the repo's floored-log₂ quantization:
    *   score(d, y) = Σ_tok cnt_d·bl(c_{y,tok}+1) − len_d·bl(T_y + V)
    * (Laplace-smoothed log P(tok|y) decomposed per factor; bl = bit
    * length, the same recipe as KL/PSI/MI). Zero-count (token, class)
    * cells come from a dense vocab×classes grid so absent evidence
    * penalizes correctly. argmax per doc via a rank window ordered
    * (score DESC, class ASC) — deterministic ties cross-engine.
    * Zero-token documents carry no evidence to score, but they are NOT
    * dropped: they surface as `pred_lang = '(empty)'` rows so the
    * confusion-matrix total always reconciles with the input doc count.
    *
    * Scale shape: the fan-out is doc-token rows × |classes| (classes are
    * enum-sized); the vocab×classes grid is vocabulary-bounded; no
    * driver-side collection anywhere — V and T_y ride one-row/per-class
    * aggregates through broadcast joins. */
  def nbTextConfusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("_id"), col(labelCol).as("_y"),
      explode(Corpus.tokensOf(col(textCol))).as("tok"))
    val dt = toks.groupBy(col("_id"), col("_y"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val langTok = toks.groupBy(col("_y").as("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val v = toks.agg(countDistinct(col("tok")).as("_V"))
    val kPerLang = langTok.groupBy(col("lang")).agg(sum(col("c")).as("_T"))
      .crossJoin(broadcast(v))
      .select(col("lang"),
        length(expr("bin(_T + _V)")).cast("long").as("k"))
    val dense = dt.select(col("tok")).distinct()
      .crossJoin(broadcast(langTok.select(col("lang")).distinct()))
      .join(langTok, Seq("lang", "tok"), "left")
      .select(col("tok"), col("lang"),
        length(expr("bin(coalesce(c, 0L) + 1)")).cast("long").as("lp"))
    val docLen = dt.groupBy(col("_id")).agg(sum(col("cnt")).as("len"))
    val scores = dt.join(dense, Seq("tok"))
      .groupBy(col("_id"), col("_y"), col("lang"))
      .agg(sum(col("cnt") * col("lp")).as("pos"))
      .join(docLen, Seq("_id"))
      .join(broadcast(kPerLang), Seq("lang"))
      .withColumn("score", col("pos") - col("len") * col("k"))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("score").desc, col("lang"))
    val classified = scores
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("_y").as("true_lang"), col("lang").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
    // Zero-token docs never reach dt; anti-join them back in so the
    // matrix total equals the input doc count (no silent undercount).
    val unscored = docs
      .select(col(idCol).as("_id"), col(labelCol).as("_y"))
      .join(dt.select(col("_id")).distinct(), Seq("_id"), "left_anti")
      .groupBy(col("_y").as("true_lang"))
      .agg(count(lit(1)).as("n"))
      .select(col("true_lang"), lit("(empty)").as("pred_lang"), col("n"))
    classified.unionByName(unscored)
  }

  /** Multiclass precision/recall/F1 from a confusion-matrix table
    * (true, pred, n) — the per-class one-vs-rest readout plus the two
    * standard summaries, all exact integer basis points:
    *   prec = tp/col_total, rec = tp/row_total,
    *   f1 = 2·tp/(row_total + col_total)   (the harmonic mean computed
    * from raw counts in ONE floor — never by chaining already-floored
    * prec/rec), `(macro)` = the floored mean of per-class f1 (absent
    * classes count 0 — the honest macro), `(micro)` = Σtp/N, which for
    * single-label multiclass IS accuracy. Classes are the union of
    * true and pred labels, so a label that is only ever predicted (or
    * only ever true) still gets its zero row instead of vanishing.
    * Confusion tables are enum-sized — every join here is broadcast
    * class-list work, nothing row-scaled. */
  def multiclassF1(conf: DataFrame, trueCol: String, predCol: String,
      nCol: String): DataFrame = {
    val classes = conf.select(col(trueCol).as("cls"))
      .unionByName(conf.select(col(predCol).as("cls"))).distinct()
    val tp = conf.filter(col(trueCol) === col(predCol))
      .select(col(trueCol).as("cls"), col(nCol).as("tp"))
    val rowTot = conf.groupBy(col(trueCol).as("cls"))
      .agg(sum(col(nCol)).as("n_true"))
    val colTot = conf.groupBy(col(predCol).as("cls"))
      .agg(sum(col(nCol)).as("n_pred"))
    val per = classes
      .join(tp, Seq("cls"), "left")
      .join(rowTot, Seq("cls"), "left")
      .join(colTot, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("prec_bp",
        expr("CAST(tp * 10000 div NULLIF(n_pred, 0) AS BIGINT)"))
      .withColumn("rec_bp",
        expr("CAST(tp * 10000 div NULLIF(n_true, 0) AS BIGINT)"))
      .withColumn("f1_bp",
        expr("CAST(2 * tp * 10000 div NULLIF(n_true + n_pred, 0) AS BIGINT)"))
    val summary = per.agg(
      sum(col("tp")).as("tp"), sum(col("n_true")).as("n_true"),
      sum(col("n_pred")).as("n_pred"),
      expr("CAST(sum(coalesce(f1_bp, 0)) div count(1) AS BIGINT)")
        .as("macro_f1"),
      expr("""CAST(sum(tp) * 10000 div NULLIF(sum(n_true), 0) AS BIGINT)""")
        .as("micro_f1"))
    val macroRow = summary.select(lit("(macro)").as("cls"), col("tp"),
      col("n_true"), col("n_pred"), lit(null).cast("long").as("prec_bp"),
      lit(null).cast("long").as("rec_bp"), col("macro_f1").as("f1_bp"))
    val microRow = summary.select(lit("(micro)").as("cls"), col("tp"),
      col("n_true"), col("n_pred"), lit(null).cast("long").as("prec_bp"),
      lit(null).cast("long").as("rec_bp"), col("micro_f1").as("f1_bp"))
    per.unionByName(macroRow).unionByName(microRow)
  }

  /** Off-policy evaluation of a deterministic target policy over logged
    * bandit feedback — inverse-propensity scoring, the estimator behind
    * every "would the new ranker have done better on last week's logs"
    * question answered WITHOUT an online test:
    *   V̂_IPS   = Σ 1[π(x)=a]·r·w / n
    *   V̂_SNIPS = Σ 1[π(x)=a]·r·w / Σ 1[π(x)=a]·w  (self-normalized —
    * kills the variance of rare-action upweighting at the cost of a
    * small bias). The caller supplies the EXACT integer importance
    * weight w = 1/p (loggers that randomize with power-of-two
    * propensities make w integral by construction), so both estimators
    * are exact integer fractions and the floored milli-ratios agree
    * cross-engine. One map-side-combined aggregation. */
  def ipsEval(df: DataFrame, groupCol: String, matchCol: Column,
      rewardCol: Column, weightCol: Column): DataFrame =
    df.select(col(groupCol), when(matchCol, 1L).otherwise(0L).as("_m"),
        rewardCol.cast("long").as("_r"), weightCol.cast("long").as("_w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("_m")).as("n_matched"),
        sum(col("_m") * col("_r") * col("_w")).as("ips_num"),
        sum(col("_m") * col("_w")).as("snips_den"))
      .select(col(groupCol), col("n"), col("n_matched"), col("ips_num"),
        col("snips_den"),
        expr("ips_num * 1000 div n").as("ips_milli"),
        expr("ips_num * 1000 div NULLIF(snips_den, 0)").as("snips_milli"))

  /** Cluster-quality report over a [[kmeansAssign]] partitioning — the
    * go/no-go check before trusting a clustering for SemDeDup pruning or
    * IVF bucketing: per cluster the member count, exact integer
    * within-cluster dispersion (Σ dist² to own centroid, floored mean),
    * the squared distance to the NEAREST other centroid, and their ratio
    *   sep_x100 = ⌊100·inter_min / intra_mean⌋
    * (a Dunn-style separation index — higher is tighter/farther; ≤ 100
    * means the nearest foreign centroid sits inside the cluster's own
    * mean spread, so pruning there will merge real neighborhoods).
    * Everything is exact integer on quantized vectors; the
    * centroid-pair pass is k² rows on a broadcast k-row table, and the
    * member pass reuses the single assignment shuffle. */
  def clusterQuality(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = emb.select(col(idCol).as("vid"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val cents = q.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"), col("qv").as("cv"))
    val intra = kmeansAssign(emb, idCol, vecCol, k)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("intra_sum"))
    val inter = cents
      .crossJoin(broadcast(cents.select(col("cid").as("cid2"),
        col("cv").as("cv2"))))
      .filter(col("cid") =!= col("cid2"))
      .withColumn("d2", aggregate(
        zip_with(col("cv"), col("cv2"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v))
      .groupBy(col("cid").as("cluster"))
      .agg(min(col("d2")).as("inter_min"))
    intra.join(inter, "cluster")
      .select(col("cluster"), col("n"), col("intra_sum"),
        expr("intra_sum div n").as("intra_mean"), col("inter_min"),
        expr("CAST(100 * inter_min div NULLIF(intra_sum div n, 0) " +
          "AS BIGINT)").as("sep_x100"))
  }

  /** Semantic-dedup representative selection (the SemDeDup keep-one step
    * downstream of [[kmeansAssign]]): per cluster, keep the member closest
    * to the centroid (lowest exact integer dist2, id-tiebroken) as the
    * canonical document and count how many members it stands for. The
    * keep-list IS the deduplicated corpus; n_members − 1 is the pruned
    * mass. One cluster-key shuffle over the assignment output — the
    * min(struct) argmin does the selection map-side, so no per-cluster
    * member list ever materializes. */
  def semdedupReps(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    kmeansAssign(emb, idCol, vecCol, k)
      .groupBy(col("cluster"))
      .agg(min(struct(col("dist2"), col(idCol))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("m").getField(idCol).as("rep_id"),
        col("m.dist2").as("rep_dist2"), col("n_members"))
  }

  /** Deterministic negative sampling for contrastive training: for each
    * user, k pseudo-random candidate items from a Knuth multiplicative
    * hash of (user, i), minus the user's actual interactions (anti-join).
    * Pure integer arithmetic — both engines compute the identical
    * candidate stream, no RNG state — so resampling is reproducible and
    * shardable. Cost: a k-way row explode on the (small) user side + one
    * distinct on interactions + one equi-anti-join; no item-table scan at
    * all. Items are assumed dense in [1, nItems] (the id-encode step
    * [[Vocab.encode]] produces exactly that). Output: user, sample_idx,
    * item (as `itemCol`). */
  def negativeSample(users: DataFrame, interactions: DataFrame,
      userCol: String, itemCol: String, k: Int, nItems: Long): DataFrame = {
    require(k > 0 && nItems > 0, "k and nItems must be positive")
    // the user id is folded to 31 bits BEFORE the Knuth multiply: the
    // raw product overflows a long (ANSI failure) once ids pass ~3.4e9,
    // which the 10× scale sweep hit; (2³¹−1)·2654435761 ≈ 5.7e18 stays
    // exact, and ids below 2³¹ (every realistic id space, and every
    // oracle fixture) hash identically to the unfolded form
    val cand = users.select(col(userCol))
      .withColumn("sample_idx",
        explode(sequence(lit(0L), lit(k - 1L))))
      .withColumn(itemCol,
        ((col(userCol) % 2147483648L) * 2654435761L
          + col("sample_idx") * 40503L)
          % nItems + 1L)
    cand.join(interactions.select(col(userCol), col(itemCol)).distinct(),
        Seq(userCol, itemCol), "left_anti")
      .select(col(userCol), col("sample_idx"), col(itemCol))
  }

  /** Precision@k / recall@k per group — the set-retrieval half of the
    * ranking-eval family (MRR: first hit; NDCG: graded order; this: how
    * much of the top-k is relevant and how much of the relevant set the
    * top-k captures). k_eff = min(k, group size) keeps small groups
    * honest; groups with zero relevant rows report recall NULL.
    * One partitioned rank window + one fold, exact integers. */
  def precisionRecallAtK(df: DataFrame, groupCol: String,
      rankCols: Seq[Column], relevant: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(rankCols: _*)
    df.withColumn("_rk", row_number().over(w))
      .withColumn("_rel", when(relevant, 1L).otherwise(0L))
      .groupBy(col(groupCol))
      .agg(least(count(lit(1)), lit(k.toLong)).as("k_eff"),
        sum(when(col("_rk") <= k, col("_rel")).otherwise(0L))
          .cast("long").as("rel_in_topk"),
        sum(col("_rel")).cast("long").as("n_relevant"))
      .select(col(groupCol), col("k_eff"), col("rel_in_topk"),
        col("n_relevant"),
        expr("rel_in_topk * 10000L div k_eff").as("precision_bp"),
        expr("rel_in_topk * 10000L div NULLIF(n_relevant, 0)")
          .as("recall_bp"))
  }

  /** Binary-classifier confusion counts + precision/recall/F1 per group,
    * all in basis points with single integer divisions (F1's algebraic
    * form 2tp·10⁴ div (2tp+fp+fn) avoids dividing twice — exact, no
    * float). One combiner-friendly shuffle: the four cells are
    * conditional sums, not joins. Degenerate groups (no predicted
    * positives / no actual positives) report NULL for the undefined
    * ratio rather than a fake 0. */
  def confusionStats(df: DataFrame, groupCol: String, pred: Column,
      truth: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        sum(when(pred && truth, 1L).otherwise(0L)).cast("long").as("tp"),
        sum(when(pred && !truth, 1L).otherwise(0L)).cast("long").as("fp"),
        sum(when(!pred && truth, 1L).otherwise(0L)).cast("long").as("fn"),
        sum(when(!pred && !truth, 1L).otherwise(0L)).cast("long").as("tn"))
      .select(col(groupCol), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp * 10000L div NULLIF(tp + fp, 0)").as("precision_bp"),
        expr("tp * 10000L div NULLIF(tp + fn, 0)").as("recall_bp"),
        expr("2 * tp * 10000L div NULLIF(2 * tp + fp + fn, 0)")
          .as("f1_bp"))

  /** NDCG@k per group with an integer discount table — the graded-ranking
    * quality metric beside MRR (first hit only) and AUC (binary order
    * only): DCG = Σ gain(relᵢ)·wᵢ over the top-k by score, IDCG the same
    * sum over the ideal (relevance-sorted) prefix, reported as
    * ndcg_bp = DCG·10⁴ div IDCG.
    *
    * `weights` IS the discount: callers pass the pre-scaled integer table
    * (canonically round(scale/log₂(i+1))) and the same literals go in any
    * oracle — keeping irrational log₂ out of the cross-engine contract,
    * the same fixed-point trick as the BM25 idf table. Gains are the
    * standard 2^rel − 1, exact for integer rel.
    *
    * Cost: two row_number windows per group (score order, ideal order)
    * and one fold — the q68 rank-family shape. For huge groups the
    * bounded-buffer alternative is the [[graft.functions.TopKRowsAgg]]
    * top-k aggregator; the window form keeps the whole-group plan
    * AQE-coalescible and is exact for any k. */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreOrder: Seq[Column],
      idealOrder: Seq[Column], relCol: Column, k: Int,
      weights: Seq[Long], scale: Long = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.length >= k, "need one weight per rank 1..k")
    val g = Window.partitionBy(col(groupCol))
    val wLit = array(weights.map(lit): _*)
    val ranked = df
      .withColumn("_gain",
        (call_function("shiftleft", lit(1L), relCol.cast("int")) - 1L)
          .cast("long"))
      .withColumn("_rs", row_number().over(g.orderBy(scoreOrder: _*)))
      .withColumn("_ri", row_number().over(g.orderBy(idealOrder: _*)))
    ranked
      .groupBy(col(groupCol))
      .agg(
        sum(when(col("_rs") <= k,
          element_at(wLit, col("_rs")) * col("_gain")).otherwise(0L))
          .cast("long").as("dcg_scaled"),
        sum(when(col("_ri") <= k,
          element_at(wLit, col("_ri")) * col("_gain")).otherwise(0L))
          .cast("long").as("idcg_scaled"))
      .select(col(groupCol), col("dcg_scaled"), col("idcg_scaled"),
        expr(s"dcg_scaled * $scale div NULLIF(idcg_scaled, 0)")
          .as("ndcg_bp"))
  }

  /** Best binary split of one integer feature against a boolean label per
    * group — the decision-stump / split-finder primitive behind tree
    * induction and feature triage. Among candidate thresholds t (the
    * feature's distinct values whose left side `v ≤ t` leaves the right
    * child nonempty), minimize the weighted Gini impurity
    *   G(t) = t_l·G_l + t_r·G_r,   G_c = 1 − (p_c² + n_c²)/t_c²
    * which over the common denominator (dropping the constant total N) is
    * the exact integer fraction
    *   num(t) = (t_l² − p_l² − n_l²)·t_r + (t_r² − p_r² − n_r²)·t_l
    *   den(t) = t_l·t_r·N.
    * Rows collapse to one per (group, value) FIRST, so the ordered window
    * is bounded by distinct-value count, not row count; cumulative class
    * counts ride that one window; the argmin is a min(struct) fold with
    * score_ppm = ⌊10⁶·num/den⌋ in decimal(38,0) (products reach N³),
    * ties broken by the smaller threshold. num ≥ 0 always (each child's
    * Gini is nonnegative), so floored division agrees across engines.
    *
    * Output per group: `threshold`, `score_ppm` (0 = a perfect split),
    * total/positive counts and the left-child counts at the argmin. */
  def bestSplit(df: DataFrame, groupCol: String, featureCol: String,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val cell = df.select(col(groupCol), col(featureCol).as("_v"),
        when(labelCol, 1L).otherwise(0L).as("_y"))
      .groupBy(col(groupCol), col("_v"))
      .agg(count(lit(1)).as("_c"), sum(col("_y")).as("_p"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = cell
      .withColumn("tl", sum(col("_c")).over(w))
      .withColumn("pl", sum(col("_p")).over(w))
      .withColumn("t", sum(col("_c")).over(wAll))
      .withColumn("p", sum(col("_p")).over(wAll))
      .filter(col("tl") < col("t"))
    val scored = cum.select(col(groupCol), col("_v"), col("tl"), col("pl"),
      col("t"), col("p"),
      expr(s"""CAST((
          (CAST(tl AS $d38) * tl - CAST(pl AS $d38) * pl
             - CAST(tl - pl AS $d38) * (tl - pl)) * (t - tl)
        + (CAST(t - tl AS $d38) * (t - tl)
             - CAST(p - pl AS $d38) * (p - pl)
             - CAST((t - tl) - (p - pl) AS $d38) * ((t - tl) - (p - pl)))
          * tl
        ) * 1000000 div (CAST(tl AS $d38) * (t - tl) * t) AS BIGINT)""")
        .as("score_ppm"))
    scored.groupBy(col(groupCol))
      .agg(min(struct(col("score_ppm"), col("_v"), col("tl"), col("pl")))
          .as("_best"),
        max(col("t")).as("n"), max(col("p")).as("n_pos"))
      .select(col(groupCol),
        col("_best").getField("_v").as("threshold"),
        col("_best").getField("score_ppm").as("score_ppm"),
        col("n"), col("n_pos"),
        col("_best").getField("tl").as("n_left"),
        col("_best").getField("pl").as("pos_left"))
  }

  /** Expected Reciprocal Rank at k (cascade-model ranking quality, the
    * graded companion to MRR/NDCG): a simulated user scans the ranking
    * top-down, stops at rank r with probability R_r = (2^g − 1)/2^gmax,
    * and ERR = Σ_r (1/r)·R_r·Π_{i<r}(1 − R_i). Unlike NDCG, a
    * highly-relevant early hit SHADES everything below it — the metric
    * that tells serving whether rank 1 actually answers the query.
    *
    * Integer-exact through dyadic rationals: with gmax = 3 every R_r has
    * denominator 8, so scaling by lcm(1..k)·8^k clears ALL fractions:
    *   err_scaled = Σ_r (2520 div r)·(2^g − 1)·Π_{i<r}(8 − (2^g_i −1))
    *                 ·8^(k−r)              (k ≤ 10, lcm(1..10) = 2520)
    * and err_ppm = err_scaled·10⁶ div (2520·8^k) via decimal(38,0).
    * The prefix product Π(8 − Rnum) rides collect_list over the
    * group-partitioned rank window + an `aggregate` fold — exact 64-bit
    * integers (≤ 8^(k−1)), mirrored by DuckDB's product() window (double,
    * but exact below 2^53). One shuffle on the group key. */
  def errAtK(ranked: DataFrame, groupCol: String, rankCol: String,
      gradeCol: Column, k: Int = 10, gmax: Int = 3): DataFrame = {
    require(k >= 1 && k <= 10, "k <= 10: the lcm constant is 2520")
    require(gmax >= 1 && gmax <= 6, "gmax in 1..6 keeps 2^g in int range")
    // per-rank term ≤ 2520·2^(gmax·k) and the k-term sum rides a LONG
    // accumulator: gmax·k ≤ 48 bounds the sum at ~7.1e18 < 2^63.
    // Without this, gmax=6 ∧ k≥9 silently overflows to a wrong err_ppm.
    require(gmax * k <= 48,
      "gmax*k <= 48: the 2520*2^(gmax*k) per-rank terms must sum in 63 bits")
    val d = ranked.filter(col(rankCol) <= k)
      .select(col(groupCol).as("_g"), col(rankCol).cast("int").as("_r"),
        least(greatest(gradeCol.cast("long"), lit(0L)), lit(gmax.toLong))
          .as("_grade"))
      .withColumn("_rnum",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_grade AS INT)) - 1"))
      .withColumn("_nstop", lit(1L << gmax) - col("_rnum"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_r"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val denomBase = 1L << gmax
    d.withColumn("_prevs", collect_list(col("_nstop")).over(w))
      .withColumn("_pre",
        expr("aggregate(_prevs, CAST(1 AS BIGINT), (acc, x) -> acc * x)"))
      .withColumn("_term", expr(
        s"(2520 div _r) * _rnum * _pre " +
          s"* shiftleft(CAST(1 AS BIGINT), ($k - _r) * $gmax)"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n_ranked"), sum(col("_term")).as("_e"))
      .select(col("_g").as(groupCol), col("n_ranked"),
        expr(s"CAST(CAST(_e AS DECIMAL(38,0)) * 1000000 " +
          s"div (CAST(2520 AS DECIMAL(38,0)) " +
          s"* ${BigInt(denomBase).pow(k)}) AS BIGINT)").as("err_ppm"))
  }
}
