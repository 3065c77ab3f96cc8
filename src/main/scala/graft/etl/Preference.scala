package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data production — the operators that turn raw interaction
  * logs into RLHF training inputs (DPO pairs, tournament consistency,
  * annotator-vs-gold audits). The eval side of this surface exists
  * (Bradley–Terry q393, Copeland q383, GRPO q471); these are the DATA
  * side: what a pipeline runs to BUILD preference sets and to audit them
  * before any reward model sees them. All exact-integer, deterministic
  * (struct-free argmax spelling: min-id among max-score rows), DuckDB-
  * twinnable.
  */
object Preference {

  /** DPO pair construction: per group (prompt), chosen = the row with
    * the max score and rejected = the row with the min score, both with
    * the MIN-ID deterministic tiebreak (never max_by/min_by — Spark
    * documents "any value" on ties, which is exactly the
    * non-reproducibility a training set can't have). Groups with all
    * scores equal produce no pair (a DPO pair needs a strict margin).
    *
    * Spelling: one (group) aggregate for the score extremes, one keyed
    * join back + conditional-min aggregate for the ids — two shuffles on
    * the group key, no windows, no per-group sort. Output: group, cmax,
    * cmin, chosen_id, rejected_id. */
  def dpoPairs(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val g = col(groupCol)
    val m = df.groupBy(g).agg(max(col(scoreCol)).as("cmax"),
        min(col(scoreCol)).as("cmin"))
      .filter(col("cmax") > col("cmin"))
    df.join(m, Seq(groupCol))
      .groupBy(g, col("cmax"), col("cmin"))
      .agg(min(when(col(scoreCol) === col("cmax"), col(idCol)))
          .as("chosen_id"),
        min(when(col(scoreCol) === col("cmin"), col(idCol)))
          .as("rejected_id"))
  }

  /** Majority (gold) label per item with the min-label deterministic
    * tiebreak — the consensus step of every annotation pipeline. Same
    * argmax spelling as [[dpoPairs]]: per-(item,label) counts, max count
    * broadcast back along the item key, min label among the achievers.
    * Two keyed shuffles, both on the item key (AQE reuses the
    * partitioning). Output: item, gold, n_votes (the winning count). */
  def majorityLabel(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val counts = df.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("_n"))
    val top = counts.groupBy(col(itemCol)).agg(max(col("_n")).as("_nmax"))
    counts.join(top, Seq(itemCol))
      .filter(col("_n") === col("_nmax"))
      .groupBy(col(itemCol))
      .agg(min(col(labelCol)).as("gold"), max(col("_nmax")).as("n_votes"))
  }

  /** Majority-preference tournament edges over a small label domain:
    * per group, each label's best score; per unordered label pair the
    * per-group win counts; the majority direction (ties dropped — no
    * majority, no edge). The per-group pair fan-out is C(|labels|, 2) —
    * callers must pass a label column with an ENUM domain (event types,
    * model names), which is also what makes the output edge table
    * broadcast-size. Output: src, dst, wins_src, wins_dst (src is the
    * majority winner, so wins_src > wins_dst). */
  def majorityEdges(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val best = df.groupBy(col(groupCol), col(labelCol))
      .agg(max(col(scoreCol)).as("_s"))
    val a = best.select(col(groupCol), col(labelCol).as("_la"), col("_s").as("_sa"))
    val b = best.select(col(groupCol), col(labelCol).as("_lb"), col("_s").as("_sb"))
    val w = a.join(b, Seq(groupCol)).filter(col("_la") < col("_lb"))
      .groupBy(col("_la"), col("_lb"))
      .agg(sum(when(col("_sa") > col("_sb"), 1L).otherwise(0L)).as("_wa"),
        sum(when(col("_sb") > col("_sa"), 1L).otherwise(0L)).as("_wb"))
      .filter(col("_wa") =!= col("_wb"))
    w.select(
      when(col("_wa") > col("_wb"), col("_la")).otherwise(col("_lb")).as("src"),
      when(col("_wa") > col("_wb"), col("_lb")).otherwise(col("_la")).as("dst"),
      greatest(col("_wa"), col("_wb")).as("wins_src"),
      least(col("_wa"), col("_wb")).as("wins_dst"))
  }

  /** Rejection-sampling yield ladder — the compute planner for synthetic
    * data generation: per (arm, acceptance threshold τ) the keep rate,
    * the expected draws per kept sample (floored milli — the 1/p a
    * generation budget multiplies by), and the TOTAL tokens drawn per
    * kept sample (rejected drafts still cost inference). One scan
    * crossed with the broadcast τ grid, then an (arm, τ)-keyed
    * aggregate — the grid multiplies combiner input, never the shuffle
    * key space. */
  def rejectionYield(df: DataFrame, armCol: String, scoreCol: String,
      tokCol: String, taus: Seq[Long]): DataFrame = {
    require(taus.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val g = taus.toDF("tau")
    df.select(col(armCol).as("arm"), col(scoreCol).as("_c"),
        col(tokCol).as("_k"))
      .crossJoin(broadcast(g))
      .groupBy(col("arm"), col("tau"))
      .agg(count(lit(1)).as("n_drawn"),
        sum(when(col("_c") >= col("tau"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("_k")).as("_tok"))
      .select(col("arm"), col("tau"), col("n_drawn"), col("n_kept"),
        expr("n_kept * 10000 div n_drawn").as("keep_bp"),
        expr("CASE WHEN n_kept > 0 THEN n_drawn * 1000 div n_kept END")
          .as("draws_per_keep_milli"),
        expr("CASE WHEN n_kept > 0 THEN _tok div n_kept END")
          .as("tokens_per_keep"))
  }

  /** Teacher-confidence distillation audit over the [[majorityLabel]]
    * machinery: per item the gold label AND its vote share; ratings
    * bucket by the teacher's confidence quartile (⌊4·share⌋ capped at
    * 3), and per bucket the agreement of individual ratings with gold —
    * the rising curve that justifies confidence-weighted distillation
    * (flat = the teacher's confidence carries no signal). */
  def teacherConfidence(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val counts = df.groupBy(col(itemCol).as("_item"),
        col(labelCol).as("_label"))
      .agg(count(lit(1)).as("_n"))
    val m = counts.groupBy(col("_item"))
      .agg(sum(col("_n")).as("_m"), max(col("_n")).as("_nmax"))
    val gold = counts.join(m, Seq("_item"))
      .filter(col("_n") === col("_nmax"))
      .groupBy(col("_item"), col("_m"), col("_nmax"))
      .agg(min(col("_label")).as("_gold"))
      .withColumn("conf_bucket", expr("least(_nmax * 4 div _m, 3)"))
    df.select(col(itemCol).as("_item"), col(labelCol).as("_label"))
      .join(gold, Seq("_item"))
      .groupBy(col("conf_bucket"))
      .agg(countDistinct(col("_item")).as("n_items"),
        count(lit(1)).as("n_ratings"),
        expr("sum(CASE WHEN _label = _gold THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("agree_bp"))
  }

  /** Self-consistency sampling curve (the Wang et al. majority-vote
    * recipe, measured on the sample budget axis): per prompt the first
    * k samples vote; per k the mean majority share, the unanimity rate,
    * and the agreement of the k-majority with the full-budget (max k)
    * majority — the early-stopping readout ("would 3 samples have
    * picked the same answer 5 did"). Only prompts carrying the FULL
    * max-k samples enter, so every k row reads the same prompt panel.
    * Ties break to the min label ([[majorityLabel]]'s convention). The
    * rank window is prompt-keyed (corpus-cardinality partitions); the k
    * grid multiplies combiner input only. */
  def selfConsistency(df: DataFrame, promptCol: String, labelCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val kMax = ks.max
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(promptCol)).orderBy(orderCols: _*)
    val s = df
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= kMax)
      .select(col(promptCol).as("_p"), col("_rn"),
        col(labelCol).as("_label"))
    val grid = ks.toDF("k")
    val votes = s.crossJoin(broadcast(grid))
      .filter(col("_rn") <= col("k"))
      .groupBy(col("k"), col("_p"), col("_label"))
      .agg(count(lit(1)).as("_v"))
    val m = votes.groupBy(col("k"), col("_p"))
      .agg(sum(col("_v")).as("_m"), max(col("_v")).as("_vmax"))
      .filter(col("_m") === col("k")) // full k samples only
    val maj = votes.join(m, Seq("k", "_p"))
      .filter(col("_v") === col("_vmax"))
      .groupBy(col("k"), col("_p"), col("_m"), col("_vmax"))
      .agg(min(col("_label")).as("_maj"))
    val majMax = maj.filter(col("k") === kMax)
      .select(col("_p"), col("_maj").as("_majmax"))
    maj.join(majMax, Seq("_p"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_prompts"),
        expr("sum(_vmax * 10000 div _m) div count(1)")
          .as("mean_major_share_bp"),
        expr("sum(CASE WHEN _vmax = _m THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("unanimous_bp"),
        expr("sum(CASE WHEN _maj = _majmax THEN 1 ELSE 0 END) * 10000 " +
          "div count(1)").as("match_full_bp"))
  }

  /** Krippendorff's alpha (nominal metric) with a leave-one-annotator-out
    * grid — the panel-health readout over the [[majorityLabel]] gold
    * machinery: alpha says whether the PANEL agrees beyond chance;
    * the LOO rows say which annotator's removal moves it (the annotator
    * hurting consensus reads alpha_without > alpha_full).
    *
    * Exact-integer quantization (the repo's cross-engine convention —
    * quantize the statistic's terms, never the data): per pairable item
    * (m ≥ 2 ratings) the weighted observed disagreement
    *   wdo_i = ⌊(m² − Σ_c n_c²) · 10⁶ div (m − 1)⌋      (= m·do_i·10⁶)
    * floors ONCE per item; D_o(ppm) = ⌊Σ wdo_i div n⌋ over the n
    * pairable ratings. Expected disagreement from the pooled marginals
    * of the same pairable ratings: D_e(ppm) = ⌊(n² − Σ n_c²)·10⁶ div
    * (n(n−1))⌋, and alpha(ppm) = ⌊(D_e − D_o)·10⁶ div D_e⌋ — every
    * division floored identically by both engines, every product widened
    * to decimal(38,0) (n² at 100 TB exceeds 64 bits). Replicated ratings
    * (one annotator rating an item twice) are handled as Krippendorff
    * defines: they are ratings, not votes.
    *
    * `exclGrid` values are matched against the annotator column; the
    * sentinel −1 (matching no annotator) yields the full-panel row. One
    * grid-crossed scan, three keyed aggregates — the grid multiplies
    * partial-aggregate input, never the shuffle key space (grid values
    * are the coarsest key). Output per excl: n_items, n_ratings, do_ppm,
    * de_ppm, alpha_ppm (NULL when D_e = 0 — a degenerate single-label
    * panel has no chance disagreement to correct against). */
  def krippendorffAlpha(df: DataFrame, itemCol: String, annCol: String,
      labelCol: String, exclGrid: Seq[Long] = Seq(-1L)): DataFrame = {
    require(exclGrid.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val grid = exclGrid.toDF("excl")
    val r = df.select(col(itemCol).as("_item"), col(annCol).as("_ann"),
        col(labelCol).as("_label"))
      .crossJoin(broadcast(grid)).filter(col("_ann") =!= col("excl"))
    val cl = r.groupBy(col("excl"), col("_item"), col("_label"))
      .agg(count(lit(1)).as("_nil"))
    val perItem = cl.groupBy(col("excl"), col("_item"))
      .agg(sum(col("_nil")).as("_m"),
        sum(col("_nil") * col("_nil")).as("_sq"))
      .filter(col("_m") >= 2)
      .withColumn("_wdo", expr(
        s"CAST((CAST(_m AS $d38) * _m - _sq) * 1000000 div (_m - 1) " +
          "AS BIGINT)"))
    val marg = cl.join(perItem.select(col("excl"), col("_item")),
        Seq("excl", "_item"), "left_semi")
      .groupBy(col("excl"), col("_label"))
      .agg(sum(col("_nil")).as("_nc"))
      .groupBy(col("excl"))
      .agg(sum(col("_nc")).as("n_ratings"),
        sum(col("_nc") * col("_nc")).as("_sqc"))
    val obs = perItem.groupBy(col("excl"))
      .agg(count(lit(1)).as("n_items"), sum(col("_wdo")).as("_wdos"))
    obs.join(marg, Seq("excl"))
      .withColumn("do_ppm", expr("_wdos div n_ratings"))
      .withColumn("de_ppm", expr(
        s"CAST((CAST(n_ratings AS $d38) * n_ratings - _sqc) * 1000000 " +
          s"div (CAST(n_ratings AS $d38) * (n_ratings - 1)) AS BIGINT)"))
      // negative alphas (systematic disagreement) negate a POSITIVE
      // floored quotient — Spark's `div` truncates toward zero while
      // DuckDB's // floors toward −∞, so a negative dividend would
      // silently diverge the engines (the q511/q512 div convention)
      .withColumn("alpha_ppm", expr(
        "CASE WHEN de_ppm > 0 THEN " +
          "CASE WHEN do_ppm <= de_ppm " +
          "THEN (de_ppm - do_ppm) * 1000000 div de_ppm " +
          "ELSE -((do_ppm - de_ppm) * 1000000 div de_ppm) END END"))
      .select(col("excl"), col("n_items"), col("n_ratings"),
        col("do_ppm"), col("de_ppm"), col("alpha_ppm"))
  }
}
