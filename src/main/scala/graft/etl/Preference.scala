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
