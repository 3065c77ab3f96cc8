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
}
