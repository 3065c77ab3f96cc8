package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution — the end-to-end composition of the
  * engine's linkage pieces (blocking, bounded edit distance, exact-integer
  * Jaro–Winkler) into the operator a dedup pipeline actually calls.
  *
  * Reference analog: the category fuzzy-match cascade (C7,
  * category-normalizer.ts) does argmin-by-Levenshtein against a small dim;
  * this is the same shape generalized to two arbitrary tables at scale.
  */
object Linkage {

  /** For each left row, the best right-side match within its block:
    *
    *  1. equi-join on the block key (never all-pairs — the block is the
    *     scale contract, exactly like the q237/q349 linkage queries);
    *  2. keep pairs with `levenshtein(name_l, name_r) <= maxDist` — the
    *     bounded form rides [[graft.plans.LevThresholdRewrite]], so each
    *     candidate pays the O(k·n) banded DP, not the full matrix;
    *  3. per left id, argmin by (edit distance, −jaro_winkler, right id):
    *     the Jaro–Winkler x10⁶ integer breaks distance ties toward the
    *     more prefix-similar candidate, and the id makes the winner
    *     deterministic. One `min(struct(...))` aggregation — partials
    *     combine map-side, no window sort over the candidate set.
    *
    * Output: (left id, right id, dist, jw_x1m), one row per left id that
    * matched at all. Left rows with no candidate within `maxDist` are
    * absent (inner semantics — the caller unions unmatched ids back if it
    * needs them). */
  def fuzzyBestMatch(left: DataFrame, right: DataFrame, blockCol: String,
      leftId: String, leftName: String, rightId: String, rightName: String,
      maxDist: Int): DataFrame = {
    val l = left.select(col(blockCol).as("_blk"), col(leftId).as("left_id"),
      col(leftName).as("_ln"))
    val r = right.select(col(blockCol).as("_blk"),
      col(rightId).as("right_id"), col(rightName).as("_rn"))
    l.join(r, Seq("_blk"))
      .withColumn("dist", levenshtein(col("_ln"), col("_rn")))
      .filter(col("dist") <= maxDist)
      .withColumn("jw",
        call_function("jaro_winkler", col("_ln"), col("_rn")))
      .groupBy(col("left_id"))
      .agg(min(struct(col("dist"), (-col("jw")).as("njw"),
        col("right_id"))).as("_best"))
      .select(col("left_id"), col("_best.right_id").as("right_id"),
        col("_best.dist").as("dist"), (-col("_best.njw")).as("jw_x1m"))
  }
}
