package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Blocking-quality audit — the two standard entity-resolution metrics
    * for a blocking scheme, BEFORE trusting it at scale:
    *
    *  - reduction ratio (bp): 1 − candidates/(|L|·|R|) — how much of the
    *    quadratic all-pairs space the blocks prune. The all-pairs count
    *    is arithmetic (|L|·|R| as a cross of two one-row counts), never
    *    a join.
    *  - pair completeness (bp): the share of KNOWN true matches whose
    *    two sides land in the same block — the recall ceiling any
    *    downstream matcher inherits (a matcher cannot find a pair the
    *    blocks never co-locate). Same audit family as the simhash/ANN
    *    recall audits: measured on labeled truth, not assumed.
    *
    * `truth` is (left id, right id) labeled matches. Candidates are
    * COUNTED via a block-key aggregation (Σ n_l·n_r per key), so the
    * audit never materializes the candidate pairs it is counting —
    * that is what makes it safe to run on a blocking scheme that might
    * be bad. One combiner shuffle per side + a broadcast-joined truth
    * check. */
  def blockingAudit(left: DataFrame, right: DataFrame, blockCol: String,
      leftId: String, rightId: String, truth: DataFrame): DataFrame = {
    val lk = left.select(col(blockCol).as("_blk"), col(leftId).as("lid"))
    val rk = right.select(col(blockCol).as("_blk"), col(rightId).as("rid"))
    val perKey = lk.groupBy(col("_blk")).agg(count(lit(1)).as("nl"))
      .join(rk.groupBy(col("_blk")).agg(count(lit(1)).as("nr")), Seq("_blk"))
      .agg(coalesce(sum(expr(
        "CAST(nl AS DECIMAL(38,0)) * nr")), lit(0)).as("_cand"))
      .select(col("_cand").cast("decimal(38,0)").as("n_candidates"))
    val totals = lk.agg(count(lit(1)).as("_nl"))
      .crossJoin(broadcast(rk.agg(count(lit(1)).as("_nr"))))
    val t = truth.select(col(leftId).as("lid"), col(rightId).as("rid"))
    val found = t
      .join(lk, Seq("lid"))
      .join(rk.withColumnRenamed("_blk", "_blkR"), Seq("rid"))
      .filter(col("_blk") === col("_blkR"))
      .select(col("lid"), col("rid")).distinct()
    val truthCounts = t.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(found.agg(count(lit(1)).as("n_colocated"))))
    perKey.crossJoin(broadcast(totals)).crossJoin(broadcast(truthCounts))
      .select(
        col("n_candidates").cast("long").as("n_candidates"),
        (col("_nl") * col("_nr")).as("n_all_pairs"),
        expr("""CAST((CAST(_nl AS DECIMAL(38,0)) * _nr - n_candidates)
               * 10000 div NULLIF(CAST(_nl AS DECIMAL(38,0)) * _nr, 0)
               AS BIGINT)""").as("reduction_bp"),
        col("n_truth"), col("n_colocated"),
        expr("CAST(n_colocated * 10000 div NULLIF(n_truth, 0) AS BIGINT)")
          .as("completeness_bp"))
  }

  /** Blocking-key profiler — the PLANNING complement of
    * [[blockingAudit]]: before any pairs are generated, rank candidate
    * key expressions by the numbers that decide whether a self-join
    * dedup under that key is tractable. Per candidate key:
    *
    *  - n_blocks, max_block: granularity and the worst hot block;
    *  - pair_volume = Σ n·(n−1)/2 (decimal-widened): the EXACT number of
    *    candidate pairs a self-join dedup would generate — the cost a
    *    scheme commits to, computed without generating any of it;
    *  - top_share_bp: the largest block's share of rows — the skew
    *    number that predicts one straggler task doing half the join.
    *
    * One groupBy per candidate (candidates are enum-sized); rows with a
    * NULL key are excluded from that key's profile (a NULL block never
    * joins). */
  def blockKeyProfile(df: DataFrame,
      keys: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(keys.nonEmpty)
    keys.map { case (name, kexpr) =>
      df.select(kexpr.as("_k")).filter(col("_k").isNotNull)
        .groupBy(col("_k")).agg(count(lit(1)).as("n"))
        .agg(
          sum(col("n")).as("_rows"),
          count(lit(1)).as("n_blocks"),
          max(col("n")).as("max_block"),
          sum(expr("CAST(n AS DECIMAL(38,0)) * (n - 1) div 2"))
            .as("_pairs"))
        .select(lit(name).as("block_key"),
          coalesce(col("_rows"), lit(0L)).as("n_rows"),
          col("n_blocks"),
          coalesce(col("max_block"), lit(0L)).as("max_block"),
          coalesce(col("_pairs").cast("long"), lit(0L)).as("pair_volume"),
          expr("CAST(max_block * 10000 div NULLIF(_rows, 0) AS BIGINT)")
            .as("top_share_bp"))
    }.reduce(_ unionByName _)
  }

  /** Sorted-neighborhood candidate generation — the classic alternative
    * to equi-blocking ([[blockingAudit]]'s subject) for linkage keys
    * that DON'T split cleanly into blocks: impose a total order on a
    * sort key (name, address, normalized title), and emit exactly the
    * pairs within `w` positions of each other in that order. Typo'd
    * keys that equi-blocking separates (first-character block, wrong
    * first character) still sort adjacently and get paired.
    *
    * Scale shape: the global order comes from [[Layout.globalRank]]
    * (range-partitioned rank — no single-partition window), then the
    * sliding window becomes a bounded equi-join: bucket `b = ⌊(rk−1)/w⌋`,
    * the a-side exploded to {b, b+1}, join on bucket, keep
    * `0 < rk_b − rk_a < w`. Every pair within w positions spans at most
    * adjacent buckets, each bucket holds w rows, so the join does O(w²)
    * work per bucket and O(n·w) total — never the n² self-join, with no
    * skew (buckets are equal-sized by construction).
    *
    * Output: a_/b_ prefixed id and carry columns plus `gap` (rank
    * distance, 1..w−1), a-side strictly first in the sort order. `sort`
    * is column NAMES; the row id is appended as the tiebreak, making
    * the order total (same contract as [[Layout.globalRank]]). */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sort: Seq[String], w: Int, carry: Seq[String] = Nil): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val keep = (idCol +: (sort ++ carry)).distinct
    val ranked = Layout.globalRank(
        df.select(keep.map(col): _*), (sort :+ idCol).map(col), "_rk")
      .select((idCol +: carry).distinct.map(col) :+ col("_rk"): _*)
    val outCols = (idCol +: carry).distinct
    def side(p: String) =
      ranked.select(outCols.map(c => col(c).as(p + c)) :+
        col("_rk").as(p + "rk"): _*)
    val a = side("a_")
      .withColumn("_jb", explode(array(expr(s"(a_rk - 1) div $w"),
        expr(s"(a_rk - 1) div $w + 1"))))
    val b = side("b_").withColumn("_jb", expr(s"(b_rk - 1) div $w"))
    a.join(b, Seq("_jb"))
      .filter(col("b_rk") > col("a_rk") && col("b_rk") - col("a_rk") < w)
      .withColumn("gap", (col("b_rk") - col("a_rk")).cast("long"))
      .drop("_jb", "a_rk", "b_rk")
  }

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

  /** Fellegi–Sunter per-field match weights from a labeled pair sample:
    * for each boolean agreement field, m = P(agree | match) and
    * u = P(agree | non-match) as exact floored ppm, plus the
    * floored-log₂ agreement/disagreement weights in centibits under the
    * house convention (`(bitlen(m_ppm) − bitlen(u_ppm))·100` — the same
    * bl() approximation the surprisal family uses, integer-exact and
    * engine-portable). These weights are what turns [[fuzzyBestMatch]]'s
    * per-field comparisons into a calibrated match score: fields that
    * rarely agree by chance (phone) earn large weights, fields that
    * often agree anyway (city) earn small ones.
    *
    * One aggregation pass over the pairs (per-field sums fold into one
    * row) and an enum-sized unpivot — the labeled sample is scanned
    * once however many fields are scored. Zero-count edges keep their
    * honest degenerate values (bitlen(0) = 0) rather than smoothing
    * silently; callers wanting Laplace smoothing add it upstream. */
  def fellegiSunter(pairs: DataFrame, matchCol: Column,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty)
    val perField = agreeCols.flatMap { f =>
      Seq(sum(when(matchCol && col(f), 1L).otherwise(0L)).as(s"_ma_$f"),
        sum(when(!matchCol && col(f), 1L).otherwise(0L)).as(s"_ua_$f"))
    }
    val one = pairs.agg(
      sum(when(matchCol, 1L).otherwise(0L)).as("_nm"),
      (sum(when(!matchCol, 1L).otherwise(0L)).as("_nu") +: perField): _*)
    val stacked = explode(array(agreeCols.map(f =>
      struct(lit(f).as("field"), col(s"_ma_$f").as("_ma"),
        col(s"_ua_$f").as("_ua"))): _*))
    one.select(col("_nm"), col("_nu"), stacked.as("_s"))
      .select(col("_s.field").as("field"), col("_s._ma").as("_ma"),
        col("_s._ua").as("_ua"), col("_nm"), col("_nu"))
      .select(col("field"), col("_nm").as("n_match"),
        col("_nu").as("n_unmatch"),
        expr("CAST(_ma * 1000000 div NULLIF(_nm, 0) AS BIGINT)")
          .as("m_ppm"),
        expr("CAST(_ua * 1000000 div NULLIF(_nu, 0) AS BIGINT)")
          .as("u_ppm"))
      .withColumn("agree_w_cb", expr(
        "CAST((bitlen(m_ppm) - bitlen(u_ppm)) * 100 AS BIGINT)"))
      .withColumn("disagree_w_cb", expr(
        """CAST((bitlen(1000000 - m_ppm) - bitlen(1000000 - u_ppm)) * 100
           AS BIGINT)"""))
  }
}
