package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.{Analytics, Mining, Privacy, Series, Sketches, Stats}

/** Round-4 additions: Bloom-pruned exact semi-join, single-pass grouped
  * regression, Gini impurity, set-overlap Jaccard, ranking quality (MRR),
  * and k-means assignment on quantized embeddings.
  *
  * Same exactness contract as [[Curation]]: sketches and hashes only
  * produce CANDIDATES (the Bloom filter prunes, the exact join decides);
  * emitted numbers are integer counts or cross-multiplied scaled ratios
  * the DuckDB oracle re-derives bit-for-bit.
  */
object MiningQueries {

  /** DuckDB-side token list — must match [[graft.etl.Corpus.tokensOf]]. */
  private val toksSql =
    """list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')"""

  // ------------------------------------------------ q124 bloom semi-join

  /** Lineitems of URGENT orders via [[Sketches.bloomSemiJoin]]: the Bloom
    * bitmap (2¹⁷ bits built distributed, fetched bounded) prunes the fact
    * side map-side before the exact semi-join; result is bit-identical to
    * the plain semi-join the oracle runs. */
  def q124BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
    Sketches.bloomSemiJoin(Tables.lineitem(spark, dir), dim,
        "l_orderkey", "o_orderkey", mBits = 1 << 17, kHashes = 4)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .orderBy($"l_returnflag")
  }

  // ------------------------------------------------ q125 grouped slope

  /** Per-event-type OLS slope of value-cents over day index
    * ([[Mining.groupedSlope]]): one pass, five sufficient statistics,
    * decimal(38,0) sums, scaled-integer quotient. */
  def q125GroupedSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("x"),
      Series.cents($"value").as("y"))
    Mining.groupedSlope(e, "event_type", "x", "y", scale = 10000)
      .orderBy($"event_type")
  }

  // ------------------------------------------------------- q126 gini

  /** Gini impurity of each brand's part-type mix ([[Mining.giniImpurity]]):
    * two combiner-friendly shuffles, decimal squares. */
  def q126Gini(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.giniImpurity(Tables.part(spark, dir), "p_brand", "p_type",
        scale = 10000)
      .orderBy($"p_brand")
  }

  // ------------------------------------------- q127 set jaccard

  /** Pairwise Jaccard between event-type user populations
    * ([[Mining.groupSetJaccard]]) — element-key self-join, fan-out bounded
    * by the enum-sized group domain squared. */
  def q127SetJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.groupSetJaccard(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy($"g_a", $"g_b")
  }

  // ------------------------------------------------------- q128 mrr

  /** Reciprocal rank of the first relevant customer per market segment
    * ([[Mining.firstRelevantRank]]): rank by (acctbal DESC, custkey),
    * relevance = custkey divisible by 13 — a deterministic stand-in for a
    * relevance label. */
  def q128Mrr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.firstRelevantRank(Tables.customer(spark, dir), "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey".asc), $"c_custkey" % 13 === 0)
      .orderBy($"c_mktsegment")
  }

  // ---------------------------------------------------- q129 kmeans

  /** K-means assignment (k=8, lowest-id seeding) on scale-1000 quantized
    * embeddings ([[Mining.kmeansAssign]]): broadcast centroids, integer
    * distances, argmin via min(struct) — the oracle re-derives it with a
    * QUALIFY window, a genuinely different formulation. */
  def q129Kmeans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.kmeansAssign(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 8)
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------- q130 chi2

  /** Per-token χ² association with the lang='en' label
    * ([[Mining.chi2TokenLabel]]), top-40 — the feature-selection screen;
    * ≥50-doc frequency floor bounds the output by the vocabulary. */
  def q130Chi2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.chi2TokenLabel(Tables.documents(spark, dir), "doc_id", "text",
        label = $"lang" === "en", minDocs = 50, scale = 10000)
      .orderBy($"chi2_scaled".desc, $"token")
      .limit(40)
  }

  // --------------------------------------------------- q131 drift

  /** Cohort drift screen between even/odd user populations per event
    * type ([[Mining.cohortDrift]]): scaled mean gap + variance ratio
    * from one pass of sufficient statistics. */
  def q131Drift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      $"user_id", Series.cents($"value").as("cents"))
    Mining.cohortDrift(e, "event_type", $"user_id" % 2 === 0, "cents",
        scale = 10000)
      .orderBy($"event_type")
  }

  // ------------------------------------------------ q132 dup spans

  /** Duplicated-span audit over 4-gram anchors
    * ([[graft.etl.Vocab.duplicatedSpans]]) — the substring-dedup shape:
    * duplicated positions and longest duplicated run per document. */
  def q132DupSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Vocab.duplicatedSpans(Tables.documents(spark, dir),
        "doc_id", "text", n = 4)
      .orderBy($"doc_id")
  }

  // --------------------------------------------- q133 rolling median

  /** Exact rolling lower-median of the last 15 values per user
    * ([[Series.rollingMedian]]): sorted-frame indexing on the Spark side,
    * native `quantile_disc` window on the oracle side — two independent
    * derivations of the same discrete quantile. */
  def q133RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_id", $"user_id",
      Series.cents($"value").as("cents"), $"ts")
    Series.rollingMedian(e, "user_id", Seq("ts", "event_id"), "cents",
        n = 15)
      .select($"event_id", $"roll_median")
      .orderBy($"event_id")
  }

  // ---------------------------------------- q134 incremental dedup

  /** Incremental ingest dedup ([[graft.etl.Similarity.incrementalDupFlags]])
    * over the q25 planted-duplicate corpus: "new batch" = the planted
    * copies plus every 7th original, flagged against the standing corpus
    * by exact hash and ≥5 shared non-boilerplate trigram shingles. The
    * old×old quadrant never joins — the cost law of nightly ingest. */
  def q134IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Similarity.incrementalDupFlags(
        TrainingData.corpus(spark, dir), "doc_id", "text",
        isNew = $"doc_id" >= 1000000L || $"doc_id" % 7 === 0,
        n = 3, minShared = 5, maxShingleDocs = 50)
      .orderBy($"doc_id")
  }

  // ---------------------------------------- q135 equi-depth histogram

  /** Equi-depth (ntile) histogram of order value per priority — the
    * optimizer-statistics histogram (q93 is the equi-WIDTH variant):
    * 10 deciles per group with count and exact integer bounds. Ties
    * broken by order key so the ntile assignment is deterministic; one
    * partitioned window + one combiner-friendly groupBy. */
  def q135EquidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderkey",
        Series.cents($"o_totalprice").as("cents"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"o_orderpriority", $"decile")
      .agg(count(lit(1)).as("n"), min($"cents").as("lo"),
        max($"cents").as("hi"))
      .orderBy($"o_orderpriority", $"decile")
  }

  // ------------------------------------------------ q136 surprisal

  /** Unigram-surprisal scoring ([[graft.etl.Vocab.unigramSurprisal]]):
    * floored self-information bits per token position via binary-digit
    * counts — the no-LM quality signal, exact on any engine. */
  def q136Surprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Vocab.unigramSurprisal(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy($"doc_id")
  }

  // -------------------------------------------- q137 mixture sample

  /** Domain-reweighted mixture sampling
    * ([[graft.etl.Corpus.mixtureSample]]): per-source inclusion rates
    * derived deterministically from the source name (500 + 400·(src#
    * mod 7) bp), reported as per-source kept/total counts. */
  def q137MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val rate = lit(500) + lit(400) *
      (substring($"source", 4, 10).cast("int") % 7)
    graft.etl.Corpus.mixtureSample(docs.withColumn("rate_bp", rate),
        "doc_id", $"rate_bp")
      .groupBy($"source", $"rate_bp")
      .agg(count(lit(1)).as("n_kept"))
      .join(docs.groupBy($"source").agg(count(lit(1)).as("n_total")),
        "source")
      .select($"source", $"rate_bp", $"n_total", $"n_kept")
      .orderBy($"source")
  }

  // ----------------------------------------- q138 percentile rank

  /** Integer percentile-rank feature transform (the rank half of
    * rank-gauss scaling): per event type, pr_bp = (rank−1)·10000 div
    * (n−1), ties sharing a rank so the output is order-independent.
    * One partitioned window + a broadcast group-size join; the scaled
    * integer form crosses engines exactly where percent_rank()'s float
    * would not. */
  def q138PercentileRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).select($"event_id", $"event_type",
      Series.cents($"value").as("cents"))
    // rank(v) = 1 + #strictly-smaller rows, read off a per-(type, value)
    // count histogram - the cumsum window runs over DISTINCT VALUES
    // (bounded by the cents domain), never a row-grain rank partitioned
    // by the 5-value type key (one-task-per-type sort at scale)
    val wv = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val hist = e.groupBy($"event_type", $"cents")
      .agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum($"_c").over(wv), lit(0L)))
      .select($"event_type", $"cents", $"_before")
    e.join(hist, Seq("event_type", "cents"))
      .join(broadcast(e.groupBy($"event_type")
        .agg(count(lit(1)).as("n"))), "event_type")
      .select($"event_id", $"event_type",
        expr("CAST(_before * 10000 div NULLIF(n - 1, 0) AS BIGINT)")
          .as("pr_bp"))
      .orderBy($"event_id")
  }

  // -------------------------------------------- q139 purged split

  /** Leakage-aware temporal split: train = events in the first 80% of the
    * observed time span, embargo = the next day (discarded, so train
    * labels computed over trailing windows cannot leak into test), test =
    * after. The cutoff is integer micros arithmetic over one (min, max)
    * aggregate broadcast back; the split itself is a shuffle-free
    * projection — no global sort, unlike a percentile cutoff, which is
    * why span-fraction cutoffs are the form that scales. Reported as
    * counts per type × split. */
  def q139PurgedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"event_type", unix_micros($"ts").as("us"))
    val bounds = e.agg(min($"us").as("lo"), max($"us").as("hi"))
      .select(($"lo" + expr("(hi - lo) * 8 div 10")).as("cut"))
    e.join(broadcast(bounds))
      .withColumn("split",
        when($"us" <= $"cut", lit("train"))
          .when($"us" <= $"cut" + 86400000000L, lit("embargo"))
          .otherwise(lit("test")))
      .groupBy($"event_type", $"split")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"split")
  }

  // ------------------------------------------------------- q140 auc

  /** Exact tie-aware ROC AUC per event type ([[Mining.groupAuc]]): score =
    * value cents, relevance = user_id divisible by 3 (deterministic label
    * stand-in, as in q128). The Spark side counts (pos,neg) pairs via a
    * distinct-score running sum; the oracle derives the same floor from
    * per-row midrank sums — two independent formulations of the
    * Mann–Whitney statistic. */
  def q140Auc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type", $"user_id",
      Series.cents($"value").as("cents"))
    Mining.groupAuc(e, "event_type", "cents", $"user_id" % 3 === 0)
      .orderBy($"event_type")
  }

  // ------------------------------------------------ q141 calibration

  /** Reliability diagram for the q140 classifier: score deciles per event
    * type (ntile, event_id tiebreak — same deterministic binning contract
    * as q135) with observed positive rate in basis points. One partitioned
    * window + one combiner-friendly groupBy; with q140's AUC this
    * completes the threshold-free evaluation pair (discrimination +
    * calibration). */
  def q141Calibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).select($"event_id", $"event_type",
      Series.cents($"value").as("cents"),
      when($"user_id" % 3 === 0, 1L).otherwise(0L).as("lbl"))
    // ntile via groupedGlobalRank + the exact ntile formula - never a
    // row-grain window partitioned by the 5-value type key
    val ranked = graft.etl.Layout.groupedGlobalRank(e,
      Seq("event_type"), Seq($"cents", $"event_id"), "_r")
    val ns = broadcast(e.groupBy($"event_type").agg(count(lit(1)).as("_n")))
    ranked.join(ns, "event_type")
      .withColumn("bin", graft.etl.Layout.ntileFromRank("_r", "_n", 10)
        .cast("int"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"), sum($"lbl").as("n_pos"),
        min($"cents").as("lo"), max($"cents").as("hi"))
      .withColumn("pos_bp", expr("CAST(n_pos * 10000 div n AS BIGINT)"))
      .orderBy($"event_type", $"bin")
  }

  // ---------------------------------------- q306 lift / gains table

  /** Cumulative gains & lift table for the q140 classifier
    * ([[Mining.liftCurve]]): score deciles ranked best-first, with the
    * cumulative positive capture (gain) and its ratio to random
    * targeting (lift) in basis points — the campaign-targeting readout
    * ("how deep must we mail to capture 80% of buyers") that AUC's one
    * number cannot answer. Same deterministic labeling as q140/q141. */
  def q306LiftCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"user_id",
        Series.cents($"value").as("cents"))
    Mining.liftCurve(e, "event_type", "cents", "event_id",
        $"user_id" % 3 === 0, bins = 10)
      .orderBy($"event_type", $"bin")
  }

  // ------------------------------------------- q316 Qini curve

  /** Qini (uplift) curve ([[Mining.qiniCurve]]): the q306 deciles with
    * the treatment/control split overlaid — cumulative incremental
    * positives over the control baseline scaled to treated depth, the
    * readout that separates "finds converters" from "changes
    * behavior". Same deterministic labeling family as q140/q306, arms
    * from the q308 assignment. */
  def q316QiniCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"user_id",
        Series.cents($"value").as("cents"))
    Mining.qiniCurve(e, "event_type", "cents", "event_id",
        $"user_id" % 2 === 1, $"user_id" % 3 === 0, bins = 10)
      .orderBy($"event_type", $"bin")
  }

  // ------------------------------------- q307 average precision

  /** Average precision per event type ([[Mining.averagePrecision]]):
    * the PR-curve area for the q140 classifier — the rank metric that
    * ignores the true-negative ocean, so it stays honest where class
    * imbalance inflates ROC AUC. Quantized as a per-term-floored ppm
    * sum both engines reproduce bit-for-bit. */
  def q307AvgPrecision(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type", $"event_id", $"user_id",
        Series.cents($"value").as("cents"))
    Mining.averagePrecision(e, "event_type", "cents", "event_id",
        $"user_id" % 3 === 0)
      .orderBy($"event_type")
  }

  // ------------------------------------------- q241 isotonic (PAV)

  /** Isotonic calibration curve over the q141 reliability bins
    * ([[graft.etl.Stats.isotonicFit]]): the L2 monotone fit of the
    * per-decile positive rate via the PAV minimax identity
    * `ŷ_i = max_{j≤i} min_{k≥i} avg(j..k)` — pooling activates wherever
    * the empirical rate dips, which the user_id%3 labeling against
    * cents-ordered deciles genuinely produces. Row work is the same one
    * window + groupBy as q141; the PAV math runs on the 10-bin
    * histogram in exact floored parts-per-billion. */
  def q241Isotonic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).select($"event_id", $"event_type",
      Series.cents($"value").as("cents"),
      when($"user_id" % 3 === 0, 1L).otherwise(0L).as("lbl"))
    // same scale-safe ntile spelling as q141
    val ranked = graft.etl.Layout.groupedGlobalRank(e,
      Seq("event_type"), Seq($"cents", $"event_id"), "_r")
    val ns = broadcast(e.groupBy($"event_type").agg(count(lit(1)).as("_n")))
    val bins = ranked.join(ns, "event_type")
      .withColumn("bin", graft.etl.Layout.ntileFromRank("_r", "_n", 10)
        .cast("int"))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"), sum($"lbl").as("n_pos"))
    Stats.isotonicFit(bins, "event_type", "bin", "n_pos", "n")
      .join(bins, Seq("event_type", "bin"))
      .select($"event_type", $"bin", $"n", $"n_pos", $"y_fit_ppb")
      .orderBy($"event_type", $"bin")
  }

  // ---------------------------------------------------- q142 kappa

  /** Cohen's kappa per event type ([[Mining.cohenKappa]]) between two
    * deterministic 5-way labelings that agree exactly on even event ids —
    * chance-corrected agreement ≈ 0.37, a non-trivial fixture. The
    * annotator-agreement QA gate of a labeling pipeline. */
  def q142Kappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      ($"user_id" % 5).as("a"),
      (($"user_id" + ($"event_id" % 2)) % 5).as("b"))
    Mining.cohenKappa(e, "event_type", "a", "b")
      .orderBy($"event_type")
  }

  // ------------------------------------------------------ q143 rrf

  /** Reciprocal-rank fusion of two retrieval rankings per market segment
    * (the standard hybrid-search merge: rrf = Σ scale div (60 + rank)):
    * rank 1 by account balance, rank 2 by a deterministic second signal
    * (custkey mod 97), top 5 fused per segment. Three same-partition
    * windows — ONE shuffle on the segment key, three in-partition sorts,
    * nothing global; exact integers throughout. */
  def q143Rrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val seg = Window.partitionBy($"c_mktsegment")
    Tables.customer(spark, dir)
      .withColumn("r1", row_number().over(
        seg.orderBy($"c_acctbal".desc, $"c_custkey")))
      .withColumn("r2", row_number().over(
        seg.orderBy($"c_custkey" % 97, $"c_custkey")))
      .withColumn("rrf_scaled",
        expr("CAST(1000000 div (60 + r1) + 1000000 div (60 + r2) AS BIGINT)"))
      .withColumn("_tk", row_number().over(
        seg.orderBy($"rrf_scaled".desc, $"c_custkey")))
      .filter($"_tk" <= 5)
      .select($"c_mktsegment", $"c_custkey", $"r1", $"r2", $"rrf_scaled")
      .orderBy($"c_mktsegment", $"rrf_scaled".desc, $"c_custkey")
  }

  // ----------------------------------------------------- q144 corr

  /** Per-event-type Pearson correlation of value-cents with day index
    * ([[Mining.groupedCorr]]): sign + scaled r² from the same single-pass
    * sufficient statistics as q125's slope — the feature-screen companion
    * (is this signal worth a model?). */
  def q144Corr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select($"event_type",
      datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("x"),
      Series.cents($"value").as("y"))
    Mining.groupedCorr(e, "event_type", "x", "y")
      .orderBy($"event_type")
  }

  // -------------------------------------------------- q145 entropy

  /** Source-diversity floored entropy per language
    * ([[Mining.flooredEntropy]]): is one source dominating a language's
    * corpus? 0 bits = single source; the binary-digit-count floor makes
    * the number identical on both engines. */
  def q145Entropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.flooredEntropy(Tables.documents(spark, dir), "lang", "source")
      .orderBy($"lang")
  }

  // ---------------------------------------------- q146 basket lift

  /** Top-20 co-purchased part pairs with exact integer lift
    * ([[Mining.basketPairLift]] over distinct (order, part)): the
    * market-basket screen; the basket-key self-join bounds fan-out by
    * basket size squared, never the item domain. */
  def q146BasketLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.basketPairLift(Tables.lineitem(spark, dir),
        "l_orderkey", "l_partkey")
      .orderBy($"n_ab".desc, $"item_a", $"item_b")
      .limit(20)
  }

  // ------------------------------------------------- q148 k-anonymity

  /** k-anonymity audit with one generalization step (the privacy gate
    * before a data release): for each quasi-identifier cell
    * (nation, segment), report its exact population, its nation-rollup
    * population, and the anonymity decision — keep the cell ('exact'),
    * generalize to nation ('generalized'), or suppress. Two
    * combiner-friendly aggregations; the rollup join is
    * group-domain-sized. k = 10, the conventional release floor. */
  def q148Kanon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val cell = Tables.customer(spark, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n_exact"))
    val roll = cell.groupBy($"c_nationkey")
      .agg(sum($"n_exact").as("n_rollup"))
    cell.join(broadcast(roll), "c_nationkey")
      .select($"c_nationkey", $"c_mktsegment", $"n_exact", $"n_rollup",
        when($"n_exact" >= k, lit("exact"))
          .when($"n_rollup" >= k, lit("generalized"))
          .otherwise(lit("suppress")).as("anonymity"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  // ------------------------------------------- q149 quantile normalization

  /** Quantile normalization across event types (the cross-distribution
    * feature alignment: replace each value with its percentile bucket's
    * cross-group mean): per-type ntile(100) buckets (q135's deterministic
    * binning contract), bucket-keyed reference means as floor divisions,
    * broadcast join back. One partitioned window + a 100-row-per-group
    * aggregate — never a global sort. */
  def q149QuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).select($"event_id", $"event_type",
      Series.cents($"value").as("cents"))
    // same scale-safe ntile spelling as q141, k=100
    val ranked = graft.etl.Layout.groupedGlobalRank(e,
      Seq("event_type"), Seq($"cents", $"event_id"), "_r")
    val ns = broadcast(e.groupBy($"event_type").agg(count(lit(1)).as("_n")))
    val b = ranked.join(ns, "event_type")
      .withColumn("bucket", graft.etl.Layout.ntileFromRank("_r", "_n", 100)
        .cast("int"))
    val ref = b.groupBy($"bucket")
      .agg(expr("CAST(sum(cents) div count(1) AS BIGINT)").as("norm_cents"))
    b.join(broadcast(ref), "bucket")
      .select($"event_id", $"event_type", $"bucket", $"cents", $"norm_cents")
      .orderBy($"event_id")
  }

  // ------------------------------------------- q150 curriculum phases

  /** Curriculum phase assignment by difficulty band: q136's unigram
    * surprisal score, banded into 4 equal-WIDTH phases by the q139
    * span-fraction rule (one (min,max) aggregate broadcast back,
    * shuffle-free assignment — equal-count phases would need a global
    * sort). Reports per-phase corpus statistics — the easy→hard data
    * ordering a curriculum-training run consumes. */
  def q150Curriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = graft.etl.Vocab.unigramSurprisal(Tables.documents(spark, dir),
        "doc_id", "text")
      .filter($"n_tokens" > 0)
    val bounds = s.agg(min($"mean_bits_x100").as("lo"),
      max($"mean_bits_x100").as("hi"))
    s.join(broadcast(bounds))
      .withColumn("phase",
        expr("1 + ((mean_bits_x100 - lo) * 4) div (hi - lo + 1)"))
      .groupBy($"phase")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        min($"mean_bits_x100").as("lo_bits"),
        max($"mean_bits_x100").as("hi_bits"))
      .orderBy($"phase")
  }

  // --------------------------------------------- q151 vocab coverage

  /** Vocabulary coverage curve: the corpus share (bp) covered by the top
    * 100 / 1k / 10k ranked tokens ([[graft.etl.Vocab.vocabulary]]'s
    * range-partitioned two-phase rank — no single-partition sort) — the
    * number that decides a tokenizer's vocab size. One pass of
    * conditional sums over the ranked vocabulary, unpivoted with stack. */
  def q151VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = graft.etl.Vocab.vocabulary(Tables.documents(spark, dir), "text")
    v.agg(
        sum(when($"token_id" <= 100, $"cnt").otherwise(0L)).as("c100"),
        sum(when($"token_id" <= 1000, $"cnt").otherwise(0L)).as("c1k"),
        sum(when($"token_id" <= 10000, $"cnt").otherwise(0L)).as("c10k"),
        sum($"cnt").as("tot"))
      .selectExpr(
        "stack(3, 100, c100, 1000, c1k, 10000, c10k) AS (k, covered)",
        "tot AS total")
      .selectExpr("k", "covered", "total",
        "CAST(covered * 10000 div total AS BIGINT) AS coverage_bp")
      .orderBy($"k")
  }

  // ---------------------------------------------- q152 shard balance

  /** Shard-balance audit for a 32-way corpus layout: shards assigned by
    * the repo-standard sha256-prefix hash of doc_id (q59/q76/q137's
    * recipe), reporting per-shard document and token totals and the
    * signed skew vs the mean in bp ((S·sum − total)·10⁴ div total,
    * cross-multiplied exact). The write-path check that no output shard
    * becomes a straggler. One aggregation + a one-row broadcast. */
  def q152ShardBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir).select($"doc_id",
      size(graft.etl.Corpus.tokensOf($"text")).cast("long").as("n_tok"),
      (conv(substring(sha2($"doc_id".cast("string"), 256), 1, 4), 16, 10)
        .cast("long") % 32).as("shard"))
    val per = d.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tokens"))
    val tot = per.agg(sum($"sum_tokens").as("tot"))
    per.join(broadcast(tot))
      .select($"shard", $"n_docs", $"sum_tokens",
        expr("CAST((32 * sum_tokens - tot) * 10000 div tot AS BIGINT)")
          .as("skew_bp"))
      .orderBy($"shard")
  }

  // ------------------------------------------- q153 bigram surprisal

  /** Bigram conditional-surprisal scoring
    * ([[graft.etl.Vocab.bigramSurprisal]]): floored −log₂ P̂(w₂|w₁) —
    * the first-order fluency signal refining q136's unigram score, still
    * with no float log anywhere. */
  def q153BigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.etl.Vocab.bigramSurprisal(Tables.documents(spark, dir),
        "doc_id", "text")
      .orderBy($"doc_id")
  }

  // ------------------------------------------------------ q156 acf

  /** Lag-1..7 autocorrelation of the daily event-count series
    * ([[Series.acf]]): the raw table collapses to ≤ one row per calendar
    * day first (one combiner-friendly shuffle), then the lag pairs join on
    * that day-bounded series — the seasonality screen (a weekly cycle
    * shows as a lag-7 peak) with q144's exact sign + scaled-r² contract. */
  def q156Acf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
      .groupBy($"d").agg(count(lit(1)).as("x"))
    Series.acf(daily, "d", "x", maxLag = 7)
      .withColumnRenamed("lag", "lag_days")
      .orderBy($"lag_days")
  }

  // ---------------------------------------------------- q157 cusum

  /** CUSUM change-point screen per event type
    * ([[Series.cusumChangepoint]]): the day whose running mean-centered
    * cumulative sum peaks in absolute value — the level-shift detector a
    * pipeline runs on ingest volume (did a source break or double?). All
    * decimal(38,0) integer arithmetic, earliest-day tiebreak. */
  def q157Cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
      .withColumn("one", lit(1L))
    Series.cusumChangepoint(e, "event_type", "d", "one")
      .withColumnRenamed("cp_tick", "cp_day")
      .orderBy($"event_type")
  }

  // ------------------------------------------------- q158 semdedup

  /** SemDeDup representative selection ([[Mining.semdedupReps]]): one
    * canonical embedding per k-means cluster (closest-to-centroid, exact
    * integer distances, id-tiebroken) with the member count it stands
    * for — the keep-one step that turns q129's assignment into a
    * deduplicated corpus. */
  def q158Semdedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.semdedupReps(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 8)
      .orderBy($"cluster")
  }

  // ------------------------------------------ q163 negative sampling

  /** Deterministic negative sampling ([[Mining.negativeSample]]): 4
    * hash-derived candidate parts per customer minus the parts the
    * customer actually ordered — the contrastive-training negative
    * stream, reproducible across engines because the candidate is pure
    * integer arithmetic (no RNG state). The one driver-side scalar
    * (max part key) is a bounded lookup, same legitimacy class as the
    * IVF centroid fetch. */
  def q163NegativeSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxPart = Tables.part(spark, dir)
      .agg(max($"p_partkey")).head().getLong(0)
    val interactions = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c_custkey"), $"l_partkey".as("neg_partkey"))
    Mining.negativeSample(Tables.customer(spark, dir), interactions,
        "c_custkey", "neg_partkey", k = 4, nItems = maxPart)
      .orderBy($"c_custkey", $"sample_idx")
  }

  // ------------------------------------------- q165 Theil–Sen slope

  /** Robust trend per event type ([[Series.theilSenSlopeBp]]): lower
    * median of all pairwise slopes of the daily-count series, in bp/day.
    * Same collapse-to-daily-first contract as q156 — the O(n²) pair join
    * runs on a calendar-bounded series, not the raw events. */
  def q165Theilsen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("x"))
    Series.theilSenSlopeBp(daily, "event_type", "d", "x")
      .orderBy($"event_type")
  }

  // --------------------------------------- q169 weighted median

  /** Weighted lower median ([[Analytics.weightedMedian]]): per return
    * flag, the price-cents value at which half the total QUANTITY is
    * reached — the volume-weighted price midpoint (q38's unweighted
    * median weights every row 1). */
  def q169WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", Series.cents($"l_extendedprice").as("price_c"),
        round($"l_quantity").cast("long").as("qty"),
        $"l_orderkey", $"l_linenumber")
    Analytics.weightedMedian(li, "l_returnflag", "price_c", "qty",
        Seq("l_orderkey", "l_linenumber"))
      .orderBy($"l_returnflag")
  }

  // ------------------------------------------ q170 weekly seasonality

  /** Day-of-week seasonal profile ([[Series.dowSeasonal]]): slot means
    * and worst single-day deviation of the daily event-count series —
    * the is-it-just-weekly screen next to q156's ACF. */
  def q170DowSeasonal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select(datediff(to_date($"ts"), to_date(lit("1970-01-01")))
        .cast("long").as("d"))
      .groupBy($"d").agg(count(lit(1)).as("x"))
    Series.dowSeasonal(daily, "d", "x").orderBy($"dow")
  }

  // ------------------------------------------- q171 Gini coefficient

  /** Lorenz-curve Gini ([[Analytics.giniCoefficientBp]]): revenue
    * concentration across orders within each priority class, in bp. */
  def q171GiniCoef(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .select($"o_orderpriority", Series.cents($"o_totalprice").as("price_c"),
        $"o_orderkey")
    Analytics.giniCoefficientBp(o, "o_orderpriority", "price_c", "o_orderkey")
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------- q174 linear interpolation

  /** Gap interpolation ([[Series.interpolateDaily]]): each user's daily
    * purchase-count series expanded to its own day span with interior
    * gaps filled by the floor-integer line between bracketing
    * observations — the straight-line sibling of q91's LOCF. */
  def q174Interpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy($"user_id", $"d").agg(count(lit(1)).as("x"))
    Series.interpolateDaily(daily, "user_id", "d", "x")
      .orderBy($"user_id", $"day")
  }

  // ------------------------------------ q175 largest-remainder alloc

  /** Hamilton allocation ([[Analytics.largestRemainderAlloc]]): 1000
    * sampling slots across nations proportional to customer count,
    * summing to exactly 1000 — the exact-total budget allocator rate
    * sampling can't provide. */
  def q175LargestRemainder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Tables.customer(spark, dir)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
    Analytics.largestRemainderAlloc(w, "c_nationkey", "n_cust", 1000L)
      .orderBy($"c_nationkey")
  }

  // ------------------------------------------------ q179 Kendall tau

  /** Kendall tau-a vs time ([[Series.kendallTauBp]]): the rank-based
    * monotone-trend test on each event type's daily-count series — q165's
    * Theil–Sen gives the robust slope, this gives the robust direction
    * strength, on the same collapsed series. */
  def q179Kendall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("x"))
    Series.kendallTauBp(daily, "event_type", "d", "x")
      .orderBy($"event_type")
  }

  // ------------------------------------------------- q186 OHLC bars

  /** 6-hour OHLC bars per event type ([[Series.ohlcBars]]): open/close
    * picked by `min_by`/`max_by` over (ts, event_id) so timestamp ties
    * are deterministic, values in exact cents — the candlestick
    * downsampling primitive as one combiner-friendly aggregation. */
  def q186Ohlc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_type", unix_micros($"ts").as("us"), $"event_id",
        Series.cents($"value").as("vc"))
    Series.ohlcBars(e, "event_type", "us", "event_id", "vc",
        bucketUs = 21600000000L)
      .orderBy($"event_type", $"bucket")
  }

  // -------------------------------------------- q187 rolling slope

  /** Trailing-7-day rolling OLS slope of each event type's daily count
    * ([[Series.rollingSlopeBp]]) — q125's grouped regression turned into
    * a moving trend indicator; the first 6 days regress on their shorter
    * prefix, a single-day frame is NULL. */
  def q187RollingSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("x"))
    Series.rollingSlopeBp(daily, "event_type", "d", "x", n = 7)
      .orderBy($"event_type", $"d")
  }

  // ----------------------------------------- q188 seasonal anomaly

  /** Seasonal-residual anomaly flags: each (event_type, day) count vs
    * the type's floored day-of-week mean; days deviating more than 20%
    * from their weekday baseline surface with their residual. The q170
    * seasonal profile turned into a per-day screen — the detrended twin
    * of q115's rolling-window anomaly. */
  def q188SeasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .groupBy($"event_type", $"d").agg(count(lit(1)).as("x"))
    val means = daily.select($"event_type", ($"d" % 7).as("dow"), $"x")
      .groupBy($"event_type", $"dow")
      .agg(expr("sum(x) div count(1)").as("dow_mean"))
    daily.withColumn("dow", $"d" % 7)
      .join(broadcast(means), Seq("event_type", "dow"))
      .filter(abs($"x" - $"dow_mean") * 100 > $"dow_mean" * 20)
      .select($"event_type", $"d", $"dow", $"x", $"dow_mean",
        ($"x" - $"dow_mean").as("resid"))
      .orderBy($"event_type", $"d")
  }

  // ------------------------------------------------------ q195 NDCG@10

  /** NDCG@10 per market segment ([[Mining.ndcgAtK]]): graded relevance
    * rel = c_custkey mod 4, system ranking by (acctbal desc, custkey),
    * ideal ranking by (rel desc, custkey). The discount table is the
    * literal round(10⁶/log₂(i+1)) row shared verbatim with the oracle —
    * no engine evaluates a logarithm. */
  def q195Ndcg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rel = $"c_custkey" % 4
    Mining.ndcgAtK(Tables.customer(spark, dir), "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey".asc),
        Seq(($"c_custkey" % 4).desc, $"c_custkey".asc),
        rel, k = 10, weights = NdcgWeights)
      .orderBy($"c_mktsegment")
  }

  /** round(10⁶ / log₂(i+1)) for i = 1..10 — the cross-engine literal. */
  private val NdcgWeights = Seq(1000000L, 630930L, 500000L, 430677L,
    386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  // ------------------------------------------------- q412 ERR

  /** Expected Reciprocal Rank ([[Mining.errAtK]]) of each order's
    * price-ranked lineitems with graded relevance `l_partkey mod 4`:
    * the cascade-model serving metric where an early relevant hit
    * shades everything ranked below it — the stop-probability
    * complement to q195's positional-discount NDCG, integer-exact via
    * dyadic stop probabilities scaled by lcm(1..k)·8^k. */
  def q412Err(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", ($"l_partkey" % 4).as("g"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"c".desc, $"l_linenumber".asc)
    val ranked = li.withColumn("rnk", row_number().over(w))
    Mining.errAtK(ranked, "l_orderkey", "rnk", $"g", k = 7, gmax = 3)
      .orderBy($"l_orderkey")
  }

  // ------------------------------------------------- q196 l-diversity

  /** l-diversity audit ([[Privacy.lDiversity]]) over the q148 QI grid
    * (nation × segment) with a synthetic categorical sensitive attribute
    * (custkey mod 5), l = 3: the homogeneity check k-anonymity misses. */
  def q196Ldiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Privacy.lDiversity(
        Tables.customer(spark, dir).withColumn("sens", $"c_custkey" % 5),
        Seq("c_nationkey", "c_mktsegment"), "sens", l = 3)
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  /** Grouped 2-feature OLS ([[Mining.ols2]]): amount regressed on
    * day-of-week and a bounded hour-like code per event type — exact
    * Cramer's-rule coefficients, the multivariate sibling of q125. */
  def q261Ols2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type",
        (datediff(to_date($"ts"), to_date(lit("1970-01-01"))) % 7).as("x1"),
        ($"event_id" % 24).as("x2"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y"))
    Mining.ols2(e, "event_type", "x1", "x2", "y")
      .orderBy($"event_type")
  }

  /** t-closeness over the q148/q196 quasi-identifier groups
    * ([[Privacy.tCloseness]]): total-variation distance between each
    * group's sensitive-value distribution and the global one as an exact
    * fraction + basis points — the release audit's third rung. */
  def q254Tcloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Privacy.tCloseness(
        Tables.customer(spark, dir).withColumn("sens", $"c_custkey" % 5),
        Seq("c_nationkey", "c_mktsegment"), "sens")
      .select($"c_nationkey", $"c_mktsegment", $"n_group", $"n_total",
        $"t_num".cast("long").as("t_num"),
        $"t_den".cast("long").as("t_den"), $"t_bp")
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  // ------------------------------------------- q200 precision/recall@k

  /** P@20 / R@20 per segment ([[Mining.precisionRecallAtK]]) with the q128
    * relevance marker — the set-retrieval counterpart of MRR and NDCG. */
  def q200PrecRecallK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.precisionRecallAtK(Tables.customer(spark, dir), "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey".asc),
        $"c_custkey" % 13 === 0, k = 20)
      .orderBy($"c_mktsegment")
  }

  // ---------------------------------------------- q201 ingestion gaps

  /** Gap report ([[Series.gapReport]]) over a sparse deterministic slice
    * of events (event_id mod 97 = 0): contiguous missing-day runs per
    * event type — where the feed went dark, and for how long. */
  def q201GapReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .filter($"event_id" % 97 === 0)
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit("1970-01-01"))).as("d"))
    Series.gapReport(days, "event_type", "d")
      .orderBy($"event_type", $"gap_start")
  }

  // ---------------------------------------------- q202 confusion / F1

  /** Confusion counts + precision/recall/F1 bp per segment
    * ([[Mining.confusionStats]]): pred = positive balance, truth =
    * custkey mod 3 = 0 — the threshold-eval table beside AUC (q140),
    * calibration (q141), and kappa (q142). */
  def q202ConfusionF1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.confusionStats(Tables.customer(spark, dir), "c_mktsegment",
        $"c_acctbal" > 0, $"c_custkey" % 3 === 0)
      .orderBy($"c_mktsegment")
  }

  // ------------------------------------------------ q207 2D histogram

  /** Hour-of-day × value-decile heatmap grid over events: global value
    * bounds ride a broadcast one-row aggregate (the scalar crossJoin
    * family), bins are exact integer arithmetic, one combiner-friendly
    * (hour, bin) shuffle — the 2D extension of q93's dynamic histogram. */
  def q207Histogram2d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select(
      expr("(unix_micros(ts) div 3600000000L) % 24").as("hour"),
      Series.cents($"value").as("cents"))
    val stats = e.agg(min($"cents").as("lo"), max($"cents").as("hi"))
    e.crossJoin(broadcast(stats))
      .select($"hour", expr("((cents - lo) * 10) div (hi - lo + 1)").as("bin"))
      .groupBy($"hour", $"bin").agg(count(lit(1)).as("n"))
      .orderBy($"hour", $"bin")
  }

  // -------------------------------------- q210 reference percentile

  /** Each non-BUILDING customer's balance percentile within their
    * nation's BUILDING cohort ([[Analytics.referencePercentile]]) — the
    * benchmark-calibration primitive, computed joinlessly by one
    * union-sorted running count per nation. */
  def q210RefPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select($"c_nationkey", $"c_custkey",
      round($"c_acctbal" * 100).cast("long").as("cents"), $"c_mktsegment")
    Analytics.referencePercentile(c, "c_nationkey", "c_custkey", "cents",
        $"c_mktsegment" === "BUILDING")
      .orderBy($"c_custkey")
  }

  // ------------------------------------------------ q211 proration

  /** Revenue calendarization ([[Analytics.prorateSpan]]): each sampled
    * line item's value spreads EXACTLY (Hamilton day allocation) across
    * its order→ship span, rolled up to calendar months — recognized
    * revenue per month, conserving every cent. */
  def q211Proration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val epoch = to_date(lit("1970-01-01"))
    val li = Tables.lineitem(spark, dir)
      .filter($"l_orderkey" % 20 === 0)
      .select($"l_orderkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"),
        datediff(to_date($"l_shipdate"), epoch).cast("long").as("ship_d"))
    val o = Tables.orders(spark, dir).select($"o_orderkey",
      datediff(to_date($"o_orderdate"), epoch).cast("long").as("ord_d"))
    val spans = li.join(o, $"l_orderkey" === $"o_orderkey")
      .filter($"ship_d" >= $"ord_d")
      .select($"cents", $"ord_d".as("start_d"), $"ship_d".as("end_d"))
    Analytics.prorateSpan(spans, "cents", "start_d", "end_d")
      .withColumn("_dt", expr("date_add(DATE'1970-01-01', CAST(day AS INT))"))
      .select((year($"_dt") * 12 + month($"_dt")).cast("long").as("month"),
        $"day_cents")
      .groupBy($"month")
      .agg(sum($"day_cents").cast("long").as("month_cents"))
      .orderBy($"month")
  }

  /** Decision stump over spend ([[Mining.bestSplit]]): per user cohort,
    * the whole-euro spend threshold that best separates purchases from
    * the other event types under exact weighted Gini impurity — the
    * split-finder primitive behind tree induction and feature triage. */
  def q274BestSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        expr("CAST(round(value * 100) AS BIGINT) div 100").as("v"),
        $"event_type")
    Mining.bestSplit(e, "cohort", "v", $"event_type" === "purchase")
      .orderBy($"cohort")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q458_join_card_audit" -> q458JoinCardAudit _,
    "q460_doubly_robust" -> q460DoublyRobust _,
    "q412_err" -> q412Err _,
    "q210_ref_percentile" -> q210RefPercentile _,
    "q211_proration" -> q211Proration _,
    "q207_histogram_2d" -> q207Histogram2d _,
    "q200_prec_recall_k" -> q200PrecRecallK _,
    "q201_gap_report" -> q201GapReport _,
    "q202_confusion_f1" -> q202ConfusionF1 _,
    "q195_ndcg" -> q195Ndcg _,
    "q196_ldiversity" -> q196Ldiversity _,
    "q254_tcloseness" -> q254Tcloseness _,
    "q261_ols2" -> q261Ols2 _,
    "q274_best_split" -> q274BestSplit _,
    "q186_ohlc" -> q186Ohlc _,
    "q187_rolling_slope" -> q187RollingSlope _,
    "q188_seasonal_anomaly" -> q188SeasonalAnomaly _,
    "q179_kendall" -> q179Kendall _,
    "q174_interpolate" -> q174Interpolate _,
    "q175_largest_remainder" -> q175LargestRemainder _,
    "q169_weighted_median" -> q169WeightedMedian _,
    "q170_dow_seasonal" -> q170DowSeasonal _,
    "q171_gini_coef" -> q171GiniCoef _,
    "q165_theilsen" -> q165Theilsen _,
    "q163_negative_sample" -> q163NegativeSample _,
    "q158_semdedup" -> q158Semdedup _,
    "q157_cusum" -> q157Cusum _,
    "q156_acf" -> q156Acf _,
    "q153_bigram_surprisal" -> q153BigramSurprisal _,
    "q152_shard_balance" -> q152ShardBalance _,
    "q151_vocab_coverage" -> q151VocabCoverage _,
    "q150_curriculum" -> q150Curriculum _,
    "q149_quantile_norm" -> q149QuantileNorm _,
    "q148_kanon" -> q148Kanon _,
    "q146_basket_lift" -> q146BasketLift _,
    "q145_entropy" -> q145Entropy _,
    "q144_corr" -> q144Corr _,
    "q143_rrf" -> q143Rrf _,
    "q142_kappa" -> q142Kappa _,
    "q141_calibration" -> q141Calibration _,
    "q241_isotonic" -> q241Isotonic _,
    "q140_auc" -> q140Auc _,
    "q139_purged_split" -> q139PurgedSplit _,
    "q138_percentile_rank" -> q138PercentileRank _,
    "q137_mixture_sample" -> q137MixtureSample _,
    "q136_surprisal" -> q136Surprisal _,
    "q135_equidepth" -> q135EquidepthHistogram _,
    "q130_chi2" -> q130Chi2 _,
    "q131_drift" -> q131Drift _,
    "q132_dup_spans" -> q132DupSpans _,
    "q133_rolling_median" -> q133RollingMedian _,
    "q134_incremental_dedup" -> q134IncrementalDedup _,
    "q124_bloom_join" -> q124BloomJoin _,
    "q125_grouped_slope" -> q125GroupedSlope _,
    "q126_gini" -> q126Gini _,
    "q127_set_jaccard" -> q127SetJaccard _,
    "q128_mrr" -> q128Mrr _,
    "q129_kmeans" -> q129Kmeans _,
    "q278_cluster_quality" -> q278ClusterQuality _,
    "q280_ips_eval" -> q280IpsEval _,
    "q283_gen_ladder" -> q283GenLadder _,
    "q287_nb_classify" -> q287NbClassify _,
    "q295_cost_threshold" -> q295CostThreshold _,
    "q284_var_alloc" -> q284VarAlloc _,
    "q304_microaggregate" -> q304Microaggregate _,
    "q306_lift_curve" -> q306LiftCurve _,
    "q307_avg_precision" -> q307AvgPrecision _,
    "q316_qini_curve" -> q316QiniCurve _)

  /** Microaggregation ([[graft.etl.Privacy.microaggregate]]) of order
    * totals within market segment at k = 10: every published amount is
    * a ≥10-record run mean — the k-anonymity TRANSFORM the q283 ladder
    * only audits for. Sampled to the keys ending in 0 to keep the
    * per-row output driver-friendly. */
  def q304Microaggregate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .filter($"o_orderkey" % 10 === 0)
      .select($"c_mktsegment".as("seg"), $"o_orderkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    graft.etl.Privacy.microaggregate(o, "seg", "o_orderkey", "cents",
        k = 10)
      .orderBy($"seg", $"o_orderkey")
  }

  /** Minimal-generalization search
    * ([[graft.etl.Privacy.generalizationLadder]]) over a three-level
    * customer QI ladder (nation+segment+balance-band → nation+segment →
    * segment), k = 25: which coarsening first makes the release
    * k-anonymous, and how much row mass each finer level exposes. The
    * balance band shifts +100000 before the floor division so negative
    * balances never hit the truncate-vs-floor divergence. */
  def q283GenLadder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir).select($"c_nationkey",
      $"c_mktsegment",
      expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 100000) div 100000")
        .as("band"))
    graft.etl.Privacy.generalizationLadder(c,
        Seq(Seq("c_nationkey", "c_mktsegment", "band"),
          Seq("c_nationkey", "c_mktsegment"), Seq("c_mktsegment")),
        k = 25)
      .orderBy($"level")
  }

  /** Cost-optimal alert threshold ([[Mining.bestThreshold]]): per user
    * cohort, the spend cutoff above which flagging an event as a
    * purchase minimizes 1·FP + 5·FN — the asymmetric-cost DECISION step
    * downstream of q140's AUC and q202's confusion counts. */
  def q295CostThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select(($"user_id" % 4).as("cohort"),
        expr("CAST(round(value * 100) AS BIGINT)").as("s"),
        $"event_type")
    Mining.bestThreshold(e, "cohort", "s", $"event_type" === "purchase",
        costFp = 1L, costFn = 5L)
      .orderBy($"cohort")
  }

  /** Naive Bayes language classifier ([[Mining.nbTextConfusion]]):
    * train per-language unigram models on the labeled corpus, classify
    * every document by floored-log₂ score, and report the 5×5
    * resubstitution confusion matrix — the learned counterpart of q30's
    * heuristic language ID, as one declarative plan. */
  def q287NbClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.nbTextConfusion(Tables.documents(spark, dir), "doc_id", "text",
        "lang")
      .orderBy($"true_lang", $"pred_lang")
  }

  /** Variance-proportional annotation-budget split
    * ([[graft.etl.Corpus.varianceAllocation]]): 10,000 labeling slots
    * across event types weighted by each type's exact amount variance —
    * allocations sum to the budget exactly via largest remainder. */
  def q284VarAlloc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).filter($"value".isNotNull)
      .select($"event_type",
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    graft.etl.Corpus.varianceAllocation(e, "event_type", "v",
        budget = 10000L)
      .orderBy($"event_type")
  }

  /** Off-policy eval ([[Mining.ipsEval]]) of the deterministic policy
    * π(user) = (user_id+1) mod 3 against logged actions event_id mod 3
    * with power-of-two propensities (w = 2^action): per user-context
    * cohort the exact IPS and SNIPS estimates of the purchase rate the
    * new policy WOULD have achieved on last month's log. */
  /** Join-cardinality ESTIMATOR audit: per hash bucket of l_partkey,
    * the optimizer-style uniform-per-key self-join estimate n²/d (n
    * rows, d distinct keys) against the exact Σc² output cardinality,
    * error in bp — the audit that tells a shuffle planner WHERE the
    * uniformity assumption its sizing rests on breaks (a skewed bucket
    * under-estimates, so its reducer blows past the plan). One groupBy
    * per key + one per bucket, every quantity a nonnegative integer. */
  def q458JoinCardAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .select(($"l_partkey" % 64).as("bucket"), $"c")
    k.groupBy($"bucket")
      .agg(sum($"c").as("n_rows"), count(lit(1)).as("n_keys"),
        sum($"c" * $"c").as("exact_pairs"))
      .withColumn("est_pairs", expr("(n_rows * n_rows) div n_keys"))
      .withColumn("err_bp",
        expr("abs(est_pairs - exact_pairs) * 10000 div exact_pairs"))
      .orderBy($"bucket")
  }

  def q280IpsEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir).select(
      ($"user_id" % 3).as("context"),
      ($"event_id" % 3).as("action"),
      when($"event_type" === "purchase", 1L).otherwise(0L).as("r"),
      expr("shiftleft(1L, CAST(event_id % 3 AS INT))").as("w"))
    Mining.ipsEval(e, "context",
        ($"context" + 1) % 3 === $"action", $"r", $"w")
      .orderBy($"context")
  }

  /** Doubly-robust off-policy value estimate on the q280 logging
    * scenario: DR(x) = q̂(x, π(x)) + 1{a=π(x)}·w·(r − q̂(x,a)) with the
    * direct model q̂ the empirical cell mean (milli) from the same
    * logs — the estimator that stays consistent if EITHER the
    * propensities (w) or the model (q̂) is right, next to q280's
    * IPS/SNIPS which need the propensities alone. The per-row
    * correction is bounded below by −w_max·1000 = −4000 milli, so the
    * final mean shifts by +4000 before the floor division and back
    * after — every division in both engines stays on nonnegative
    * operands. Cell means broadcast (≤9 rows); one shuffle total. */
  def q460DoublyRobust(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"user_id".isNotNull && $"user_id" >= 0)
      .select(($"user_id" % 3).as("context"),
        ($"event_id" % 3).as("action"),
        when($"event_type" === "purchase", 1000L).otherwise(0L)
          .as("r_milli"),
        expr("shiftleft(1L, CAST(event_id % 3 AS INT))").as("w"))
    val qhat = e.groupBy($"context", $"action")
      .agg(expr("sum(r_milli) div count(1)").as("q_milli"))
    val tgt = qhat.filter($"action" === ($"context" + 1) % 3)
      .select($"context", $"q_milli".as("q_pi"))
    val sc = e
      .join(broadcast(qhat), Seq("context", "action"), "left")
      .join(broadcast(tgt), Seq("context"), "left")
      .select($"context", coalesce($"q_pi", lit(0L)).as("q_pi"),
        (coalesce($"q_pi", lit(0L)) +
          when($"action" === ($"context" + 1) % 3,
            $"w" * ($"r_milli" - coalesce($"q_milli", lit(0L))))
            .otherwise(0L)).as("contrib"))
    sc.groupBy($"context")
      .agg(count(lit(1)).as("n"), max($"q_pi").as("dm_milli"),
        sum($"contrib").as("num"))
      .withColumn("dr_milli",
        expr("(num + 4000 * n) div n - 4000"))
      .select($"context", $"n", $"dm_milli", $"dr_milli")
      .orderBy($"context")
  }

  /** Cluster-quality report ([[Mining.clusterQuality]]) over the q129
    * embedding clustering: per cluster the exact dispersion, the nearest
    * foreign centroid, and the Dunn-style separation ratio — the
    * go/no-go screen before trusting the partitioning for SemDeDup
    * pruning or IVF bucketing. */
  def q278ClusterQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Mining.clusterQuality(Tables.embeddings(spark, dir), "vec_id",
        "embedding", k = 8)
      .orderBy($"cluster")
  }

  val oracleSql: Map[String, String] = Map(
    "q458_join_card_audit" -> """
      |WITH k AS (
      |  SELECT l_partkey % 64 AS bucket, count(*) AS c
      |  FROM lineitem GROUP BY l_partkey),
      |per AS (
      |  SELECT bucket, sum(c) AS n_rows, count(*) AS n_keys,
      |    sum(c * c) AS exact_pairs
      |  FROM k GROUP BY 1)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |  CAST(n_rows AS BIGINT) AS n_rows,
      |  CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST(exact_pairs AS BIGINT) AS exact_pairs,
      |  CAST((n_rows * n_rows) // n_keys AS BIGINT) AS est_pairs,
      |  CAST(abs((n_rows * n_rows) // n_keys - exact_pairs) * 10000
      |    // exact_pairs AS BIGINT) AS err_bp
      |FROM per ORDER BY bucket""".stripMargin,
    "q460_doubly_robust" -> """
      |WITH e AS (
      |  SELECT user_id % 3 AS context, event_id % 3 AS action,
      |    CASE WHEN event_type = 'purchase' THEN 1000 ELSE 0 END
      |      AS r_milli,
      |    (CAST(1 AS BIGINT) << CAST(event_id % 3 AS INTEGER)) AS w
      |  FROM events WHERE user_id IS NOT NULL AND user_id >= 0),
      |qhat AS (SELECT context, action,
      |           sum(r_milli) // count(*) AS q_milli
      |         FROM e GROUP BY 1, 2),
      |tgt AS (SELECT context, q_milli AS q_pi FROM qhat
      |        WHERE action = (context + 1) % 3),
      |sc AS (
      |  SELECT e.context, coalesce(t.q_pi, 0) AS q_pi,
      |    coalesce(t.q_pi, 0)
      |      + CASE WHEN e.action = (e.context + 1) % 3
      |          THEN e.w * (e.r_milli - coalesce(q.q_milli, 0))
      |          ELSE 0 END AS contrib
      |  FROM e
      |  LEFT JOIN qhat q ON q.context = e.context AND q.action = e.action
      |  LEFT JOIN tgt t ON t.context = e.context)
      |SELECT CAST(context AS BIGINT) AS context,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(q_pi) AS BIGINT) AS dm_milli,
      |  CAST((sum(contrib) + 4000 * count(*)) // count(*) - 4000
      |    AS BIGINT) AS dr_milli
      |FROM sc GROUP BY context ORDER BY context""".stripMargin,
    "q412_err" -> """
      |WITH r AS (
      |  SELECT l_orderkey AS g, l_partkey % 4 AS grade,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
      |        l_linenumber) AS rnk
      |  FROM lineitem),
      |d AS (
      |  SELECT g, rnk,
      |    (CAST(1 AS BIGINT) << CAST(grade AS INTEGER)) - 1 AS rnum,
      |    8 - ((CAST(1 AS BIGINT) << CAST(grade AS INTEGER)) - 1) AS nstop
      |  FROM r WHERE rnk <= 7),
      |p AS (
      |  SELECT g, rnk, rnum,
      |    CAST(coalesce(product(nstop) OVER (PARTITION BY g ORDER BY rnk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1)
      |      AS BIGINT) AS pre
      |  FROM d),
      |t AS (
      |  SELECT g, count(*) AS n_ranked,
      |    sum((2520 // rnk) * rnum * pre
      |      * (CAST(1 AS BIGINT) << ((7 - rnk) * 3))) AS e
      |  FROM p GROUP BY 1)
      |SELECT g AS l_orderkey, CAST(n_ranked AS BIGINT) AS n_ranked,
      |  CAST(CAST(e AS HUGEINT) * 1000000
      |    // (2520 * CAST(2097152 AS BIGINT)) AS BIGINT) AS err_ppm
      |FROM t ORDER BY l_orderkey""".stripMargin,
    "q316_qini_curve" -> """
      |WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS t,
      |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS l
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, t, l, ntile(10) OVER (PARTITION BY event_type
      |    ORDER BY cents DESC, event_id) AS bin
      |  FROM e),
      |b AS (
      |  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(t) AS BIGINT) AS n_t,
      |    CAST(sum(1 - t) AS BIGINT) AS n_c,
      |    CAST(sum(t * l) AS BIGINT) AS pos_t,
      |    CAST(sum((1 - t) * l) AS BIGINT) AS pos_c
      |  FROM r GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, bin, n,
      |    CAST(sum(n_t) OVER w AS BIGINT) AS cum_n_t,
      |    CAST(sum(n_c) OVER w AS BIGINT) AS cum_n_c,
      |    CAST(sum(pos_t) OVER w AS BIGINT) AS cum_pos_t,
      |    CAST(sum(pos_c) OVER w AS BIGINT) AS cum_pos_c
      |  FROM b
      |  WINDOW w AS (PARTITION BY event_type ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, bin, n, cum_n_t, cum_n_c, cum_pos_t, cum_pos_c,
      |  CAST(cum_pos_t * 1000 -
      |    CAST(CAST(cum_pos_c AS HUGEINT) * cum_n_t * 1000
      |      // NULLIF(cum_n_c, 0) AS BIGINT) AS BIGINT) AS qini_milli
      |FROM c ORDER BY 1, 2""".stripMargin,
    "q306_lift_curve" -> """
      |WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS l
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, l, ntile(10) OVER (PARTITION BY event_type
      |    ORDER BY cents DESC, event_id) AS bin
      |  FROM e),
      |b AS (
      |  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(l) AS BIGINT) AS n_pos
      |  FROM r GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, bin, n, n_pos,
      |    CAST(sum(n) OVER w AS BIGINT) AS cum_n,
      |    CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
      |    CAST(sum(n) OVER wa AS BIGINT) AS tot_n,
      |    CAST(sum(n_pos) OVER wa AS BIGINT) AS tot_pos
      |  FROM b
      |  WINDOW w AS (PARTITION BY event_type ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wa AS (PARTITION BY event_type))
      |SELECT event_type, bin, n, n_pos, cum_n, cum_pos,
      |  CAST(cum_pos * 10000 // NULLIF(tot_pos, 0) AS BIGINT) AS gain_bp,
      |  CAST(CAST(cum_pos AS HUGEINT) * tot_n * 10000
      |    // NULLIF(CAST(cum_n AS HUGEINT) * tot_pos, 0) AS BIGINT)
      |    AS lift_bp
      |FROM c ORDER BY 1, 2""".stripMargin,
    "q307_avg_precision" -> """
      |WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS l
      |  FROM events WHERE value IS NOT NULL),
      |r AS (
      |  SELECT event_type, l,
      |    CAST(row_number() OVER wk AS BIGINT) AS k,
      |    CAST(sum(l) OVER wk AS BIGINT) AS tp
      |  FROM e
      |  WINDOW wk AS (PARTITION BY event_type
      |    ORDER BY cents DESC, event_id))
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(l) AS BIGINT) AS n_pos,
      |  CAST(sum(CASE WHEN l = 1 THEN tp * 1000000 // k ELSE 0 END)
      |    // NULLIF(sum(l), 0) AS BIGINT) AS ap_ppm
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q274_best_split" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |         CAST(round(value * 100) AS BIGINT) // 100 AS v,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events WHERE value IS NOT NULL),
      |cell AS (
      |  SELECT cohort, v, count(*) AS c, sum(y) AS p
      |  FROM x GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, v,
      |    CAST(sum(c) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS tl,
      |    CAST(sum(p) OVER (PARTITION BY cohort ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS pl,
      |    CAST(sum(c) OVER (PARTITION BY cohort) AS BIGINT) AS t,
      |    CAST(sum(p) OVER (PARTITION BY cohort) AS BIGINT) AS p
      |  FROM cell),
      |scored AS (
      |  SELECT cohort, v, tl, pl, t, p,
      |    CAST((
      |      (CAST(tl AS HUGEINT) * tl - CAST(pl AS HUGEINT) * pl
      |         - CAST(tl - pl AS HUGEINT) * (tl - pl)) * (t - tl)
      |      + (CAST(t - tl AS HUGEINT) * (t - tl)
      |         - CAST(p - pl AS HUGEINT) * (p - pl)
      |         - CAST((t - tl) - (p - pl) AS HUGEINT)
      |           * ((t - tl) - (p - pl))) * tl
      |    ) * 1000000 // (CAST(tl AS HUGEINT) * (t - tl) * t) AS BIGINT)
      |      AS score_ppm
      |  FROM cum WHERE tl < t),
      |sel AS (SELECT cohort, min(score_ppm) AS s FROM scored GROUP BY 1),
      |best AS (
      |  SELECT scored.cohort, min(v) AS threshold, s AS score_ppm
      |  FROM scored JOIN sel
      |    ON scored.cohort = sel.cohort AND score_ppm = s
      |  GROUP BY scored.cohort, s),
      |ctx AS (
      |  SELECT cohort, max(t) AS n, max(p) AS n_pos FROM cum GROUP BY 1)
      |SELECT b.cohort, b.threshold, b.score_ppm, ctx.n, ctx.n_pos,
      |  sc.tl AS n_left, sc.pl AS pos_left
      |FROM best b
      |JOIN ctx ON ctx.cohort = b.cohort
      |JOIN scored sc ON sc.cohort = b.cohort AND sc.v = b.threshold
      |ORDER BY b.cohort""".stripMargin,
    "q210_ref_percentile" -> """
      |WITH c AS (SELECT c_nationkey, c_custkey,
      |        CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
      |        CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ref
      |      FROM customer),
      |w AS (SELECT c_nationkey, c_custkey, cents, ref,
      |        CAST(sum(ref) OVER (PARTITION BY c_nationkey
      |          ORDER BY cents, ref DESC, c_custkey
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS le,
      |        CAST(sum(ref) OVER (PARTITION BY c_nationkey) AS BIGINT)
      |          AS nref
      |      FROM c)
      |SELECT c_nationkey, c_custkey, cents,
      |  le * 10000 // NULLIF(nref, 0) AS pct_bp
      |FROM w WHERE ref = 0 ORDER BY c_custkey""".stripMargin,
    "q211_proration" -> """
      |WITH li AS (SELECT l_orderkey,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |        date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
      |          AS ship_d
      |      FROM lineitem WHERE l_orderkey % 20 = 0),
      |o AS (SELECT o_orderkey,
      |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |          AS ord_d
      |      FROM orders),
      |s AS (SELECT cents, ord_d AS sd, ship_d - ord_d + 1 AS n
      |      FROM li JOIN o ON l_orderkey = o_orderkey
      |      WHERE ship_d >= ord_d),
      |d AS (SELECT sd + i AS day,
      |        cents // n + (CASE WHEN i < cents % n THEN 1 ELSE 0 END) AS dc
      |      FROM s, LATERAL (SELECT unnest(generate_series(0,
      |        CAST(n - 1 AS BIGINT))) AS i) g)
      |SELECT CAST(year(DATE '1970-01-01' + CAST(day AS INTEGER)) * 12
      |    + month(DATE '1970-01-01' + CAST(day AS INTEGER)) AS BIGINT)
      |    AS month,
      |  CAST(sum(dc) AS BIGINT) AS month_cents
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q207_histogram_2d" -> """
      |WITH e AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
      |        CAST(round(value * 100) AS BIGINT) AS cents
      |      FROM events),
      |st AS (SELECT min(cents) AS lo, max(cents) AS hi FROM e)
      |SELECT hour, ((cents - lo) * 10) // (hi - lo + 1) AS bin,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM e, st GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q200_prec_recall_k" -> """
      |WITH r AS (SELECT c_mktsegment, c_custkey % 13 = 0 AS rel,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |          ORDER BY c_acctbal DESC, c_custkey) AS rk
      |      FROM customer),
      |g AS (SELECT c_mktsegment,
      |        CAST(least(count(*), 20) AS BIGINT) AS k_eff,
      |        CAST(sum(CASE WHEN rk <= 20 AND rel THEN 1 ELSE 0 END)
      |          AS BIGINT) AS rel_in_topk,
      |        CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
      |          AS n_relevant
      |      FROM r GROUP BY 1)
      |SELECT c_mktsegment, k_eff, rel_in_topk, n_relevant,
      |  rel_in_topk * 10000 // k_eff AS precision_bp,
      |  rel_in_topk * 10000 // NULLIF(n_relevant, 0) AS recall_bp
      |FROM g ORDER BY 1""".stripMargin,
    "q201_gap_report" -> """
      |WITH obs AS (SELECT DISTINCT event_type,
      |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      |      FROM events WHERE event_id % 97 = 0),
      |spans AS (SELECT event_type, min(d) AS lo, max(d) AS hi
      |          FROM obs GROUP BY 1),
      |grid AS (SELECT event_type, unnest(generate_series(lo, hi)) AS d
      |         FROM spans),
      |miss AS (SELECT g.event_type, g.d FROM grid g
      |         LEFT JOIN obs ON obs.event_type = g.event_type
      |                      AND obs.d = g.d
      |         WHERE obs.d IS NULL),
      |isl AS (SELECT event_type, d,
      |          d - row_number() OVER (PARTITION BY event_type ORDER BY d)
      |            AS grp
      |        FROM miss)
      |SELECT event_type, CAST(min(d) AS BIGINT) AS gap_start,
      |  CAST(max(d) AS BIGINT) AS gap_end,
      |  CAST(count(*) AS BIGINT) AS gap_days
      |FROM isl GROUP BY event_type, grp ORDER BY 1, 2""".stripMargin,
    "q202_confusion_f1" -> """
      |WITH g AS (SELECT c_mktsegment,
      |    CAST(sum(CASE WHEN c_acctbal > 0 AND c_custkey % 3 = 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(sum(CASE WHEN c_acctbal > 0 AND c_custkey % 3 <> 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(sum(CASE WHEN NOT c_acctbal > 0 AND c_custkey % 3 = 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |    CAST(sum(CASE WHEN NOT c_acctbal > 0 AND c_custkey % 3 <> 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
      |  FROM customer GROUP BY 1)
      |SELECT c_mktsegment, tp, fp, fn, tn,
      |  tp * 10000 // NULLIF(tp + fp, 0) AS precision_bp,
      |  tp * 10000 // NULLIF(tp + fn, 0) AS recall_bp,
      |  2 * tp * 10000 // NULLIF(2 * tp + fp + fn, 0) AS f1_bp
      |FROM g ORDER BY 1""".stripMargin,
    "q195_ndcg" -> """
      |WITH w AS (SELECT * FROM (VALUES (1, 1000000), (2, 630930),
      |    (3, 500000), (4, 430677), (5, 386853), (6, 356207),
      |    (7, 333333), (8, 315465), (9, 301030), (10, 289065))
      |    AS t(rk, wt)),
      |r AS (SELECT c_mktsegment, c_custkey % 4 AS rel,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |          ORDER BY c_acctbal DESC, c_custkey) AS rs,
      |        row_number() OVER (PARTITION BY c_mktsegment
      |          ORDER BY (c_custkey % 4) DESC, c_custkey) AS ri
      |      FROM customer),
      |g AS (SELECT c_mktsegment, rs, ri, (1 << rel) - 1 AS gain FROM r),
      |d AS (SELECT c_mktsegment, CAST(sum(wt * gain) AS BIGINT)
      |        AS dcg_scaled FROM g JOIN w ON w.rk = g.rs GROUP BY 1),
      |i AS (SELECT c_mktsegment, CAST(sum(wt * gain) AS BIGINT)
      |        AS idcg_scaled FROM g JOIN w ON w.rk = g.ri GROUP BY 1)
      |SELECT d.c_mktsegment, dcg_scaled, idcg_scaled,
      |  dcg_scaled * 10000 // NULLIF(idcg_scaled, 0) AS ndcg_bp
      |FROM d JOIN i USING (c_mktsegment) ORDER BY 1""".stripMargin,
    "q261_ols2" -> """
      |WITH b AS (
      |  SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS x1,
      |    event_id % 24 AS x2,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL),
      |s AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
      |    CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
      |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
      |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
      |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      |  FROM b GROUP BY 1),
      |d AS (
      |  SELECT event_type, n,
      |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s12 - s11 * s2) AS det,
      |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      |      + s2 * (s1y * s12 - s11 * s2y) AS d0,
      |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      |      + s2 * (s1 * s2y - s1y * s2) AS d1,
      |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      |      + sy * (s1 * s12 - s11 * s2) AS d2
      |  FROM s)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST((d0 * 10000) // NULLIF(det, 0) AS BIGINT) AS b0_scaled,
      |  CAST((d1 * 10000) // NULLIF(det, 0) AS BIGINT) AS b1_scaled,
      |  CAST((d2 * 10000) // NULLIF(det, 0) AS BIGINT) AS b2_scaled
      |FROM d ORDER BY event_type""".stripMargin,
    "q254_tcloseness" -> """
      |WITH base AS (
      |  SELECT c_nationkey, c_mktsegment, c_custkey % 5 AS sens
      |  FROM customer),
      |cell AS (
      |  SELECT c_nationkey, c_mktsegment, sens, count(*) AS c
      |  FROM base GROUP BY 1, 2, 3),
      |grp AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(sum(c) AS BIGINT) AS ng
      |  FROM cell GROUP BY 1, 2),
      |gd AS (SELECT sens, count(*) AS cs FROM base GROUP BY 1),
      |n AS (SELECT count(*) AS nt FROM base),
      |grid AS (
      |  SELECT g.c_nationkey, g.c_mktsegment, g.ng, s.sens, s.cs
      |  FROM grp g CROSS JOIN gd s)
      |SELECT c_nationkey, c_mktsegment, ng AS n_group,
      |  CAST(nt AS BIGINT) AS n_total,
      |  CAST(sum(abs(coalesce(c, 0) * nt - cs * ng)) AS BIGINT) AS t_num,
      |  CAST(2 * ng * nt AS BIGINT) AS t_den,
      |  CAST(sum(abs(coalesce(c, 0) * nt - cs * ng)) * 10000
      |    // (2 * ng * nt) AS BIGINT) AS t_bp
      |FROM grid
      |LEFT JOIN cell USING (c_nationkey, c_mktsegment, sens)
      |CROSS JOIN n
      |GROUP BY c_nationkey, c_mktsegment, ng, nt
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q196_ldiversity" -> """
      |WITH s AS (SELECT c_nationkey, c_mktsegment, c_custkey % 5 AS sens,
      |             count(*) AS sc
      |           FROM customer GROUP BY 1, 2, 3),
      |g AS (SELECT c_nationkey, c_mktsegment, CAST(sum(sc) AS BIGINT) AS n,
      |        CAST(count(*) AS BIGINT) AS l_distinct,
      |        CAST(max(sc) AS BIGINT) AS top_cnt
      |      FROM s GROUP BY 1, 2)
      |SELECT c_nationkey, c_mktsegment, n, l_distinct,
      |  top_cnt * 10000 // n AS top_share_bp,
      |  CASE WHEN l_distinct >= 3 THEN 'ok' ELSE 'violates' END AS diversity
      |FROM g ORDER BY 1, 2""".stripMargin,
    "q186_ohlc" -> """
      |WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id,
      |             CAST(round(value * 100) AS BIGINT) AS vc FROM events),
      |r AS (SELECT event_type, us // 21600000000 AS bucket, us, event_id,
      |             vc FROM e),
      |o AS (SELECT *,
      |    row_number() OVER (PARTITION BY event_type, bucket
      |                       ORDER BY us, event_id) AS ra,
      |    row_number() OVER (PARTITION BY event_type, bucket
      |                       ORDER BY us DESC, event_id DESC) AS rz FROM r)
      |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(CASE WHEN ra = 1 THEN vc END) AS BIGINT) AS open,
      |  CAST(max(vc) AS BIGINT) AS high, CAST(min(vc) AS BIGINT) AS low,
      |  CAST(max(CASE WHEN rz = 1 THEN vc END) AS BIGINT) AS close
      |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q187_rolling_slope" -> """
      |WITH daily AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, d, x,
      |    count(*) OVER win AS cnt, sum(d) OVER win AS sx,
      |    sum(x) OVER win AS sy, sum(d * x) OVER win AS sxy,
      |    sum(d * d) OVER win AS sxx
      |  FROM daily WINDOW win AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT event_type, d, CAST(x AS BIGINT) AS x,
      |  CAST(((cnt * sxy - sx * sy) * 10000) //
      |       NULLIF(cnt * sxx - sx * sx, 0) AS BIGINT) AS slope_bp
      |FROM w ORDER BY 1, 2""".stripMargin,
    "q188_seasonal_anomaly" -> """
      |WITH daily AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, d % 7 AS dow,
      |    CAST(sum(x) // count(*) AS BIGINT) AS dow_mean
      |  FROM daily GROUP BY 1, 2),
      |j AS (SELECT daily.event_type AS event_type, daily.d AS d,
      |    daily.d % 7 AS dow, CAST(daily.x AS BIGINT) AS x,
      |    m.dow_mean AS dow_mean
      |  FROM daily JOIN m ON daily.event_type = m.event_type
      |                   AND daily.d % 7 = m.dow)
      |SELECT event_type, d, dow, x, dow_mean, x - dow_mean AS resid FROM j
      |WHERE abs(x - dow_mean) * 100 > dow_mean * 20
      |ORDER BY event_type, d""".stripMargin,
    "q179_kendall" -> """
      |WITH daily AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |    CASE WHEN b.x > a.x THEN 1 ELSE 0 END AS con,
      |    CASE WHEN b.x < a.x THEN 1 ELSE 0 END AS dis
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d < b.d)
      |SELECT event_type, count(*) AS n_pairs,
      |  CAST(sum(con) AS BIGINT) AS concordant,
      |  CAST(sum(dis) AS BIGINT) AS discordant,
      |  count(*) - CAST(sum(con) AS BIGINT) - CAST(sum(dis) AS BIGINT)
      |    AS ties,
      |  ((CAST(sum(con) AS BIGINT) - CAST(sum(dis) AS BIGINT)) * 10000)
      |    // count(*) AS tau_bp
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q174_interpolate" -> """
      |WITH daily AS (SELECT user_id,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sp AS (SELECT user_id, min(d) AS lo, max(d) AS hi
      |       FROM daily GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS d
      |         FROM sp),
      |j AS (SELECT g.user_id, g.d, daily.x
      |      FROM grid g LEFT JOIN daily
      |        ON daily.user_id = g.user_id AND daily.d = g.d),
      |w AS (SELECT user_id, d, x,
      |    last_value(x IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY d ROWS UNBOUNDED PRECEDING) AS pv,
      |    last_value(CASE WHEN x IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY d
      |            ROWS UNBOUNDED PRECEDING) AS pd,
      |    first_value(x IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY d ROWS BETWEEN CURRENT ROW
      |      AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN x IS NOT NULL THEN d END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY d
      |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j)
      |SELECT user_id, d AS day,
      |  CASE WHEN x IS NOT NULL THEN x
      |       ELSE pv + ((nv - pv) * (d - pd)) // (nd - pd) END AS x_fill,
      |  CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END AS is_obs
      |FROM w ORDER BY 1, 2""".stripMargin,
    "q175_largest_remainder" -> """
      |WITH w AS (SELECT c_nationkey, count(*) AS n_cust
      |           FROM customer GROUP BY 1),
      |t AS (SELECT CAST(sum(n_cust) AS BIGINT) AS tw FROM w),
      |b AS (SELECT c_nationkey, n_cust,
      |        (n_cust * 1000) // tw AS fl, (n_cust * 1000) % tw AS rem
      |      FROM w CROSS JOIN t),
      |l AS (SELECT 1000 - CAST(sum(fl) AS BIGINT) AS lv FROM b),
      |r AS (SELECT c_nationkey, n_cust, fl,
      |        row_number() OVER (ORDER BY rem DESC, c_nationkey) AS rk
      |      FROM b)
      |SELECT c_nationkey, n_cust AS weight,
      |  CAST(fl + CASE WHEN rk <= lv THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM r CROSS JOIN l ORDER BY 1""".stripMargin,
    "q169_weighted_median" -> """
      |WITH li AS (SELECT l_returnflag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(round(l_quantity) AS BIGINT) AS qty,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (SELECT l_returnflag, price_c, qty,
      |    CAST(sum(qty) OVER (PARTITION BY l_returnflag
      |      ORDER BY price_c, l_orderkey, l_linenumber
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
      |    CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
      |  FROM li)
      |SELECT l_returnflag, totw AS total_weight, price_c AS w_median
      |FROM c WHERE cumw * 2 >= totw AND (cumw - qty) * 2 < totw
      |ORDER BY 1""".stripMargin,
    "q170_dow_seasonal" -> """
      |WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |    CAST(ts AS DATE)) AS d, count(*) AS x
      |  FROM events GROUP BY 1),
      |s AS (SELECT d % 7 AS dow, x FROM daily),
      |m AS (SELECT dow, count(*) AS n_days,
      |    CAST(sum(x) AS BIGINT) // count(*) AS dow_mean
      |  FROM s GROUP BY 1)
      |SELECT m.dow, n_days, dow_mean,
      |  max(abs(x - dow_mean)) AS max_abs_resid
      |FROM s JOIN m ON s.dow = m.dow
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q171_gini_coef" -> """
      |WITH o AS (SELECT o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x, o_orderkey
      |  FROM orders),
      |r AS (SELECT o_orderpriority, x,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY x, o_orderkey) AS i
      |  FROM o),
      |a AS (SELECT o_orderpriority, count(*) AS n,
      |    CAST(sum(x) AS HUGEINT) AS s,
      |    sum(CAST(i AS HUGEINT) * x) AS i_s
      |  FROM r GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  CAST((((2 * i_s) - ((n + 1) * s)) * 10000) // (n * s) AS BIGINT)
      |    AS gini_bp
      |FROM a ORDER BY 1""".stripMargin,
    "q165_theilsen" -> """
      |WITH daily AS (SELECT event_type,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT a.event_type,
      |    ((b.x - a.x) * 10000) // (b.d - a.d) AS slope_bp,
      |    a.d AS t1, b.d AS t2
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.d < b.d),
      |r AS (SELECT event_type, slope_bp,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY slope_bp, t1, t2) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM p)
      |SELECT event_type, n AS n_pairs, slope_bp
      |FROM r WHERE rn = (n + 1) // 2 ORDER BY 1""".stripMargin,
    "q163_negative_sample" -> """
      |WITH mx AS (SELECT max(p_partkey) AS m FROM part),
      |cand AS (
      |  SELECT c_custkey, i AS sample_idx,
      |    ((c_custkey % 2147483648) * 2654435761 + i * 40503) % (SELECT m FROM mx) + 1
      |      AS neg_partkey
      |  FROM customer,
      |       LATERAL (SELECT unnest(generate_series(0, 3)) AS i) g),
      |inter AS (SELECT DISTINCT o_custkey, l_partkey
      |          FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
      |SELECT c_custkey, CAST(sample_idx AS BIGINT) AS sample_idx,
      |  CAST(neg_partkey AS BIGINT) AS neg_partkey
      |FROM cand
      |WHERE NOT EXISTS (SELECT 1 FROM inter
      |                  WHERE o_custkey = c_custkey
      |                    AND l_partkey = neg_partkey)
      |ORDER BY 1, 2""".stripMargin,
    "q156_acf" -> """
      |WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
      |                 CAST(ts AS DATE)) AS d,
      |               count(*) AS x
      |               FROM events GROUP BY 1),
      |l AS (SELECT unnest(generate_series(1, 7)) AS lag_days),
      |p AS (SELECT l.lag_days, a.x AS x, b.x AS y
      |      FROM daily a CROSS JOIN l
      |      JOIN daily b ON b.d = a.d + l.lag_days),
      |s AS (SELECT lag_days, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |      FROM p GROUP BY 1)
      |SELECT lag_days, CAST(n AS BIGINT) AS n,
      |  CAST(sign(n * sxy - sx * sy) AS BIGINT) AS corr_sign,
      |  CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000)
      |    // NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
      |    AS BIGINT) AS r2_scaled
      |FROM s ORDER BY lag_days""".stripMargin,
    "q157_cusum" -> """
      |WITH g AS (SELECT event_type,
      |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |               AS d,
      |             CAST(count(*) AS HUGEINT) AS x
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, d, x,
      |        CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT)
      |          AS n,
      |        CAST(sum(x) OVER (PARTITION BY event_type) AS HUGEINT) AS s
      |      FROM g),
      |c AS (SELECT event_type, d, n,
      |        sum(n * x - s) OVER (PARTITION BY event_type ORDER BY d
      |          ROWS UNBOUNDED PRECEDING) AS cusum
      |      FROM w)
      |SELECT event_type, CAST(n AS BIGINT) AS n_ticks, d AS cp_day,
      |  CAST(cusum AS BIGINT) AS cusum
      |FROM c
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY abs(cusum) DESC, d) = 1
      |ORDER BY event_type""".stripMargin,
    "q158_semdedup" -> """
      |WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
      |               AS qv
      |           FROM embeddings),
      |c AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 8),
      |s AS (SELECT q.vec_id, c.cid,
      |        CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist2
      |      FROM q CROSS JOIN c),
      |a AS (SELECT vec_id, cid AS cluster, dist2 FROM s
      |      QUALIFY row_number() OVER (PARTITION BY vec_id
      |        ORDER BY dist2, cid) = 1),
      |r AS (SELECT cluster, vec_id, dist2,
      |        CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
      |          AS n_members
      |      FROM a)
      |SELECT cluster, vec_id AS rep_id, dist2 AS rep_dist2, n_members
      |FROM r
      |QUALIFY row_number() OVER (PARTITION BY cluster
      |  ORDER BY dist2, vec_id) = 1
      |ORDER BY cluster""".stripMargin,
    "q153_bigram_surprisal" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |bi AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
      |       FROM toks,
      |            LATERAL (SELECT unnest(generate_series(1,
      |              greatest(len(t) - 1, 0))) AS i) g),
      |bc AS (SELECT bg, count(*) AS cb FROM bi GROUP BY 1),
      |tok AS (SELECT unnest(t) AS token FROM toks),
      |uc AS (SELECT token, count(*) AS cu FROM tok GROUP BY 1),
      |b AS (SELECT doc_id, length(bin(cu)) - length(bin(cb)) AS bits
      |      FROM bi JOIN bc USING (bg) JOIN uc ON bi.w1 = uc.token),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |          CAST(sum(bits) AS BIGINT) AS sb
      |        FROM b GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
      |  coalesce(a.sb, 0) AS bi_bits,
      |  CAST(coalesce(a.sb, 0) * 100 // NULLIF(a.n_bigrams, 0)
      |    AS BIGINT) AS mean_bits_x100
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin,
    "q152_shard_balance" -> """
      |WITH d AS (SELECT doc_id,
      |        CAST(len(list_filter(string_split_regex(text, '[ \t\n\r]+'),
      |          x -> x <> '')) AS BIGINT) AS n_tok,
      |        ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
      |          ::BIGINT % 32 AS shard
      |      FROM documents),
      |per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |          CAST(sum(n_tok) AS BIGINT) AS sum_tokens
      |        FROM d GROUP BY 1),
      |t AS (SELECT CAST(sum(sum_tokens) AS BIGINT) AS tot FROM per)
      |SELECT shard, n_docs, sum_tokens,
      |  CAST((32 * sum_tokens - tot) * 10000 // tot AS BIGINT) AS skew_bp
      |FROM per CROSS JOIN t
      |ORDER BY shard""".stripMargin,
    "q151_vocab_coverage" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |tok AS (SELECT unnest(t) AS token FROM toks),
      |counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token)
      |        AS tid FROM counts),
      |a AS (SELECT
      |    CAST(sum(CASE WHEN tid <= 100 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS c100,
      |    CAST(sum(CASE WHEN tid <= 1000 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS c1k,
      |    CAST(sum(CASE WHEN tid <= 10000 THEN cnt ELSE 0 END) AS BIGINT)
      |      AS c10k,
      |    CAST(sum(cnt) AS BIGINT) AS tot
      |  FROM r)
      |SELECT k, covered, tot AS total,
      |  CAST(covered * 10000 // tot AS BIGINT) AS coverage_bp
      |FROM (SELECT 100 AS k, c100 AS covered, tot FROM a
      |      UNION ALL SELECT 1000, c1k, tot FROM a
      |      UNION ALL SELECT 10000, c10k, tot FROM a)
      |ORDER BY k""".stripMargin,
    "q150_curriculum" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
      |uni AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
      |b AS (SELECT tok.doc_id,
      |        length(bin(n.n)) - length(bin(uni.c)) AS bits
      |      FROM tok JOIN uni USING (token) CROSS JOIN n),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |          CAST(sum(bits) AS BIGINT) AS sb
      |        FROM b GROUP BY 1),
      |s AS (SELECT doc_id, n_tokens,
      |        CAST(sb * 100 // n_tokens AS BIGINT) AS mb
      |      FROM agg WHERE n_tokens > 0),
      |bounds AS (SELECT min(mb) AS lo, max(mb) AS hi FROM s)
      |SELECT 1 + ((mb - lo) * 4) // (hi - lo + 1) AS phase,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  min(mb) AS lo_bits, max(mb) AS hi_bits
      |FROM s CROSS JOIN bounds
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q149_quantile_norm" -> """
      |WITH b AS (SELECT event_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |t AS (SELECT *, ntile(100) OVER (PARTITION BY event_type
      |        ORDER BY cents, event_id) AS bucket FROM b),
      |r AS (SELECT bucket,
      |        CAST(CAST(sum(cents) AS HUGEINT) // count(*) AS BIGINT)
      |          AS norm_cents
      |      FROM t GROUP BY 1)
      |SELECT event_id, event_type, t.bucket, cents, norm_cents
      |FROM t JOIN r ON t.bucket = r.bucket
      |ORDER BY event_id""".stripMargin,
    "q148_kanon" -> """
      |WITH cell AS (SELECT c_nationkey, c_mktsegment,
      |                CAST(count(*) AS BIGINT) AS n_exact
      |              FROM customer GROUP BY 1, 2),
      |roll AS (SELECT c_nationkey, CAST(sum(n_exact) AS BIGINT) AS n_rollup
      |         FROM cell GROUP BY 1)
      |SELECT cell.c_nationkey, c_mktsegment, n_exact, n_rollup,
      |  CASE WHEN n_exact >= 10 THEN 'exact'
      |       WHEN n_rollup >= 10 THEN 'generalized'
      |       ELSE 'suppress' END AS anonymity
      |FROM cell JOIN roll USING (c_nationkey)
      |ORDER BY 1, 2""".stripMargin,
    "q146_basket_lift" -> """
      |WITH d AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
      |           FROM lineitem),
      |f AS (SELECT bk, it FROM
      |        (SELECT bk, it, count(*) OVER (PARTITION BY bk) AS bs FROM d)
      |      WHERE bs <= 64),
      |nb AS (SELECT CAST(count(DISTINCT bk) AS HUGEINT) AS nbk FROM f),
      |ix AS (SELECT it, CAST(count(*) AS BIGINT) AS cx FROM f GROUP BY 1),
      |p AS (SELECT a.it AS item_a, b.it AS item_b,
      |        CAST(count(*) AS BIGINT) AS n_ab
      |      FROM f a JOIN f b ON a.bk = b.bk AND a.it < b.it GROUP BY 1, 2)
      |SELECT item_a, item_b, n_ab, xa.cx AS n_a, xb.cx AS n_b,
      |  CAST(nbk AS BIGINT) AS n_baskets,
      |  CAST((nbk * n_ab * 10000) // (CAST(xa.cx AS HUGEINT) * xb.cx)
      |    AS BIGINT) AS lift_scaled
      |FROM p CROSS JOIN nb
      |  JOIN ix xa ON p.item_a = xa.it
      |  JOIN ix xb ON p.item_b = xb.it
      |ORDER BY n_ab DESC, item_a, item_b LIMIT 20""".stripMargin,
    "q145_entropy" -> """
      |WITH cc AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
      |            FROM documents WHERE source IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT lang, c,
      |        CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
      |      FROM cc)
      |SELECT lang, max(n) AS n, CAST(count(*) AS BIGINT) AS n_cats,
      |  CAST(CAST(sum(c * (length(bin(n)) - length(bin(c)))) AS BIGINT)
      |    * 100 // max(n) AS BIGINT) AS ent_bits_x100
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q144_corr" -> """
      |WITH b AS (SELECT event_type,
      |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
      |             CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events),
      |s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |        CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |      FROM b GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(sign(n * sxy - sx * sy) AS BIGINT) AS corr_sign,
      |  CAST(((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000)
      |    // NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
      |    AS BIGINT) AS r2_scaled
      |FROM s ORDER BY event_type""".stripMargin,
    "q143_rrf" -> """
      |WITH r AS (SELECT c_mktsegment, c_custkey,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS r1,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_custkey % 97, c_custkey) AS r2
      |  FROM customer),
      |s AS (SELECT *, 1000000 // (60 + r1) + 1000000 // (60 + r2) AS rrf
      |      FROM r)
      |SELECT c_mktsegment, c_custkey, r1, r2,
      |  CAST(rrf AS BIGINT) AS rrf_scaled
      |FROM s
      |QUALIFY row_number() OVER (PARTITION BY c_mktsegment
      |  ORDER BY rrf DESC, c_custkey) <= 5
      |ORDER BY c_mktsegment, rrf_scaled DESC, c_custkey""".stripMargin,
    "q142_kappa" -> """
      |WITH b AS (SELECT event_type, user_id % 5 AS a,
      |             (user_id + (event_id % 2)) % 5 AS bb
      |           FROM events),
      |t AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CASE WHEN a = bb THEN 1 ELSE 0 END) AS HUGEINT)
      |          AS agree
      |      FROM b GROUP BY 1),
      |r AS (SELECT event_type, a AS k, CAST(count(*) AS HUGEINT) AS rk
      |      FROM b GROUP BY 1, 2),
      |c AS (SELECT event_type, bb AS k, CAST(count(*) AS HUGEINT) AS ck
      |      FROM b GROUP BY 1, 2),
      |p AS (SELECT r.event_type, CAST(sum(rk * ck) AS HUGEINT) AS rc
      |      FROM r JOIN c ON r.event_type = c.event_type AND r.k = c.k
      |      GROUP BY 1)
      |SELECT t.event_type, CAST(n AS BIGINT) AS n,
      |  CAST(agree AS BIGINT) AS n_agree,
      |  CAST((n * agree - coalesce(rc, 0)) * 10000
      |    // NULLIF(n * n - coalesce(rc, 0), 0) AS BIGINT) AS kappa_scaled
      |FROM t LEFT JOIN p ON t.event_type = p.event_type
      |ORDER BY t.event_type""".stripMargin,
    "q241_isotonic" -> """
      |WITH b AS (SELECT event_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents,
      |             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS lbl
      |           FROM events),
      |t AS (SELECT *, ntile(10) OVER (PARTITION BY event_type
      |        ORDER BY cents, event_id) AS bin FROM b),
      |bins AS (SELECT event_type, bin, count(*) AS n, sum(lbl) AS n_pos
      |         FROM t GROUP BY 1, 2),
      |pre AS (SELECT event_type, bin,
      |          sum(n_pos) OVER w AS ss, sum(n) OVER w AS cc,
      |          sum(n_pos) OVER w - n_pos AS ss0,
      |          sum(n) OVER w - n AS cc0
      |        FROM bins WINDOW w AS (PARTITION BY event_type ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pairs AS (SELECT j.event_type, j.bin AS jb, k.bin AS kb,
      |            (k.ss - j.ss0) * 1000000000 // (k.cc - j.cc0) AS av
      |          FROM pre j JOIN pre k
      |            ON j.event_type = k.event_type AND j.bin <= k.bin),
      |mm AS (SELECT p.event_type, i.bin, p.jb, min(av) AS mn
      |       FROM pairs p JOIN pre i ON i.event_type = p.event_type
      |         AND p.jb <= i.bin AND p.kb >= i.bin
      |       GROUP BY 1, 2, 3),
      |fit AS (SELECT event_type, bin, CAST(max(mn) AS BIGINT) AS y_fit_ppb
      |        FROM mm GROUP BY 1, 2)
      |SELECT f.event_type, f.bin, CAST(n AS BIGINT) AS n,
      |  CAST(n_pos AS BIGINT) AS n_pos, y_fit_ppb
      |FROM fit f JOIN bins USING (event_type, bin)
      |ORDER BY 1, 2""".stripMargin,
    "q141_calibration" -> """
      |WITH b AS (SELECT event_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents,
      |             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS lbl
      |           FROM events),
      |t AS (SELECT *, ntile(10) OVER (PARTITION BY event_type
      |        ORDER BY cents, event_id) AS bin FROM b)
      |SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(lbl) AS BIGINT) AS n_pos,
      |  min(cents) AS lo, max(cents) AS hi,
      |  CAST(CAST(sum(lbl) AS BIGINT) * 10000 // count(*) AS BIGINT)
      |    AS pos_bp
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q140_auc" -> """
      |WITH b AS (SELECT event_type,
      |             CAST(round(value * 100) AS BIGINT) AS s,
      |             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS lbl
      |           FROM events WHERE value IS NOT NULL),
      |r AS (SELECT event_type, lbl,
      |        2 * rank() OVER (PARTITION BY event_type ORDER BY s)
      |          + count(*) OVER (PARTITION BY event_type, s) - 1 AS mr2
      |      FROM b),
      |a AS (SELECT event_type,
      |        CAST(sum(CASE WHEN lbl = 1 THEN mr2 ELSE 0 END) AS HUGEINT) AS r2,
      |        CAST(sum(lbl) AS HUGEINT) AS np,
      |        CAST(sum(1 - lbl) AS HUGEINT) AS nq
      |      FROM r GROUP BY 1)
      |SELECT event_type, CAST(np AS BIGINT) AS n_pos,
      |  CAST(nq AS BIGINT) AS n_neg,
      |  CAST((r2 - np * (np + 1)) * 10000 // NULLIF(2 * np * nq, 0)
      |    AS BIGINT) AS auc_scaled
      |FROM a ORDER BY event_type""".stripMargin,
    "q139_purged_split" -> """
      |WITH b AS (SELECT event_id, event_type, epoch_us(ts) AS us
      |           FROM events),
      |c AS (SELECT min(us) + ((max(us) - min(us)) * 8) // 10 AS cut FROM b)
      |SELECT event_type,
      |  CASE WHEN us <= cut THEN 'train'
      |       WHEN us <= cut + 86400000000 THEN 'embargo'
      |       ELSE 'test' END AS split,
      |  count(*) AS n
      |FROM b CROSS JOIN c
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q138_percentile_rank" -> """
      |WITH b AS (SELECT event_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |r AS (SELECT event_id, event_type,
      |        rank() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
      |        count(*) OVER (PARTITION BY event_type) AS n
      |      FROM b)
      |SELECT event_id, event_type,
      |  CAST((rk - 1) * 10000 // NULLIF(n - 1, 0) AS BIGINT) AS pr_bp
      |FROM r ORDER BY event_id""".stripMargin,
    "q137_mixture_sample" -> """
      |WITH r AS (SELECT doc_id, source,
      |             500 + 400 * (CAST(substring(source, 4) AS INT) % 7)
      |               AS rate_bp
      |           FROM documents),
      |k AS (SELECT source, rate_bp, count(*) AS n_kept
      |      FROM r
      |      WHERE ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
      |              ::BIGINT % 10000 < rate_bp
      |      GROUP BY 1, 2),
      |t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1)
      |SELECT k.source, CAST(k.rate_bp AS INT) AS rate_bp,
      |       CAST(t.n_total AS BIGINT) AS n_total,
      |       CAST(k.n_kept AS BIGINT) AS n_kept
      |FROM k JOIN t USING (source) ORDER BY k.source""".stripMargin,
    "q136_surprisal" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
      |uni AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
      |b AS (SELECT tok.doc_id,
      |        length(bin(n.n)) - length(bin(uni.c)) AS bits
      |      FROM tok JOIN uni USING (token) CROSS JOIN n),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |          CAST(sum(bits) AS BIGINT) AS surprisal_bits
      |        FROM b GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
      |  coalesce(a.surprisal_bits, 0) AS surprisal_bits,
      |  CAST(coalesce(a.surprisal_bits, 0) * 100 // NULLIF(a.n_tokens, 0)
      |    AS BIGINT) AS mean_bits_x100
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin,
    "q135_equidepth" -> """
      |WITH b AS (SELECT o_orderpriority, o_orderkey,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |           FROM orders),
      |d AS (SELECT o_orderpriority, cents,
      |        ntile(10) OVER (PARTITION BY o_orderpriority
      |          ORDER BY cents, o_orderkey) AS decile
      |      FROM b)
      |SELECT o_orderpriority, decile, count(*) AS n,
      |       CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q134_incremental_dedup" -> s"""
      |WITH ${TrainingData.corpusSql},
      |lab AS (SELECT doc_id, text,
      |          CASE WHEN doc_id >= 1000000 OR doc_id % 7 = 0
      |               THEN 1 ELSE 0 END AS is_new
      |        FROM corpus),
      |h AS (SELECT doc_id, is_new, sha256(text) AS h FROM lab),
      |oldh AS (SELECT DISTINCT h FROM h WHERE is_new = 0),
      |sh AS (SELECT DISTINCT doc_id, tf[i] || ' ' || tf[i+1] || ' ' || tf[i+2] AS s
      |       FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |                      x -> x <> '') AS tf
      |             FROM lab),
      |            LATERAL (SELECT unnest(generate_series(1,
      |              greatest(len(tf) - 2, 0))) AS i) g),
      |ok AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 50),
      |shf AS (SELECT doc_id, s FROM sh WHERE s IN (SELECT s FROM ok)),
      |near AS (SELECT a.doc_id, b.doc_id AS old_id, count(*) AS shared
      |         FROM shf a JOIN shf b ON a.s = b.s
      |         JOIN lab la ON la.doc_id = a.doc_id
      |         JOIN lab lb ON lb.doc_id = b.doc_id
      |         WHERE la.is_new = 1 AND lb.is_new = 0
      |         GROUP BY 1, 2 HAVING count(*) >= 5),
      |nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near_old
      |       FROM near GROUP BY 1)
      |SELECT l.doc_id,
      |  CAST(CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END AS INT) AS exact_dup,
      |  coalesce(nn.n_near_old, 0) AS n_near_old,
      |  CAST(CASE WHEN o.h IS NOT NULL OR coalesce(nn.n_near_old, 0) > 0
      |       THEN 1 ELSE 0 END AS INT) AS is_dup
      |FROM (SELECT doc_id, h FROM h WHERE is_new = 1) l
      |LEFT JOIN oldh o ON o.h = l.h
      |LEFT JOIN nn ON nn.doc_id = l.doc_id
      |ORDER BY l.doc_id""".stripMargin,
    "q133_rolling_median" -> """
      |WITH b AS (SELECT event_id, user_id,
      |             CAST(round(value * 100) AS BIGINT) AS c, ts FROM events)
      |SELECT event_id,
      |  quantile_disc(c, 0.5) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS roll_median
      |FROM b ORDER BY event_id""".stripMargin,
    "q132_dup_spans" -> s"""
      |WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |pe AS (SELECT doc_id, t,
      |         unnest(generate_series(1, len(t) - 3)) AS pos FROM toks),
      |g AS (SELECT doc_id, CAST(pos AS INT) AS pos,
      |        t[pos] || ' ' || t[pos + 1] || ' ' || t[pos + 2] || ' '
      |          || t[pos + 3] AS gram
      |      FROM pe),
      |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
      |f AS (SELECT doc_id, pos,
      |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
      |          AS isl
      |      FROM g WHERE gram IN (SELECT gram FROM dup)),
      |r AS (SELECT doc_id, isl, count(*) AS run FROM f GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
      |          CAST(sum(run) AS BIGINT) AS n_dup_pos,
      |          CAST(max(run) AS BIGINT) AS max_run
      |        FROM r GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(greatest(len($toksSql) - 3, 0) AS BIGINT) AS n_pos,
      |  coalesce(a.n_dup_pos, 0) AS n_dup_pos,
      |  coalesce(a.n_runs, 0) AS n_runs,
      |  coalesce(a.max_run, 0) AS max_run
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin,
    "q130_chi2" -> s"""
      |WITH lab AS (SELECT doc_id,
      |               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lbl
      |             FROM documents),
      |dt AS (SELECT DISTINCT doc_id, unnest($toksSql) AS token
      |       FROM documents),
      |tot AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
      |               CAST(sum(lbl) AS HUGEINT) AS ll FROM lab),
      |pt AS (SELECT token, CAST(count(*) AS HUGEINT) AS nt,
      |         CAST(sum(lbl) AS HUGEINT) AS a
      |       FROM dt JOIN lab USING (doc_id)
      |       GROUP BY token HAVING count(*) >= 50)
      |SELECT token, CAST(nt AS BIGINT) AS n_docs,
      |  CAST(a AS BIGINT) AS n_label_docs,
      |  CAST((nn * (a * (nn - ll - nt + a) - (nt - a) * (ll - a))
      |           * (a * (nn - ll - nt + a) - (nt - a) * (ll - a)) * 10000)
      |       // NULLIF(nt * (nn - nt) * ll * (nn - ll), 0) AS BIGINT)
      |    AS chi2_scaled
      |FROM pt CROSS JOIN tot
      |ORDER BY chi2_scaled DESC, token LIMIT 40""".stripMargin,
    "q131_drift" -> """
      |WITH b AS (SELECT event_type,
      |             CAST(round(value * 100) AS BIGINT) AS v,
      |             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS c
      |           FROM events),
      |s AS (SELECT event_type,
      |        CAST(sum(c) AS HUGEINT) AS n1,
      |        CAST(sum(1 - c) AS HUGEINT) AS n2,
      |        CAST(sum(CASE WHEN c = 1 THEN CAST(v AS HUGEINT) ELSE 0 END)
      |          AS HUGEINT) AS s1,
      |        CAST(sum(CASE WHEN c = 0 THEN CAST(v AS HUGEINT) ELSE 0 END)
      |          AS HUGEINT) AS s2,
      |        CAST(sum(CASE WHEN c = 1 THEN CAST(v AS HUGEINT) * v ELSE 0 END)
      |          AS HUGEINT) AS q1,
      |        CAST(sum(CASE WHEN c = 0 THEN CAST(v AS HUGEINT) * v ELSE 0 END)
      |          AS HUGEINT) AS q2
      |      FROM b GROUP BY 1)
      |SELECT event_type, CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
      |  CAST((abs(s1 * n2 - s2 * n1) * 10000) // NULLIF(n1 * n2, 0)
      |    AS BIGINT) AS mean_gap_scaled,
      |  CAST(((n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1) * 10000)
      |       // NULLIF((n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1), 0)
      |    AS BIGINT) AS var_ratio_scaled
      |FROM s ORDER BY event_type""".stripMargin,
    "q124_bloom_join" -> """
      |SELECT l_returnflag, count(*) AS n_items,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |         AS qty_cents
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q125_grouped_slope" -> """
      |WITH b AS (SELECT event_type,
      |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
      |             CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events),
      |s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
      |        CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
      |        CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |        CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |      FROM b GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(((n * sxy - sx * sy) * 10000)
      |       // NULLIF(n * sxx - sx * sx, 0) AS BIGINT) AS slope_scaled
      |FROM s ORDER BY event_type""".stripMargin,
    "q126_gini" -> """
      |WITH c AS (SELECT p_brand, p_type, count(*) AS c
      |           FROM part GROUP BY 1, 2),
      |g AS (SELECT p_brand, CAST(sum(c) AS HUGEINT) AS n,
      |        CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss,
      |        count(*) AS n_cats
      |      FROM c GROUP BY 1)
      |SELECT p_brand, CAST(n AS BIGINT) AS n,
      |       CAST(n_cats AS BIGINT) AS n_cats,
      |       CAST(((n * n - ss) * 10000) // (n * n) AS BIGINT) AS gini_scaled
      |FROM g ORDER BY p_brand""".stripMargin,
    "q127_set_jaccard" -> """
      |WITH d AS (SELECT DISTINCT event_type AS g, user_id AS e FROM events),
      |sz AS (SELECT g, count(*) AS sz FROM d GROUP BY 1),
      |i AS (SELECT a.g AS g_a, b.g AS g_b, count(*) AS inter
      |      FROM d a JOIN d b ON a.e = b.e AND a.g < b.g GROUP BY 1, 2)
      |SELECT i.g_a, i.g_b, CAST(i.inter AS BIGINT) AS inter,
      |  CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_size,
      |  CAST((i.inter * 10000) // (sa.sz + sb.sz - i.inter) AS BIGINT)
      |    AS jaccard_bp
      |FROM i JOIN sz sa ON sa.g = i.g_a JOIN sz sb ON sb.g = i.g_b
      |ORDER BY g_a, g_b""".stripMargin,
    "q128_mrr" -> """
      |WITH r AS (SELECT c_mktsegment, c_custkey,
      |             row_number() OVER (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey) AS rk
      |           FROM customer)
      |SELECT c_mktsegment,
      |  CAST(min(CASE WHEN c_custkey % 13 = 0 THEN rk END) AS BIGINT)
      |    AS first_rank,
      |  CAST(sum(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_relevant,
      |  CAST(1000000 // min(CASE WHEN c_custkey % 13 = 0 THEN rk END)
      |    AS BIGINT) AS rr_scaled
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q304_microaggregate" -> """
      |WITH o AS (
      |  SELECT c_mktsegment AS seg, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderkey % 10 = 0),
      |r AS (
      |  SELECT seg, o_orderkey, cents,
      |    row_number() OVER (PARTITION BY seg ORDER BY cents, o_orderkey)
      |      AS rn,
      |    count(*) OVER (PARTITION BY seg) AS n
      |  FROM o),
      |g AS (
      |  SELECT *, greatest(least((rn - 1) // 10, n // 10 - 1), 0) AS run
      |  FROM r),
      |m AS (
      |  SELECT seg, run, CAST(count(*) AS BIGINT) AS run_size,
      |    CAST(sum(cents) // count(*) AS BIGINT) AS micro_v
      |  FROM g GROUP BY 1, 2)
      |SELECT g.seg, g.o_orderkey, g.cents, CAST(g.run AS BIGINT) AS run,
      |  m.run_size, m.micro_v, m.run_size >= 10 AS meets_k
      |FROM g JOIN m ON m.seg = g.seg AND m.run = g.run
      |ORDER BY g.seg, g.o_orderkey""".stripMargin,
    "q295_cost_threshold" -> """
      |WITH x AS (
      |  SELECT CAST(user_id % 4 AS BIGINT) AS cohort,
      |    CAST(round(value * 100) AS BIGINT) AS s,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events WHERE value IS NOT NULL),
      |cell AS (
      |  SELECT cohort, s, count(*) AS c, sum(y) AS p
      |  FROM x GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, s,
      |    CAST(sum(p) OVER (PARTITION BY cohort ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cp,
      |    CAST(sum(c - p) OVER (PARTITION BY cohort ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cn,
      |    CAST(sum(p) OVER (PARTITION BY cohort) AS BIGINT) AS tp,
      |    CAST(sum(c - p) OVER (PARTITION BY cohort) AS BIGINT) AS tn
      |  FROM cell),
      |cand AS (
      |  SELECT cohort, s AS thr, cp AS fn_at, tn - cn AS fp_at, tp, tn
      |  FROM cum
      |  UNION ALL
      |  SELECT cohort, min(s) - 1, 0, max(tn), max(tp), max(tn)
      |  FROM cum GROUP BY cohort),
      |costed AS (
      |  SELECT cohort, thr, fn_at, fp_at, tp, tn,
      |    5 * fn_at + 1 * fp_at AS cost
      |  FROM cand),
      |sel AS (SELECT cohort, min(cost) AS mc FROM costed GROUP BY 1),
      |best AS (
      |  SELECT costed.cohort, min(thr) AS threshold, mc AS cost
      |  FROM costed JOIN sel
      |    ON costed.cohort = sel.cohort AND cost = mc
      |  GROUP BY costed.cohort, mc)
      |SELECT b.cohort, b.threshold, b.cost, c.fn_at, c.fp_at,
      |  c.tp AS n_pos, c.tn AS n_neg
      |FROM best b
      |JOIN costed c ON c.cohort = b.cohort AND c.thr = b.threshold
      |ORDER BY b.cohort""".stripMargin,
    "q287_nb_classify" -> """
      |WITH toks AS MATERIALIZED (
      |  SELECT doc_id AS id, lang AS y,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS tok
      |  FROM documents),
      |dt AS MATERIALIZED (
      |  SELECT id, y, tok, count(*) AS cnt FROM toks GROUP BY 1, 2, 3),
      |lt AS MATERIALIZED (
      |  SELECT y AS lang, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      |v AS (SELECT count(DISTINCT tok) AS vv FROM toks),
      |kp AS (SELECT lang,
      |         CAST(length(bin(CAST(t + vv AS BIGINT))) AS BIGINT) AS k
      |       FROM (SELECT lang, sum(c) AS t FROM lt GROUP BY 1)
      |       CROSS JOIN v),
      |dense AS MATERIALIZED (
      |  SELECT tk.tok, lg.lang,
      |    CAST(length(bin(CAST(coalesce(c, 0) + 1 AS BIGINT))) AS BIGINT)
      |      AS lp
      |  FROM (SELECT DISTINCT tok FROM dt) tk
      |  CROSS JOIN (SELECT DISTINCT lang FROM lt) lg
      |  LEFT JOIN lt ON lt.lang = lg.lang AND lt.tok = tk.tok),
      |dl AS (SELECT id, CAST(sum(cnt) AS BIGINT) AS len
      |       FROM dt GROUP BY 1),
      |sc AS (
      |  SELECT dt.id, dt.y, dense.lang, CAST(sum(cnt * lp) AS BIGINT)
      |    AS pos
      |  FROM dt JOIN dense USING (tok) GROUP BY 1, 2, 3),
      |s2 AS (
      |  SELECT sc.id, sc.y, sc.lang, pos - len * k AS score
      |  FROM sc JOIN dl USING (id) JOIN kp USING (lang)),
      |best AS (
      |  SELECT id, y, lang FROM s2
      |  QUALIFY row_number() OVER (PARTITION BY id
      |    ORDER BY score DESC, lang) = 1),
      |conf AS (
      |  SELECT y AS true_lang, lang AS pred_lang, count(*) AS n
      |  FROM best GROUP BY 1, 2
      |  UNION ALL
      |  SELECT lang AS true_lang, '(empty)' AS pred_lang, count(*) AS n
      |  FROM documents d
      |  WHERE NOT EXISTS (SELECT 1 FROM dt WHERE dt.id = d.doc_id)
      |  GROUP BY 1)
      |SELECT true_lang, pred_lang, n FROM conf ORDER BY 1, 2""".stripMargin,
    "q283_gen_ladder" -> """
      |WITH c AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
      |      AS band
      |  FROM customer),
      |g0 AS (SELECT count(*) AS g FROM c
      |       GROUP BY c_nationkey, c_mktsegment, band),
      |a0 AS (SELECT CAST(0 AS BIGINT) AS level,
      |         CAST(count(*) AS BIGINT) AS n_groups,
      |         CAST(min(g) AS BIGINT) AS min_group,
      |         CAST(coalesce(sum(CASE WHEN g < 25 THEN g END), 0)
      |           AS BIGINT) AS rows_below_k
      |       FROM g0),
      |g1 AS (SELECT count(*) AS g FROM c
      |       GROUP BY c_nationkey, c_mktsegment),
      |a1 AS (SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
      |         CAST(min(g) AS BIGINT),
      |         CAST(coalesce(sum(CASE WHEN g < 25 THEN g END), 0)
      |           AS BIGINT)
      |       FROM g1),
      |g2 AS (SELECT count(*) AS g FROM c GROUP BY c_mktsegment),
      |a2 AS (SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
      |         CAST(min(g) AS BIGINT),
      |         CAST(coalesce(sum(CASE WHEN g < 25 THEN g END), 0)
      |           AS BIGINT)
      |       FROM g2),
      |u AS (SELECT *, min_group >= 25 AS meets_k FROM
      |        (SELECT * FROM a0 UNION ALL SELECT * FROM a1
      |         UNION ALL SELECT * FROM a2)),
      |f AS (SELECT min(level) AS fl FROM u WHERE meets_k)
      |SELECT level, n_groups, min_group, rows_below_k, meets_k,
      |  coalesce(level = fl, FALSE) AS chosen
      |FROM u CROSS JOIN f ORDER BY level""".stripMargin,
    "q284_var_alloc" -> """
      |WITH e AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_h,
      |    CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
      |  FROM e GROUP BY 1),
      |w AS (
      |  SELECT event_type, n_h,
      |    CAST(CASE WHEN n_h > 1 THEN (n_h * sxx - sx * sx) // (n_h - 1)
      |              ELSE 0 END AS BIGINT) AS w
      |  FROM st),
      |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM w),
      |b AS (
      |  SELECT event_type, n_h, w,
      |    CAST(CAST(w AS HUGEINT) * 10000 // tw AS BIGINT) AS fl,
      |    CAST(w AS HUGEINT) * 10000 % tw AS rem
      |  FROM w CROSS JOIN t),
      |l AS (SELECT 10000 - CAST(sum(fl) AS BIGINT) AS leftover FROM b),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, event_type)
      |        AS rk FROM b)
      |SELECT event_type, n_h, w AS weight,
      |  CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |    AS alloc,
      |  CAST(least(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, n_h)
      |    AS BIGINT) AS alloc_capped
      |FROM r CROSS JOIN l ORDER BY event_type""".stripMargin,
    "q280_ips_eval" -> """
      |WITH e AS (
      |  SELECT CAST(user_id % 3 AS BIGINT) AS context,
      |    CASE WHEN (user_id % 3 + 1) % 3 = event_id % 3
      |         THEN 1 ELSE 0 END AS m,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r,
      |    CAST(1 << (event_id % 3) AS BIGINT) AS w
      |  FROM events),
      |agg AS (
      |  SELECT context, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(m) AS BIGINT) AS n_matched,
      |    CAST(sum(m * r * w) AS BIGINT) AS ips_num,
      |    CAST(sum(m * w) AS BIGINT) AS snips_den
      |  FROM e GROUP BY 1)
      |SELECT context, n, n_matched, ips_num, snips_den,
      |  CAST(ips_num * 1000 // n AS BIGINT) AS ips_milli,
      |  CAST(ips_num * 1000 // NULLIF(snips_den, 0) AS BIGINT)
      |    AS snips_milli
      |FROM agg ORDER BY context""".stripMargin,
    "q278_cluster_quality" -> """
      |WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
      |               AS qv
      |           FROM embeddings),
      |c AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 8),
      |s AS (SELECT q.vec_id, c.cid,
      |        CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist2
      |      FROM q CROSS JOIN c),
      |a AS (SELECT vec_id, cid AS cluster, dist2 FROM s
      |      QUALIFY row_number() OVER (PARTITION BY vec_id
      |        ORDER BY dist2, cid) = 1),
      |intra AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(dist2) AS BIGINT) AS intra_sum
      |          FROM a GROUP BY 1),
      |inter AS (SELECT c1.cid AS cluster,
      |            CAST(min(list_sum(list_transform(list_zip(c1.cv, c2.cv),
      |              p -> (p[1] - p[2]) * (p[1] - p[2])))) AS BIGINT)
      |              AS inter_min
      |          FROM c c1, c c2 WHERE c1.cid <> c2.cid GROUP BY 1)
      |SELECT cluster, n, intra_sum,
      |  CAST(intra_sum // n AS BIGINT) AS intra_mean, inter_min,
      |  CAST(100 * inter_min // NULLIF(intra_sum // n, 0) AS BIGINT)
      |    AS sep_x100
      |FROM intra JOIN inter USING (cluster) ORDER BY cluster""".stripMargin,
    "q129_kmeans" -> """
      |WITH q AS (SELECT vec_id,
      |             list_transform(embedding,
      |               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
      |               AS qv
      |           FROM embeddings),
      |c AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 8),
      |s AS (SELECT q.vec_id, c.cid,
      |        CAST(list_sum(list_transform(list_zip(q.qv, c.cv),
      |          p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist2
      |      FROM q CROSS JOIN c)
      |SELECT vec_id, cid AS cluster, dist2 FROM s
      |QUALIFY row_number() OVER (PARTITION BY vec_id
      |  ORDER BY dist2, cid) = 1
      |ORDER BY vec_id""".stripMargin)
}
