package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training pipelines: sequence packing,
  * context-window chunking, stratified sampling. All declarative column
  * expressions — the scale levers are the shard/stratum partitionings, so
  * each operator parallelizes by construction and never needs a global
  * ordering or a driver-side loop.
  */
object Corpus {

  /** Pack documents into training-sequence bins of roughly `budget`
    * tokens, the cumulative-sum formulation: docs are sharded (bins never
    * span shards, so packing parallelizes; shard count bounds per-task
    * state), ordered by id within their shard, and assigned bin
    * `⌊(cumsum − tokens) / budget⌋` — i.e. binned by START offset, so a
    * doc that straddles a budget boundary stays in the bin it started in
    * and that bin EXCEEDS the budget by up to that doc's length. Bins are
    * a grouping hint for the tokenizer stage, which owns hard truncation/
    * padding to the context window; a consumer needing a strict ≤ budget
    * guarantee must split the straddling doc itself.
    *
    * In exchange the packing is a pure window expression: one shuffle on
    * the shard key, no stateful scan (strict first-fit needs a
    * reset-on-overflow running state that windows can't express). Output:
    * id, tokens, shard, seq_in_shard (bin within the shard). */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shardCol: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs.withColumn("shard", shardCol)
      .withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("seq_in_shard",
        ((col("_cum") - col(tokensCol)) / budget).cast("long"))
      .drop("_cum")
  }

  /** Overlapping context-window chunks (RAG/pretraining shape): one row per
    * (doc, window) with `size`-char chunks every `stride` chars. Pure
    * generator — sequence + posexplode fans out within the partition, no
    * shuffle; empty docs produce no rows. */
  def chunkText(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    docs
      // Spark's sequence(0, -1, stride) throws where DuckDB's
      // generate_series returns empty — drop empty docs before generating
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        posexplode(sequence(lit(0), length(col(textCol)) - 1, lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_pos"),
        col(textCol).substr(col("col") + 1, lit(size)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .withColumn("chunk_sha", sha2(col("chunk"), 256))
      .drop("chunk")
  }

  /** Whitespace tokens as a column, empties dropped — the native codegen
    * `ws_tokens` expression ([[graft.plans.WsTokens]]), one character-scan
    * pass instead of regex split + interpreted filter HOF. The separator
    * class is an explicit `[ \t\n\r]` (not `\s`): Java's `\s` and RE2's
    * differ on unicode space, which silently diverges token counts across
    * engines. */
  private[graft] def tokensOf(textCol: Column): Column =
    call_function("ws_tokens", textCol)

  /** Adjacent-pair (bigram) array of a token array: `a b c` → `[a b, b c]`.
    * zip_with over two slices, NOT `transform(sequence(...), i =>
    * element_at(toks, i))`: a lambda body that references the token
    * expression re-evaluates it per ELEMENT (Catalyst inlines the alias),
    * turning the generator O(n²) per doc — measured 6.3s vs 0.2s on the
    * sf0.1 corpus. The slices evaluate the token array a constant number
    * of times per row; length max(n−1, 0) makes < 2 tokens an empty
    * slice, so no separate guard. */
  private[graft] def bigramsOf(toks: Column): Column = {
    val n1 = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Gopher-style intra-document repetition metrics (Rae et al. 2021,
    * §A1.1 repetition filters): per doc, the token count, distinct-token
    * count, the frequency of the MOST repeated bigram, and the number of
    * duplicate bigram occurrences (Σ max(c−1, 0) over bigram types).
    * All integers — no ratio is materialized, so downstream thresholds
    * (e.g. top-bigram fraction > 0.18 → drop) divide at the caller and
    * the cross-engine compare stays exact.
    *
    * Shape: unigram stats are per-row column expressions (scan only);
    * bigram stats explode ≈n_tokens rows/doc into a combiner-friendly
    * (doc, bigram) count, re-aggregated per doc — two shuffles on doc_id,
    * fan-out linear in corpus token count. */
  def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokensOf(col(textCol))
    val uni = docs.select(col(idCol), size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
    val big = docs
      .select(col(idCol), explode(bigramsOf(toks)).as("_bg"))
      .groupBy(col(idCol), col("_bg")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(max(col("_c")).as("top_bigram_n"),
        sum(col("_c") - 1).as("dup_bigrams"))
    uni.join(big, Seq(idCol), "left")
      .na.fill(0L, Seq("top_bigram_n", "dup_bigrams"))
  }

  /** Longest equal-run in a SORTED array = max multiplicity of any value.
    * The native codegen expression [[graft.plans.LongestRun]] — the HOF
    * `aggregate` fold it replaced pays interpreted lambda dispatch plus a
    * struct allocation per element (CodegenFallback); see
    * [[topRunLengthHof]], kept as the reference model. */
  private def topRunLength(sorted: Column): Column =
    call_function("longest_run", sorted)

  /** Interpreted HOF formulation of [[topRunLength]] — the equivalence
    * model LongestRunSpec checks the native expression against. */
  private[graft] def topRunLengthHof(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        // null elements break runs and are not counted (matches LongestRun)
        val run = when(x.isNull, lit(0L))
          .when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Column-only twin of [[repetitionStats]] — identical output schema,
    * ZERO shuffles: per-row column expressions replace the explode+groupBy.
    * top_bigram_n is the longest equal-run in the SORTED bigram array
    * (run length of a value in sorted order = its multiplicity, via the
    * native codegen `longest_run`); dup_bigrams is size − distinct-size
    * (Σ(c−1) ≡ total − distinct). Streaming-safe (no aggregation state),
    * and the scale default for normal documents; prefer the groupBy
    * variant only when single docs are so large their bigram array
    * shouldn't be row-local. */
  def repetitionStatsCols(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokensOf(col(textCol))
    val bgs = array_sort(bigramsOf(toks))
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      topRunLength(bgs).as("top_bigram_n"),
      (size(bgs) - size(array_distinct(bgs))).cast("long").as("dup_bigrams"))
  }

  /** Per-document curation decision (the q92 funnel's per-doc stage):
    * language-ID argmax, stopword count and the column-only repetition
    * metrics composed into a first-match keep/drop label. A pure
    * PROJECTION — no aggregation state — so the same call works on a
    * batch frame and a `readStream` frame unchanged (the streaming
    * corpus gate; see CorpusStreamingSpec for the parity proof).
    * Output: id, source, lang_pred, decision. */
  def curationDecisions(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val toksLower = transform(tokensOf(col(textCol)), t => lower(t))
    def hits(words: Set[String]) =
      size(filter(toksLower, t => t.isInCollection(words.toSeq)))
    val scored = graft.functions.Text.langProfiles.foldLeft(docs) {
      case (df, (lang, set)) => df.withColumn(s"s_$lang", hits(set))
    }
    val pred =
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es")
        && col("s_de") >= col("s_fr") && col("s_de") >= col("s_nl"), "de")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr")
          && col("s_en") >= col("s_nl"), "en")
        .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_nl"), "es")
        .when(col("s_fr") >= col("s_nl"), "fr")
        .otherwise("nl")
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    scored.select(col(idCol), col(sourceCol), pred.as("lang_pred"),
        hits(stop).as("n_stopwords"), tokensOf(col(textCol)).as("_t"))
      .withColumn("n_tokens", size(col("_t")).cast("long"))
      .withColumn("_bgs", array_sort(bigramsOf(col("_t"))))
      .withColumn("top_bigram_n", topRunLength(col("_bgs")))
      .withColumn("decision",
        when(col("n_tokens") < 20, "too_short")
          .when(col("top_bigram_n") * 20 >= col("n_tokens"), "repetitive")
          .when(col("n_stopwords") === 0, "no_stopwords")
          .otherwise("keep"))
      .select(col(idCol), col(sourceCol), col("lang_pred"), col("decision"))
  }

  /** Corpus-wide bigram collocations: each bigram's total occurrence count
    * and document frequency, kept when total ≥ `minCount`. The distinct is
    * a MANUAL two-phase — groupBy (bigram, doc) then groupBy (bigram) —
    * not `countDistinct`: mixing count(*) with countDistinct makes Spark
    * Expand every exploded row into two aggregation streams, which at
    * corpus scale doubles the widest shuffle in the job (measured ~4× on
    * this query). The first phase also combines map-side, so repeated
    * in-doc bigrams never cross the wire more than once per partition. */
  def bigramCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame =
    docs.select(col(idCol),
        explode(bigramsOf(tokensOf(col(textCol)))).as("bigram"))
      .groupBy(col("bigram"), col(idCol)).agg(count(lit(1)).as("_c"))
      .groupBy(col("bigram"))
      .agg(sum(col("_c")).as("n_total"), count(lit(1)).as("n_docs"))
      .filter(col("n_total") >= minCount)

  /** Quantized-BM25 top-k retrieval for one bag-of-words query, in exact
    * integer arithmetic so the ranking is bit-stable cross-engine.
    *
    * Classic BM25 is Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl));
    * this quantizes each float: idf_q = bitlength(n_docs div df) (the
    * exact integer log2-floor recipe — `length(bin(x))` on both engines),
    * the length norm and saturation in fixed-point centi units with
    * k1=1.2, b=0.75, every division a floor division:
    *   avgdl_c  = Σdl·100 div n_docs
    *   norm_c   = 25 + (75·dl·100) div avgdl_c
    *   score_t  = idf_q · ((tf·220·100) div (tf·100 + (120·norm_c) div 100))
    * Doc score = Σ score_t over matched query terms. The quantization
    * shifts absolute scores, not the ordering structure BM25 exists for
    * (tf saturation, length penalty, rare-term boost).
    *
    * Shape: one token explode filtered TO THE QUERY TERMS before any
    * shuffle (the per-doc tf agg only ever sees |query| terms per doc),
    * df + corpus stats as two broadcast one-row/terms-row sides, then a
    * global top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    * heaps + driver merge; the rank window runs over only the k rows).
    * Output: (rk, doc_id, n_terms, score_c). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(tokensOf(col(textCol))).as("term"))
    val dl = docs.select(col(idCol).as("doc_id"),
      size(tokensOf(col(textCol))).cast("long").as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n_docs"), sum(col("_dl")).as("_sum_dl"))
      .withColumn("_avgdl_c", expr("_sum_dl * 100L div _n_docs"))
    val qterms = terms.filter(col("term").isin(queryTerms: _*))
    val dfreq = qterms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val tf = qterms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("_tf"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("_idf_q", expr("length(bin(_n_docs div _df))"))
      .withColumn("_norm_c", expr("25L + (75L * _dl * 100L) div _avgdl_c"))
      .withColumn("_s", expr(
        "_idf_q * ((_tf * 220L * 100L) div (_tf * 100L + (120L * _norm_c) div 100L))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("_s")).as("score_c"))
    // top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps + driver merge, never a single-partition window over every
    // matched doc; with a common query term that table is the corpus);
    // the rank window then covers only the k survivors
    val top = scored.orderBy(col("score_c").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score_c").desc, col("doc_id"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("rk"), col("doc_id"), col("n_terms"), col("score_c"))
  }

  /** Skip-gram (word2vec-style) context-pair counts: every ordered token
    * pair at distance 1..`window` within a document, counted corpus-wide.
    * The pairs come from `window` zip_with'd slice pairs per row — the
    * same constant-evaluations-per-row trick as [[bigramsOf]] (a lambda
    * over `sequence` re-evaluates the token array per ELEMENT — O(n²)
    * per doc); no self-join on doc_id (which would fan out len² rows per
    * doc before the distance filter could cut them). One explode + one
    * groupBy shuffle total. Output: (a, b, n) with a the earlier token. */
  def skipgramPairs(docs: DataFrame, textCol: String, window: Int): DataFrame = {
    val toks = docs.select(tokensOf(col(textCol)).as("_t"))
    val pairCols = (1 to window).map { d =>
      val len = greatest(size(col("_t")) - d, lit(0))
      zip_with(slice(col("_t"), lit(1), len), slice(col("_t"), lit(1 + d), len),
        (a, b) => struct(a.as("a"), b.as("b")))
    }
    toks.select(explode(concat(pairCols: _*)).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Deterministic per-group sample: the `k` rows of each group with the
    * smallest sha256(id) — a seedless, order-independent, re-runnable
    * sample (same ids always survive, wherever they sit in the file
    * layout). Window top-k per group: one shuffle on the group key;
    * per-group state is the sort, so cap k and salt if a group is huge. */
  def hashSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(sha2(col(idCol).cast("string"), 256), col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Priority sampling (Duffield–Lund–Thorup) — the weighted
    * without-replacement sample with per-item ESTIMATION weights, the
    * one-pass answer to "keep k docs but let token-weighted aggregates
    * stay unbiased": each kept item's `est_w = max(w, τ)` (τ = the
    * (k+1)-th priority) makes Σ est_w over the sample an unbiased
    * estimator of the population's total weight for ANY subset query.
    *
    * Seedless and engine-exact: the uniform is the 28-bit
    * sha256-hex-prefix of the id (the repo-standard recipe, +1 so it is
    * never zero), and the priority w/u is the floored integer
    * `w·2²⁸ div (h+1)` — deterministic ordering with an id tiebreak, no
    * floats anywhere, so an SQL oracle reproduces the exact sample AND
    * the exact estimator. Weights must be positive (`require`d ≥ 1 after
    * the cast); w ≤ ~3·10¹⁰ keeps the scaled priority in a long.
    *
    * Shape: one map-side priority projection + a global top-(k+1)
    * (TakeOrderedAndProject — never a full sort), localCheckpoint'ed at
    * ≤ k+1 rows so the threshold fold and the sample filter don't re-run
    * the scan; the k+1-row window is bounded by construction. Fewer than
    * k+1 input rows ⇒ τ = 0 and every row survives with est_w = w (the
    * exact-census degenerate case, surfaced not special-cased). */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pri = df.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("w"))
      .withColumn("w", when(col("w") >= 1L && col("w") <= 30000000000L,
          col("w"))
        .otherwise(raise_error(concat(
          lit("prioritySample: weight must be in [1, 3e10], got "),
          col("w"), lit(" for id "), col("id").cast("string")))))
      .withColumn("_h", conv(substring(
        sha2(col("id").cast("string"), 256), 1, 7), 16, 10).cast("long") + 1)
      .withColumn("priority", expr("w * 268435456 div _h"))
    val top = pri.orderBy(col("priority").desc, col("id")).limit(k + 1)
      .localCheckpoint()
    val w0 = Window.orderBy(col("priority").desc, col("id"))
    val ranked = top.withColumn("_rn", row_number().over(w0))
    val tau = ranked.agg(
      max(when(col("_rn") === k + 1, col("priority"))).as("_tau"))
    ranked.filter(col("_rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col("id"), col("w"), col("priority"),
        greatest(col("w"), coalesce(col("_tau"), lit(0L))).as("est_w"))
  }

  /** Deterministic global corpus shuffle + round-robin sharding — the
    * "shuffle before you shard" step every training run needs, seedless:
    * the permutation is the (sha256(id), id) order, so any engine, any
    * partition layout, any rerun produces the SAME shuffle_idx (1..N)
    * and shard assignment ((idx−1) mod shards interleaves, so each shard
    * sees an unbiased slice of the hash order).
    *
    * Ranked WITHOUT a single-partition global sort — the two-phase
    * range-rank used by [[Vocab.vocabulary]]: range-partition on the
    * hash (partition i wholly precedes i+1; (hash, id) keys are unique,
    * so any sampled boundary split yields the same global order), rank
    * within partitions in parallel, add broadcast per-partition offsets
    * (the offsets cumsum is the only single-partition step, O(#buckets)).
    * The bucketed table is localCheckpointed so the rank pass and the
    * offset count share one materialization. */
  def deterministicShuffle(df: DataFrame, idCol: String, shards: Int,
      rankPartitions: Int = 32): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val keyed = df.select(col(idCol))
      .withColumn("_h", sha2(col(idCol).cast("string"), 256))
    val bucketed = keyed
      .repartitionByRange(rankPartitions, col("_h").asc, col(idCol).asc)
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val local = bucketed.withColumn("_lr", row_number().over(
      Window.partitionBy(col("_b")).orderBy(col("_h"), col(idCol))))
    val offsets = bucketed.groupBy(col("_b"))
      .agg(count(lit(1)).as("_sz"))
      .withColumn("_off", coalesce(
        sum(col("_sz")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    local.join(broadcast(offsets), "_b")
      .select(col(idCol),
        (col("_off") + col("_lr")).cast("long").as("shuffle_idx"),
        ((col("_off") + col("_lr") - 1) % shards).cast("long").as("shard"))
  }

  /** Mixture (domain-reweighted) down-sample — the data-mixing step that
    * sets per-source inclusion rates for a training blend (the
    * DoReMi-style reweighting pass): keep a row iff its deterministic
    * hash bucket (the repo-standard sha256-hex-prefix recipe, same as
    * the train/val/test split and feature hashing) falls under the
    * row's rate in basis points. Pure per-row projection + filter — no
    * shuffle, no state, reproducible across runs and engines, and
    * trivially pushes down past it any filter Catalyst can move. */
  def mixtureSample(df: DataFrame, idCol: String,
      rateBp: org.apache.spark.sql.Column): DataFrame =
    df.filter(
      conv(substring(sha2(col(idCol).cast("string"), 256), 1, 4), 16, 10)
        .cast("long") % 10000 < rateBp)

  /** Coverage curve: per group, how many TOP items (by weight, ids
    * breaking ties) it takes to reach each target share of the total
    * mass — "500 of 80k docs carry half the tokens" is this table, and
    * it is the concentration readout that decides whether dedup or
    * downsampling should target the head before anything else. The
    * threshold test cross-multiplies (`cum·10⁴ ≥ total·target_bp`), so
    * no division anywhere. Rank and cumulative mass ride one two-phase
    * range-bucketed pass ([[Layout.addRunningSums]]) — the group key is
    * typically an enum (languages, sources), and a window partitioned by
    * it would sort each whole group in one task (the q268 class; round-9
    * enum lint) — plus one fold with a min-aggregate per target. */
  def coverageCurve(df: DataFrame, groupCol: String, idCol: String,
      wCol: String, targetsBp: Seq[Int]): DataFrame = {
    require(targetsBp.nonEmpty && targetsBp.forall(t => t > 0 && t <= 10000))
    val sort = Seq(col(wCol).desc, col(idCol))
    val totals = df.groupBy(col(groupCol)).agg(sum(col(wCol)).as("_tot"))
    val bucketed = Layout.bucketize(
      df.select(col(groupCol), col(idCol), col(wCol)),
      col(groupCol) +: sort)
    val t = Layout.addRunningSums(bucketed, Seq(groupCol), sort,
        Seq(lit(1L) -> "_rk", col(wCol) -> "_cum"))
      .join(broadcast(totals), groupCol)
    // decimal(38,0) cross-multiply: per-group total weight can pass
    // Long/10⁴ (~9.2e14) at the 100 TB token-weight scale — same widening
    // as liftCurve/hhiBp/diffInDiff
    val aggs = targetsBp.map { tgt =>
      min(when(expr(
          s"CAST(_cum AS DECIMAL(38,0)) * 10000 >= " +
          s"CAST(_tot AS DECIMAL(38,0)) * $tgt"), col("_rk")))
        .as(s"k_bp$tgt")
    }
    t.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        max(col("_tot")).as("total_w") +: aggs: _*)
  }

  /** Mixture-weight planning — the step BEFORE [[mixtureSample]]: given
    * target blend shares in ppm, compute per source the largest
    * undersample-only plan that hits the blend EXACTLY:
    *   T_max  = min_s ⌊n_s · 10⁶ / target_s⌋   (the binding source
    *            caps the whole mixture — no source is oversampled)
    *   take_s = ⌊T_max · target_s / 10⁶⌋
    *   rate_bp= ⌊take_s · 10⁴ / n_s⌋            (feed to mixtureSample)
    * A target source absent from the data drives T_max to 0 — the
    * honest "this blend is infeasible", never a silent renormalize;
    * sources outside the target list are simply not in the plan (absent
    * rows, not rate-0 rows), and a zero-count target source emits
    * take_rows 0 with rate_bp NULL (0 div 0 — there is nothing to
    * sample from). Counts fold map-side; the target list and the one-row T_max
    * broadcast — no shuffle beyond the count. n·10⁶ passes a long to
    * ~9·10¹² rows per source. */
  def mixtureWeights(df: DataFrame, sourceCol: String,
      targetsPpm: Seq[(String, Long)]): DataFrame = {
    require(targetsPpm.nonEmpty, "need at least one target share")
    require(targetsPpm.map(_._2).sum <= 1000000L,
      "target shares exceed 10^6 ppm")
    require(targetsPpm.forall(_._2 > 0), "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targetsPpm.toDF(sourceCol, "target_ppm")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
    val joined = tgt.join(counts, Seq(sourceCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val feas = joined
      .agg(min(expr("n * 1000000 div target_ppm")).as("t_max"))
    joined.crossJoin(broadcast(feas))
      .withColumn("take_rows", expr("t_max * target_ppm div 1000000"))
      .withColumn("rate_bp",
        expr("CAST(take_rows * 10000 div NULLIF(n, 0) AS BIGINT)"))
      .select(col(sourceCol), col("n"), col("target_ppm"), col("t_max"),
        col("take_rows"), col("rate_bp"))
  }

  /** Balanced down-sample: every group reduced to the size of the
    * SMALLEST group, survivors chosen by the [[hashSample]] order
    * (smallest sha256(id) first) — the class-rebalancing step of a
    * training mix, fully deterministic. The per-group cap is a one-row
    * aggregate broadcast back (no second pass over per-group state). */
  def balancedSample(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val minSize = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_gn"))
      .agg(min(col("_gn")).as("_cap"))
    // the data-dependent column cap can never fire WindowGroupLimit, so
    // a rank window over the (enum) stratum key would one-task-sort each
    // whole stratum (the q268 class; round-9 enum lint) — the rank rides
    // Layout.groupedGlobalRank instead (range-partitioned global rank
    // minus broadcast per-stratum offsets)
    Layout.groupedGlobalRank(df, Seq(groupCol),
        Seq(sha2(col(idCol).cast("string"), 256), col(idCol)), "rk")
      .crossJoin(broadcast(minSize))
      .filter(col("rk") <= col("_cap"))
      .drop("_cap")
  }

  /** Stratified sample with deterministic per-stratum fractions
    * (`df.stat.sampleBy`): the training-mix lever — e.g. keep 100% of a
    * rare language, 5% of boilerplate. Seeded, so re-runs of the same
    * pipeline see the same sample; per-row Bernoulli, so it streams —
    * no per-stratum state or shuffle at all. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Systematic probability-proportional-to-size sampling, per group:
    * exactly `nPerGroup` rows per group (fewer only if the group has
    * fewer rows), each row's inclusion probability proportional to its
    * integer weight. Rows sort by id within the group, the running weight
    * W_i is computed, and row i is selected iff the interval
    * (W_i−w_i, W_i] contains one of the n evenly-spaced boundaries
    * k·total/n — tested as `(W_i·n) div total > ((W_i−w_i)·n) div total`,
    * pure integer arithmetic, no RNG. Deterministic, reproducible,
    * engine-independent — the weighted counterpart of the sha256 rate
    * samplers ([[hashSample]] / [[mixtureSample]]), for when the quota is
    * an exact COUNT (shard budgets) rather than a rate.
    *
    * One window per group (running sum + group total share the sort);
    * partitioned by the group key, so no global single-partition pass.
    * Bound: W_i·n must fit a long — fine to ~10¹⁴ weight-sum per group
    * at n ≤ 10⁴. Output: input row + `pick_idx` (0-based boundary index).
    * Weights must be positive. */
  /** Exact-total stratified sample: `totalSlots` rows overall, strata
    * quotas set by largest-remainder allocation on stratum sizes
    * ([[Analytics.largestRemainderAlloc]] — Σ quotas = totalSlots
    * exactly), rows within each stratum picked in sha256(id) order (the
    * repo-standard reproducible shuffle) up to the quota. The exact-COUNT
    * counterpart of [[balancedSample]]'s per-stratum fixed n and
    * [[mixtureSample]]'s rates — use it when the downstream budget is a
    * hard row count. One count aggregation (quotas broadcast back) + one
    * per-stratum window sort. Output: input row + `pick_rank` (1-based
    * within stratum). */
  def quotaStratifiedSample(df: DataFrame, stratumCol: String,
      idCol: String, totalSlots: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("_n"))
    val quotas = Analytics
      .largestRemainderAlloc(counts, stratumCol, "_n", totalSlots)
      .select(col(stratumCol), col("alloc").as("_quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(sha2(col(idCol).cast("string"), 256), col(idCol))
    // the LITERAL totalSlots conjunct makes the rank filter
    // WindowGroupLimit-eligible (per-input-partition top-k heaps run
    // BEFORE the stratum shuffle); the column-quota conjunct alone
    // would not fire the rewrite and the window would sort each whole
    // stratum in one task. Every quota is <= totalSlots by
    // largest-remainder construction, so semantics are unchanged.
    df.join(broadcast(quotas), Seq(stratumCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= lit(totalSlots) && col("_rn") <= col("_quota"))
      .withColumn("pick_rank", col("_rn"))
      .drop("_rn", "_quota")
  }

  def ppsSystematicSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1, s"nPerGroup must be >= 1, got $nPerGroup")
    // two-phase prefix sum (the abcClasses/budgetedSelect recipe): a
    // running-weight window partitioned by a low-cardinality group key
    // would stream every group through one task; instead the
    // (group, id) order is range-partitioned, prefix sums run locally,
    // and broadcast per-(group, bucket) offsets complete them
    // (localCheckpoint pins one partitioner for both branches)
    val bucketed = df
      .repartitionByRange(64, col(groupCol), col(idCol))
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy(col(groupCol), col("_b"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = bucketed.groupBy(col(groupCol), col("_b"))
      .agg(sum(col(weightCol)).as("_bs"))
      .withColumn("_off", coalesce(
        sum(col("_bs")).over(Window.partitionBy(col(groupCol))
          .orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(groupCol), col("_b"), col("_off"))
    val tot = bucketed.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).as("_tot"))
    bucketed
      .withColumn("_lrun", sum(col(weightCol)).over(wLoc))
      .join(broadcast(offs), Seq(groupCol, "_b"))
      .join(broadcast(tot), Seq(groupCol))
      .withColumn("_cum", col("_lrun") + col("_off"))
      .filter(expr(s"(_cum * $nPerGroup) div _tot") >
        expr(s"((_cum - $weightCol) * $nPerGroup) div _tot"))
      .withColumn("pick_idx",
        expr(s"((_cum - $weightCol) * $nPerGroup) div _tot"))
      .drop("_cum", "_tot", "_lrun", "_off", "_b")
  }

  /** Flesch–Kincaid-style readability as exact integer fractions — the
    * curation signal that flags run-on machine text (high grade) and
    * listicle fragments (implausibly low) without a language model.
    *
    * Heuristics, chosen to be identical cross-engine: words = whitespace
    * tokens; syllables = maximal vowel-group runs `[aeiouy]+` of the
    * lowercased text (vowel groups never span a space, so the doc-level
    * count equals the per-word sum); sentences = count of `.!?` chars,
    * floored at 1. The FK grade 0.39·W/S + 11.8·Syl/W − 15.59 is returned
    * as the single fraction
    *   fk_num / fk_den = (39·W² + 1180·Syl·S − 1559·S·W) / (100·S·W)
    * (null when a doc has no words). Pure per-row projection — no
    * shuffle, runs unchanged on a stream. */
  def readabilityScores(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val nWords = size(tokensOf(col(textCol))).cast("long")
    val nSyll = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val nSent = greatest(
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[.!?]", ""))).cast("long"),
      lit(1L))
    docs.select(col(idCol), nWords.as("n_words"), nSyll.as("n_syllables"),
        nSent.as("n_sentences"))
      .withColumn("fk_num", when(col("n_words") > 0,
        lit(39L) * col("n_words") * col("n_words") +
          lit(1180L) * col("n_syllables") * col("n_sentences") -
          lit(1559L) * col("n_sentences") * col("n_words")))
      .withColumn("fk_den", when(col("n_words") > 0,
        lit(100L) * col("n_sentences") * col("n_words")))
  }

  /** Character-class profile per group — the cheap mojibake/encoding
    * screen run before any tokenizer: per slice the exact character
    * masses of lowercase letters, digits, spaces, and everything else
    * (counted as length deltas under class-stripping regexes — both
    * engines agree on these POSIX classes), with floored ppm shares.
    * A non-letter share spiking on one source is the classic symptom of
    * double-encoded or binary-contaminated text. Pure projection + one
    * fold; streams unchanged. */
  def charsetProfile(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    def classLen(pattern: String) =
      length(regexp_replace(col(textCol), pattern, "")).cast("long")
    docs
      .select(col(groupCol), length(col(textCol)).cast("long").as("_c"),
        (length(col(textCol)) - classLen("[a-z]")).cast("long").as("_a"),
        (length(col(textCol)) - classLen("[0-9]")).cast("long").as("_d"),
        (length(col(textCol)) - classLen("[ ]")).cast("long").as("_s"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_c")).as("chars"),
        sum(col("_a")).as("alpha"), sum(col("_d")).as("digit"),
        sum(col("_s")).as("space"))
      .select(col(groupCol), col("n_docs"), col("chars"), col("alpha"),
        col("digit"), col("space"),
        (col("chars") - col("alpha") - col("digit") - col("space"))
          .as("other"),
        expr("alpha * 1000000 div NULLIF(chars, 0)").as("alpha_ppm"),
        expr("""(chars - alpha - digit - space) * 1000000
                div NULLIF(chars, 0)""").as("other_ppm"))
  }

  /** Markup/noise density per document — the web-scrape curation signal
    * [[charsetProfile]]'s character classes can't see: counts of
    * HTML-ish tags (`<div ...>`, `</p>`, `<br/>`), entity references
    * (`&amp;` / `&#233;`), and URL tokens, plus the total characters
    * those matches cover (via the same length-delta-under-stripping
    * trick as charsetProfile) and their share of the doc in basis
    * points. High markup_bp means the extractor upstream failed and the
    * "text" is still HTML — drop or re-extract, don't tokenize. The
    * regexes are deliberately in the Java∩RE2 portable subset (no
    * backrefs, no lookaround) so an SQL oracle reproduces them. Pure
    * per-row projection: scan-only, codegen, streams unchanged. */
  def markupDensity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tagPat = "<[a-zA-Z/][^<>]*>"
    val entPat = "&[a-zA-Z]+;|&#[0-9]+;"
    val urlPat = "https?://[^ ]+"
    def nMatches(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long")
    def coveredChars(pat: String) =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), pat, ""))).cast("long")
    docs.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        nMatches(tagPat).as("n_tags"),
        nMatches(entPat).as("n_entities"),
        nMatches(urlPat).as("n_urls"),
        (coveredChars(tagPat) + coveredChars(entPat) + coveredChars(urlPat))
          .as("markup_chars"))
      .withColumn("markup_bp",
        expr("markup_chars * 10000 div NULLIF(n_chars, 0)"))
  }

  /** Temperature-reweighted source sampling plan at α = ½ — the standard
    * multilingual/multi-source rebalancing move (sample source s with
    * probability ∝ n_s^α, α < 1 upweights small sources) at the one α
    * where the plan stays integer-exact cross-engine: rate ∝ ⌊√n_s⌋
    * (IEEE sqrt is correctly rounded, so both engines floor the same
    * value; exact for n < 2⁵², far past any per-source doc count).
    * Given a target total of `totalRows`:
    *   take_s = min(n_s, ⌊totalRows · ⌊√n_s⌋ / Σ⌊√n⌋⌋)   (never
    *            oversamples; `capped` marks sources that hit n_s)
    *   rate_bp = ⌊take_s · 10⁴ / n_s⌋                     (feed to
    *            [[mixtureSample]])
    * Counts fold map-side; the one-row Σ⌊√n⌋ broadcasts back — the
    * same shuffle shape as [[mixtureWeights]] (which plans an EXACT
    * target blend; this derives the blend from corpus sizes). */
  def temperatureWeights(df: DataFrame, sourceCol: String,
      totalRows: Long): DataFrame = {
    require(totalRows > 0, "totalRows must be positive")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .withColumn("isqrt_n", floor(sqrt(col("n").cast("double"))).cast("long"))
    val denom = counts.agg(sum(col("isqrt_n")).as("_den"))
    counts.crossJoin(broadcast(denom))
      .withColumn("_raw", expr(
        s"CAST(CAST($totalRows AS DECIMAL(38,0)) * isqrt_n div _den AS BIGINT)"))
      .withColumn("take_rows", least(col("n"), col("_raw")))
      .withColumn("capped", col("_raw") > col("n"))
      .withColumn("rate_bp", expr("take_rows * 10000 div n"))
      .select(col(sourceCol), col("n"), col("isqrt_n"), col("take_rows"),
        col("capped"), col("rate_bp"))
  }

  /** Per-shard dataset manifest — the reproducibility artifact a training
    * run pins its data to: for each deterministic shard (sha256-prefix of
    * the id, the repo-standard recipe, so assignment survives repartition
    * and engine changes), the doc count, character and whitespace-token
    * masses, and an ORDER-INDEPENDENT content digest
    *   digest = (Σ_docs first-8-hex-digits-of-sha256(text)) mod p,
    * p = 9223372036854775783 (the largest prime < 2⁶³). Order
    * independence is what makes the digest layout-stable: addition
    * commutes, so any partitioning/merge order produces the same value,
    * unlike a hash-of-concatenation. The sum is widened to decimal(38,0)
    * before the mod (10¹² docs × 2³² per term overflows a long). Two
    * identical manifests ⇒ byte-equivalent shard content with
    * probability 1 − ~n²/p per shard. One combiner-friendly groupBy. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0)
    val h8 = conv(substring(sha2(col(textCol), 256), 1, 8), 16, 10)
      .cast("long")
    docs
      .select(
        (conv(substring(sha2(col(idCol).cast("string"), 256), 1, 4), 16, 10)
          .cast("long") % nShards).as("shard"),
        length(col(textCol)).cast("long").as("_c"),
        size(call_function("sp_tokens", col(textCol)))
          .cast("long").as("_t"),
        h8.as("_h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_c")).as("n_chars"),
        sum(col("_t")).as("n_tokens"),
        expr("CAST(CAST(sum(_h) AS DECIMAL(38,0)) % " +
          "9223372036854775783 AS BIGINT)").as("digest"))
  }

  /** Kish effective sample size of a weighted sample per group:
    *   n_eff = (Σw)² / Σw²
    * — how many EQUAL-weight observations the weighted set is actually
    * worth (the design-effect check for importance-weighted corpora:
    * a temperature-mixed corpus of 10⁹ docs whose weights concentrate
    * on 10⁶ of them trains like 10⁶ docs, and this is the number that
    * says so). Exact integer cross-multiplication in decimal(38,0),
    * emitted as the floored fraction plus `deff_x100 = ⌊100·n/n_eff⌋`
    * (design effect ≥ 100 ⇔ any weighting at all). One combiner-
    * friendly aggregation. */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(weightCol).cast(d38)).as("_sw"),
        sum(col(weightCol).cast(d38) * col(weightCol)).as("_sww"))
      .select(col(groupCol), col("n"),
        col("_sw").cast("long").as("sum_w"),
        expr("CAST(_sw * _sw div NULLIF(_sww, 0) AS BIGINT)")
          .as("n_eff"),
        expr("""CAST(CAST(n AS DECIMAL(38,0)) * _sww * 100
                div NULLIF(_sw * _sw, 0) AS BIGINT)""").as("deff_x100"))
  }

  /** Variance-proportional stratified sample allocation: distribute a
    * fixed labeling/eval budget across strata in proportion to
    * N_h·s²_h — the "spend annotations where the data actually varies"
    * plan (the integer-exact cousin of Neyman allocation, which weights
    * by σ and would need a square root). Weights are the floored exact
    * fraction w_h = (n_h·Σx² − (Σx)²)/(n_h − 1) ≥ 0 in decimal(38,0)
    * (singleton strata weigh 0 — no variance evidence), and the integer
    * split is [[Analytics.largestRemainderAlloc]], so allocations sum to
    * the budget EXACTLY. `alloc_capped` additionally clamps each stratum
    * to its population. Precondition: at least one stratum with n_h ≥ 2
    * and nonconstant values (total weight > 0). One stats shuffle +
    * the enum-sized allocation pass. */
  def varianceAllocation(df: DataFrame, stratumCol: String,
      valueCol: String, budget: Long): DataFrame = {
    val d38 = "decimal(38,0)"
    val stats = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_h"),
        sum(col(valueCol).cast(d38)).as("_sx"),
        sum(col(valueCol).cast(d38) * col(valueCol)).as("_sxx"))
      .withColumn("w", expr(
        """CAST(CASE WHEN n_h > 1
             THEN (n_h * _sxx - _sx * _sx) div (n_h - 1)
             ELSE 0 END AS BIGINT)"""))
    Analytics.largestRemainderAlloc(
        stats.select(col(stratumCol), col("w")), stratumCol, "w", budget)
      .join(stats.select(col(stratumCol), col("n_h")), Seq(stratumCol))
      .select(col(stratumCol), col("n_h"), col("weight"), col("alloc"),
        least(col("alloc"), col("n_h")).as("alloc_capped"))
  }

  /** Nucleus (top-p) filter per group: the SMALLEST weight-desc prefix
    * whose cumulative weight reaches `pBp`/10⁴ of the group total — the
    * mass-coverage truncation used for vocab cutoffs, sampler nucleus
    * sets, and "which sources carry 95% of the corpus" reports. A row is
    * kept iff the mass BEFORE it is still short of the target, so the
    * crossing row is included and the kept set is minimal; ordering ties
    * break by id for a total order. Exact integer test
    * (cum_before·10⁴ < total·pBp, decimal-widened); rank and cumulative
    * mass ride one two-phase range-bucketed pass
    * ([[Layout.addRunningSums]] — the group key is typically an enum, so
    * a partitioned window would one-task-sort each group; round-9 enum
    * lint) plus a broadcast of enum-sized group totals. Output: kept
    * rows with rank, cumulative weight, and the group total. */
  def nucleusFilter(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, pBp: Int): DataFrame = {
    require(pBp >= 1 && pBp <= 10000, s"pBp must be in 1..10000: $pBp")
    val d38 = "decimal(38,0)"
    val sort = Seq(col(weightCol).desc, col(idCol))
    val totals = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol).cast(d38)).as("_tot"))
    val bucketed = Layout.bucketize(
      df.select(col(groupCol), col(idCol), col(weightCol)),
      col(groupCol) +: sort)
    Layout.addRunningSums(bucketed, Seq(groupCol), sort,
        Seq(lit(1L) -> "rank", col(weightCol).cast(d38) -> "cum"))
      .join(broadcast(totals), Seq(groupCol))
      .filter((col("cum") - col(weightCol)) * lit(10000) <
        col("_tot") * lit(pBp))
      .select(col(groupCol), col(idCol), col(weightCol), col("rank"),
        col("cum").cast("long").as("cum_weight"),
        col("_tot").cast("long").as("total_weight"))
  }

  /** Line-level exact dedup (the CCNet-style boilerplate scrub that runs
    * BEFORE document-level near-dup): every document is split on `\n`,
    * each non-empty line's corpus-wide occurrence count is taken, and
    * lines occurring more than `maxDf` times — nav bars, cookie banners,
    * footers — are dropped from EVERY document (all copies, not
    * keep-first: a line that common is boilerplate, not content). The
    * surviving lines are reassembled in original order.
    *
    * Conventions (mirrored literally by the oracle): lines are matched
    * byte-exact (no trim/case fold — normalize upstream if wanted);
    * empty lines are dropped before counting and never count toward
    * `n_lines`; a fully-scrubbed document reassembles to the empty
    * string (its sha = sha256 of zero bytes), not NULL.
    *
    * Output per doc: `n_lines` (non-empty input lines), `n_kept`,
    * `chars_kept` (newline separators excluded), and `clean_sha`
    * (sha256 hex of the reassembled text) — the digest rather than the
    * text so downstream compares stay narrow; callers wanting the text
    * re-run the same plan minus the hash.
    *
    * Shape: one explode, one combiner-friendly line count, one equi-join
    * back on the line, one per-doc fold — no self-joins, no windows. The
    * line-count shuffle keys on the raw line string for cross-engine
    * parity; a 100 TB run would key on xxhash64(line) and carry the
    * string only through the map side (same plan, narrower exchange,
    * collision odds ~n²/2⁶⁴). Per-doc collect_list is bounded by
    * document size, the same bound chunkText already relies on. */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Int): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(col("line") =!= "")
    val freq = lines.groupBy(col("line")).agg(count(lit(1)).as("_df"))
    lines.join(freq, Seq("line"))
      .withColumn("_keep", col("_df") <= maxDf)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), length(col("line"))).otherwise(0L))
          .as("chars_kept"),
        sha2(concat_ws("\n", transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line"))), 256).as("clean_sha"))
  }

  /** Epoch/oversampling plan for a token-budgeted training mix: given
    * per-source available tokens and target mixture shares (basis
    * points), how many tokens each source must contribute, how many
    * EPOCHS of it that means (ceil), and the oversampling rate — the
    * table a pretraining run signs off on before the dataloader is
    * built (a 40-epoch small source is a memorization risk the plan
    * must surface, not hide).
    *
    * All integral: needed = budget·bp div 10⁴, epochs = ceil-div,
    * oversample_bp = needed·10⁴ div available. Sources in the target
    * list but absent from the corpus emit NULL epochs (loudly
    * unplannable); corpus sources outside the target get share 0. One
    * combiner-friendly aggregation + a broadcast of the (tiny) target
    * table. */
  def epochPlan(docs: DataFrame, sourceCol: String, textCol: String,
      targets: Seq[(String, Int)], budgetTokens: Long): DataFrame = {
    require(targets.nonEmpty && targets.map(_._2).forall(_ >= 0) &&
      targets.map(_._2).sum == 10000, "target shares must sum to 10000 bp")
    require(budgetTokens > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val avail = docs.select(col(sourceCol).as("source"),
        size(tokensOf(col(textCol))).cast("long").as("_t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("tokens_avail"))
    val tgt = targets.toDF("source", "target_bp")
      .select(col("source"), col("target_bp").cast("long"))
    avail.join(broadcast(tgt), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("tokens_avail"), lit(0L)).as("tokens_avail"),
        coalesce(col("target_bp"), lit(0L)).as("target_bp"))
      .withColumn("tokens_needed",
        expr(s"$budgetTokens * target_bp div 10000"))
      .withColumn("epochs", when(col("tokens_needed") === 0, lit(0L))
        .otherwise(when(col("tokens_avail") > 0,
          expr("(tokens_needed + tokens_avail - 1) div tokens_avail"))))
      .withColumn("oversample_bp", when(col("tokens_avail") > 0,
        expr("tokens_needed * 10000 div tokens_avail")))
  }

  /** Context-window waste audit: for window size W, what truncation
    * throws away versus what chunk-padding burns — the two standard
    * policies' cost, per source, from one aggregation:
    *
    *   trunc_waste = Σ max(tokens − W, 0)      (tail tokens dropped)
    *   n_chunks    = Σ ⌈tokens / W⌉
    *   pad_waste   = Σ (⌈tokens/W⌉·W − tokens)  (padding burned)
    *
    * plus the over-window doc count. Empty docs contribute one empty
    * chunk under the convention ⌈0/W⌉ = 0 (they vanish — both engines
    * agree because the ceil-div identity (t + W − 1) div W is 0 at
    * t = 0). The numbers that decide whether a corpus ships truncated,
    * chunked, or packed (q64). */
  def windowWaste(docs: DataFrame, sourceCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1)
    docs.select(col(sourceCol).as("source"),
        size(tokensOf(col(textCol))).cast("long").as("_t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_t")).as("tokens"),
        sum(when(col("_t") > window, 1L).otherwise(0L)).as("n_over"),
        sum(greatest(col("_t") - window, lit(0L))).as("trunc_waste"),
        sum(expr(s"(_t + $window - 1) div $window")).as("n_chunks"))
      .withColumn("pad_waste",
        col("n_chunks") * window - col("tokens"))
  }

  /** Marker-hit language argmax over per-language score columns `p(lang)`
    * — the exact tie policy of `graft.functions.Text.languageId`
    * (alphabetically first wins), shared by doc- and chunk-granularity
    * language ID so the two can never drift. */
  private def langArgmax(p: String => Column): Column =
    when(p("de") >= p("en") && p("de") >= p("es") &&
         p("de") >= p("fr") && p("de") >= p("nl"), "de")
      .when(p("en") >= p("es") && p("en") >= p("fr") && p("en") >= p("nl"), "en")
      .when(p("es") >= p("fr") && p("es") >= p("nl"), "es")
      .when(p("fr") >= p("nl"), "fr")
      .otherwise("nl")

  /** Chunk-granularity code-switching detector: split each document into
    * fixed `chunkTokens`-token windows, language-ID each chunk with the same
    * marker profiles as the doc-level operator (q30), and report how many
    * chunks disagree with the document's overall prediction — the
    * mixed-language screen a multilingual curation pipeline runs before
    * trusting one doc-level language tag (embedded boilerplate, quoted
    * passages, concatenated crawls).
    *
    * The doc-level prediction is the argmax over SUMMED chunk marker
    * counts — identical to scoring the whole text, since token windows
    * never split tokens — so one explode feeds both granularities. Plan:
    * one generator + two combiner-friendly aggregations + one doc-key
    * join; zero-token documents are absent (nothing to classify).
    * Returns (id, lang_pred, n_chunks, n_switched, mix_bp). */
  def langMixChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 16): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    val profiles = graft.functions.Text.langProfiles
    val toks = docs.select(col(idCol),
        posexplode(call_function("sp_tokens", col(textCol)))
          .as(Seq("pos", "tok")))
      .select(col(idCol), expr(s"CAST(pos div $chunkTokens AS BIGINT)").as("chunk"),
        lower(col("tok")).as("tok"))
    val chunkAggs = profiles.map { case (lang, set) =>
      sum(when(col("tok").isInCollection(set.toSeq), 1L).otherwise(0L))
        .as(s"s_$lang")
    }
    val perChunk = toks.groupBy(col(idCol), col("chunk"))
      .agg(chunkAggs.head, chunkAggs.tail: _*)
      .withColumn("chunk_pred", langArgmax(l => col(s"s_$l")))
    val docAggs = profiles.map { case (lang, _) =>
      sum(col(s"s_$lang")).as(s"d_$lang")
    }
    val docPred = perChunk.groupBy(col(idCol))
      .agg(docAggs.head, docAggs.tail: _*)
      .select(col(idCol), langArgmax(l => col(s"d_$l")).as("lang_pred"))
    perChunk.join(docPred, Seq(idCol))
      .groupBy(col(idCol), col("lang_pred"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_pred") =!= col("lang_pred"), 1L).otherwise(0L))
          .as("n_switched"))
      .withColumn("mix_bp", expr("n_switched * 10000 div n_chunks"))
  }

  /** ROUGE-N clipped n-gram overlap between paired texts — the standard
    * summarization/paraphrase overlap metric, used in a data pipeline to
    * score candidate-reference pairs (distillation outputs vs sources,
    * rewrite quality, near-dup triage beyond set-Jaccard: ROUGE keeps
    * MULTIPLICITY, so "the the the" can't fake overlap the way a distinct
    * shingle set can).
    *
    * Input is one row per pair (id, candidate text, reference text).
    * Returns per pair the clipped overlap Σ_g min(tf_cand(g), tf_ref(g))
    * over word n-grams, both gram totals, and floored-bp precision
    * (clipped/cand), recall (clipped/ref) and F1 — which for counts is
    * EXACTLY 2·clipped/(cand+ref), so all three are integer rationals
    * with no float in the fixture. Sides with fewer than n words have 0
    * grams and NULL for the affected ratios (0/0 is surfaced, not 0).
    *
    * Shape: ONE tagged explode over both sides' native `word_ngrams`
    * (two arrays concat'ed per row — not a per-side scan-and-union,
    * which would re-run the possibly-expensive pair input twice), one
    * (pair, gram) combiner groupBy for the clipped sum — and the gram
    * TOTALS come from that same pass (cand_grams = Σ_g tf_cand, not a
    * second `word_ngrams` evaluation in a spine branch; round 8 dropped
    * that branch, which was recomputing every n-gram array just to take
    * its size — q394 ran both branches through its lead-window input).
    * The id-only spine restores gram-less pairs (both sides < n words)
    * with NULL ratios via NULLIF — 0/0 is surfaced, not 0. */
  def rougeN(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def ngrams(c: Column) = call_function("word_ngrams", c, lit(n))
    val base = pairs.select(col(pairIdCol).as("pair_id"),
      col(candCol).as("_c"), col(refCol).as("_r"))
    val perGram = base.select(col("pair_id"), explode(concat(
        transform(ngrams(col("_c")),
          g => struct(g.as("g"), lit(0).as("s"))),
        transform(ngrams(col("_r")),
          g => struct(g.as("g"), lit(1).as("s"))))).as("e"))
      .groupBy(col("pair_id"), col("e.g").as("g"))
      .agg(sum(when(col("e.s") === 0, 1L).otherwise(0L)).as("_cc"),
        sum(when(col("e.s") === 1, 1L).otherwise(0L)).as("_rc"))
    val perPair = perGram.groupBy(col("pair_id"))
      .agg(sum(least(col("_cc"), col("_rc"))).as("_cl"),
        sum(col("_cc")).as("_cg"), sum(col("_rc")).as("_rg"))
    base.select(col("pair_id"))
      .join(perPair, Seq("pair_id"), "left")
      .select(col("pair_id"),
        coalesce(col("_cl"), lit(0L)).as("clipped"),
        coalesce(col("_cg"), lit(0L)).as("cand_grams"),
        coalesce(col("_rg"), lit(0L)).as("ref_grams"))
      .withColumn("p_bp", expr("clipped * 10000 div NULLIF(cand_grams, 0)"))
      .withColumn("r_bp", expr("clipped * 10000 div NULLIF(ref_grams, 0)"))
      .withColumn("f1_bp",
        expr("clipped * 20000 div NULLIF(cand_grams + ref_grams, 0)"))
  }

  /** Shuffle mixing audit: does the [[deterministicShuffle]] order
    * actually interleave the groups (sources), or do runs of same-source
    * documents survive into the shards? Homogeneous stretches in a
    * training shard correlate adjacent gradients — this measures the
    * residual clumping per shard against the exact expected run count of
    * a uniform random permutation of the same composition:
    *   E[runs] = n − Σ_s n_s(n_s−1)/n
    * (adjacent-equal probability summed over pairs). Emits per shard the
    * observed runs, `exp_runs_milli`, and `ratio_milli` =
    * observed/expected ×1000 — a healthy shuffle reads ≈1000; well below
    * means clumped input survived. Shard-partitioned windows only; the
    * single global step is the O(#rank-partitions) offset fold inside
    * the shuffle itself. */
  def shuffleMixAudit(df: DataFrame, idCol: String, groupCol: String,
      shards: Int): DataFrame = {
    val keyed = df.select(col(idCol), col(groupCol))
    val sh = deterministicShuffle(keyed, idCol, shards).join(keyed, Seq(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_idx"))
    val runs = sh
      .withColumn("_prev", lag(col(groupCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_prev") =!= col(groupCol), 1L)
          .otherwise(0L))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(col("_new")).as("n_runs"))
    val comp = sh.groupBy(col("shard"), col(groupCol))
      .agg(count(lit(1)).as("_ns"))
      .groupBy(col("shard"))
      .agg(sum(expr("CAST(_ns AS DECIMAL(38,0)) * (_ns - 1)")).as("_same"))
    runs.join(comp, Seq("shard"))
      .withColumn("_exp_milli", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * n - _same) * 1000 div n AS BIGINT)"))
      .select(col("shard"), col("n"), col("n_runs"), col("_exp_milli")
        .as("exp_runs_milli"),
        expr("CAST(CAST(n_runs AS DECIMAL(38,0)) * 1000000 " +
          "div NULLIF(_exp_milli, 0) AS BIGINT)").as("ratio_milli"))
  }

  /** Budgeted quality-first corpus selection: fill a global token budget
    * with the best-scoring documents, subject to a per-source token cap
    * — the "take the best data we can afford, but let no source dominate"
    * step that sits between scoring (quality/DSIR weights) and the final
    * shard write. Deterministic two-constraint greedy:
    *
    *  1. per-source pass: inside each source, rank by (score desc, id)
    *     and keep the prefix whose running cost stays ≤ `perSourceCap`
    *     (a source-partitioned window — one shuffle on source);
    *  2. global pass: over the survivors, rank globally by (score desc,
    *     id) and keep the prefix whose running cost stays ≤ `budget`.
    *
    * The global prefix sum is NOT a single-partition window: survivors
    * are range-partitioned on the rank key (the [[deterministicShuffle]]
    * two-phase construction), each partition cumsums in parallel, and
    * the per-partition totals (one row per partition, broadcast) supply
    * the offsets — the only single-partition step is the O(#partitions)
    * offset cumsum. Returns per source: candidate and selected counts
    * and token mass — the report a mixture planner reads next to
    * [[mixtureWeights]]. */
  def budgetedSelect(df: DataFrame, sourceCol: String, idCol: String,
      costCol: Column, scoreCol: Column, budget: Long, perSourceCap: Long,
      rankPartitions: Int = 32): DataFrame = {
    require(budget > 0 && perSourceCap > 0)
    val d = df.select(col(sourceCol).as("_src"), col(idCol).as("_id"),
      costCol.cast("long").as("_c"), scoreCol.cast("long").as("_sc"))
    val wSrc = Window.partitionBy(col("_src"))
      .orderBy(col("_sc").desc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val capped = d.withColumn("_run", sum(col("_c")).over(wSrc))
      .filter(col("_run") <= perSourceCap)
      .drop("_run")
    val bucketed = capped
      .repartitionByRange(rankPartitions, col("_sc").desc, col("_id").asc)
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("_b"))
      .orderBy(col("_sc").desc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketed.groupBy(col("_b"))
      .agg(sum(col("_c")).as("_sz"))
      .withColumn("_off", coalesce(
        sum(col("_sz")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val selected = bucketed
      .withColumn("_lrun", sum(col("_c")).over(wLoc))
      .join(broadcast(offsets), "_b")
      .filter(col("_off") + col("_lrun") <= budget)
    val candAgg = capped.groupBy(col("_src"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("_c")).as("cost_candidates"))
    val selAgg = selected.groupBy(col("_src"))
      .agg(count(lit(1)).as("n_selected"), sum(col("_c")).as("cost_selected"))
    candAgg.join(selAgg, Seq("_src"), "left")
      .select(col("_src").as(sourceCol), col("n_candidates"),
        col("cost_candidates"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("cost_selected"), lit(0L)).as("cost_selected"))
  }
}
