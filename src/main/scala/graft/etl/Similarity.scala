package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale dedup + similarity-search operators for training-data
  * pipelines: exact dedup, n-gram Jaccard, MinHash+LSH, SimHash banding,
  * and embedding ANN (brute-force baseline + LSH-bucketed scale path).
  *
  * Scale design notes (the point of each operator):
  *  - exact dedup: one shuffle on the content hash; combiner-friendly.
  *  - n-gram Jaccard: shuffle on shingle; the candidate join only ever
  *    materializes pairs that share a shingle (no O(n²) cross join).
  *  - MinHash+LSH: signatures are a narrow per-row map; the only shuffle is
  *    the (band, bucket) groupBy, and bucket sizes bound pair generation.
  *  - SimHash: per-row 64-bit sketch; near-dup candidates via band equality
  *    (pigeonhole: hamming ≤ 3 ⇒ one of 4 16-bit bands equal).
  *  - ANN brute force: broadcast the (small) query set, map-side top-k per
  *    partition via window; corpus is never shuffled except the final
  *    per-query k-row reduce.
  */
object Similarity {

  // ---------- exact dedup (hash groupBy) ----------

  /** Exact dedup on a text column: survivors keep the minimum id per
    * normalized content hash. Returns (hash, keep_id, dup_count). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("_h", sha2(col(textCol), 256))
      .groupBy(col("_h").as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  // ---------- word shingles ----------

  /** Distinct word n-gram shingles per row → (id, shingle), exploded.
    * The shingling itself is the native codegen `word_shingles` expression
    * ([[graft.plans.WordShingles]]) — one static-call pass per row,
    * replacing the interpreted five-HOF chain
    * (split→filter→sequence→transform(slice+join)→array_distinct) that
    * previously dominated the pre-shuffle cost of every shingle-keyed
    * dedup path (q26/q27/q134). */
  def explodeShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(call_function("word_shingles", col(textCol), lit(n)))
        .as("shingle"))

  /** Default skew cap for [[ngramJaccardPairs]]: one shingle contributes at
    * most cap·(cap−1)/2 ≈ 32.6k candidate pairs, generated INSIDE one
    * aggregated bucket row — never a c² self-join blowup. */
  val DefaultMaxShingleFreq = 256

  /** Honest-coverage audit of the shingle frequency cap: how much
    * signal does [[ngramJaccardPairs]]' boilerplate bar actually drop?
    * One row: distinct shingle types, total (doc, shingle) rows, the
    * types above `cap` and the row mass they carry, and `dropped_bp` —
    * the share of shingle evidence the capped plan never joins on. Run
    * before trusting a cap at a new corpus: navigation chrome pushes
    * this to thousands of bp (fine — that's boilerplate by definition);
    * a HIGH value on clean text means the cap is eating real n-grams
    * and should be raised. Two combiner-friendly aggregations. */
  def shingleCapAudit(df: DataFrame, idCol: String, textCol: String,
      n: Int, cap: Int = DefaultMaxShingleFreq): DataFrame = {
    val sh = explodeShingles(df, idCol, textCol, n).distinct()
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("c"))
    freq.agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_rows"),
        sum(when(col("c") > cap, 1L).otherwise(0L)).as("capped_types"),
        sum(when(col("c") > cap, col("c")).otherwise(0L)).as("capped_rows"))
      .withColumn("dropped_bp",
        expr("CAST(capped_rows * 10000 div NULLIF(n_rows, 0) AS BIGINT)"))
  }

  /** n-gram Jaccard candidate pairs: rows sharing ≥1 shingle, with exact
    * intersection/union counts (set semantics). Output:
    * (id_a, id_b, inter, union_size, size_a, size_b), id_a < id_b.
    *
    * Default (capped) path — the 100 TB shape: count shingle frequencies,
    * anti-join away shingles above `maxShingleFreq` BEFORE bucketing
    * (boilerplate: a shingle shared by c docs would emit c²/2 pairs — and
    * even collecting its id list would put a c-element array in one
    * aggregation buffer — the two scale-killers, both cut by the pre-cap),
    * group the surviving shingles into buckets, DROP singleton buckets
    * (exactness-preserving: a shingle seen once can pair with nothing — on
    * realistic corpora most shingles are unique), and explode bounded
    * in-bucket pairs. Counting the emitted pairs directly gives the exact intersection
    * over non-boilerplate shingles; a correction join (bounded by candidates
    * × hot-shingles-per-doc, never hot memberships²) adds intersections via
    * boilerplate shingles back in — so reported Jaccard is EXACT for every
    * emitted pair. Pairs whose every common shingle is boilerplate are
    * missed: the documented recall/scale tradeoff, same family as MinHash
    * band tuning. Shuffles: the bucket groupBy, the pair-count groupBy, and
    * the (usually empty) hot correction — all bounded.
    *
    * `maxShingleFreq = None` is the exact escape hatch: a direct self-join
    * on shingle with no cap — correct at any frequency but O(Σc²) pair rows;
    * only for corpora known to be boilerplate-free.
    *
    * Pure declarative plan since round 7 — no cache, no localCheckpoint.
    * A/B-measured at sf0.1/local[32] (graft.dev.MaterializationBench):
    * pure 2.27 s vs cached 2.57 s. Same rationale as
    * [[minhashDedupPairs]]: native `word_shingles` makes shingle recompute
    * a codegen'd scan pass, AQE reuses the heavy bucket-aggregation
    * exchange across consumers, and neither an exploded-table cache nor a
    * lineage-truncating checkpoint survives 100 TB / executor loss. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      maxShingleFreq: Option[Int] = Some(DefaultMaxShingleFreq)): DataFrame =
    ngramJaccardImpl(df, idCol, textCol, n, maxShingleFreq, materialize = false)

  /** [[ngramJaccardPairs]] with a pair-level sample predicate applied AT
    * CANDIDATE-PAIR STAGE — right after the in-bucket pair emission,
    * BEFORE the intersection aggregation — so a 1-in-m hash sample cuts
    * the pair-count shuffle (the engine's heaviest post-bucket stage) to
    * 1/m instead of filtering the finished pair table. Sound for any
    * predicate over (id_a, id_b) ONLY: it commutes with the per-pair
    * aggregation because it is a pure function of the group key (every
    * shingle row of a surviving pair survives; the hot-boilerplate
    * correction join starts from the already-filtered candidates). The
    * audits that measure per-pair RATES (q450's S-curve) ride this. */
  def ngramJaccardPairsSampled(df: DataFrame, idCol: String, textCol: String,
      n: Int, pairFilter: (Column, Column) => Column,
      maxShingleFreq: Option[Int] = Some(DefaultMaxShingleFreq)): DataFrame =
    ngramJaccardImpl(df, idCol, textCol, n, maxShingleFreq,
      materialize = false, pairFilter = Some(pairFilter))

  /** Alias kept for plan-shape assertions (historically the no-checkpoint
    * variant; since round 7 the public entry point IS the pure plan). */
  private[graft] def ngramJaccardPlan(df: DataFrame, idCol: String,
      textCol: String, n: Int,
      maxShingleFreq: Option[Int] = Some(DefaultMaxShingleFreq)): DataFrame =
    ngramJaccardImpl(df, idCol, textCol, n, maxShingleFreq, materialize = false)

  /** Directed n-gram containment pairs: (contained, container) where the
    * contained doc's shingle set is ≥ tauNum/tauDen inside the other doc —
    * the asymmetric near-dup test that catches quotes and subset
    * duplication Jaccard misses (a short doc embedded in a long one has
    * tiny Jaccard but containment ≈ 1). Rides the exact same capped
    * no-self-join candidate plan as [[ngramJaccardPairs]] (and shares its
    * documented boilerplate-only-pair recall caveat); the directed filter
    * is a pure integer cross-multiply, both directions emitted. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      tauNum: Int = 3, tauDen: Int = 4,
      maxShingleFreq: Option[Int] = Some(DefaultMaxShingleFreq)): DataFrame =
    containmentTunable(df, idCol, textCol, n, tauNum, tauDen, maxShingleFreq,
      materialize = false)

  /** Knob-separated variant for A/B measurement (dev.MaterializationBench);
    * the public entry point pins the measured winner (pure plan — the
    * union's two branches re-run only the post-exchange assembly joins,
    * the heavy bucket aggregation exchange is reused by AQE). */
  private[graft] def containmentTunable(df: DataFrame, idCol: String,
      textCol: String, n: Int, tauNum: Int = 3, tauDen: Int = 4,
      maxShingleFreq: Option[Int] = Some(DefaultMaxShingleFreq),
      materialize: Boolean): DataFrame = {
    val pairs = ngramJaccardImpl(df, idCol, textCol, n, maxShingleFreq,
      materialize = materialize)
    val ab = pairs.filter(col("inter") * tauDen >= col("size_a") * tauNum)
      .select(col("id_a").as("contained_id"), col("id_b").as("container_id"),
        col("inter"), col("size_a").as("contained_size"))
    val ba = pairs.filter(col("inter") * tauDen >= col("size_b") * tauNum)
      .select(col("id_b").as("contained_id"), col("id_a").as("container_id"),
        col("inter"), col("size_b").as("contained_size"))
    ab.unionByName(ba)
  }

  /** (id, token) frame whose per-doc token ARRAYS are computed once: the
    * pair engine consumes its token frame 3–4× (size census, hot-set
    * census, bucket collect, hot-correction join) and, un-pinned, every
    * consumer re-ran the per-doc fingerprint kernel (word_shingles /
    * winnow_fps) over the whole corpus — AQE exchange reuse dedupes
    * shuffles, not scans. The lazy checkpoint holds the COMPACT pre-explode
    * arrays (≈ text-sized, one row per doc); each consumer re-explodes
    * cheap rows. NOT the `materialize` knob Q162AB rejected — that cached
    * the EXPLODED row table and the pair table. Per-query-run storage,
    * released by Bench/Verify with every other checkpoint. */
  private def pinnedTokens(df: DataFrame, idCol: String, fps: Column): DataFrame =
    Parallelism.spread(df).select(col(idCol).as("id"), fps.as("_sha"))
      .localCheckpoint(eager = false)
      .select(col("id"), explode(col("_sha")).as("shingle"))

  private def ngramJaccardImpl(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxShingleFreq: Option[Int], materialize: Boolean,
      pairFilter: Option[(Column, Column) => Column] = None): DataFrame =
    intersectionPairsFromTokens(
      pinnedTokens(df, idCol,
        call_function("word_shingles", col(textCol), lit(n))),
      maxShingleFreq, materialize, pairFilter)

  /** The capped bucket-and-explode pair engine behind [[ngramJaccardPairs]]
    * / [[containmentPairs]] / [[winnowOverlapPairs]], generic over any
    * exploded (id, shingle) token frame: in-bucket pair emission bounded by
    * the frequency cap, hot-token exact correction join, size assembly.
    * Intersection counts are per (id, token) ROW — feed distinct tokens
    * per id for set semantics. Same recall caveat as the callers: pairs
    * sharing ONLY above-cap (boilerplate) tokens are not candidates. */
  private[graft] def intersectionPairsFromTokens(tokens: DataFrame,
      maxShingleFreq: Option[Int], materialize: Boolean,
      pairFilter: Option[(Column, Column) => Column] = None): DataFrame = {
    val sh = if (materialize) tokens.cache() else tokens
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    // caches created in the capped branch, released after final assembly
    var branchCaches: List[DataFrame] = Nil
    val pairs = maxShingleFreq match {
      case None =>
        // exact path: one self-join on shingle + pair-count aggregation
        val joined = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        val sampled = pairFilter match {
          case Some(p) => joined.filter(p(col("a.id"), col("b.id")))
          case None => joined
        }
        sampled
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
      case Some(cap) =>
        // bucket the ids per shingle, emit sorted in-bucket pairs from
        // inside the aggregated row (bounded by cap) — no self-join ever.
        // Counting the emitted pairs IS the exact intersection over the
        // [2, cap]-frequency shingles (singletons can't be shared).
        //
        // The cap is enforced BEFORE the collect: hot (> cap) shingles are
        // anti-joined away first, so no aggregation buffer ever holds more
        // than `cap` ids — without this, one boilerplate shingle shared by
        // c docs would materialize a c-element array in ONE buffer before
        // the size filter could drop it (c ~ 10⁹ at 100 TB ⇒ task OOM).
        // The hot SET is tiny even when its memberships are huge, so the
        // anti-join broadcasts; the same broadcast feeds the correction
        // join below (one exchange, two consumers). Semantics unchanged:
        // ≤-cap buckets are complete either way, > cap buckets were
        // dropped either way. CollectLintSpec audits this construction.
        val hotSet = sh.groupBy(col("shingle"))
          .agg(count(lit(1)).as("_freq"))
          .filter(col("_freq") > cap).select(col("shingle"))
        val buckets = sh.join(broadcast(hotSet), Seq("shingle"), "left_anti")
          .groupBy(col("shingle"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
        val emitted = buckets
          .filter(size(col("ids")) >= 2)
          .select(explode(flatten(
            transform(col("ids"), (x, i) =>
              transform(slice(col("ids"), i + 2, size(col("ids"))),
                y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        // the pair sample lands HERE — post-emission, pre-aggregation —
        // so the pair-count shuffle only ever carries surviving pairs
        val emittedSampled = pairFilter match {
          case Some(p) => emitted.filter(p(col("p.id_a"), col("p.id_b")))
          case None => emitted
        }
        val interCapped0 = emittedSampled
          .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .agg(count(lit(1)).as("inter_capped"))
        val interCapped =
          if (materialize) interCapped0.cache() else interCapped0
        if (materialize) branchCaches = interCapped :: branchCaches
        // correction: candidates may ALSO share boilerplate (> cap)
        // shingles; add those in via a join bounded by candidates ×
        // hot-shingles-per-doc (the hot shingle SET is tiny even when its
        // memberships are huge — membership lists are never pair-exploded).
        // The hot set comes from the COUNT-ONLY aggregation above, never
        // from `buckets`: re-deriving it there would rerun the collect_list
        // shuffle (the heaviest stage) a second time just to read sizes —
        // partial counts shuffle a few bytes per shingle instead of the
        // full id lists
        val shHot = sh.join(broadcast(hotSet), Seq("shingle"))
        val interHot = interCapped.select(col("id_a"), col("id_b"))
          .join(shHot.withColumnRenamed("id", "id_a"), "id_a")
          .join(shHot.withColumnRenamed("id", "id_b"), Seq("id_b", "shingle"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("inter_hot"))
        interCapped.join(interHot, Seq("id_a", "id_b"), "left")
          .na.fill(0, Seq("inter_hot"))
          .select(col("id_a"), col("id_b"),
            (col("inter_capped") + col("inter_hot")).as("inter"))
    }
    // materialize the (small) pair table eagerly so the shingle/pair caches
    // can be dropped here instead of leaking for the session's lifetime —
    // localCheckpoint blocks are GC-cleaned once the result is unreachable,
    // .cache() blocks are not
    val assembled = pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "size_b"), "id_b")
      .withColumn("union_size", col("size_a") + col("size_b") - col("inter"))
    if (!materialize) assembled
    else {
      val out = assembled.localCheckpoint()
      (sh :: branchCaches).foreach(_.unpersist())
      out
    }
  }

  /** Winnowing-fingerprint overlap pairs (the MOSS-style local-overlap
    * detector): doc pairs sharing at least `minShared` winnow fingerprints
    * ([[graft.functions.Text.winnow]]: k-char-gram rolling hashes,
    * window-minima, distinct). Winnowing guarantees any shared substring
    * of length ≥ k+window−1 leaves at least one common fingerprint, so
    * this catches LOCAL verbatim overlap — a copied paragraph inside an
    * otherwise-unrelated doc — that whole-doc Jaccard and MinHash dilute
    * away; the position-based complement of [[containmentPairs]]' token-set
    * test.
    *
    * `overlap_bp` = shared·10⁴ div min(n_fp) — the MOSS similarity,
    * integer-exact. Fingerprinting is the native codegen `winnow_fps`
    * expression (`graft.plans.Winnow`, registered by GraftExtensions) —
    * a per-doc sequential rolling hash that used to be the one justified
    * UDF in this family; candidate generation rides the exact same capped
    * bucket-and-explode engine as [[ngramJaccardPairs]], with the same
    * above-cap recall caveat (boilerplate fingerprints never pair-explode,
    * their intersections are corrected exactly for pairs already found). */
  def winnowOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, window: Int = 4, minShared: Int = 2,
      maxFpFreq: Option[Int] = Some(DefaultMaxShingleFreq)): DataFrame = {
    val fps = pinnedTokens(docs, idCol,
      call_function("winnow_fps", col(textCol), lit(k), lit(window)))
    intersectionPairsFromTokens(fps, maxFpFreq, materialize = false)
      .filter(col("inter") >= minShared)
      .select(col("id_a"), col("id_b"), col("inter").as("shared"),
        col("size_a").as("n_fp_a"), col("size_b").as("n_fp_b"),
        expr("CAST(inter * 10000 div least(size_a, size_b) AS BIGINT)")
          .as("overlap_bp"))
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature: for seed i, min over shingles of xxhash64(i, shingle).
    * Computed as one groupBy with `numHashes` min-aggregates — map-side
    * combine keeps the shuffle at one row per id. */
  def minhashSignatures(shingles: DataFrame, numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes)
      .map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    shingles.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: bucket = hash of each band's slice of the signature; docs
    * sharing any (band, bucket) become candidate pairs (distinct). */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = signatures.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** LSH banding S-curve plan — the tuning table that decides (bands,
    * rowsPerBand) BEFORE a 100 TB signature build commits to them: for a
    * grid of true Jaccard similarities s (step `stepBp` basis points),
    * the probability that at least one of `bands` bands collides,
    *   p(s) = 1 − (1 − s^r)^b ,
    * evaluated as a fixed left-associated chain of IEEE double
    * multiplications (no pow), so DuckDB running the identical chain
    * produces bit-identical values and the floored collide_bp matches
    * exactly. Read it as: everything above the curve's knee is found,
    * everything below is missed — move b·r to slide the knee onto the
    * dedup threshold. Driver-free and data-free (a `spark.range` over
    * the grid); one row per grid point. */
  def lshBandPlan(spark: SparkSession, bands: Int, rowsPerBand: Int,
      stepBp: Int = 250): DataFrame = {
    require(bands > 0 && rowsPerBand > 0 && stepBp > 0 && 10000 % stepBp == 0)
    def chainPow(base: Column, n: Int): Column =
      (2 to n).foldLeft(base)((acc, _) => acc * base)
    val s = col("id") * stepBp
    val x = s.cast("double") / lit(10000.0)
    val pNo = chainPow(lit(1.0) - chainPow(x, rowsPerBand), bands)
    spark.range(10000L / stepBp + 1)
      .select(s.cast("long").as("s_bp"),
        floor((lit(1.0) - pNo) * lit(10000.0)).cast("long").as("collide_bp"))
  }

  /** MinHash+LSH near-dup detection end to end: candidates from banding,
    * verified with exact shingle-set Jaccard ≥ `threshold`.
    *
    * Deliberately a PURE declarative plan — no cache, no localCheckpoint.
    * A/B-measured at sf0.1/local[32] (graft.dev.MaterializationBench,
    * median of 3): pure 1.05 s vs shingle-cache + signature-barrier 1.23 s.
    * The round-5 "measured 8×" recompute penalty predates the native
    * `word_shingles` expression (recomputing the shingle explode is now a
    * codegen'd scan pass) and AQE exchange reuse already dedups the
    * signature aggregation feeding both sides of the LSH self-join. The
    * pure plan is also the only 100 TB-safe one: caching the exploded
    * shingle table (≫ input size) is infeasible cluster-wide, and
    * localCheckpoint truncates lineage so a lost executor kills the job. */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 1.0): DataFrame =
    minhashDedupImpl(df, idCol, textCol, n, numHashes, bands, threshold,
      materialize = false)

  /** Alias kept for plan-shape assertions (historically the no-checkpoint
    * variant; since round 7 the public entry point IS the pure plan). */
  private[graft] def minhashDedupPlan(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 1.0): DataFrame =
    minhashDedupImpl(df, idCol, textCol, n, numHashes, bands, threshold,
      materialize = false)

  private def minhashDedupImpl(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double,
      materialize: Boolean): DataFrame =
    minhashDedupTunable(df, idCol, textCol, n, numHashes, bands, threshold,
      cacheShingles = materialize, barrierSigs = materialize,
      materialize = materialize)

  /** Internal knob-separated variant so the two materialization decisions
    * (shingle cache, signature barrier) can be A/B-measured independently
    * (dev.MaterializationBench) — the public entry points pin the winning
    * combination. */
  private[graft] def minhashDedupTunable(df: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, bands: Int, threshold: Double,
      cacheShingles: Boolean, barrierSigs: Boolean,
      materialize: Boolean): DataFrame = {
    // pinned per-doc arrays (see pinnedTokens): sigs/sizes/inter each
    // consume the token frame — un-pinned they re-ran word_shingles 4×
    val sh0 = pinnedTokens(df, idCol,
      call_function("word_shingles", col(textCol), lit(n)))
    val sh = if (cacheShingles) sh0.cache() else sh0
    // the signature table is one row per DOC (tiny next to the shingle
    // explode) but feeds a self-join in lshCandidatePairs — without a
    // materialization barrier both join sides recompute the numHashes-way
    // min-aggregation over the full shingle table (measured 8× on q27)
    val sigs0 = minhashSignatures(sh, numHashes)
    val sigs = if (barrierSigs) sigs0.localCheckpoint() else sigs0
    val cands = lshCandidatePairs(sigs, bands, numHashes / bands)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = cands
      .join(sh.withColumnRenamed("id", "id_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b"), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    val assembled = cands.join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0, Seq("inter"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("size_a") + col("size_b") - col("inter")).as("union_size"))
    if (!materialize) assembled
    else {
      val out = assembled.localCheckpoint()
      if (cacheShingles) sh.unpersist()
      out
    }
  }

  /** Incremental dedup — flag NEW-batch documents against the EXISTING
    * corpus, the shape a production ingest actually runs (nightly batch
    * vs 100 TB standing corpus): exact duplicates via content-hash
    * membership, near-duplicates via ≥ `minShared` shared non-boilerplate
    * shingles with any old document.
    *
    * The scale property is what the join DOESN'T do: old×old pairs never
    * form. The shingle join is strictly new-side × old-side on the
    * shingle key, after a count-only boilerplate bar (> `maxShingleDocs`
    * docs ⇒ no dedup signal, and the bar bounds the per-shingle fan-out
    * at new×old ≤ maxShingleDocs² rather than corpus²). The old corpus
    * pays one hash pass and one shingle shuffle per ingest; the heavy
    * work is proportional to the NEW batch. Returns one row per new doc:
    * (id, exact_dup, n_near_old, is_dup). */
  def incrementalDupFlags(docs: DataFrame, idCol: String, textCol: String,
      isNew: org.apache.spark.sql.Column, n: Int = 3, minShared: Long = 5,
      maxShingleDocs: Int = 50): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      isNew.as("is_new"))
    val hashes = base.withColumn("h", sha2(col("text"), 256))
    val oldHashes = hashes.filter(!col("is_new"))
      .select(col("h")).distinct().withColumn("_hit", lit(1))
    val exact = hashes.filter(col("is_new"))
      .join(oldHashes, Seq("h"), "left")
      .select(col("id"), coalesce(col("_hit"), lit(0)).as("exact_dup"))
    val sh = explodeShingles(base, "id", "text", n)
    val ok = sh.groupBy(col("shingle")).agg(count(lit(1)).as("_d"))
      .filter(col("_d") <= maxShingleDocs).select(col("shingle"))
    val shOk = sh.join(ok, Seq("shingle"), "left_semi")
    val newSh = shOk.join(base.filter(col("is_new")).select(col("id")),
      Seq("id"), "left_semi")
    val oldSh = shOk.join(base.filter(!col("is_new")).select(col("id")),
        Seq("id"), "left_semi")
      .withColumnRenamed("id", "old_id")
    val near = newSh.join(oldSh, "shingle")
      .groupBy(col("id"), col("old_id")).agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >= minShared)
      .groupBy(col("id")).agg(count(lit(1)).as("n_near_old"))
    exact.join(near, Seq("id"), "left")
      .select(col("id").as(idCol), col("exact_dup"),
        coalesce(col("n_near_old"), lit(0L)).as("n_near_old"),
        when(col("exact_dup") === 1 ||
          coalesce(col("n_near_old"), lit(0L)) > 0, 1)
          .otherwise(0).as("is_dup"))
  }

  // ---------- SimHash ----------

  /** Per-row 64-bit SimHash sketch as a bit string (SQL-oracle-friendly),
    * via the native codegen expression `graft.plans.Simhash` (registered
    * by GraftExtensions) — no UDF boundary, transparent to the optimizer. */
  def withSimhash(df: DataFrame, textCol: String, out: String = "simhash"): DataFrame =
    df.withColumn(out, call_function("simhash", col(textCol)))

  /** SimHash near-dup pairs with hamming ≤ maxDist, banded into 4 16-bit
    * blocks (pigeonhole guarantees recall for maxDist ≤ 3). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame = {
    val withSh = withSimhash(Parallelism.spread(
      df.select(col(idCol).as("id"), col(textCol).as("text"))), "text")
    val banded = withSh.select(col("id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => col("simhash").substr(b * lit(16) + 1, lit(16)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "block")
    // native codegen expression (graft.plans.HammingDistance), registered
    // by GraftExtensions — no UDF boundary in the pair-filter inner loop
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.block") === col("b.block") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", call_function("hamming", col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Banded near-dup pairs over an integer perceptual-hash column
    * (dHash / pHash / a simhash packed as a long): pairs with hamming
    * distance ≤ `maxDist`, found by splitting the `bits`-wide hash into
    * `bands` equal blocks and equi-joining per block. Recall is EXACT by
    * pigeonhole — `maxDist < bands` flips can dirty at most `maxDist`
    * blocks, so at least one block matches — which is why the oracle can
    * be a brute-force hamming join while the engine never builds one:
    * candidates are bounded by per-block collisions, the scale-safe shape
    * of [[simhashPairs]] generalized to any integer hash.
    *
    * Feed DISTINCT hashes (e.g. one representative per exact-dup class)
    * when collision groups are large: near-dup between classes is the
    * same answer at 1/|class|² the pair volume. */
  def hammingDupPairs(df: DataFrame, idCol: String, hashCol: String,
      bits: Int = 64, bands: Int = 4, maxDist: Int = 3): DataFrame = {
    require(bands >= 1 && bits % bands == 0,
      s"bands ($bands) must divide bits ($bits)")
    require(maxDist < bands,
      s"pigeonhole recall guarantee needs maxDist ($maxDist) < bands ($bands)")
    val width = bits / bands
    require(width < 64, "per-band width must be < 64 bits")
    val mask = (1L << width) - 1
    val h = df.select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
    val banded = h.select(col("id"), col("h"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftrightunsigned", col("h"), b * lit(width))
            .bitwiseAND(lit(mask)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "block")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.block") === col("b.block") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("_ha"), col("b.h").as("_hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash detector audit — [[annRecallAudit]]'s text-side sibling:
    * pair-level recall AND precision of the banded hamming-≤`maxDist`
    * detector ([[simhashPairs]]) against exact shingle-Jaccard ≥ ½
    * truth ([[ngramJaccardPairs]]). The one-row answer to "can the
    * 64-bit sketch replace the shingle join at 100 TB, and what does it
    * miss" — measured on a sample before the cheap path is trusted.
    * Both operands are the already-bounded pair plans; the audit itself
    * is one left-semi join plus three one-row folds. */
  /** @param sampleOneIn audit a deterministic 1-in-`k` hash sample of the
    *   docs (both detector and truth see the same subset) — the production
    *   dial that keeps the exact-truth side affordable when the corpus is
    *   far past audit scale (sf10+: truth cost grows with corpus, the
    *   audit's value doesn't). None = full corpus. The sample uses the
    *   repo-standard sha256-hex-prefix recipe (same as hashSample /
    *   mixtureSample / the train split), so an SQL oracle can replicate
    *   the subset exactly.
    * @param truthPairs precomputed exact ground-truth pairs (id_a, id_b) —
    *   pass when the truth set is already materialized (e.g. a prior audit
    *   run, or goldens) so the expensive shingle-join side is skipped.
    *
    * Plan shape: ONE full-outer join of truth vs detected pairs + one
    * global fold — each side is computed exactly once (the former
    * 3-aggregate crossJoin assembly evaluated the truth plan twice). */
  def simhashRecallAudit(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxDist: Int = 3, sampleOneIn: Option[Int] = None,
      truthPairs: Option[DataFrame] = None): DataFrame = {
    val base = sampleOneIn match {
      case Some(k) => df.filter(
        conv(substring(sha2(col(idCol).cast("string"), 256), 1, 4), 16, 10)
          .cast("long") % k === 0)
      case None => df
    }
    val truth = truthPairs.getOrElse(
        ngramJaccardPairs(base, idCol, textCol, n)
          .filter(col("inter") * 2 >= col("union_size")))
      .select(col("id_a"), col("id_b")).withColumn("_t", lit(1))
    val det = simhashPairs(base, idCol, textCol, maxDist)
      .select(col("id_a"), col("id_b")).withColumn("_d", lit(1))
    truth.join(det, Seq("id_a", "id_b"), "full_outer")
      .agg(count(col("_t")).as("n_truth"), count(col("_d")).as("n_detected"),
        count(when(col("_t").isNotNull && col("_d").isNotNull, 1))
          .as("n_both"))
      .select(col("n_truth"), col("n_detected"), col("n_both"),
        expr("CAST(n_both * 10000 div NULLIF(n_truth, 0) AS BIGINT)")
          .as("recall_bp"),
        expr("CAST(n_both * 10000 div NULLIF(n_detected, 0) AS BIGINT)")
          .as("precision_bp"))
  }

  // ---------- embedding similarity search ----------

  /** Element-wise int quantization of a float vector column (scale 1000):
    * integer dots are exact and engine-order-independent, which makes ANN
    * results byte-stable across engines (int8/int16 quantization is also
    * the standard serving trick at scale). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Per-vector int8 quantization summary (the serving-time compression
    * path): each vector scaled by 127/max|x| and floored to integers,
    * reporting dims, integer sum/min/max and the saturated-dim count.
    * floor (not round) keeps the cross-engine story trivial — identical
    * IEEE doubles floor identically, with no decimal-vs-binary rounding
    * tie to diverge on. Pure per-row column expressions: scan-only, no
    * shuffle, codegen throughout. Zero vectors quantize to all-zero. */
  def int8QuantStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = col("_q")
    emb
      .withColumn("_ma", array_max(transform(col(vecCol), x => abs(x))))
      .withColumn("_scale",
        when(col("_ma") === 0, lit(0.0)).otherwise(lit(127.0) / col("_ma")))
      .withColumn("_q",
        transform(col(vecCol), x => floor(x * col("_scale")).cast("long")))
      .select(col(idCol), size(col(vecCol)).cast("long").as("n_dims"),
        aggregate(q, lit(0L), (acc, v) => acc + v).as("sum_q"),
        array_min(q).as("min_q"), array_max(q).as("max_q"),
        size(filter(q, v => abs(v) === 127)).cast("long").as("n_sat"))
  }

  /** Exact integer dot product of two quantized vectors, via the native
    * codegen expression `graft.plans.QDot` (registered by GraftExtensions):
    * Spark's `aggregate`/`zip_with` higher-order functions are
    * CodegenFallback, so the interpreted-lambda form pays per-element
    * dispatch in the ANN hot loop. */
  def qdot(a: Column, b: Column): Column = call_function("qdot", a, b)

  /** Product-quantization encoding with integer-exact assignment — the
    * memory side of the ANN stack (IVF-PQ): each quantized vector splits
    * into `m` subvectors, each assigned to the nearest of `ks` codebook
    * entries, and the whole vector compresses to one packed 4·m-bit code
    * plus its exact squared quantization error.
    *
    * The codebook is the first `ks` corpus vectors by id (the same
    * deterministic seeding as [[ivfTopK]]'s centroids — a k-means refit
    * would drop in without changing the plan). Per subspace, nearness is
    * argmin of ‖x−c‖² = x·x + (c·c − 2·x·c); x·x is constant across
    * codewords, so each candidate carries only `cc − 2·qdot(x, c)` — one
    * native codegen dot per codeword against a literal subvector — and a
    * (rel, code) struct min settles ties toward the lowest code, exactly
    * like the SQL twin's (dist, k) ordering.
    *
    * Plan shape: the ks-row codebook collect is bounded (same legitimacy
    * as IVF's nlist rows); everything after is a pure per-row codegen
    * projection — no join, no shuffle, scan-bound at any corpus size,
    * which is the property that makes PQ the 100 TB compression path
    * (code + error: 12 bytes/vector instead of 4·dim). */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ks: Int = 16): DataFrame = {
    require(m >= 1 && ks >= 1 && ks <= 16, s"need 1 <= ks <= 16, got $ks")
    val seeds: Seq[Seq[Long]] = emb.orderBy(col(idCol)).limit(ks)
      .select(quantize(col(vecCol)).as("qv")).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    require(seeds.size == ks, s"corpus has fewer than $ks vectors")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("qv"))
    val best = (0 until m).map { s =>
      val xs = slice(col("qv"), s * sub + 1, sub)
      val cand = array((0 until ks).map { k =>
        val c = seeds(k).slice(s * sub, (s + 1) * sub)
        val cc = c.map(v => v * v).sum
        struct((lit(cc) - lit(2L) * qdot(xs, typedLit(c))).as("rel"),
          lit(k.toLong).as("code"))
      }: _*)
      (array_min(cand), qdot(xs, xs))
    }
    val code = best.zipWithIndex
      .map { case ((b, _), s) =>
        b.getField("code") * lit(1L << (4 * (m - 1 - s))) }
      .reduce(_ + _)
    val distortion = best.map { case (b, xx) => xx + b.getField("rel") }
      .reduce(_ + _)
    q.select(col(idCol), code.as("pq_code"), distortion.as("distortion"))
  }

  /** Nearest-class-mean confusion audit — the label-noise screen a
    * labeled embedding corpus gets before its labels are trusted for
    * training: classify every vector by its nearest class centroid and
    * cross-tabulate predicted vs given labels; heavy off-diagonal cells
    * are the mislabeled (or genuinely entangled) classes.
    *
    * Centroids are never materialized as float means: with per-class
    * integer sums S_c and counts n_c, ‖x − S_c/n_c‖² ranks classes by the
    * exact integer `raw_c = n_c²·x·x − 2n_c·x·S_c + S_c·S_c` normalized as
    * the FLOORED `score_c = raw_c div n_c²` — the floor is part of the
    * operator's definition (mirrored in the oracle), so the argmin is
    * engine-deterministic; ties break to the lowest label. Magnitude
    * bound: n_c·|x_d| must stay under ~3·10⁸ per dim for raw_c to fit a
    * long — shard-and-average class sums first beyond ~10⁵ rows/class.
    *
    * Plan: one posexplode + (class, dim) combiner agg for the sums (a
    * classes×dims frame), a bounded collect (classes ≤ 64, the ivfTopK
    * seeding legitimacy), then a pure per-row codegen argmin over literal
    * sums + one confusion-cell aggregation — no joins on the heavy side. */
  def classMeanConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val q = emb.select(col(labelCol).cast("long").as("lab"),
      quantize(col(vecCol)).as("qv"))
    val sums = q.select(col("lab"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("lab"), col("dim")).agg(sum(col("v")).as("s"))
      .groupBy(col("lab"))
      .agg(sort_array(collect_list(struct(col("dim"), col("s")))).as("sv"))
      .select(col("lab"), transform(col("sv"), x => x.getField("s")).as("s"))
    val counts = q.groupBy(col("lab")).agg(count(lit(1)).as("n"))
    val cents: Seq[(Long, Long, Seq[Long])] = sums.join(counts, "lab")
      .collect().map(r => (r.getAs[Long]("lab"), r.getAs[Long]("n"),
        r.getSeq[Long](1).toSeq)).toSeq.sortBy(_._1)
    require(cents.size <= 64, s"too many classes for literal argmin: ${cents.size}")
    val cand = array(cents.map { case (lab, n, s) =>
      val ss = s.map(v => v * v).sum
      val raw = lit(n * n) * qdot(col("qv"), col("qv")) -
        lit(2L * n) * qdot(col("qv"), typedLit(s)) + lit(ss)
      // floored raw/n² in decimal (raw >= 0): floor on decimal is exact,
      // unlike a double divide (precision) or a decimal cast (HALF_UP)
      struct(floor(raw.cast("decimal(38,0)") /
          lit(n * n).cast("decimal(38,0)")).cast("long").as("score"),
        lit(lab).as("pred"))
    }: _*)
    q.withColumn("pred", array_min(cand).getField("pred"))
      .groupBy(col("lab").as(labelCol), col("pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("is_diag",
        when(col(labelCol) === col("pred"), 1L).otherwise(0L))
  }

  /** Greedy k-center coreset selection over embeddings (farthest-point
    * traversal) — the classic coverage-maximizing subset pick a curation
    * pipeline uses to choose k diverse exemplars (annotation seeds,
    * eval-probe selection, diversity-aware distillation): start from the
    * lowest-id vector, then repeatedly add the point FARTHEST from the
    * current set; the emitted per-round radius = max-min-distance is the
    * textbook 2-approximation certificate for the k-center objective.
    *
    * All distances are exact integers over quantized vectors (‖x−c‖² =
    * x·x − 2x·c + c·c via native qdot against literal centers), argmax
    * ties break to the lowest id through a (dist, −id) struct max, and
    * the per-round driver pull is ONE row (the same bounded-round shape
    * as bpeTrain/ivfTopK seeding). k scans of the corpus, each a pure
    * map-side aggregation with ≤ k literal distance terms — no joins, no
    * windows, no shuffle beyond the one-row agg; at 100 TB that is k
    * passes over a columnar scan, the optimal access pattern for this
    * algorithm (its data dependence is inherently sequential in k).
    *
    * Returns one row per round r: (round, vec_id of the r-th selected
    * center, radius after covering with r centers). */
  def kCenterGreedy(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k out of range: $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
    val first = q.orderBy(col("id")).limit(1).collect().head
    var sel = Vector((first.getLong(0), first.getSeq[Long](1).toSeq))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to k) {
      val minD = sel.map { case (_, c) =>
        val cc = c.map(v => v * v).sum
        qdot(col("qv"), col("qv")) - lit(2L) * qdot(col("qv"), typedLit(c)) +
          lit(cc)
      }.reduce(least(_, _))
      val top = q.select(col("id"), col("qv"), minD.as("md"))
        .agg(max(struct(col("md"), (-col("id")).as("nid"), col("qv"))))
        .collect().head.getStruct(0)
      rows += ((r.toLong, sel(r - 1)._1, top.getLong(0)))
      if (r < k) sel = sel :+ ((-top.getLong(1), top.getSeq[Long](2).toSeq))
    }
    rows.toSeq.toDF("round", "vec_id", "radius")
  }

  /** Linear-kernel MMD² between each group's embedding distribution and
    * the full corpus — the embedding-space drift line next to the
    * histogram drifts (q131/q239/q256): for the linear kernel, MMD² is
    * exactly ‖μ_g − μ_corpus‖², so the whole statistic reduces to per-dim
    * integer sums and one cross-multiplied fold:
    *
    *   mmd2_q(g) = Σ_d (S_g,d·N − S_d·n_g)² div (n_g·N)²
    *
    * over quantized vectors (scale 1000 → mmd2_q is in milli-units²),
    * every product in decimal(38,0). A group whose mean sits at the
    * corpus mean scores 0; a displaced cluster scores its squared
    * distance — the "did this source/snapshot move in embedding space"
    * audit, exact and engine-stable because no float mean is ever
    * formed.
    *
    * Plan: one posexplode + (group, dim) combiner aggregation, a
    * dims-row global fold broadcast back, one per-group sum — the heavy
    * shuffle carries dims·groups rows, never vectors. */
  def embeddingMmd(emb: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val q = emb.select(col(groupCol).as("grp"), quantize(col(vecCol)).as("qv"))
    val perDim = q.select(col("grp"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("grp"), col("dim"))
      .agg(sum(col("v")).as("s_g"), count(lit(1)).as("_n"))
    val counts = q.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val global = perDim.groupBy(col("dim")).agg(sum(col("s_g")).as("s_all"))
    val total = counts.agg(sum(col("n")).as("n_all"))
    perDim.join(broadcast(global), Seq("dim"))
      .join(broadcast(counts), Seq("grp"))
      .crossJoin(broadcast(total))
      .withColumn("_t", col("s_g").cast("decimal(38,0)") * col("n_all") -
        col("s_all").cast("decimal(38,0)") * col("n"))
      .groupBy(col("grp"), col("n"), col("n_all"))
      .agg(sum(col("_t") * col("_t")).as("_num"))
      .select(col("grp").as(groupCol), col("n"),
        expr("""CAST(_num div (CAST(n AS DECIMAL(38,0)) * n * n_all * n_all)
               AS BIGINT)""").as("mmd2_q"))
  }

  /** PQ asymmetric-distance (ADC) retrieval audit: for each query, the
    * nearest neighbor found by scanning only the 4·m-bit PQ codes (query
    * side exact, corpus side quantized — the IVF-PQ serving path) versus
    * the exact-dot nearest neighbor, with the integer regret between
    * them. This is the measurement that decides whether [[pqEncode]]'s
    * compression is safe to serve — recall asserted by audit, not by hope
    * (same philosophy as the q315/q327/q319 recall audits).
    *
    * ADC distance = Σ_s lut_q[s][code_s(v)] where each query's lookup
    * table holds `c·c − 2·q_s·c` per (subspace, codeword) — exact
    * integers, built once per query against the literal codebook, carried
    * as a nested array column and indexed by unpacking the corpus code
    * with shift/mask column ops. The pair frame is corpus × broadcast
    * queries; at production scale the audit runs on a query SAMPLE (the
    * full ADC scan itself never materializes pairs — it is a scan with a
    * per-row m-lookup sum), exactly like the other recall audits.
    *
    * Ties: ADC winner = lowest (dist, id); exact winner = highest dot,
    * then lowest id. Returns one row per query: both winners, their
    * exact dots, hit@1, and regret = true_dot − adc_dot ≥ 0. */
  def pqAdcAudit(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, m: Int = 8, ks: Int = 16): DataFrame = {
    val seeds: Seq[Seq[Long]] = emb.orderBy(col(idCol)).limit(ks)
      .select(quantize(col(vecCol)).as("qv")).collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    require(seeds.size == ks, s"corpus has fewer than $ks vectors")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // materialized, not a live expression: downstream the packed code is
    // referenced once per subspace, and Catalyst's projection collapse
    // would substitute the full 8x16 argmin tree into every reference —
    // measured 12.2 s vs 1.9 s at sf0.1 for 40k pairs. Production reads
    // codes from the persisted PQ index (the code table IS the serving
    // artifact), so the barrier mirrors the real dataflow.
    val codes = pqEncode(emb, idCol, vecCol, m, ks)
      .select(col(idCol).as("nn_id"), col("pq_code"))
      .localCheckpoint()
      .join(emb.select(col(idCol).as("nn_id"), quantize(col(vecCol)).as("qv")),
        "nn_id")
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
    // codebook as nested literals indexed by the unpacked code — each ADC
    // term evaluates ONCE per pair (an earlier per-query LUT column was
    // re-inlined by Catalyst into every element_at, multiplying its
    // 8x16-dot construction by the pair count and exploding codegen)
    val cbLit = typedLit(
      (0 until m).map(s => (0 until ks).map(k =>
        seeds(k).slice(s * sub, (s + 1) * sub))))
    val ccLit = typedLit(
      (0 until m).map(s => (0 until ks).map(k =>
        seeds(k).slice(s * sub, (s + 1) * sub).map(v => v * v).sum)))
    val adcDist = (0 until m).map { s =>
      val codeIdx =
        (shiftright(col("pq_code"), 4 * (m - 1 - s)) % 16 + 1).cast("int")
      val c = element_at(element_at(cbLit, s + 1), codeIdx)
      val cc = element_at(element_at(ccLit, s + 1), codeIdx)
      val qs = slice(col("qq"), s * sub + 1, sub)
      cc - lit(2L) * aggregate(zip_with(qs, c, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    }.reduce(_ + _)
    val pairs = codes.join(broadcast(queries), col("query_id") =!= col("nn_id"))
      .withColumn("adc", adcDist)
      .withColumn("dot", qdot(col("qq"), col("qv")))
    val byAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("nn_id").asc)
    val byDot = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("nn_id").asc)
    val ranked = pairs
      .withColumn("rn_adc", row_number().over(byAdc))
      .withColumn("rn_dot", row_number().over(byDot))
    val adcWin = ranked.filter(col("rn_adc") === 1)
      .select(col("query_id"), col("nn_id").as("adc_nn"),
        col("dot").as("adc_dot"))
    val trueWin = ranked.filter(col("rn_dot") === 1)
      .select(col("query_id"), col("nn_id").as("true_nn"),
        col("dot").as("true_dot"))
    trueWin.join(adcWin, "query_id")
      .select(col("query_id"), col("true_nn"), col("true_dot"),
        col("adc_nn"), col("adc_dot"),
        when(col("adc_nn") === col("true_nn"), 1L).otherwise(0L).as("hit"),
        (col("true_dot") - col("adc_dot")).as("regret"))
  }

  /** Brute-force top-k neighbors for each query id: broadcast the query
    * set, score the whole corpus map-side, take k per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(vecCol)).as("qv"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .withColumn("dot", qdot(col("qq"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("dot"))
  }

  /** Hard-negative mining for contrastive training: for each query row,
    * the top-k most-similar corpus rows with a DIFFERENT label — the
    * near-misses a contrastive or retrieval model learns the most from
    * (same-label rows are positives, low-similarity rows are easy).
    * Same plan family as [[bruteForceTopK]]: the query set broadcasts
    * (queries ≪ corpus — a mining batch, not the corpus itself), the
    * label inequality rides the broadcast nested-loop join's condition,
    * and each query reduces to k rows. Exact over quantized vectors with
    * a deterministic (dot desc, id asc) tiebreak. At 100 TB the corpus
    * side streams partition-parallel; nothing but the k·|queries| result
    * ever concentrates. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neg_id"),
      quantize(col(vecCol)).as("qv"), col(labelCol).as("_cl"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qq"), col(labelCol).as("_ql"))
    val scored = c.join(broadcast(q), col("_cl") =!= col("_ql"))
      .withColumn("dot", qdot(col("qq"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neg_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"), col("dot"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily pick k items maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d,s)` — the serving-side
    * answer to "the top-k are all near-duplicates of each other" that the
    * dedup family measures offline. λ is an integer percent so every
    * score is exact: `score = lambdaPct·rel − (100−lambdaPct)·maxSim`
    * over quantized dot products, ties to the smaller id. The first pick
    * has no selected set: score = lambdaPct·rel, max_sim NULL.
    *
    * Plan: relevance against the query vector is a scan-wide codegen dot
    * ([[qdot]]); the candidate pool is the global top-`poolSize` by
    * relevance via TakeOrderedAndProject (per-partition top-k + driver
    * merge — never a full sort); the greedy reranking then runs
    * driver-side over the ≤64-row pool (the bounded-collect convention,
    * same as the IVF centroid pull) — O(k·poolSize) dots on ≤64 rows is
    * noise next to the scan, and no distributed k-round loop can beat a
    * 64-row local argmax. The query vector is the corpus row with the
    * smallest id (excluded from the pool). */
  def mmrTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int = 6,
      poolSize: Int = 16, lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && k <= poolSize && poolSize <= 64,
      s"need 1 <= k <= poolSize <= 64, got k=$k pool=$poolSize")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct: $lambdaPct")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("qv"))
    val first = q.orderBy(col("id")).limit(1).collect().head
    val qid = first.getLong(0)
    val qvec = first.getSeq[Long](1).toSeq
    val pool = q.filter(col("id") =!= qid)
      .withColumn("rel", qdot(col("qv"), typedLit(qvec)))
      .orderBy(col("rel").desc, col("id").asc).limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2)))
    // (id, qv, rel), pool already (rel desc, id asc)-ordered
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Option[Long], Long)]
    for (r <- 1 to math.min(k, pool.length)) {
      val cands = pool.filter(p => !sel.exists(_._1 == p._1))
      val scored = cands.map { case (id, v, rel) =>
        val maxSim =
          if (sel.isEmpty) None else Some(sel.map(s => dot(v, s._2)).max)
        val score = lambdaPct * rel -
          (100L - lambdaPct) * maxSim.getOrElse(0L)
        (id, v, rel, maxSim, score)
      }
      val best = scored.minBy(c => (-c._5, c._1))
      sel += ((best._1, best._2))
      out += ((r.toLong, best._1, best._3, best._4, best._5))
    }
    out.toSeq.toDF("rank", "vec_id", "rel", "max_sim", "score")
  }

  /** Serving-diversity audit over retrieved lists: per list the exact
    * mean pairwise dot between its items (intra-list similarity — the
    * "top-k is five copies of the same item" pathology [[mmrTopK]]
    * exists to fix, measured), plus one `(catalog)` row with aggregate
    * catalog coverage in bp (distinct items served / corpus) — the two
    * standard beyond-accuracy serving metrics next to q128/q195/q395's
    * rank-quality lines.
    *
    * `lists` is (queryCol, itemCol) — typically an ANN top-k result.
    * Pairs are generated per list by an equi-join on the list key with
    * `itemA < itemB` — bounded at C(k,2) pairs per list by construction,
    * never corpus-shaped. Items join their quantized vectors via two
    * equi-joins on the item id. The per-list similarity is emitted as
    * the exact (pair_dot_sum, n_pairs) pair rather than a floored mean:
    * dots can be negative, where Spark's `div` (trunc) and the oracle's
    * `//` (floor) disagree — the division is the caller's, with full
    * precision in hand. Singleton lists report NULL sums (no pair
    * exists — loud, not 0). */
  def servingDiversity(lists: DataFrame, queryCol: String, itemCol: String,
      emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("_iid"),
      quantize(col(vecCol)).as("_qv"))
    val l = lists.select(col(queryCol).cast("long").as("_lq"),
      col(itemCol).cast("long").as("_li"))
    val pairs = l.as("a").join(l.as("b"),
        col("a._lq") === col("b._lq") && col("a._li") < col("b._li"))
      .select(col("a._lq").as("_lq"), col("a._li").as("_ia"),
        col("b._li").as("_ib"))
      .join(q.withColumnRenamed("_iid", "_ia")
        .withColumnRenamed("_qv", "_qa"), Seq("_ia"))
      .join(q.withColumnRenamed("_iid", "_ib")
        .withColumnRenamed("_qv", "_qb"), Seq("_ib"))
      .select(col("_lq"), qdot(col("_qa"), col("_qb")).as("_dot"))
    val perList = l.groupBy(col("_lq")).agg(count(lit(1)).as("n_items"))
      .join(pairs.groupBy(col("_lq")).agg(sum(col("_dot")).as("_sd"),
        count(lit(1)).as("_np")), Seq("_lq"), "left")
      .select(col("_lq").cast("string").as("list_id"), col("n_items"),
        col("_np").as("n_pairs"), col("_sd").as("pair_dot_sum"),
        lit(null).cast("long").as("coverage_bp"))
    val corpusN = q.agg(count(lit(1)).as("_cn"))
    val catalog = l.agg(countDistinct(col("_li")).as("_served"),
        count(lit(1)).cast("long").as("n_items"))
      .crossJoin(broadcast(corpusN))
      .select(lit("(catalog)").as("list_id"), col("n_items"),
        lit(null).cast("long").as("n_pairs"),
        lit(null).cast("long").as("pair_dot_sum"),
        expr("CAST(_served * 10000 div _cn AS BIGINT)").as("coverage_bp"))
    perList.unionByName(catalog)
  }

  /** Sign-LSH bucket id: the sign bits of the first `bits` dims, folded
    * as acc*2 + bit. */
  def signBucket(vec: Column, bits: Int): Column =
    aggregate(slice(vec, 1, bits), lit(0L),
      (acc, x) => acc * 2 + when(x >= 0, 1L).otherwise(0L))

  /** Sign-LSH bucketed ANN (the scale path): bucket = sign bits of the
    * first `bits` dims; queries probe their own bucket only. Same output
    * shape as bruteForceTopK; recall < 1 by construction. At 100 TB the
    * corpus is hash-partitioned by bucket so each query touches one
    * partition group instead of the full corpus. */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), quantize(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qq"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("dot", qdot(col("qq"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("dot"))
  }

  /** IVF-flat ANN (the other standard scale path next to sign-LSH):
    * a coarse quantizer of `nlist` sampled centroids partitions the corpus
    * into inverted lists map-side (no shuffle for assignment — centroids are
    * literal arrays inside codegen); each query probes its `nprobe` closest
    * lists. nprobe = nlist degenerates to exact brute force. At 100 TB the
    * corpus is written bucketed by `cid` so a probe touches only its lists'
    * partitions. Deterministic: centroids = first `nlist` vectors by id. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val q = quantize(col(vecCol))
    val cents: Seq[(Int, Seq[Long])] = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(q.as("qv")).collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Long](0).toSeq }.toSeq

    def dots(v: Column) = array(cents.map { case (cid, cv) =>
      struct(qdot(v, typedLit(cv)).as("dot"), lit(cid).as("cid"))
    }: _*)

    val c = corpus.select(col(idCol).as("nn_id"), q.as("qv"))
      .withColumn("cid", array_max(dots(col("qv"))).getField("cid"))
    val probes = queries.select(col(idCol).as("query_id"), q.as("qq"))
      .withColumn("cid", explode(transform(
        slice(reverse(array_sort(dots(col("qq")))), 1, math.min(nprobe, nlist)),
        s => s("cid"))))
    val scored = c.join(broadcast(probes.withColumnRenamed("qq", "qq2")), Seq("cid"))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("dot", qdot(col("qq2"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("dot"))
  }

  /** ANN recall audit — the quality gate on the bucketing/recall
    * tradeoff [[lshBucketTopK]] and [[ivfTopK]] make: per query, how
    * many of the EXACT top-k ([[bruteForceTopK]]) the approximate
    * index actually returned, as `recall_bp`. Run on a sampled query
    * set, this is the number that decides `bits`/`nprobe` before a
    * 100 TB index build commits to them — measured, not guessed.
    * The exact side is the expensive one (brute force over the corpus);
    * the audit inherits its cost on the SAMPLE only, never the full
    * query load. One left-semi join on (query, neighbor) + two
    * per-query folds. */
  /** @param exactTruth precomputed exact top-k (query_id, nn_id) — pass
    *   when the brute-force side is already materialized (goldens or a
    *   prior audit) so only the cheap approximate side runs. */
  def annRecallAudit(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8,
      exactTruth: Option[DataFrame] = None): DataFrame =
    recallOf(
      exactTruth.getOrElse(bruteForceTopK(corpus, queries, idCol, vecCol, k)),
      lshBucketTopK(corpus, queries, idCol, vecCol, k, bits))

  /** [[annRecallAudit]] for the IVF-flat path: per sampled query, how
    * many of the exact top-k the `nlist`/`nprobe` inverted-list search
    * returns — the measured number that sets `nprobe` (the
    * recall-vs-lists-touched dial) before an index build commits. */
  def ivfRecallAudit(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame =
    recallOf(
      bruteForceTopK(corpus, queries, idCol, vecCol, k),
      ivfTopK(corpus, queries, idCol, vecCol, k, nlist, nprobe))

  /** Retrieval-quality metrics of an approximate ANN run against exact
    * truth (both in the (query_id, rank, nn_id) shape of
    * [[bruteForceTopK]]/[[lshBucketTopK]]/[[ivfTopK]]): where does each
    * query's TRUE nearest neighbor land in the approximate list?
    * `hits_at_1`, `hits_at_k` (found anywhere in the approx top-k),
    * `n_missed`, and `mrr_ppm` — mean reciprocal rank as floored
    * parts-per-million (per-query rr_ppm = 10⁶ div pos, missed = 0,
    * then the floored mean), integer-exact end to end. The
    * ranking-quality companion to [[annRecallAudit]]'s set recall:
    * recall says how much of the top-k survives, MRR says whether the
    * best answer is still FIRST. One equi-join on (query, true-NN) plus
    * a one-row fold. */
  def retrievalMetrics(approx: DataFrame, truth: DataFrame,
      k: Int): DataFrame = {
    val t1 = truth.filter(col("rank") === 1)
      .select(col("query_id"), col("nn_id"))
    val pos = approx.select(col("query_id"), col("nn_id"),
      col("rank").as("_pos"))
    t1.join(pos, Seq("query_id", "nn_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("_pos") === 1, 1L).otherwise(0L)).as("hits_at_1"),
        sum(when(col("_pos").isNotNull && col("_pos") <= k, 1L)
          .otherwise(0L)).as("hits_at_k"),
        sum(when(col("_pos").isNull, 1L).otherwise(0L)).as("n_missed"),
        sum(when(col("_pos").isNotNull, expr("1000000 div _pos"))
          .otherwise(0L)).as("_rr"))
      .select(col("n_queries"), col("hits_at_1"), col("hits_at_k"),
        col("n_missed"),
        expr("CAST(_rr div n_queries AS BIGINT)").as("mrr_ppm"))
  }

  /** One left join + one aggregation — the exact (expensive) side is
    * computed exactly once; the former semi-join + count assembly
    * evaluated it twice. */
  private def recallOf(exactTopK: DataFrame,
      approxTopK: DataFrame): DataFrame = {
    val exact = exactTopK.select(col("query_id"), col("nn_id"))
    val approx = approxTopK.select(col("query_id"), col("nn_id"))
      .withColumn("_d", lit(1))
    exact.join(approx, Seq("query_id", "nn_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("_d")).as("hits"))
      .withColumn("recall_bp", expr("hits * 10000 div n_exact"))
  }

  /** Matryoshka-truncation recall audit: for each prefix dimensionality
    * d, how much of the FULL-dimension exact top-k does a search over
    * only the first d coordinates recover? The measured dial for
    * matryoshka-style embeddings (nested prefixes trained to be usable
    * truncations): serving at d=16 instead of 64 cuts index bytes and
    * dot-product work 4× — this table says what recall that buys at each
    * rung, per the same micro-averaged protocol as [[annRecallAudit]]
    * (which audits the LSH bucketing loss; this audits the dimension
    * loss — orthogonal knives).
    *
    * Per dim: one [[bruteForceTopK]] over `slice(vec, 1, d)` joined to
    * the full-dim truth; the truncated scans get CHEAPER as d shrinks.
    * The truth plan is referenced by every rung — on a large corpus
    * cache/checkpoint it first (at audit scale here the recompute is the
    * cheaper trade; flagged rather than hidden). Output one row per dim:
    * `(dim, n_queries, hits, n_exact, recall_bp)` micro-averaged. */
  def matryoshkaRecall(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1))
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k)
    dims.map { dd =>
      val approx = bruteForceTopK(
        corpus.withColumn(vecCol, slice(col(vecCol), 1, dd)),
        queries.withColumn(vecCol, slice(col(vecCol), 1, dd)),
        idCol, vecCol, k)
      recallOf(truth, approx)
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("hits"),
          sum(col("n_exact")).as("n_exact"))
        .select(lit(dd).as("dim"), col("n_queries"), col("hits"),
          col("n_exact"),
          expr("CAST(hits * 10000 div n_exact AS BIGINT)").as("recall_bp"))
    }.reduce(_ unionByName _)
  }

  /** Diagonal-Mahalanobis embedding outliers: per label, score every
    * vector by Σ_d (x_d − μ_d)²/σ²_d over the label's own per-dimension
    * moments — the multivariate data-quality screen that catches vectors
    * whose every coordinate is individually plausible but jointly wrong
    * (mislabeled rows, encoder-version strays), where a norm check
    * (q281) sees nothing. Diagonal covariance only: the full-matrix
    * inverse is a driver-side O(d³) nobody needs for screening, and the
    * diagonal keeps the arithmetic integer-exact.
    *
    * Milli floors, engine-identical: per (label, dim) m_milli = S·10³
    * div n and v_milli = (Q·10³·n − S²·10³) div (n·(n−1)); per vector
    * term_milli = (x·10³ − m_milli)² div v_milli (the 10⁶/10³ scales
    * cancel to an exact milli z²), summed over dims. Plan: one
    * posexplode aggregate for the moments (combiner-friendly), one
    * broadcast join of the tiny (label × dims) stats table back onto the
    * exploded vectors, top-k via TakeOrdered. */
  def diagMahalanobisOutliers(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"), col(labelCol).as("_l"),
        posexplode(quantize(col(vecCol))).as(Seq("_dim", "_x")))
    val stats = exploded.groupBy(col("_l"), col("_dim"))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_q"))
      .filter(col("_n") >= 2)
      .select(col("_l"), col("_dim"),
        expr("CAST(CAST(_s AS DECIMAL(38,0)) * 1000 div _n AS BIGINT)")
          .as("_m_milli"),
        expr("CAST((_q * 1000 * _n - CAST(_s AS DECIMAL(38,0)) * _s * 1000)" +
          " div (CAST(_n AS DECIMAL(38,0)) * (_n - 1)) AS BIGINT)")
          .as("_v_milli"))
      .filter(col("_v_milli") > 0)
    exploded.join(broadcast(stats), Seq("_l", "_dim"))
      .withColumn("_t", expr(
        "CAST(CAST(_x * 1000 - _m_milli AS DECIMAL(38,0)) " +
          "* (_x * 1000 - _m_milli) div _v_milli AS BIGINT)"))
      .groupBy(col("_id"), col("_l"))
      .agg(count(lit(1)).as("n_dims"), sum(col("_t")).as("z2_milli"))
      .select(col("_id").as(idCol), col("_l").as(labelCol), col("n_dims"),
        col("z2_milli"))
      .orderBy(col("z2_milli").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate PAIRS (the dedup-flavored companion to
    * the top-k searches): candidates share a sign-LSH bucket (never an
    * all-pairs join — at 100 TB the corpus is hash-partitioned by bucket and
    * each bucket self-joins locally), then exact verification: cosine is
    * computed from quantized-integer dot/norms, so the only double math is
    * one correctly-rounded sqrt + divide over exact longs — bit-identical
    * in any IEEE754 engine. Recall < 1 by construction (near-dups that
    * disagree in an early sign bit are missed) — the standard
    * bucketing/recall tradeoff, tunable via `bits`. */
  def cosineDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bits: Int = 8): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("norm2", qdot(col("qv"), col("qv")))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        qdot(col("a.qv"), col("b.qv")).as("dot"),
        col("a.norm2").as("n2_a"), col("b.norm2").as("n2_b"))
      .withColumn("cosine", col("dot").cast("double") /
        sqrt((col("n2_a") * col("n2_b")).cast("double")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("dot"), col("cosine"))
  }

  /** Deterministic ±1 sign matrix for [[signProject]]: entry (i,j) is the
    * low bit of sha256("i:j") — a pure public recipe any engine replays,
    * no RNG state to ship. */
  def signMatrix(outDim: Int, inDim: Int): Array[Array[Int]] =
    Array.tabulate(outDim, inDim) { (i, j) =>
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$i:$j".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1 else -1
    }

  /** Johnson–Lindenstrauss sign projection: each output coordinate is an
    * exact integer dot of the quantized vector with a deterministic ±1
    * row of [[signMatrix]] — the dimensionality-reduction step that runs
    * BEFORE a 100 TB ANN build (distance work shrinks by inDim/outDim
    * while JL keeps relative distances to within the usual ε). Integer
    * end to end: quantize ×1000, ±1 weights, so projections are
    * bit-stable across engines. Emits the input and output squared norms
    * (`n2_in`, `n2_out`) so a caller can audit the distortion per vector
    * — E[n2_out] = outDim/1 · n2_in is the sanity line. Pure scan, zero
    * shuffles; the matrix is compile-time data unrolled into the
    * projection expressions (codegen sees a flat multiply-add chain). */
  def signProject(emb: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim)
    val m = signMatrix(outDim, inDim)
    val base = emb.select(col(idCol), quantize(col(vecCol)).as("_q"))
    val projCols = (0 until outDim).map { i =>
      (0 until inDim).map { j =>
        if (m(i)(j) == 1) element_at(col("_q"), j + 1)
        else -element_at(col("_q"), j + 1)
      }.reduce(_ + _).as(s"p$i")
    }
    val n2Out = (0 until outDim).map(i => col(s"p$i") * col(s"p$i"))
      .reduce(_ + _)
    base.select((col(idCol) +: qdot(col("_q"), col("_q")).as("n2_in") +:
        projCols): _*)
      .withColumn("n2_out", n2Out)
  }

  /** Cross-split embedding contamination pairs — the semantic complement
    * of exact n-gram decontamination: (train, test) vectors in the same
    * sign-LSH bucket with cosine ≥ `minCosine`, i.e. eval items that are
    * near-paraphrases of training items even when no n-gram overlaps.
    * Same candidate/verify split as [[cosineDupPairs]] (bucketed
    * candidates, exact integer `qdot` verify), but the join is
    * train×test only — the two big self-join quadrants never form, which
    * is what makes a full-corpus leak scan affordable: cost scales with
    * per-bucket |train|·|test|, not (|train|+|test|)². */
  def embeddingLeak(train: DataFrame, test: DataFrame, idCol: String,
      vecCol: String, minCosine: Double, bits: Int = 8): DataFrame = {
    def prep(df: DataFrame) =
      df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
          signBucket(col(vecCol), bits).as("bucket"))
        .withColumn("norm2", qdot(col("qv"), col("qv")))
    prep(test).as("a").join(prep(train).as("b"),
        col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("test_id"), col("b.id").as("train_id"),
        qdot(col("a.qv"), col("b.qv")).as("dot"),
        col("a.norm2").as("n2_a"), col("b.norm2").as("n2_b"))
      .withColumn("cosine", col("dot").cast("double") /
        sqrt((col("n2_a") * col("n2_b")).cast("double")))
      .filter(col("cosine") >= minCosine)
      .select(col("test_id"), col("train_id"), col("dot"), col("cosine"))
  }

  /** Reciprocal (mutual) nearest-neighbor pairs under maximum inner
    * product, the strictest embedding-dedup signal: a pair survives only
    * if each vector is the OTHER's best match — one-sided hub vectors
    * (the "everything matches the centroid doc" failure of plain
    * threshold dedup) cannot form mutual pairs with their many
    * satellites, because the hub has exactly one best match.
    *
    * Candidates come from the same sign-LSH bucketing as the other ANN
    * paths (each bucket self-joins locally; never all-pairs), scored by
    * the exact integer `qdot`, ranked per vector by (dot desc, id) — no
    * float compare anywhere — and the two per-vector argmax tables
    * self-join on the "you are my best AND I am yours" condition.
    * Vectors alone in their bucket have no candidates and drop out (the
    * standard bucketing/recall tradeoff, tunable via `bits`). */
  def mutualNnPairs(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nn"),
        qdot(col("a.qv"), col("b.qv")).as("dot"))
    val w = Window.partitionBy(col("id")).orderBy(col("dot").desc, col("nn"))
    val best = pairs.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
    best.as("x").join(best.as("y"),
        col("x.id") === col("y.nn") && col("x.nn") === col("y.id") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("x.nn").as("id_b"),
        col("x.dot").as("dot"))
  }

  /** Resolve near-dup pairs into clusters: connected components by
    * min-label propagation. Each round every node adopts the smallest
    * label among itself and its neighbors — a chain of diameter d
    * converges in d rounds, and real dedup graphs are overwhelmingly
    * tiny cliques (diameter 1–2), so `maxIter` is a safety rail, not the
    * expected cost. Each round is one shuffle (join on node + min-agg);
    * the driver loop only counts changed labels (a scalar per round).
    * At 100 TB scale the standard refinement is star-contraction
    * (alternating large-star/small-star halves the diameter per round);
    * plain propagation is kept here because dedup components are shallow
    * by construction — a 64-round chain would mean 64 documents each
    * near-duplicating ONLY their neighbors, which LSH banding never emits.
    *
    * `edges` is (src, dst) in either orientation; output (node, component)
    * where component = min node id in the cluster. Isolated nodes keep
    * their own id (pass them in `nodes`).
    *
    * If labels are still changing after `maxIter` propagation rounds —
    * a component whose diameter exceeds the rail, which LSH dedup output
    * never produces but entity-resolution chains can — the computation
    * ESCALATES to [[connectedComponentsStar]] (O(log d) rounds) instead
    * of failing: the caller always gets a fully-converged labeling, pays
    * the cheaper propagation cost on the overwhelmingly-common shallow
    * graphs, and only a genuinely pathological graph pays the star
    * rounds. Star's own rail still throws, so a half-propagated labeling
    * can never escape silently. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      nodeCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    val (labels, _, converged) = connectedComponentsAttempt(nodes, edges,
      nodeCol, srcCol, dstCol, maxIter)
    if (converged) labels
    else connectedComponentsStar(nodes, edges, nodeCol, srcCol, dstCol)
  }

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took — surfaced so the star-contraction spec can assert the
    * diameter-vs-log-diameter round counts side by side. */
  private[graft] def connectedComponentsRounds(nodes: DataFrame,
      edges: DataFrame, nodeCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 20): (DataFrame, Int) = {
    val (labels, rounds, converged) = connectedComponentsAttempt(nodes,
      edges, nodeCol, srcCol, dstCol, maxIter)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge after $maxIter rounds " +
        "(component diameter exceeds it) — raise maxIter or use " +
        "connectedComponentsStar")
    (labels, rounds)
  }

  /** Propagation rounds without the fail-loud rail: returns the labels,
    * round count, and whether they converged — the primitive both the
    * throwing [[connectedComponentsRounds]] and the star-escalating
    * [[connectedComponents]] build on. */
  private def connectedComponentsAttempt(nodes: DataFrame,
      edges: DataFrame, nodeCol: String, srcCol: String, dstCol: String,
      maxIter: Int): (DataFrame, Int, Boolean) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // symmetric edge list, self-loops dropped
    // localCheckpoint (not cache) per round: an iterative DataFrame loop
    // grows the logical plan by one join+agg per round, and re-analysis/
    // re-optimization over the whole history quickly dominates — the
    // checkpoint truncates lineage so every round plans O(1) operators
    var labels = nodes.select(col(nodeCol).as("node"))
      .distinct().withColumn("component", $"node").localCheckpoint()
    // edges whose endpoint is absent from `nodes` are ignored, not
    // label-creating: the b side is filtered by the propagation join
    // below, the a side by this semi-join — without it an unknown src id
    // would enter the label set and surface in the output
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter($"a" =!= $"b").distinct()
      .join(labels.select($"node".as("a")), Seq("a"), "left_semi")
      .localCheckpoint()
    val labelType = labels.schema("component").dataType
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // candidate label per node: min over own label and neighbors'
      // labels. The node's PREVIOUS label rides through the same
      // aggregation (each node has exactly one own row, so max(prev)
      // over {prev, null, null, ...} recovers it), which makes the
      // convergence check a filter-count over the round's checkpoint
      // blocks instead of a second shuffle join per round — the join was
      // ~40% of each round's wall at sf0.1 (the round-11 q66 lead).
      val viaEdges = sym.join(labels, sym("b") === labels("node"))
        .select($"a".as("node"), $"component",
          lit(null).cast(labelType).as("prev"))
      val next = labels
        .select($"node", $"component", $"component".as("prev"))
        .union(viaEdges)
        .groupBy($"node").agg(min($"component").as("component"),
          max($"prev").as("prev"))
        .localCheckpoint()
      changed = next.filter($"component" =!= $"prev").count()
      labels = next.select($"node", $"component")
      i += 1
    }
    (labels, i, changed == 0)
  }

  /** Connected components by star contraction — the long-diameter-safe
    * variant of [[connectedComponents]] (alternating large-star /
    * small-star, the standard MapReduce CC construction from the public
    * literature on components in MapReduce). Where min-label propagation
    * needs one round per hop of component diameter, star contraction
    * HALVES tree heights every alternation: a d-hop chain converges in
    * O(log d) rounds, so a pathological 10⁶-hop path costs ~20 rounds,
    * not 10⁶. Per round: two groupBy-min aggregations and two joins on
    * the edge key — the same shuffle family as propagation, just fewer
    * rounds. Use it when the dedup graph's diameter is unknown (entity
    * resolution chains, citation graphs); plain propagation stays the
    * default for LSH dedup output whose components are shallow cliques.
    *
    * Semantics are identical to [[connectedComponents]]: `edges` in
    * either orientation, endpoints outside `nodes` ignored, isolated
    * nodes keep their own id, output (node, component = min id in the
    * cluster), IllegalStateException on non-convergence. */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
      nodeCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame =
    connectedComponentsStarRounds(nodes, edges, nodeCol, srcCol, dstCol,
      maxIter)._1

  private[graft] def connectedComponentsStarRounds(nodes: DataFrame,
      edges: DataFrame, nodeCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 25): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val nodeSet = nodes.select(col(nodeCol).as("node")).distinct()
      .localCheckpoint()
    // undirected edge set, kept canonical as (u, v) with u > v;
    // endpoints outside `nodes` dropped on BOTH sides (same contract as
    // the propagation variant)
    var e = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .filter($"x" =!= $"y")
      .join(nodeSet.select($"node".as("x")), Seq("x"), "left_semi")
      .join(nodeSet.select($"node".as("y")), Seq("y"), "left_semi")
      .select(greatest($"x", $"y").as("u"), least($"x", $"y").as("v"))
      .distinct().localCheckpoint()

    // large-star(u): m = min(Γ(u) ∪ {u}); emit (w, m) for w ∈ Γ(u), w > u
    def largeStar(cur: DataFrame): DataFrame = {
      val sym = cur.select($"u".as("a"), $"v".as("b"))
        .union(cur.select($"v".as("a"), $"u".as("b")))
      val m = sym.groupBy($"a")
        .agg(least(min($"b"), first($"a")).as("m"))
      sym.filter($"b" > $"a").join(m, "a")
        .select($"b".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
    }

    // small-star(u): over smaller neighbors Γ⁻(u), m = min(Γ⁻(u) ∪ {u})
    // (= min neighbor, all are < u); emit (w, m) for w ∈ Γ⁻(u), w ≠ m,
    // plus (u, m)
    def smallStar(cur: DataFrame): DataFrame = {
      val m = cur.groupBy($"u").agg(min($"v").as("m"))
      val viaNbr = cur.join(m, "u")
        .filter($"v" =!= $"m").select($"v".as("u"), $"m".as("v"))
      val own = m.select($"u", $"m".as("v"))
      viaNbr.union(own).filter($"u" =!= $"v").distinct()
    }

    var converged = e.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // fixed point: the canonical (u, v) edge set is unchanged — at
      // that point every edge is (child, root-of-star)
      converged = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      e = next
      i += 1
    }
    if (!converged && i >= maxIter) throw new IllegalStateException(
      s"connectedComponentsStar did not converge after $maxIter rounds " +
        "— raise maxIter")
    val labels = nodeSet
      .join(e.select($"u".as("node"), $"v".as("_root")), Seq("node"), "left")
      .select($"node", coalesce($"_root", $"node").as("component"))
    (labels, i)
  }

  /** Phonetic blocking for entity resolution: candidate pairs share a
    * Soundex code (codegen'd built-in — "Smith"/"Smyth" → S530), refined
    * by Levenshtein distance ≤ `maxDist`. The same bucket-and-explode
    * shape as the capped n-gram path: blocks above `maxBlock` are dropped
    * (a phonetic bucket shared by 10⁶ names is a stop-word-like junk
    * block, and its pair fan-out is quadratic), so the candidate join is
    * bounded by maxBlock² per block with no self-join. Spec-pinned only:
    * DuckDB has no Soundex, so there is no SQL oracle twin.
    *
    * Output: (id_a, id_b, name_a, name_b, dist), id_a < id_b. */
  def soundexBlockedPairs(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int = 2, maxBlock: Int = 64): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      soundex(upper(col(nameCol))).as("blk"))
    val blocks = keyed
      .groupBy(col("blk"))
      .agg(sort_array(collect_list(struct(col("id"), col("name")))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBlock)
    blocks
      .select(explode(flatten(
        transform(col("ms"), (x, i) =>
          transform(slice(col("ms"), i + 2, size(col("ms"))),
            y => struct(x.getField("id").as("id_a"), y.getField("id").as("id_b"),
              x.getField("name").as("name_a"), y.getField("name").as("name_b"))))))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.name_a"), col("p.name_b"),
        levenshtein(col("p.name_a"), col("p.name_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Per-dimension embedding profile — the geometry audit to run before
    * trusting a vector column for ANN bucketing or clustering: for each
    * dimension, count, exact integer coordinate sum (mean's numerator —
    * emitted raw because it is signed and floored division diverges
    * across engines on negatives), the floored per-dim variance in
    * quantized units², and a dead-dimension flag. A dead dim wastes
    * index bits; a dominant one (variance ≫ the rest) lets a single
    * coordinate drive every distance — both distort ANN recall and this
    * one cheap scan catches them. posexplode keeps (row × dim) flat;
    * dims are enum-sized so the per-dim shuffle cannot skew. Sufficient
    * statistics ride decimal(38,0) (n·Σq² reaches n²·q²max). */
  def dimProfile(emb: DataFrame, vecCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    emb.select(posexplode(quantize(col(vecCol))).as(Seq("_d", "_q")))
      .groupBy(col("_d").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("_q")).as("sum_q"),
        sum((col("_q").cast(d38) * col("_q"))).as("_sqq"))
      .select(col("dim"), col("n"), col("sum_q"),
        expr(s"""CAST((n * _sqq - CAST(sum_q AS $d38) * sum_q)
                 div NULLIF(CAST(n AS $d38) * (n - 1), 0) AS BIGINT)""")
          .as("var_q2"),
        (expr(s"n * _sqq - CAST(sum_q AS $d38) * sum_q") === 0)
          .as("dead"))
  }

  /** k-NN hubness audit — the embedding-space pathology check that runs
    * BEFORE trusting any k-NN-derived signal (mutual-NN dedup, retrieval
    * eval, SemDeDup): in high-dimensional or badly-trained embedding
    * spaces a few "hub" points appear in everyone's neighbor list while
    * "antihubs" appear in nobody's, silently biasing every downstream
    * neighbor-based decision. Builds the directed k-NN graph inside
    * sign-LSH buckets (the same bucket-local self-join as
    * [[mutualNnPairs]] — never an all-pairs join) and returns the
    * in-degree histogram: `(in_degree, n_vectors)`, including the
    * in_degree = 0 antihub row (vectors nobody selected, plus
    * singleton-bucket vectors — both genuinely unreachable under the
    * bucketed serving path, which is exactly what the audit measures).
    *
    * A healthy space concentrates mass near in_degree = k; a long right
    * tail (max in-degree ≫ k) flags hubness. At 100 TB the corpus is
    * hash-partitioned by bucket so the self-join is partition-local;
    * the histogram is two combiner-friendly groupBys (≤ corpus rows,
    * then ≤ distinct degrees). Integer-exact end to end (quantized dot,
    * deterministic nn-id tiebreak). */
  def knnHubness(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val v = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nn"),
        qdot(col("a.qv"), col("b.qv")).as("dot"))
    val w = Window.partitionBy(col("id")).orderBy(col("dot").desc, col("nn"))
    val edges = pairs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    val indeg = edges.groupBy(col("nn").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    v.select(col("id")).join(indeg, Seq("id"), "left")
      .select(coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vectors"))
  }

  /** Rank-biased overlap (Webber et al. 2010, truncated at depth k) between
    * two rankings of the same query set — the rank-AWARE serving audit next
    * to the set-level recall audits (q315/q327): recall@k treats a hit at
    * rank 1 and rank 10 the same; RBO top-weights agreement, which is what
    * a serving cutover actually changes for users.
    *
    * Inputs are two (query_id, rank, nn_id) rankings (the exact shape
    * [[bruteForceTopK]] / [[lshBucketTopK]] / [[ivfTopK]] emit). For each
    * query, RBO@k = (1−p)·Σ_{d=1..k} p^(d−1)·|A_{1:d} ∩ B_{1:d}|/d with
    * p = 9/10, quantized exactly: weight w_d = 9^(d−1)·10^(12−d) is an
    * integer for every d ≤ 12 (hence the k ≤ 12 bound), and each depth
    * term is the floored `w_d·X_d div d` — engine-deterministic, no
    * floats, perfect agreement tops out just below 10^12 (1−p^k mass).
    *
    * Shape: one equi-join of the two rankings on (query, neighbor) —
    * ≤ k rows per query each side — then a bounded ≤ k-row explode
    * (each agreeing pair contributes to depths ≥ its max rank) and two
    * combiner groupBys; the left join back to the query spine restores
    * zero-overlap queries as rbo 0, not absent rows. */
  def rankBiasedOverlap(rankA: DataFrame, rankB: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 12,
      "k must be in [1,12]: 9^(d-1)*10^(12-d) weights are integral there")
    val wd = map((1 to k).flatMap(d => Seq(lit(d),
      lit((BigInt(9).pow(d - 1) * BigInt(10).pow(12 - d)).toLong))): _*)
    def side(r: DataFrame, as: String) = r
      .select(col("query_id"), col("nn_id"), col("rank").cast("int").as(as))
      .filter(col(as) <= k)
    val agree = side(rankA, "_ra").join(side(rankB, "_rb"),
        Seq("query_id", "nn_id"))
      .select(col("query_id"), greatest(col("_ra"), col("_rb")).as("_m"))
    val perQuery = agree
      .select(col("query_id"), explode(sequence(col("_m"), lit(k))).as("d"))
      .groupBy(col("query_id"), col("d")).agg(count(lit(1)).as("_x"))
      .withColumn("_w", element_at(wd, col("d")))
      .groupBy(col("query_id"))
      .agg(sum(expr("_w * _x div d")).as("rbo_p12"),
        max(when(col("d") === k, col("_x"))).as("_ok"))
    rankA.select(col("query_id")).distinct()
      .join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("_ok"), lit(0L)).as("overlap_at_k"),
        coalesce(col("rbo_p12"), lit(0L)).as("rbo_p12"))
  }

  /** True double-precision cosine (unit-norm corpus ⇒ plain dot), for
    * in-engine use where cross-engine bit-stability doesn't matter. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Embedding-distribution drift between two cohorts, per group — the
    * monitoring op a training-data pipeline runs when a new encoder
    * version or a new ingest source lands: per group the exact squared
    * distance between the two cohorts' MEAN vectors, plus the dimension
    * that moved most. Scalar PSI/KL drift (q239/q256) can't see a shift
    * that only lives in embedding space; this can, without pairwise
    * anything.
    *
    * Exactness: vectors quantize to milli-units ([[quantize]]); per
    * (group, dim) the cohort sums s_a, s_b fold in ONE pass, and the
    * mean-difference square cross-multiplies the counts —
    *   term_d = (s_a·n_b − s_b·n_a)² ,   drift_milli² =
    *   ⌊Σ_d term_d div (n_a·n_b)²⌋   (one floored division at the end,
    * every product in decimal(38,0): s ~ n·10³ means term ~ (n²·10³)²,
    * inside 38 digits through corpus scale). Groups missing a cohort
    * emit NULL drift (nothing to compare), never a fake 0. Shape: one
    * posexplode scan → (group, dim) aggregate → group aggregate, plus a
    * broadcast (group, cohort-count) side — no window, no join wider
    * than the group-count table. */
  /** Per-group cohort sufficient statistics for [[embeddingDrift]]'s
    * streaming face ([[graft.streaming.EventsStreaming.embeddingDriftStream]]):
    * (group, s_b = element-wise Σ of the QUANTIZED vectors, n_b = count).
    * These two numbers are all the drift formula needs from the baseline
    * cohort — term_d = (s_a·n_b − s_b·n_a)² — so the stream can compare
    * exactly against an offline cohort without ever seeing its rows. One
    * groupBy with a bounded (dims-long) buffer ([[graft.functions.VecSumAgg]]);
    * null/empty vectors dropped, same as the batch op's posexplode. */
  def embeddingCohortStats(emb: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val vecsum = udaf(graft.functions.VecSumAgg(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    emb.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(groupCol).as("_g"), quantize(col(vecCol)).as("_q"))
      .groupBy(col("_g"))
      .agg(vecsum(col("_q")).as("s_b"), count(lit(1)).as("n_b"))
      .withColumnRenamed("_g", groupCol)
  }

  /** The drift arithmetic shared by [[embeddingDriftAgainst]] and the
    * streaming face ([[graft.streaming.EventsStreaming.embeddingDriftStream]])
    * — one definition so batch and stream can never diverge. Input needs
    * columns s_a (array<long>, cohort-a per-dim sums), n_a, s_b, n_b;
    * appends dims, drift_milli2, top_dim, top_dim_milli2 (the exact
    * [[embeddingDrift]] formula: term_d = (s_a·n_b − s_b·n_a)²,
    * drift = ⌊Σ term div (n_a·n_b)²⌋, every product decimal(38,0)).
    * A null s_b (no baseline for the group) or a dims mismatch between
    * s_a and s_b (encoder-version mix — zip_with pads with null) yields
    * NULL drift, never a fake 0. */
  private[graft] def driftFromStats(df: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    df
      .withColumn("_term", expr(
        s"transform(zip_with(s_a, s_b, (x, y) -> CAST(x AS $d38) * n_b " +
          s"- CAST(y AS $d38) * n_a), v -> v * v)"))
      .withColumn("_num",
        expr(s"aggregate(_term, CAST(0 AS $d38), (a, v) -> a + v)"))
      .withColumn("_mx", expr(
        "aggregate(zip_with(_term, sequence(0, size(_term) - 1), " +
          "(t, i) -> named_struct('t', t, 'nd', -i)), " +
          s"named_struct('t', CAST(-1 AS $d38), 'nd', 0), " +
          "(acc, x) -> IF(x.t > acc.t OR (x.t = acc.t AND x.nd > acc.nd), " +
          "x, acc))"))
      .withColumn("dims", size(col("s_a")).cast("long"))
      .withColumn("drift_milli2",
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(_num div " +
          s"(CAST(n_a AS $d38) * n_b * n_a * n_b) AS BIGINT) END"))
      .withColumn("top_dim",
        expr("CASE WHEN _num IS NOT NULL THEN CAST(-_mx.nd AS BIGINT) END"))
      .withColumn("top_dim_milli2",
        expr("CASE WHEN n_a > 0 AND n_b > 0 AND _num IS NOT NULL THEN " +
          s"CAST(_mx.t div (CAST(n_a AS $d38) * n_b * n_a * n_b) AS BIGINT) " +
          "END"))
      .drop("_term", "_num", "_mx")
  }

  /** Drift TIMELINE — per (pane, group) the exact drift of that pane's
    * embeddings against a provided baseline cohort: WHEN did the
    * distribution shift, not just whether ([[embeddingDrift]] answers the
    * two-cohort question; this runs it against every pane of a time/batch
    * axis). `baseline` is per-group sufficient statistics from
    * [[embeddingCohortStats]] (s_b, n_b) — the same contract as the
    * streaming face, so an offline baseline computed once serves both.
    *
    * Plan shape: one groupBy(pane, group) whose per-dim sums fold inside
    * the bounded [[graft.functions.VecSumAgg]] buffer (NO posexplode row
    * inflation — rows × dims never materializes, unlike the batch
    * two-cohort op which can afford it), then a broadcast join on group
    * and pure array arithmetic. Linear in corpus; pairs nothing. */
  def embeddingDriftAgainst(emb: DataFrame, paneCol: String,
      groupCol: String, vecCol: String, baseline: DataFrame): DataFrame = {
    val vecsum = udaf(graft.functions.VecSumAgg(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val stats = emb
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(paneCol).as("_p"), col(groupCol).as("_g"),
        quantize(col(vecCol)).as("_q"))
      .groupBy(col("_p"), col("_g"))
      .agg(vecsum(col("_q")).as("s_a"), count(lit(1)).as("n_a"))
    val base = broadcast(
      baseline.select(col(groupCol).as("_g"), col("s_b"), col("n_b")))
    driftFromStats(stats.join(base, Seq("_g"), "left"))
      .select(col("_p").as(paneCol), col("_g").as(groupCol),
        col("n_a"), col("n_b"), col("dims"), col("drift_milli2"),
        col("top_dim"), col("top_dim_milli2"))
  }

  def embeddingDrift(emb: DataFrame, groupCol: String, idCol: String,
      vecCol: String, cohort: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val q = emb.select(col(groupCol).as("_g"), cohort.as("_c"),
      posexplode(quantize(col(vecCol))).as(Seq("dim", "v")))
    val counts = emb.select(col(groupCol).as("_g"), cohort.as("_c"),
        col(idCol))
      .groupBy(col("_g"))
      .agg(sum(when(col("_c"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_c"), 1L).otherwise(0L)).as("n_b"))
    val perDim = q.groupBy(col("_g"), col("dim"))
      .agg(sum(when(col("_c"), col("v")).otherwise(0L)).as("s_a"),
        sum(when(!col("_c"), col("v")).otherwise(0L)).as("s_b"))
    perDim.join(broadcast(counts), Seq("_g"))
      .withColumn("_term", expr(
        s"(CAST(s_a AS $d38) * n_b - CAST(s_b AS $d38) * n_a) " +
          s"* (CAST(s_a AS $d38) * n_b - CAST(s_b AS $d38) * n_a)"))
      .groupBy(col("_g"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("dims"), sum(col("_term")).as("_num"),
        max(struct(col("_term").as("t"), (-col("dim")).as("nd"))).as("_mx"))
      .select(col("_g").as(groupCol), col("n_a"), col("n_b"), col("dims"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(_num div " +
          s"(CAST(n_a AS $d38) * n_b * n_a * n_b) AS BIGINT) END")
          .as("drift_milli2"),
        expr("CAST(-_mx.nd AS BIGINT)").as("top_dim"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(_mx.t div " +
          s"(CAST(n_a AS $d38) * n_b * n_a * n_b) AS BIGINT) END")
          .as("top_dim_milli2"))
  }
}
