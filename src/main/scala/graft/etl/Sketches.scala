package graft.etl

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sketch-backed exact operators.
  *
  * The pattern (same as the LSH families in [[Similarity]]): a bounded-state
  * sketch generates a CANDIDATE set with a coverage guarantee, then an exact
  * distributed pass re-verifies, so the result is bit-exact while the heavy
  * lifting stays sub-shuffle. Part of the training-data-pipeline surface the
  * builder prompt adds beyond the reference (the reference's only frequency
  * analytics are full GROUP BY counts, e.g. visualize-data.ts:102-180).
  */
object Sketches {

  /** All items with global frequency strictly above |items|/k, found without
    * shuffling the full item domain.
    *
    * Per-partition Misra–Gries with k−1 counters yields every item whose
    * PARTITION frequency exceeds n_p/k; a global heavy hitter (freq > N/k =
    * Σn_p/k) must exceed n_p/k in at least one partition (pigeonhole), so
    * the union of per-partition candidates is a superset of the true answer.
    * Candidates are bounded by numPartitions·(k−1) regardless of domain
    * size — they broadcast — and one exact semi-join + count over them
    * removes the sketch's false positives. At 100 TB the full-domain
    * alternative shuffles every distinct token; this shuffles nothing but
    * the candidate recount.
    *
    * Returns (item, cnt) with cnt·k > N, exact.
    */
  def heavyHitters(items: Dataset[String], k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    val candidates = items.mapPartitions(misraGries(_, k)).distinct()
      .toDF("item")
    // one exact pass computes BOTH the grand total and the per-candidate
    // recount: non-candidate items collapse onto a single NULL key, so the
    // aggregation carries at most |candidates|+1 keys (map-side combine
    // does the work) and the input is scanned twice overall — candidate
    // pass + this — with no corpus-sized cache. The tiny result is
    // localCheckpointed because it feeds two consumers (total + filter).
    val counts = items.toDF("item")
      .join(broadcast(candidates.withColumn("hit", lit(1))), Seq("item"), "left")
      .groupBy(when($"hit" === 1, $"item").as("item"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = counts.agg(sum($"cnt").as("n"))
    counts.filter($"item".isNotNull)
      .join(broadcast(total))
      .filter($"cnt" * k > $"n")
      .select($"item", $"cnt")
  }

  /** Exact distinct counting via 64-bit bitmap words — the roaring-bitmap
    * aggregation pattern: ids bucket into words (id div 64), each word
    * OR-accumulates its members' bits map-side, and the distinct count is
    * Σ bit_count(word). Versus count(DISTINCT id), the shuffle carries at
    * most (group × occupied words) 8-byte rows instead of every distinct
    * (group, id) pair — a 64× reduction on dense id spaces, and the OR is
    * commutative so partial aggregation does the heavy lifting. Requires
    * non-negative ids. */
  def bitmapDistinct(df: DataFrame, groupCol: String,
      idCol: String): DataFrame =
    df.select(col(groupCol), expr(s"$idCol div 64").as("w"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($idCol % 64 AS INT))").as("b"))
      .groupBy(col(groupCol), col("w"))
      .agg(expr("bit_or(b)").as("bits"))
      .groupBy(col(groupCol))
      .agg(sum(bit_count(col("bits"))).cast("long").as("n_distinct"))

  /** Bloom-filter-pruned exact semi-join: keep fact rows whose key appears
    * in `dim`, with a bitmap pre-filter ahead of the exact join.
    *
    * The filter is built DISTRIBUTED — each dim key sets `kHashes` bits,
    * words OR-accumulate map-side (the [[bitmapDistinct]] pattern) — and
    * the mBits/64 longs are fetched to the driver. That fetch is bounded
    * by the mBits PARAMETER (a config constant: 2²⁰ bits = 16 K longs =
    * 128 KB), never by data — the same bounded-fetch family as the IVF
    * centroid read. The fact side then drops non-members map-side BEFORE
    * any shuffle; the final exact semi-join removes the Bloom false
    * positives, so the result is bit-identical to a plain semi-join while
    * the shuffle carries only ~FP-rate extra rows. This is the manual,
    * parameterized form of the runtime row-filter AQE can inject — here
    * the dim side can be any computed DataFrame, not just a join child.
    *
    * Membership test per key: bit i = xxhash64(seed i, key) mod mBits;
    * AND over kHashes word probes against the broadcast literal array. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    require(mBits > 0 && Integer.bitCount(mBits) == 1,
      s"mBits must be a positive power of two, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    val keys = dim.select(col(dimKey).as("_bloom_key"))
      .filter(col("_bloom_key").isNotNull)
    val positions = (0 until kHashes)
      .map(i => pmod(xxhash64(lit(i), col("_bloom_key")), lit(mBits.toLong)))
    val words = keys
      .select(explode(array(positions: _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val bitmap = Array.tabulate(mBits / 64)(i => words.getOrElse(i, 0L))
    val bmp = typedLit(bitmap.toSeq)
    val member = (0 until kHashes).map { i =>
      val pos = pmod(xxhash64(lit(i), col(factKey)), lit(mBits.toLong))
      val word = element_at(bmp, (pos / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L),
        pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= 0
    }.reduce(_ && _)
    fact.filter(col(factKey).isNotNull && member)
      .join(keys.distinct(), fact(factKey) === col("_bloom_key"), "left_semi")
  }

  /** Count-min sketch build + collision-audited estimates. The sketch is
    * a depth×width counter grid: row i buckets an item by 16 bits of
    * sha256(item‖":"‖i) mod width, and every cell is a plain
    * (row, bucket) GROUP BY count — commutative, so map-side combine
    * carries the build and the grid's size (depth·width rows) is a
    * CONFIG constant independent of data scale; it broadcasts. The
    * estimate for an item is the min over its depth cells — ≥ the true
    * count always (collisions only add), within εN with the usual
    * (depth, width) guarantees.
    *
    * This operator returns the AUDIT: for every item whose true count
    * exceeds 1/`minFrac` of all occurrences (the [[heavyHitters]]
    * relative bar — scale-free, so the audit set stays proportional at
    * any data size), the exact count, the CMS estimate, and the
    * collision overestimate — the calibration table you consult before
    * trusting the sketch alone at 100 TB (where the grid is the only
    * thing small enough to keep per shard/window; the exact pass here
    * exists to verify, production reads the grid). Same
    * sketch-then-exact family as [[heavyHitters]].
    * Output: (item, cnt, est, overcount). */
  def countMinEstimates(items: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 256, minFrac: Long = 500): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape: $depth x $width")
    // reads the enclosing plan's _cms_item / _cms_row columns
    def bucket =
      expr("conv(substring(sha2(concat(_cms_item, ':', CAST(_cms_row AS STRING)), 256), 1, 4), 16, 10)")
        .cast("long") % width
    val base = items.select(col(itemCol).cast("string").as("_cms_item"))
      .filter(col("_cms_item").isNotNull)
    val rows = explode(sequence(lit(0), lit(depth - 1))).as("_cms_row")
    val grid = base.select(col("_cms_item"), rows)
      .select(col("_cms_row"), bucket.as("_cms_bucket"))
      .groupBy(col("_cms_row"), col("_cms_bucket"))
      .agg(count(lit(1)).as("_cms_cell"))
      .localCheckpoint()
    val total = grid.filter(col("_cms_row") === 0)
      .agg(sum(col("_cms_cell")).as("_cms_n"))
    val exact = base.groupBy(col("_cms_item"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") * minFrac > col("_cms_n"))
      .drop("_cms_n")
    exact.select(col("_cms_item"), col("cnt"), rows)
      .withColumn("_cms_bucket", bucket)
      .join(broadcast(grid), Seq("_cms_row", "_cms_bucket"))
      .groupBy(col("_cms_item"), col("cnt"))
      .agg(min(col("_cms_cell")).as("est"))
      .select(col("_cms_item").as("item"), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("overcount"))
  }

  /** HyperLogLog register build + integer estimate, audited against the
    * exact distinct count. Keys hash through a 32-bit
    * multiply–xorshift–multiply–xorshift mix (Knuth constant, then
    * xor-fold ≫16, odd constant 0x7feb352d, xor-fold ≫13) — the plain
    * multiplicative hash alone has lattice structure that biases the
    * leading-zero statistic 90% high on dense key ranges, and the second
    * constant is deliberately < 2³¹ so the widest intermediate product
    * stays under 2⁶³ (ANSI mode throws on long overflow; valid for
    * non-negative keys). The low p bits pick a register and ρ = position
    * of the top set bit in the remaining (32−p)-bit window, via the
    * bin()-length trick ([[graft.etl.Vocab]]'s integer-log₂ recipe) — so
    * both engines build bit-identical registers. Register build is one
    * (bucket, max ρ) GROUP BY — 2ᵖ rows out regardless of input size,
    * max is commutative, map-side combine does everything; this is THE
    * mergeable-sketch shape (shards/windows union by register-wise max).
    *
    * The estimate stays integral: with R = (32−p)+1 the max ρ, the
    * harmonic sum Σ 2^(R−ρ_j) over all 2ᵖ registers (empty → ρ=0) is an
    * exact integer S, and est = (α_bp · m² · 2^R) div (10000 · S) with
    * α_bp = 7090 for m ≥ 64 — floor-division-exact on both engines (no
    * bias correction branches: the audit covers the plain estimator).
    * Output one row: (m, exact_distinct, hll_est, err_bp). */
  /** The 32-bit mixed hash feeding the HLL registers (see [[hllCompare]]
    * for the constants' rationale). */
  private def hllHashed(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isNotNull && col("_k") >= 0)
      // 31-bit key fold before the 32-bit Knuth mix: the raw product
      // overflows a long under ANSI for ids past ~3.4e9 (seen at the
      // 10× sweep's shifted keys); ids below 2³¹ hash identically
      .select(expr("((_k % 2147483648L) * 2654435761L) % 4294967296L")
        .as("_h0"))
      .select(expr("_h0 ^ (_h0 div 65536)").as("_h1"))
      .select(expr("(_h1 * 2146121005L) % 4294967296L").as("_h2"))
      .select(expr("_h2 ^ (_h2 div 8192)").as("_h"))

  private def regsFromHashed(hashed: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val rMax = (32 - p) + 1
    hashed
      .select((col("_h") % m).as("bucket"), expr(s"_h div $m").as("_v"))
      .withColumn("_rho",
        when(col("_v") === 0, lit(rMax))
          .otherwise(lit(rMax) - length(bin(col("_v")))))
      .groupBy(col("bucket")).agg(max(col("_rho")).as("rho"))
  }

  /** Occupied HLL registers (bucket, max ρ) for a key column — the
    * mergeable-sketch core of [[hllCompare]], exposed separately because
    * it is a plain projection + (bucket, max) aggregation and therefore
    * runs UNCHANGED on a streaming DataFrame (complete mode): max is
    * order-insensitive, so registers over an unbounded stream equal the
    * batch registers over the same rows — the streaming distinct-count
    * monitor with 2ᵖ longs of state, ever. */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    regsFromHashed(hllHashed(df, keyCol), p)
  }

  def hllCompare(df: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val rMax = (32 - p) + 1
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = hllHashed(df, keyCol)
    val regs = regsFromHashed(hashed, p)
    val full = spark.range(0, m).toDF("bucket")
      .join(regs, Seq("bucket"), "left")
      .withColumn("rho", coalesce(col("rho"), lit(0)))
    val est = full.agg(
      sum(expr(s"shiftleft(1L, $rMax - rho)")).as("_s"))
      .select(expr(s"(7090L * $m * $m * shiftleft(1L, $rMax)) div (10000L * _s)")
        .as("hll_est"))
    val exact = hashed.agg(countDistinct(col("_h")).as("exact_distinct"))
    exact.join(est)
      .select(lit(m).cast("long").as("m"), col("exact_distinct"),
        col("hll_est"),
        expr("((hll_est - exact_distinct) * 10000L) div exact_distinct")
          .as("err_bp"))
  }

  /** Equi-width histogram quantile estimates, audited against the exact
    * order statistic. The sketch is a `bins`-cell counter row per group —
    * (group, bin) GROUP BY counts, combiner-built, merge = cell-wise add,
    * the same config-bounded mergeable shape as [[countMinEstimates]] —
    * and the estimate for quantile q is the LOWER BOUND of the first bin
    * whose running count reaches k = ⌈q·n⌉: within one bin width of the
    * truth by construction, never below the bin's floor. The exact side
    * (per-group row_number to the k-th order statistic, id-tiebroken) is
    * the audit; at scale the histogram is what you keep per shard/window
    * and the exact pass is what you're avoiding. Integer throughout —
    * bin = ((x−lo)·bins) div (hi−lo+1) needs x-range·bins within long.
    * Output: (group, q_bp, est, exact, err). */
  /** K-minimum-values distinct-count audit per group — the third distinct
    * estimator beside HLL (q168: fixed 2^p registers, rough) and the exact
    * bitmap (q123: dense id spaces only): keep the k smallest distinct
    * 32-bit hash values per group; if the k-th smallest is h_k, the domain
    * is ≈ (k−1)·2³²/h_k. Groups with < k distinct hashes are reported
    * EXACTLY (the sketch has seen everything).
    *
    * Same multiply–xorshift hash chain as [[hllCompare]] (plain Knuth
    * leaves the low bits too regular for order statistics), so any SQL
    * oracle re-derives the identical h_k. "Exact" here counts distinct
    * HASHES — the estimator's own universe; 32-bit collisions fold both
    * sides identically.
    *
    * Scale shape: the bottom-k fold is [[graft.functions.TopKAgg]] over
    * negated hashes — a bounded k-value buffer per (group, partition), so
    * map-side partials ship k longs however large the group, ONE shuffle
    * total after the distinct. No per-group window sort anywhere. */
  /** Per-group 32-bit multiply–xorshift hashes, distinct — the shared
    * front of [[kmvCompare]] and [[kmvIntersect]]. 31-bit key fold
    * first: same ANSI-overflow guard as [[hllHashed]]. */
  private def kmvHashed(df: DataFrame, groupCol: String,
      keyCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(keyCol).cast("long").as("_k"))
      .filter(col("_k").isNotNull && col("_k") >= 0)
      .select(col("g"),
        expr("((_k % 2147483648L) * 2654435761L) % 4294967296L").as("_h0"))
      .select(col("g"), expr("_h0 ^ (_h0 div 65536)").as("_h1"))
      .select(col("g"), expr("(_h1 * 2146121005L) % 4294967296L").as("_h2"))
      .select(col("g"), expr("_h2 ^ (_h2 div 8192)").as("_h"))
      .distinct()

  def kmvCompare(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hashed = kmvHashed(df, groupCol, keyCol)
    val bottomK = udaf(graft.functions.TopKAgg(k))
    hashed
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("exact_distinct"),
        bottomK(negate(col("_h"))).as("_negs"))
      .select(col("g"), col("exact_distinct"),
        // buffer is sorted desc on −h, so the LAST element is the k-th
        // smallest hash (or the largest seen when the group has < k)
        (-element_at(col("_negs"), size(col("_negs")))).as("_hk"),
        size(col("_negs")).as("_nseen"))
      .select(col("g"), col("exact_distinct"),
        when(col("_nseen") < k, col("exact_distinct"))
          .otherwise(expr(s"(${k - 1} * 4294967296L) div _hk"))
          .cast("long").as("kmv_est"))
      .withColumn("err_bp",
        expr("(kmv_est - exact_distinct) * 10000L div exact_distinct"))
  }

  /** KMV set-INTERSECTION estimates between every pair of groups — the
    * sketch answer to "how much do these audiences overlap" when the
    * exact pairwise distinct-join (q192's shape) is what you can't
    * afford: per group keep the k smallest distinct hashes (one
    * [[graft.functions.TopKAgg]] shuffle, k longs per group however big
    * the group), then for each group pair merge the two sketches, take
    * the k smallest of the union (θ = the k-th), and count how many of
    * those are in BOTH sketches. Standard KMV algebra, all exact
    * integers:
    *
    *  - jaccard_bp = n_common·10⁴ / n_k  (n_common of the combined
    *    sketch's n_k values hit both sides);
    *  - union_est = (k−1)·2³²/θ, or EXACT n_k when the merged sketch
    *    holds < k values (both sketches saw their whole group);
    *  - inter_est = jaccard · union_est.
    *
    * Everything after the per-group fold runs on |groups|·k rows —
    * enum-sized groups make the pair stage metadata-scale, so the
    * per-pair top-k window and the membership joins (broadcast) are
    * bounded regardless of data size. */
  def kmvIntersect(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val bottomK = udaf(graft.functions.TopKAgg(k))
    val sk = kmvHashed(df, groupCol, keyCol)
      .groupBy(col("g")).agg(bottomK(negate(col("_h"))).as("_negs"))
      .select(col("g"), explode(col("_negs")).as("_neg"))
      .select(col("g"), (-col("_neg")).as("h"))
    val gs = sk.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("g1"))
      .join(broadcast(gs.select(col("g").as("g2"))), col("g1") < col("g2"))
    val merged = pairs.join(broadcast(sk.select(col("g").as("g1"), col("h"))),
        Seq("g1"))
      .select(col("g1"), col("g2"), col("h"))
      .union(pairs.join(broadcast(sk.select(col("g").as("g2"), col("h"))),
          Seq("g2"))
        .select(col("g1"), col("g2"), col("h")))
      .distinct()
    val topm = merged
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("g1"), col("g2")).orderBy(col("h"))))
      .filter(col("_rn") <= k)
    topm
      .join(broadcast(sk.select(col("g").as("g1"), col("h"),
        lit(1L).as("_inA"))), Seq("g1", "h"), "left")
      .join(broadcast(sk.select(col("g").as("g2"), col("h"),
        lit(1L).as("_inB"))), Seq("g2", "h"), "left")
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_k"), max(col("h")).as("_theta"),
        sum(when(col("_inA") === 1L && col("_inB") === 1L, 1L)
          .otherwise(0L)).as("n_common"))
      .withColumn("union_est",
        when(col("n_k") < k, col("n_k"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div _theta"))
          .cast("long"))
      .select(col("g1"), col("g2"), col("n_k"), col("n_common"),
        expr("CAST(n_common * 10000 div n_k AS BIGINT)").as("jaccard_bp"),
        col("union_est"),
        expr("CAST(n_common * union_est div n_k AS BIGINT)")
          .as("inter_est"))
  }

  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, bins: Int = 256,
      quantilesBp: Seq[Int] = Seq(5000, 9000, 9900)): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(quantilesBp.forall(q => q > 0 && q <= 10000), "q_bp in (0,10000]")
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(valueCol)).as("_lo"), max(col(valueCol)).as("_hi"),
      count(lit(1)).as("_n"))
    val binned = df.join(broadcast(stats), Seq(groupCol))
      .withColumn("_bin",
        expr(s"(($valueCol - _lo) * $bins) div (_hi - _lo + 1)"))
      .groupBy(col(groupCol), col("_bin")).agg(count(lit(1)).as("_c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = binned.withColumn("_cum", sum(col("_c")).over(wCum))
    val targets = stats
      .withColumn("q_bp", explode(typedLit(quantilesBp)))
      .withColumn("_k", expr("((q_bp * _n) + 9999) div 10000"))
    val est = targets.join(cum, Seq(groupCol))
      .filter(col("_cum") >= col("_k"))
      .groupBy(col(groupCol), col("q_bp"), col("_lo"), col("_hi"))
      .agg(min(col("_bin")).as("_ebin"))
      .withColumn("est", expr(s"_lo + (_ebin * (_hi - _lo + 1)) div $bins"))
      .select(col(groupCol), col("q_bp"), col("est"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val ranked = df.withColumn("_rn", row_number().over(wRank))
    val tk = targets.select(col(groupCol).as("_tg"), col("q_bp"), col("_k"))
    val exact = ranked.join(broadcast(tk),
        col(groupCol) === col("_tg") && col("_rn") === col("_k"))
      .select(col(groupCol), col("q_bp"), col(valueCol).as("exact"))
    est.join(exact, Seq(groupCol, "q_bp"))
      .withColumn("err", col("est") - col("exact"))
  }

  /** The deterministic 60-bit hash rank behind the sample-quantile
    * sketch: first 15 hex chars of sha256(salt:id) — positive, fits a
    * long, and re-derivable by any engine (oracle twin:
    * `('0x' || substring(sha256(salt || ':' || id), 1, 15))::BIGINT`).
    * private[graft]: the streaming face ([[graft.streaming
    * .EventsStreaming.quantileSketchStream]]) shares this and
    * [[quantileRows]] so batch and stream cannot diverge. */
  private[graft] def hashRank(salt: String, id: Column): Column =
    conv(substring(sha2(concat(lit(salt + ":"), id.cast("string")), 256),
      1, 15), 16, 10).cast("long")

  /** Per-group bottom-k-by-hash uniform sample + group size — the
    * mergeable one-pass quantile sketch's sufficient state: (group, n,
    * vals = the ≤k sampled values sorted ascending). One scan, ONE
    * aggregation whose buffer never exceeds k rows
    * ([[graft.functions.BottomKRowsAgg]]) — map-side partials ship ≤k
    * rows per (group, partition). Contrast [[histogramQuantiles]], which
    * needs a min/max pre-pass plus a full second scan: this is the shape
    * for "quantiles of a 10⁹-row group in the same job as everything
    * else", and the sample is re-aggregable across shards/days
    * ([[sampleQuantilesMerged]]) because bottom-k(∪ bottom-k partials) =
    * bottom-k(all). Deterministic (salted sha256 rank, id tiebreak), so
    * an SQL oracle replays the exact sample — the property KLL/GK
    * compaction paths can't give. Rank error is the sample-quantile
    * O(1/√k). */
  private def bottomKSample(df: DataFrame, groupCol: String,
      valueCol: String, idCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val bk = udaf(graft.functions.BottomKRowsAgg(k))
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol).as("g"),
        hashRank(salt, col(idCol)).as("_hk"),
        col(idCol).cast("long").as("_id"),
        col(valueCol).cast("long").as("_v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), bk(col("_hk"), col("_id"), col("_v")).as("_top"))
      .select(col("g"), col("n"),
        array_sort(expr("transform(_top, x -> x._3)")).as("vals"))
  }

  /** Estimates at `psPpm` from a sample table carrying (n, vals): the
    * ⌈p·m/10⁶⌉-th smallest sampled value (lower sample quantile, exact
    * integer index arithmetic). m = |vals| = min(k, n) ≥ 1 because the
    * sketch only emits groups it saw. Extra input columns (pane keys on
    * the streaming face) ride through; `vals` is dropped. ONE definition
    * for batch and stream — shared arithmetic cannot diverge. */
  private[graft] def quantileRows(sample: DataFrame,
      psPpm: Seq[Int]): DataFrame = {
    require(psPpm.forall(p => p > 0 && p <= 1000000), "p_ppm in (0, 1e6]")
    sample
      .withColumn("p_ppm", explode(typedLit(psPpm.map(_.toLong))))
      .withColumn("m", size(col("vals")).cast("long"))
      .withColumn("_idx",
        greatest(expr("CAST((p_ppm * m + 999999) div 1000000 AS INT)"),
          lit(1)))
      .withColumn("est", element_at(col("vals"), col("_idx")))
      .drop("vals", "_idx")
  }

  /** One-pass mergeable sample-quantile sketch: per (group, p) the
    * estimated p-quantile of `valueCol` (long), with n (population) and
    * m (sample size) alongside. */
  def sampleQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int = 256,
      psPpm: Seq[Int] = Seq(500000, 900000, 990000),
      salt: String = "sq"): DataFrame =
    quantileRows(bottomKSample(df, groupCol, valueCol, idCol, k, salt), psPpm)
      .select(col("g"), col("p_ppm"), col("n"), col("m"), col("est"))

  /** The merge path, made observable: partial sketches are built per
    * (group, shard), then RE-AGGREGATED through the same bounded buffer —
    * the exact motion of combining per-day or per-shard sketches without
    * touching row data again. Output is identical to [[sampleQuantiles]]
    * by merge-invariance (bottom-k of a union = bottom-k of merged
    * bottom-ks, deterministic under the (hash, id) tiebreak), and the
    * oracle states exactly that: the one-level SQL sketch. The re-agg
    * explodes only the partials (≤ groups·shards·k rows), never rows. */
  def sampleQuantilesMerged(df: DataFrame, groupCol: String,
      shardCol: Column, valueCol: String, idCol: String, k: Int = 256,
      psPpm: Seq[Int] = Seq(500000, 900000, 990000),
      salt: String = "sq"): DataFrame = {
    val bk = udaf(graft.functions.BottomKRowsAgg(k))
    val partials = df.filter(col(groupCol).isNotNull &&
        col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("g"), shardCol.as("_shard"),
        hashRank(salt, col(idCol)).as("_hk"),
        col(idCol).cast("long").as("_id"),
        col(valueCol).cast("long").as("_v"))
      .groupBy(col("g"), col("_shard"))
      .agg(count(lit(1)).as("_np"),
        bk(col("_hk"), col("_id"), col("_v")).as("_top"))
      .localCheckpoint() // tiny (groups·shards rows); both reads below
    val ns = partials.groupBy(col("g")).agg(sum(col("_np")).as("n"))
    val merged = partials
      .select(col("g"), explode(col("_top")).as("_x"))
      .groupBy(col("g"))
      .agg(bk(col("_x._1"), col("_x._2"), col("_x._3")).as("_top"))
      .select(col("g"),
        array_sort(expr("transform(_top, x -> x._3)")).as("vals"))
    quantileRows(merged.join(ns, "g"), psPpm)
      .select(col("g"), col("p_ppm"), col("n"), col("m"), col("est"))
  }

  /** Rank-error audit of [[sampleQuantiles]] against the exact
    * distribution — the estimator-audit companion (same pattern as the
    * MinHash/HLL audits): per (group, p), the estimate's TRUE rank
    * (rows ≤ est, one conditional aggregation over the population joined
    * to the broadcast estimate table) and |rank − p| in ppm. The sample-
    * quantile bound says this reads ~O(10⁶/√k) ppm; a blowout means the
    * id column wasn't unique (duplicate hash ranks bias the sample). */
  def sampleQuantileAudit(df: DataFrame, groupCol: String,
      valueCol: String, idCol: String, k: Int = 256,
      psPpm: Seq[Int] = Seq(500000, 900000, 990000),
      salt: String = "sq"): DataFrame = {
    val est = sampleQuantiles(df, groupCol, valueCol, idCol, k, psPpm, salt)
    val pop = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("_v"))
    pop.join(broadcast(est), Seq("g"))
      .groupBy(col("g"), col("p_ppm"), col("n"), col("m"), col("est"))
      .agg(sum(when(col("_v") <= col("est"), 1L).otherwise(0L))
        .as("rank_le"))
      .select(col("g"), col("p_ppm"), col("n"), col("m"), col("est"),
        col("rank_le"),
        abs(expr("rank_le * 1000000 div n") - col("p_ppm"))
          .as("rank_err_ppm"))
  }

  /** Misra–Gries frequent-items sketch over one partition: k−1 counters;
    * an unmatched item either claims a free counter or decrements all.
    * Survivors are exactly the items whose count exceeds n_p/k (plus
    * possible false positives — never false negatives). */
  private[etl] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.LinkedHashMap.empty[String, Long]
    it.foreach(misraGriesUpdate(counters, _, k))
    counters.keysIterator
  }

  /** One Misra–Gries update step — shared by the batch partition sketch
    * and the streaming per-key state ([[graft.streaming.SketchStreaming]]),
    * because MG is sequential by construction: carrying the counters
    * across micro-batches IS the algorithm, no merge step needed. */
  private[graft] def misraGriesUpdate(
      counters: mutable.LinkedHashMap[String, Long], x: String,
      k: Int): Unit =
    counters.get(x) match {
      case Some(c) => counters(x) = c + 1
      case None if counters.size < k - 1 => counters(x) = 1L
      case None =>
        // decrement-all: amortized O(1) per input item — each decrement
        // event consumes k-1 previously-paid increments
        val dead = counters.iterator.collect { case (i, 1L) => i }.toList
        counters.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(counters.remove)
    }
}
