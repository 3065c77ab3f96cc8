package graft.etl

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
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
