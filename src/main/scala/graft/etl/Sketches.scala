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
    val total = items.toDF("item").agg(count(lit(1)).as("n"))
    items.toDF("item")
      .join(broadcast(candidates), "item")
      .groupBy($"item").agg(count(lit(1)).as("cnt"))
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

  /** Misra–Gries frequent-items sketch over one partition: k−1 counters;
    * an unmatched item either claims a free counter or decrements all.
    * Survivors are exactly the items whose count exceeds n_p/k (plus
    * possible false positives — never false negatives). */
  private[etl] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.LinkedHashMap.empty[String, Long]
    it.foreach { x =>
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
    counters.keysIterator
  }
}
