package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise sum of fixed-dimension long vectors as a typed Aggregator
  * — the sufficient statistic the embedding-drift monitor folds (per
  * group: Σ quantized vector + count → exact mean comparison downstream).
  *
  * Why an Aggregator instead of posexplode + (group, dim) groupBy: the
  * batch drift op (graft.etl.Similarity.embeddingDrift) can afford two
  * aggregation hops, but Structured Streaming allows exactly ONE
  * aggregation per query, so the per-dim sums must fold inside a single
  * `groupBy(window, group)` — this buffer is that fold. The buffer is one
  * long[] of the embedding dimension (bounded by construction: dims is a
  * model property, 64 in the test corpus, ≤ a few thousand in practice),
  * and map-side partial aggregation ships one vector per (group,
  * partition) instead of the group's rows — the same shape that survives
  * a 10⁹-row group at 100 TB.
  *
  * Dimension mismatches throw rather than silently zip-truncate: a mixed
  * dims group means two encoder versions landed in one cohort, which is
  * exactly the bug a drift monitor must not average away. Null/empty
  * vectors are the caller's job to filter (the drift ops do).
  */
final case class VecSumAgg() extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] =
    if (buf.isEmpty) x.toArray
    else {
      require(buf.length == x.length,
        s"mixed embedding dims in one group: ${buf.length} vs ${x.length}")
      var i = 0
      while (i < buf.length) { buf(i) += x(i); i += 1 }
      buf
    }

  // both empty cases handled explicitly: an empty partition contributes a
  // zero buffer, and merge order is engine-chosen, so `reduce(a, empty)`
  // would throw a misleading dims-mismatch ("N vs 0") under a global
  // (no-groupBy) aggregation even though nothing is actually mixed
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a else reduce(a, b.toSeq)

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
