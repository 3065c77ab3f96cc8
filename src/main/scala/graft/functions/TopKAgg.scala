package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed Aggregator (SURVEY.md §2.14 UDAF surface, O2's
  * top-k family as an aggregate instead of a window): the buffer holds at
  * most k values, so map-side partial aggregation ships k values per
  * partition instead of the whole group — the scalable shape for
  * "top-k per group" when groups are huge and k is small.
  */
final case class TopKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  /** Insert keeping the buffer sorted desc and capped at k. */
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[Long]): Seq[Long] = r

  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    if (buf.length >= k && x <= buf.last) buf
    else {
      val i = buf.indexWhere(_ < x) match { case -1 => buf.length; case n => n }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}

/** Top-k *rows* per group as a bounded typed Aggregator: input is
  * (sortKey, tiebreak) ordered by (sortKey desc, tiebreak asc) — the same
  * deterministic ordering the window-rank formulation (q14) uses. Unlike
  * `row_number() OVER (PARTITION BY ...)`, which shuffles and sorts every
  * row of every group, the buffer here never exceeds k rows, so map-side
  * partial aggregation ships at most k pairs per (group, partition): the
  * shape that survives a 10⁹-row group at 100 TB.
  */
final case class TopKRowsAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, x)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  /** (sortKey desc, tiebreak asc): x beats y iff x._1 > y._1, or equal keys
    * and x._2 < y._2. */
  private def beats(x: (Long, Long), y: (Long, Long)): Boolean =
    x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

  private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.length >= k && !beats(x, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(x, _)) match { case -1 => buf.length; case n => n }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}

/** Bottom-k rows by a hash key, CARRYING a payload — the bounded buffer
  * behind the sample-quantile sketch ([[graft.etl.Sketches]]): keep the k
  * rows with the smallest (key, tiebreak) and remember each row's payload
  * value. With key = a salted 60-bit sha256 prefix of the row id, the
  * survivors are a uniform without-replacement sample of the group that
  * any engine re-derives exactly (DETERMINISTIC, like the KMV distinct
  * sketch, unlike KLL/GK whose compaction paths an SQL oracle cannot
  * replay) — and order statistics of the sampled payloads estimate the
  * group's quantiles with O(1/√k) rank error.
  *
  * Buffer ≤ k triples, kept sorted by (key asc, tiebreak asc): map-side
  * partial aggregation ships at most k rows per (group, partition), and
  * merging two partial samples is just a capped sorted merge — the
  * mergeability that makes the sketch re-aggregable across shards,
  * days, or retriever partitions without touching row data again.
  */
final case class BottomKRowsAgg(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]] {

  override def zero: Seq[(Long, Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long, Long)],
      x: (Long, Long, Long)): Seq[(Long, Long, Long)] = insert(buf, x)

  override def merge(a: Seq[(Long, Long, Long)],
      b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = r

  /** (key asc, tiebreak asc): x beats y iff strictly smaller. */
  private def beats(x: (Long, Long, Long), y: (Long, Long, Long)): Boolean =
    x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)

  private def insert(buf: Seq[(Long, Long, Long)],
      x: (Long, Long, Long)): Seq[(Long, Long, Long)] = {
    if (buf.length >= k && !beats(x, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(x, _)) match { case -1 => buf.length; case n => n }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] = bufferEncoder
}
