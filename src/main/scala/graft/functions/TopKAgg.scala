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
