package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.etl.Sketches

/** Streaming sketch state: Misra–Gries heavy-hitter candidates maintained
  * per key across micro-batches via `mapGroupsWithState`.
  *
  * MG needs no merge step on a stream — it is a sequential algorithm, so
  * carrying the k−1 counters in group state and folding each micro-batch's
  * items into them IS the textbook streaming form; the candidate set after
  * N total items is a superset of every item with frequency > N/k, exactly
  * the batch guarantee ([[Sketches.heavyHitters]]). State is O(k) per key
  * regardless of stream length — the bounded-state property that makes a
  * per-key frequency monitor viable on an unbounded 100 TB/day stream,
  * where exact per-key counts would grow state with the item domain.
  * The exact recount that turns candidates into exact heavy hitters runs
  * as a periodic batch pass over the archived stream — candidates bound
  * that pass to a broadcast-sized item set. */
object SketchStreaming {

  final case class TokenEvent(grp: String, token: String)
  final case class MgState(counters: Map[String, Long], nSeen: Long)
  final case class MgSnapshot(grp: String, n_seen: Long,
      candidates: Seq[String])

  /** Per-group MG candidate maintenance. Emits one snapshot per group per
    * micro-batch: total items folded so far and the sorted survivor set. */
  def heavyHitterCandidates(events: Dataset[TokenEvent],
      k: Int): Dataset[MgSnapshot] = {
    implicit val stateEnc = Encoders.product[MgState]
    implicit val outEnc = Encoders.product[MgSnapshot]
    events.groupByKey(_.grp)(Encoders.STRING)
      .mapGroupsWithState[MgState, MgSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (grp: String, it: Iterator[TokenEvent], state: GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          val counters = mutable.LinkedHashMap(prev.counters.toSeq: _*)
          var n = prev.nSeen
          it.foreach { e =>
            Sketches.misraGriesUpdate(counters, e.token, k)
            n += 1
          }
          state.update(MgState(counters.toMap, n))
          MgSnapshot(grp, n, counters.keys.toSeq.sorted)
      }
  }
}
