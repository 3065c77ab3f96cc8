package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators beyond the reference's surface (it has none —
  * SURVEY.md §2.10 note): an AS-OF join and gap-based sessionization, both
  * shaped for 100 TB.
  *
  * The as-of join uses the union+window technique instead of a range join:
  * tag both sides, sort within each key by (time, tag), and carry the last
  * seen right-side value forward. Cost = ONE shuffle on the key and a
  * linear window pass — no per-row range probe, no join explosion, and
  * skew only where a single key is hot (then salt by coarse time bucket).
  */
object TimeJoins {

  /** For each left row, the right row's `pick` value with the greatest
    * `rightTime` <= the left row's `leftTime` (per `key`); ties on time
    * resolve to the greatest `pick`. Left rows keep all their columns,
    * plus `asof_<pick>` (null when nothing precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
    val r = right.select(col(key), col(rightTime).as("_time"),
      col(pick).as("_pick")).withColumn("_tag", lit(0))
    // right rows sort before left rows at equal time (<= semantics);
    // multiple right rows at one time resolve to the max pick
    val w = Window.partitionBy(col(key))
      .orderBy(col("_time"), col("_tag"), col("_pick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asof_$pick", last(col("_pick"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_time", "_tag", "_pick")
  }

  /** Forward as-of: for each left row, the right row's `pick` value with
    * the SMALLEST `rightTime` >= the left row's `leftTime` (per `key`);
    * ties on time resolve to the smallest `pick`. Same union+window shape
    * as [[asofJoin]] — one shuffle, linear pass — with the window looking
    * forward instead of back. Output column `asoff_<pick>` (null when
    * nothing follows). */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, pick: String): DataFrame = {
    val pickType = right.schema(pick).dataType
    val l = left
      .withColumn("_time", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_pick", lit(null).cast(pickType))
    val r = right.select(col(key), col(rightTime).as("_time"),
      col(pick).as("_pick")).withColumn("_tag", lit(2))
    // right rows sort after left rows at equal time (>= semantics);
    // multiple right rows at one time resolve to the min pick
    val w = Window.partitionBy(col(key))
      .orderBy(col("_time"), col("_tag"), col("_pick"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asoff_$pick", first(col("_pick"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_time", "_tag", "_pick")
  }

  /** Gap-based sessions over an event stream (batch twin of streaming
    * session windows): session_window merges events whose gaps are below
    * `gap`. Output: key, session start/end, event count. */
  def sessionize(events: DataFrame, key: String, timeCol: String,
      gap: String): DataFrame =
    events.groupBy(col(key), session_window(col(timeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
