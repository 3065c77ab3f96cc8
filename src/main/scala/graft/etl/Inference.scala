package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inference-log analytics — the readouts a serving team runs over a
  * request log: KV-cache prefix-hit-rate under an LRU horizon, and
  * dynamic-batching utilization. The static-corpus sibling of the
  * prefix work is q432 (prefix_sharing over documents); these run over
  * a TIME-ORDERED log, where "would this prefix have been cached"
  * depends on when the previous request with the same prefix arrived.
  */
object Inference {

  /** KV-cache prefix-hit rate: a request HITS if any earlier request
    * with the same prefix arrived within `horizonUs` (the LRU horizon —
    * older entries are assumed evicted). Naive spelling is a lag() over
    * a window partitioned by the prefix, but a shallow prefix column is
    * an ENUM (a handful of system prompts serve most traffic), so that
    * window is a one-task sort of the whole log — the exact class
    * WindowLintSpec's enum lint exists to reject.
    *
    * Scale-safe spelling: bucket time by the horizon (`bk = us div H`).
    * Any hit-distance predecessor lives in the SAME bucket or the one
    * BEFORE (two ts in bucket `bk` differ by < H, and anything two
    * buckets back is > H away). So:
    *   - same-bucket predecessors: a running max(us) over
    *     (prefix, bk) — partition count grows with the log, never a
    *     one-task sort; any same-bucket predecessor is automatically
    *     within H;
    *   - previous-bucket predecessors: the per-(prefix, bk) max joined
    *     onto bk+1, checked against us − H.
    *
    * Output: the input + `hit` (boolean). Deterministic: ordering ties
    * broken by `idCol`; equal-ts predecessors count (distance 0). */
  def prefixHitRate(df: DataFrame, prefixCol: Column, usCol: String,
      idCol: String, horizonUs: Long): DataFrame = {
    require(horizonUs > 0, s"horizonUs must be positive, got $horizonUs")
    // integer `div`, never `/` (double division loses exactness at
    // µs-epoch magnitudes and would round instead of floor)
    val d = df.withColumn("_pfx", prefixCol)
      .withColumn("_bk", expr(s"CAST($usCol AS BIGINT) div $horizonUs"))
    val wSame = Window.partitionBy(col("_pfx"), col("_bk"))
      .orderBy(col(usCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevBucket = d.groupBy(col("_pfx"), col("_bk"))
      .agg(max(col(usCol)).as("_pbmax"))
      .withColumn("_bk", col("_bk") + 1)
    d.withColumn("_same", max(col(usCol)).over(wSame))
      .join(prevBucket, Seq("_pfx", "_bk"), "left")
      .withColumn("hit", col("_same").isNotNull ||
        coalesce(col("_pbmax") >= col(usCol) - horizonUs, lit(false)))
      .drop("_same", "_pbmax", "_bk")
      .withColumnRenamed("_pfx", "prefix")
  }

  /** FIFO queueing replay — the capacity "what-if" a serving team runs
    * over yesterday's log: single server per key, requests served in
    * arrival order, each holding the server for its service demand. The
    * Lindley recurrence C_i = max(arr_i, C_{i-1}) + s_i looks
    * sequential, but it has the max-plus closed form
    *   C_i = S_i + max_{j ≤ i} (arr_j − S_{j−1}),   S = prefix sum of s
    * — a prefix SUM and a running MAX, exactly the two-phase
    * range-bucketed primitives ([[Layout.addRunningSums]] /
    * [[Layout.addPrevMax]]), so the replay never one-task-sorts a key.
    * Output: the input + completion `c_us` and `wait_us`
    * (= C − arr − s, the queueing delay a request would have seen).
    * Sort must be a total order (append a unique id); times/durations
    * integral µs, non-null. */
  def fifoReplay(df: DataFrame, keyCols: Seq[String], usCol: String,
      idCol: String, serviceUsCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val sort = Seq(col(usCol), col(idCol))
    val bucketed = Layout.bucketize(df, keyCols.map(col) ++ sort)
    val withS = Layout.addRunningSums(bucketed, keyCols, sort,
        Seq(col(serviceUsCol) -> "_S"))
      .withColumn("_v", col(usCol) - col("_S") + col(serviceUsCol))
    val withM = Layout.addPrevMax(withS, keyCols, sort, col("_v"), "_pm")
      .withColumn("_M", greatest(col("_v"), col("_pm")))
    withM
      .withColumn("c_us", col("_S") + col("_M"))
      .withColumn("wait_us",
        col("c_us") - col(usCol) - col(serviceUsCol))
      .drop("_S", "_v", "_pm", "_M", "_b")
  }

  /** Dynamic-batching utilization: requests are batched by arrival time
    * window (`windowUs`) per model/route key — the standard serving
    * batcher — and each batch runs in `ceil(tokens / capacity)` compute
    * waves. Per (key, batch window):
    *   - `waves`: ceil-div of the token sum by capacity,
    *   - wave utilization: tokens vs waves × capacity,
    *   - padding waste: batching pads every request to the batch max
    *     length, so waste = n·max_tok − Σtok over n·max_tok.
    * This is the MEASURED readout next to q482's LPT planner: the
    * planner says what a perfect packer could do, this says what the
    * window batcher actually did. One (key, window) aggregate + one key
    * rollup — two keyed shuffles. All ratios floored bp. */
  def windowPacking(df: DataFrame, keyCol: String, usCol: String,
      tokCol: String, windowUs: Long, capacity: Long): DataFrame = {
    require(windowUs > 0 && capacity > 0,
      s"windowUs and capacity must be positive, got $windowUs/$capacity")
    val perBatch = df
      .withColumn("_w", expr(s"CAST($usCol AS BIGINT) div $windowUs"))
      .groupBy(col(keyCol), col("_w"))
      .agg(count(lit(1)).as("_n"), sum(col(tokCol)).as("_tok"),
        max(col(tokCol)).as("_mx"))
      .withColumn("_waves", expr(s"(_tok + ${capacity - 1}) div $capacity"))
    perBatch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_batches"), sum(col("_n")).as("n_requests"),
        sum(col("_tok")).as("total_tokens"), sum(col("_waves")).as("waves"),
        sum(col("_n") * col("_mx")).as("_padded"))
      .withColumn("util_bp", expr(
        // an all-zero-token key has 0 waves: 0 utilization, not div-0
        // (Spark would null silently; the DuckDB twin would ERROR —
        // the worst cross-engine asymmetry, so both sides guard)
        s"CASE WHEN waves > 0 " +
          s"THEN total_tokens * 10000 div (waves * $capacity) " +
          "ELSE 0 END"))
      .withColumn("pad_waste_bp", expr(
        // all-zero-token keys have nothing padded: 0 waste, not div-0
        "CASE WHEN _padded > 0 " +
          "THEN (_padded - total_tokens) * 10000 div _padded ELSE 0 END"))
      .drop("_padded")
  }
}
