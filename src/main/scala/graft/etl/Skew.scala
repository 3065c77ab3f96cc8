package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys (SURVEY.md §4 / the 100 TB design notes).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.Sessions]]) covers sort-merge joins; explicit salting
  * is for the cases AQE can't rewrite: hot-key aggregations and
  * broadcast-ineligible joins where one side's key distribution is Zipfian
  * (e.g. a handful of mega-brands across 10⁹ products).
  */
object Skew {

  /** Two-stage skew-safe aggregation: groupBy (key, salt) first — spreading
    * a hot key over `salts` reducers — then re-aggregate by key. Correct for
    * any algebraic aggregate; pass the partial and final columns.
    *
    * Example: saltedCount(df, col("brand"), 32) ≡ df.groupBy("brand").count()
    * but a brand holding 30% of all rows spreads over 32 tasks. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 32): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("count"))

  /** Salted join for a skewed fact against a small-ish dim that is still
    * too big to broadcast: replicate each dim row `salts` times, salt the
    * fact randomly-but-deterministically, join on (key, salt). The hot
    * fact key spreads across `salts` partitions; dim grows ×salts (bounded,
    * choose salts so dim×salts stays shuffle-friendly). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Salting PLANNER — the measurement step before [[saltedCount]] /
    * [[saltedJoin]] commit to a salt factor (same planning-first family
    * as the LSH band planner and the blocking-key profiler): one
    * combiner-friendly count per key, then per key the salt factor
    * `⌈n / targetPerTask⌉` that caps any one (key, salt) reducer at
    * `targetPerTask` rows, and the residual per-task row count that
    * factor actually achieves. `is_hot` marks the keys that need
    * salting at all — on a healthy key distribution the plan is all 1s
    * and the operator should skip salting entirely (the two-stage
    * shuffle is pure overhead then). */
  def saltPlan(df: DataFrame, key: Column,
      targetPerTask: Long): DataFrame = {
    require(targetPerTask > 0, "targetPerTask must be positive")
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .withColumn("salt",
        expr(s"(n + ${targetPerTask - 1}L) div ${targetPerTask}L"))
      .withColumn("max_task_rows", expr("(n + salt - 1) div salt"))
      .withColumn("is_hot", (col("salt") > 1L).cast("boolean"))
  }
}
