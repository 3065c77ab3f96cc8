package graft

import org.apache.spark.sql.functions._

/** The production skew posture, pinned (SCALE.md §Skew): AQE skew-join
  * splitting is the first line of defense, `Skew.saltedJoin` the manual
  * fallback for what AQE can't rewrite — and the two must AGREE on the
  * same skewed input. The first test also pins the session config so a
  * Spark default flip or a Sessions refactor can't silently turn the
  * posture off.
  */
class SkewAqeSpec extends SparkSpec {

  test("session pins the AQE posture: adaptive + skew split + coalesce on") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled") == "true")
  }

  test("AQE splits the hot partition at runtime and agrees with saltedJoin") {
    import spark.implicits._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    // shrink the skew thresholds so the 150k-row hot key is "skewed" at
    // test scale; disable broadcast so the join actually sort-merges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try {
      // 75% of fact rows share one key — the shape AQE's splitter exists for
      val fact = spark.range(200000).select(
        when(col("id") % 4 =!= 0, lit("HOT"))
          .otherwise(concat(lit("k"), col("id") % 997)).as("key"),
        col("id").as("v"))
      val dim = spark.range(997)
        .select(concat(lit("k"), col("id")).as("key"),
          concat(lit("d"), col("id")).as("d"))
        .union(Seq(("HOT", "dhot")).toDF("key", "d"))
      val joined = fact.join(dim, "key")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val Array(r) = joined.collect()
      // the finalized adaptive plan must show the runtime skew split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
      val salted = graft.etl.Skew.saltedJoin(fact, dim, "key")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .collect().head
      assert(r.getLong(0) == salted.getLong(0) &&
        r.getLong(1) == salted.getLong(1),
        "AQE skew join and saltedJoin disagree on the same input")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltPlan: ceil factors, residual task load, hot flags") {
    import spark.implicits._
    val df = (Seq.fill(2500)("hot") ++ Seq.fill(500)("warm") ++
      Seq.fill(7)("cold")).toDF("k")
    val got = graft.etl.Skew.saltPlan(df, $"k", targetPerTask = 500L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("hot") == (2500L, 5L, 500L, true))
    assert(got("warm") == (500L, 1L, 500L, false))
    assert(got("cold") == (7L, 1L, 7L, false))
    // 2501 rows need a 6th salt; residual load rebalances to ceil(2501/6)
    val bumped = graft.etl.Skew
      .saltPlan(df.union(Seq("hot").toDF("k")), $"k", 500L)
      .filter($"key" === "hot").collect().head
    assert(bumped.getLong(2) == 6L && bumped.getLong(3) == 417L)
  }
}
