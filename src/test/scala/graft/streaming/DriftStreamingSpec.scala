package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.etl.Mining

/** The cohort drift screen on a stream: `Mining.cohortDrift` is one
  * groupBy of algebraic sufficient statistics (n, S, Q per cohort), so
  * the SAME call runs on a readStream in complete output mode — partial
  * aggregation state is O(groups), the streaming analogue of the
  * combiner-friendly batch shuffle. This spec pins batch/stream parity,
  * including across multiple micro-batches (the statistics must merge,
  * not recompute). */
case class DriftEvent(grp: String, uid: Long, v: Long)

class DriftStreamingSpec extends SparkSpec {
  test("cohortDrift: streaming complete output equals the batch run") {
    val sq = spark
    import sq.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      DriftEvent("a", 2L, 10L), DriftEvent("a", 4L, 30L),
      DriftEvent("a", 1L, 20L), DriftEvent("b", 2L, 5L))
    val batch2 = Seq(
      DriftEvent("a", 3L, 40L), DriftEvent("a", 6L, 50L),
      DriftEvent("b", 5L, 7L), DriftEvent("b", 8L, 9L))
    val input = MemoryStream[DriftEvent]

    val q = Mining.cohortDrift(input.toDF(), "grp",
        org.apache.spark.sql.functions.col("uid") % 2 === 0, "v")
      .writeStream.format("memory").queryName("drift")
      .outputMode("complete").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Any]("mean_gap_scaled"),
        r.getAs[Any]("var_ratio_scaled"))).toSet
    val streamed = key(spark.table("drift"))
    val batch = key(Mining.cohortDrift((batch1 ++ batch2).toDF(), "grp",
      org.apache.spark.sql.functions.col("uid") % 2 === 0, "v"))
    assert(streamed == batch)
    assert(streamed.map(_._1) == Set("a", "b"))
  }
}
