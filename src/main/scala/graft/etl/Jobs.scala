package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Job execution model (SURVEY.md §2.13/§3.2): the reference's
  * `processing_jobs` row with per-batch counters becomes one job row +
  * `observe()` metrics captured by a QueryExecutionListener — counters
  * come from the same pass as the data (no second scan), deterministic
  * under task retries (unlike accumulators).
  */
object Jobs {

  final case class JobResult(
      jobId: String,
      shopType: String,
      status: String,
      nRows: Long,
      nPromotions: Long,
      nInactive: Long,
      nUncategorized: Long,
      startedAtMs: Long,
      finishedAtMs: Long) {
    def durationSec: Double = (finishedAtMs - startedAtMs) / 1000.0
    def rowsPerSec: Double = if (durationSec > 0) nRows / durationSec else 0.0
  }

  /** Run one shop job: process → observe counters → sink via `write`.
    * Returns the finalized job row (completeProcessingJob analog,
    * postgres-adapter.ts:389-425). */
  def runShopJob(spark: SparkSession, adapter: Shops.ShopAdapter, raw: DataFrame,
      jobId: String)(write: DataFrame => Unit): JobResult = {
    val started = System.currentTimeMillis()
    @volatile var metrics: Option[Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("run_summary").foreach(r => metrics = Some(r))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val unified = Sinks.withRunCounters(Pipeline.process(adapter, raw))
      write(unified)
      // observed metrics are delivered asynchronously after the action
      val deadline = System.currentTimeMillis() + 30000
      while (metrics.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val m = metrics
      JobResult(jobId, adapter.shopType,
        status = if (m.isDefined) "completed" else "completed_no_metrics",
        nRows = m.map(_.getAs[Long]("n_rows")).getOrElse(0L),
        nPromotions = m.map(_.getAs[Long]("n_promotions")).getOrElse(0L),
        nInactive = m.map(_.getAs[Long]("n_inactive")).getOrElse(0L),
        nUncategorized = m.map(_.getAs[Long]("n_uncategorized")).getOrElse(0L),
        startedAtMs = started, finishedAtMs = System.currentTimeMillis())
    } catch {
      case e: Throwable =>
        JobResult(jobId, adapter.shopType, s"failed: ${e.getMessage}",
          0, 0, 0, 0, started, System.currentTimeMillis())
    } finally spark.listenerManager.unregister(listener)
  }

  /** A10-shaped job stats over a jobs table. */
  def jobStats(jobs: DataFrame): DataFrame =
    jobs.groupBy(col("shopType"))
      .agg(count(lit(1)).as("n_jobs"),
        count(when(col("status") === "completed", 1)).as("n_completed"),
        sum(col("nRows")).as("total_rows"))
      .withColumn("success_rate",
        when(col("n_jobs") > 0,
          round(col("n_completed") * 100.0 / col("n_jobs"), 2)).otherwise(0.0))
      .orderBy(col("shopType"))
}
