package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A4/A5 — per-row quality scoring and the aggregate quality report
  * (`src/core/services/quality/product-quality-service.ts:90-278`).
  * Additive when() chain — fully codegen'd, no UDF, no shuffle for the
  * per-row score; the report is one small agg.
  */
object Quality {

  /** Base 50 + image 10 + category 5 + brand 5 + promo-with-mechanism 10 +
    * active 5 + quantity 10 + conversion 5, capped at 100 (cap unreachable:
    * the factors sum to exactly 100). JS truthiness per factor. */
  val score: Column = {
    val s = lit(50) +
      when(coalesce(col("image_url"), lit("")) =!= "", 10).otherwise(0) +
      when(col("main_category").isNotNull &&
        coalesce(col("main_category"), lit("")) =!= "", 5).otherwise(0) +
      when(coalesce(col("brand"), lit("")) =!= "", 5).otherwise(0) +
      when(col("is_promotion") &&
        coalesce(col("promotion_mechanism"), lit("")) =!= "", 10).otherwise(0) +
      when(col("is_active") === true, 5).otherwise(0) +
      when(coalesce(col("quantity_amount"), lit(0.0)) =!= 0.0 &&
        coalesce(col("quantity_unit"), lit("")) =!= "", 10).otherwise(0) +
      when(col("conversion_factor").isNotNull, 5).otherwise(0)
    least(s, lit(100)).cast("double")
  }

  def withScore(df: DataFrame): DataFrame = df.withColumn("quality_score", score)

  /** A5 quality metrics: avg score + score histogram buckets
    * (product-quality-service.ts:163-278). */
  def report(df: DataFrame): DataFrame = {
    val scored = withScore(df)
    scored.agg(
      round(avg(col("quality_score")), 2).as("avg_score"),
      count(lit(1)).as("n_products"),
      count(when(col("quality_score") >= 90, 1)).as("b_90_100"),
      count(when(col("quality_score") >= 80 && col("quality_score") < 90, 1)).as("b_80_89"),
      count(when(col("quality_score") >= 70 && col("quality_score") < 80, 1)).as("b_70_79"),
      count(when(col("quality_score") >= 60 && col("quality_score") < 70, 1)).as("b_60_69"),
      count(when(col("quality_score") >= 50 && col("quality_score") < 60, 1)).as("b_50_59"),
      count(when(col("quality_score") < 50, 1)).as("b_lt_50"))
  }

  /** Functional-dependency audit: does `lhs → rhs` actually hold in the
    * data? One row per claimed dependency: determinant groups, the groups
    * where the rhs is NOT single-valued, the row mass trapped in those
    * groups, and the worst fan-out — the schema-contract check (natural
    * keys, denormalization assumptions, dimension hierarchies) run as one
    * combiner-friendly groupBy plus a one-row fold. NULL lhs values group
    * together; NULL rhs values don't count as a distinct value
    * (count(DISTINCT) semantics, identical in the oracle). */
  def functionalDependency(df: DataFrame, lhsCols: Seq[String],
      rhsCol: String, name: String): DataFrame = {
    require(lhsCols.nonEmpty)
    df.groupBy(lhsCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), countDistinct(col(rhsCol)).as("_d"))
      .agg(count(lit(1)).as("n_groups"), sum(col("_n")).as("n_rows"),
        sum(when(col("_d") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("_d") > 1, col("_n")).otherwise(0L))
          .as("rows_in_violating"),
        max(col("_d")).as("max_fanout"))
      .select(lit(name).as("fd"), col("n_groups"), col("n_rows"),
        col("n_violating"), col("rows_in_violating"), col("max_fanout"),
        expr("CAST(n_violating * 10000 div n_groups AS BIGINT)")
          .as("violation_bp"))
  }
}
