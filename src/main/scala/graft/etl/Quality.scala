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
}
