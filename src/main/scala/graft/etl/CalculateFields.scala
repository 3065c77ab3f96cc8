package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5 — the shared derive stage (`src/utils/calculate-fields.ts:20-123`),
  * applied after every shop transform. Sequential semantics:
  *
  *  1. promo parse — AH bypasses text parsing (STRUCTURED_DISCOUNT,
  *     calculate-fields.ts:30-48): effective price = current_price; all
  *     other shops run the pattern registry; missing detail fields default
  *     to required=1 / total=current_price / multi=false.
  *  2. standardize quantity → normalized_* + conversion_factor.
  *  3. price per standard unit (promo effective price feeds the current
  *     variant when truthy).
  *  4. discount metrics for promo rows.
  *
  * Pure per-row column work — one projection, no shuffle.
  */
object CalculateFields {

  def apply(df: DataFrame): DataFrame = {
    val isPromo = col("is_promotion")

    val out = df
      .withColumn("_pp",
        when(isPromo && col("shop_type") =!= "AH",
          Udfs.parsePromo(col("promotion_mechanism"),
            col("price_before_bonus"), col("current_price"))))
      .withColumn("_eff",
        when(isPromo && col("shop_type") === "AH", col("current_price"))
          .when(isPromo, col("_pp")("effective_unit_price")))
      .withColumn("parsed_promotion_effective_unit_price",
        when(isPromo, col("_eff"))
          .otherwise(col("parsed_promotion_effective_unit_price")))
      .withColumn("parsed_promotion_required_quantity",
        when(isPromo && col("shop_type") === "AH", lit(1.0))
          .when(isPromo, coalesce(col("_pp")("required_quantity"), lit(1.0)))
          .otherwise(col("parsed_promotion_required_quantity")))
      .withColumn("parsed_promotion_total_price",
        when(isPromo && col("shop_type") === "AH", col("current_price"))
          .when(isPromo, coalesce(col("_pp")("total_promotion_price"), col("current_price")))
          .otherwise(col("parsed_promotion_total_price")))
      .withColumn("parsed_promotion_is_multi_purchase_required",
        when(isPromo && col("shop_type") === "AH", lit(false))
          .when(isPromo, coalesce(col("_pp")("is_multi_purchase_required"), lit(false)))
          .otherwise(col("parsed_promotion_is_multi_purchase_required")))
      .withColumn("_std",
        Udfs.standardizeQuantity(col("quantity_amount"), col("quantity_unit")))
      .withColumn("normalized_quantity_amount", col("_std")("amount"))
      .withColumn("normalized_quantity_unit", col("_std")("unit"))
      .withColumn("conversion_factor", col("_std")("conversion_factor"))
      .withColumn("price_per_standard_unit",
        Udfs.pricePerUnit(col("price_before_bonus"), col("conversion_factor")))
      .withColumn("current_price_per_standard_unit",
        Udfs.pricePerUnit(
          // JS truthiness: 0/undefined effective price falls back to current
          when(col("parsed_promotion_effective_unit_price").isNotNull &&
              col("parsed_promotion_effective_unit_price") =!= 0.0,
            col("parsed_promotion_effective_unit_price"))
            .otherwise(col("current_price")),
          col("conversion_factor")))
      .withColumn("_dm",
        when(isPromo, Udfs.discountMetrics(col("price_before_bonus"),
          when(col("parsed_promotion_effective_unit_price").isNotNull &&
              col("parsed_promotion_effective_unit_price") =!= 0.0,
            col("parsed_promotion_effective_unit_price"))
            .otherwise(col("current_price")))))
      .withColumn("discount_absolute",
        when(isPromo, col("_dm")("amount")).otherwise(col("discount_absolute")))
      .withColumn("discount_percentage",
        when(isPromo, col("_dm")("percentage")).otherwise(col("discount_percentage")))

    out.drop("_pp", "_eff", "_std", "_dm")
  }
}
