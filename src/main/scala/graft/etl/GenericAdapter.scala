package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T7/J5 — the generic raw→unified fallback mapper
  * (`adapters/database-processor-adapter.ts:485-585`): schemaless raw JSONB
  * rows mapped into the 32-field contract by coalescing over candidate
  * field names (`title|name`, `price_before_bonus|originalPrice`, …), plus
  * the per-shop external-id extraction cascade.
  *
  * Input: a raw table shaped like `raw.products` — (id, shop_type,
  * raw_data: json string). All `get_json_object` paths over one parsed
  * column — a single codegen'd projection, no UDFs.
  */
object GenericAdapter {

  private def j(path: String): Column = get_json_object(col("raw_data"), "$." + path)

  /** JS `a || b` over extracted JSON strings (null or '' falls through). */
  private def js(paths: String*): Column =
    coalesce(paths.map(p => nullif(j(p), lit(""))): _*)

  private def num(c: Column): Column =
    nullif(regexp_extract(regexp_replace(coalesce(c, lit("")), "[^0-9.-]", ""),
      "^-?[0-9]*\\.?[0-9]+", 0), lit("")).cast("double")

  /** Map a schemaless raw frame to the unified contract. `runId` replaces
    * the reference's `Date.now()` suffix so ids are deterministic per run. */
  def unified(raw: DataFrame, shopType: String, runId: String): DataFrame = {
    val mapped = raw.select(
      concat_ws("_", lit(shopType), col("id"), lit(runId)).as("unified_id"),
      lit(shopType).as("shop_type"),
      coalesce(js("title", "name"), lit("Unknown Product")).as("title"),
      j("category").as("main_category"),
      coalesce(js("brand"), lit("Unknown")).as("brand"),
      coalesce(js("image_url", "imageUrl"), lit("")).as("image_url"),
      coalesce(js("sales_unit_size", "unitSize"), lit("")).as("sales_unit_size"),
      coalesce(nullif(num(js("quantity_amount", "quantity")), lit(0.0)), lit(1.0))
        .as("quantity_amount"),
      coalesce(js("quantity_unit", "unit"), lit("piece")).as("quantity_unit"),
      num(j("default_quantity_amount")).as("default_quantity_amount"),
      j("default_quantity_unit").as("default_quantity_unit"),
      coalesce(num(js("price_before_bonus", "originalPrice")), lit(0.0))
        .as("price_before_bonus"),
      coalesce(num(js("current_price", "price")), lit(0.0)).as("current_price"),
      num(j("unit_price")).as("unit_price"),
      j("unit_price_unit").as("unit_price_unit"),
      // JS Boolean(a || b || c): json false/0/'' are falsy, any other value truthy
      coalesce(Seq("is_promotion", "promotion", "discount").map { p =>
        when(j(p).isNull || j(p) === "" || j(p) === "false" || j(p) === "0",
          lit(null)).otherwise(lit(true))
      }: _*).as("is_promotion"),
      coalesce(js("promotion_type", "promotionType"), lit("none")).as("promotion_type"),
      coalesce(js("promotion_mechanism", "promotionMechanism"), lit("none"))
        .as("promotion_mechanism"),
      to_date(j("promotion_start_date")).cast("string").as("promotion_start_date"),
      to_date(j("promotion_end_date")).cast("string").as("promotion_end_date"),
      num(j("parsed_promotion_effective_unit_price"))
        .as("parsed_promotion_effective_unit_price"),
      num(j("parsed_promotion_required_quantity"))
        .as("parsed_promotion_required_quantity"),
      num(j("parsed_promotion_total_price")).as("parsed_promotion_total_price"),
      j("parsed_promotion_is_multi_purchase_required").cast("boolean")
        .as("parsed_promotion_is_multi_purchase_required"),
      num(j("normalized_quantity_amount")).as("normalized_quantity_amount"),
      j("normalized_quantity_unit").as("normalized_quantity_unit"),
      num(j("conversion_factor")).as("conversion_factor"),
      num(j("price_per_standard_unit")).as("price_per_standard_unit"),
      num(j("current_price_per_standard_unit")).as("current_price_per_standard_unit"),
      num(j("discount_absolute")).as("discount_absolute"),
      num(j("discount_percentage")).as("discount_percentage"),
      // is_active: true unless explicitly false
      (!(j("is_active") === "false")).as("is_active"))
    Shops.finalizeTemplate(mapped)
  }

  /** J5 — per-shop external-id candidate cascade
    * (database-processor-adapter.ts:543-585). */
  def externalId(shopType: String): Column = {
    val cands: Seq[Column] = shopType.toLowerCase match {
      case "ah" => Seq(j("id"), j("productId"), j("product.id"))
      case "jumbo" | "kruidvat" => Seq(j("id"), j("productId"), j("sku"))
      case "aldi" => Seq(j("id"), j("articleNumber"), j("productId"))
      case "plus" => Seq(j("id"), j("productId"), j("productNumber"))
      case _ => Seq(j("id"), j("productId"), j("sku"))
    }
    coalesce(cands.map(c => nullif(c, lit(""))) :+ col("unified_id"): _*)
  }
}
