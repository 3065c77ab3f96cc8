package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Pipeline, Shops}

/** The SURVEY.md §7.2 vertical slice — "per category, cheapest price per
  * standard unit across shops" — run end to end through the real engine:
  * schema-on-read shop JSON → skip rules → transforms (promo parse, unit
  * standardization, category cascade) → calculateFields → quality → dedup →
  * cross-shop union → aggregate. Exercises every stage of the pipeline in
  * one DAG; the driver smoke-checks rows > 0.
  */
object Flagship {

  /** Minimal but branch-covering raw fixtures (one per shop, plus promo and
    * skip cases). Inline so the flagship needs nothing but a SparkSession. */
  private val ahRows = Seq(
    """{"webshopId":1,"title":"AH Halfvolle melk","salesUnitSize":"1 l","mainCategory":"Zuivel, eieren","brand":"AH","priceBeforeBonus":1.19,"currentPrice":1.19,"orderAvailabilityStatus":"IN_ASSORTMENT","images":[{"url":"m.jpg","width":700}]}""",
    """{"webshopId":2,"title":"AH Appels","salesUnitSize":"1 kg","mainCategory":"Groente, aardappelen","priceBeforeBonus":2.5,"currentPrice":2.5,"isBonus":true,"bonusMechanism":"2 voor 4.00","orderAvailabilityStatus":"IN_ASSORTMENT","discountLabels":[{"code":"DISCOUNT_X_FOR_Y","count":2,"price":4.0}]}""",
    """{"webshopId":3,"title":"Bundel","isVirtualBundle":true,"priceBeforeBonus":9.99,"orderAvailabilityStatus":"IN_ASSORTMENT"}""")

  private val jumboRows = Seq(
    """{"product":{"id":"j1","title":"Jumbo Melk","category":"zuivel","subtitle":"1 l","prices":{"price":109},"inAssortment":true}}""",
    """{"product":{"id":"j2","title":"Jumbo Kipfilet","category":"vlees","subtitle":"500 g","prices":{"price":549},"promotions":[{"tags":[{"text":"25% korting"}]}],"inAssortment":true}}""")

  private val aldiRows = Seq(
    """{"articleNumber":"a1","title":"Chocolade","price":"1.49","oldPrice":"1.99","mainCategory":"snoep","salesUnit":"200 g"}""",
    """{"articleNumber":"a2","title":"Appelsap","price":"0.99","mainCategory":"frisdrank","salesUnit":"1 l"}""")

  private val plusRows = Seq(
    """{"PLP_Str":{"SKU":"p1","Name":"Plus Yoghurt","OriginalPrice":"1.79","Product_Subtitle":"Per 1000 ml","IsAvailable":true,"Categories":{"List":[{"Name":"zuivel"}]}}}""",
    """{"PLP_Str":{"SKU":"p2","Name":"Plus Gehakt","OriginalPrice":"4.50","NewPrice":"3.99","Product_Subtitle":"Per 500 g","PromotionLabel":"Fixed price €3.99","PromotionStartDate":"2026-08-01","PromotionEndDate":"2026-08-31","IsAvailable":true,"Categories":{"List":[{"Name":"vlees"}]}}}""")

  private def readFixture(spark: SparkSession, adapter: Shops.ShopAdapter,
      rows: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(adapter.schema).json(spark.createDataset(rows))
  }

  /** Cheapest current price per standard unit, per category and unit. */
  def cheapestPerCategory(spark: SparkSession): DataFrame = {
    val unified = Pipeline.processAll(spark, Map(
      "AH" -> readFixture(spark, Shops.Ah, ahRows),
      "JUMBO" -> readFixture(spark, Shops.Jumbo, jumboRows),
      "ALDI" -> readFixture(spark, Shops.Aldi, aldiRows),
      "PLUS" -> readFixture(spark, Shops.Plus, plusRows)))
    unified
      .filter(col("current_price_per_standard_unit") > 0)
      .groupBy(col("main_category"), col("normalized_quantity_unit"))
      .agg(
        min(col("current_price_per_standard_unit")).as("cheapest_per_unit"),
        count(lit(1)).as("n_products"),
        min_by(col("shop_type"), col("current_price_per_standard_unit")).as("cheapest_shop"))
      .orderBy(col("main_category"), col("normalized_quantity_unit"))
  }
}
