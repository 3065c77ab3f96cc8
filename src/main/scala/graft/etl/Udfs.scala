package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import graft.functions.{Categories, Promotions, Units}

/** Narrow UDF islands for the semantics that genuinely need imperative JVM
  * code (ordered regex registries, alias-map containment scans, first-match
  * label loops — SURVEY.md §7.3). Everything else in the adapters stays
  * column expressions inside whole-stage codegen; these UDFs take/return
  * only the few columns they need, so scan pruning and filter pushdown are
  * unaffected.
  */
object Udfs {

  /** Flat promo-parse result for the column surface. MULTI_PROMO rows carry
    * the fallback pricing on the top level exactly like the reference
    * (calculate-fields.ts:221-226); sub-promotions are re-parsed on demand. */
  final case class PromoOut(
      promo_type: String,
      effective_unit_price: Double,
      effective_discount: Double,
      required_quantity: Option[Double],
      total_promotion_price: Option[Double],
      paid_quantity: Option[Double],
      is_multi_purchase_required: Option[Boolean],
      threshold_items: Option[Double],
      threshold_amount: Option[Double])

  private def toOut(r: Promotions.PromotionResult): PromoOut =
    PromoOut(r.promoType, r.effectiveUnitPrice, r.effectiveDiscount,
      r.requiredQuantity, r.totalPromotionPrice, r.paidQuantity,
      r.isMultiPurchaseRequired, r.thresholdItems, r.thresholdAmount)

  val parsePromo =
    udf((mechanism: String, originalPrice: Double, currentPrice: Double) =>
      toOut(Promotions.parsePromotionMechanism(mechanism, originalPrice, currentPrice)))

  val normalizeUnit = udf((u: String) => Units.normalizeUnit(u))

  final case class StdQty(amount: Double, unit: String, conversion_factor: Double)
  val standardizeQuantity = udf((amount: Double, unit: String) => {
    val s = Units.standardizeQuantity(amount, unit)
    StdQty(s.amount, s.unit, s.conversionFactor)
  })

  val pricePerUnit = udf((price: Double, cf: Double) => Units.pricePerUnit(price, cf))

  final case class Discounts(amount: Double, percentage: Double)
  val discountMetrics = udf((orig: Double, cur: Double) => {
    val d = Units.discountMetrics(orig, cur)
    Discounts(d.amount, d.percentage)
  })

  final case class CategoryOut(category: String, method: String)

  /** The deterministic category cascade (no ML): matches the reference when
    * no predictions file is loaded. */
  val normalizeCategory =
    udf((title: String, category: String, shopType: String) => {
      val r = Categories.normalizeCategory(title, category, shopType, None)
      CategoryOut(r.category, r.method)
    })

  /** Cascade with an already-joined ML prediction (C6/J1: broadcast join the
    * predictions dim on title first, then pass its columns in). */
  val normalizeCategoryMl =
    udf((title: String, category: String, shopType: String,
         mlCategory: String, mlConfidence: java.lang.Double) => {
      val ml = Option(mlCategory)
        .zip(Option(mlConfidence).map(_.doubleValue)).headOption
      val r = Categories.normalizeCategory(title, category, shopType, ml)
      CategoryOut(r.category, r.method)
    })

  /** One AH discount label (model.RawSchemas.ah `discountLabels` element). */
  final case class AhLabel(
      code: String,
      count: Option[Long],
      freeCount: Option[Long],
      price: Option[Double],
      percentage: Option[Double],
      amount: Option[Double],
      unit: Option[String])

  final case class AhDiscountOut(
      effective_price: Option[Double],
      has_structured: Boolean,
      // first-label promo details (ah.ts:507-525)
      required_quantity: Option[Double],
      total_price: Option[Double],
      is_multi_purchase_required: Boolean)

  /** T8 — AH structured-discount evaluation (ah.ts:280-416): switch over
    * label.code, FIRST matching label wins (the loop breaks the moment a case
    * sets `hasStructuredDiscount`, even when — FIXED_PRICE with no price — it
    * produced no value). JS truthiness: 0-valued count/price/percentage/amount
    * do not match. */
  val ahStructuredDiscount =
    udf((labels: Seq[AhLabel], priceBeforeBonus: Double, currentPrice: java.lang.Double) => {
      val cur: Option[Double] = Option(currentPrice).map(_.doubleValue)
      var eff: Option[Double] = None
      var matched = false

      if (labels != null) {
        val it = labels.iterator
        while (it.hasNext && !matched) {
          val l = it.next()
          val pct = l.percentage.filter(_ != 0)
          val cnt = l.count.filter(_ != 0)
          val price = l.price.filter(_ != 0)
          // (effective price, hasStructuredDiscount) per ah.ts case arm
          val (e, m): (Option[Double], Boolean) = l.code match {
            case "DISCOUNT_FIXED_PRICE" => (l.price, true)
            case "DISCOUNT_PERCENTAGE" =>
              val r = pct.filter(_ => priceBeforeBonus > 0).map(p => priceBeforeBonus * (1 - p / 100))
              (r, r.isDefined)
            case "DISCOUNT_AMOUNT" =>
              val r = l.amount.filter(_ != 0).filter(_ => priceBeforeBonus > 0)
                .map(a => math.max(0, priceBeforeBonus - a))
              (r, r.isDefined)
            case "DISCOUNT_X_FOR_Y" =>
              val r = for (c <- cnt if c > 0; p <- price) yield p / c
              (r, r.isDefined)
            case "DISCOUNT_BUNDLE_BULK" | "DISCOUNT_BUNDLE_MIXED" =>
              val r = pct.flatMap { p =>
                val base = if (priceBeforeBonus > 0) priceBeforeBonus else cur.getOrElse(0.0)
                if (base > 0) Some(base * (1 - p / 100)) else None
              }
              (r, r.isDefined)
            case "DISCOUNT_X_PLUS_Y_FREE" =>
              val r = for (c <- cnt if c > 0; f <- l.freeCount.filter(_ > 0))
                yield priceBeforeBonus * c / (c + f)
              (r, r.isDefined)
            case "DISCOUNT_ONE_HALF_PRICE" =>
              val r = cnt.filter(_ >= 2).map(_ => priceBeforeBonus * 0.75)
              (r, r.isDefined)
            case "DISCOUNT_BUNDLE" | "DISCOUNT_BONUS" =>
              (Some(cur.filter(_ != 0).getOrElse(priceBeforeBonus)), true)
            case "DISCOUNT_OP_IS_OP" | "DISCOUNT_TIERED_PERCENT" =>
              val r = pct.filter(_ => priceBeforeBonus > 0).map(p => priceBeforeBonus * (1 - p / 100))
              (r, r.isDefined)
            case "DISCOUNT_WEIGHT" =>
              val r = for (c <- cnt if c > 0; p <- price) yield p
              (r, r.isDefined)
            case "DISCOUNT_TIERED_PRICE" =>
              val r = for (c <- cnt if c > 0; p <- price) yield p / c
              (r, r.isDefined)
            case "DISCOUNT_FALLBACK" =>
              (price, price.isDefined)
            case _ => (None, false)
          }
          eff = e
          matched = m
        }
      }

      // First-label parsed-promotion details (ah.ts:507-525)
      val first = Option(labels).flatMap(_.headOption)
      val reqQty = first.flatMap(_.count).filter(_ > 1).map(_.toDouble)
      val total = first.flatMap(l =>
        l.price.filter(_ != 0).filter(_ => l.count.exists(_ != 0)))
      AhDiscountOut(eff, matched, reqQty, total, reqQty.isDefined)
    })

}
