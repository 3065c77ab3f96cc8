package graft.functions

import scala.util.matching.Regex

/** Promotion-mechanism parsing (SURVEY.md §2.5 T9–T11).
  *
  * The reference parses Dutch promo text ("2 voor 3.00", "1+1 gratis",
  * "25% korting", …) with an ordered, first-match-wins pattern registry
  * (`projects/processor/src/config/promotions.ts:16-164`), per-pattern
  * enrichment (`promotions.ts:194-303`), and a segment splitter for
  * multi-promos (`src/utils/calculate-fields.ts:128-227`). Pattern ORDER is
  * semantic: e.g. "-25%" must hit percentage_discount before fixed_discount.
  *
  * Kept as data (a Seq of pattern cases) + pure functions, so it is
  * unit-testable and wraps into a single Spark UDF returning a struct.
  */
object Promotions {

  final case class PromotionResult(
      promoType: String,
      originalValue: String,
      effectiveUnitPrice: Double,
      effectiveDiscount: Double,
      requiredQuantity: Option[Double] = None,
      totalPromotionPrice: Option[Double] = None,
      paidQuantity: Option[Double] = None,
      isMultiPurchaseRequired: Option[Boolean] = None,
      thresholdItems: Option[Double] = None,
      thresholdAmount: Option[Double] = None,
      subPromotions: Seq[PromotionResult] = Nil)

  private def num(s: String): Double = s.replace(',', '.').toDouble

  /** One registry entry: id, standardized type, regex, and the detail
    * extractor (merges extractEffectivePrice + extractPromotionDetails). */
  final case class Pattern(id: String, promoType: String, regex: Regex)

  // Ordered registry — promotions.ts:16-164. Regexes are the reference's,
  // case-insensitive; Scala's `findFirstMatchIn` ≡ JS `String.match` here.
  val patterns: Seq[Pattern] = Seq(
    Pattern("fixed_price", "FIXED_PRICE", "(?i)Fixed price [€]?(\\d+[.,]?\\d*)".r),
    Pattern("x_for_y", "X_FOR_Y", "(?i)(\\d+)\\s*voor\\s*[€]?(\\d+[.,]?\\d*)".r),
    Pattern("x_plus_y_free", "X_PLUS_Y_FREE", "(?i)(\\d+)\\s*\\+\\s*(\\d+)\\s*gratis".r),
    Pattern("percentage_discount", "PERCENTAGE_DISCOUNT", "(?i)(\\d+)\\s*%\\s*korting|-\\s*(\\d+)%".r),
    Pattern("second_half_price", "SECOND_HALF_PRICE", "(?i)2e\\s+halve\\s+prijs".r),
    Pattern("second_free", "SECOND_FREE", "(?i)2e\\s+gratis".r),
    Pattern("fixed_discount", "FIXED_DISCOUNT", "(?i)-\\s*[€]?(\\d+[.,]?\\d*)".r),
    Pattern("pack_discount", "PACK_DISCOUNT", "(?i)(\\d+)%\\s*pakketkorting".r),
    Pattern("volume_discount", "VOLUME_DISCOUNT", "(?i)(\\d+)%\\s*volume\\s*voordeel".r),
    Pattern("conditional_buy", "CONDITIONAL_BUY", "(?i)bij\\s+elke\\s+(\\d+)\\s+stuks".r),
    Pattern("conditional_spend", "CONDITIONAL_SPEND", "(?i)vanaf\\s*[€]?(\\d+[.,]?\\d*)".r),
    Pattern("delivery_promo", "DELIVERY_PROMO", "(?i)gratis\\s+bezorging|bezorgkorting".r),
    Pattern("kies_mix", "KIES_MIX", "(?i)kies\\s*&?\\s*mix".r))

  /** Effective unit price per pattern — promotions.ts extractEffectivePrice. */
  private def effectivePrice(id: String, m: Regex.Match, originalPrice: Double): Double = id match {
    case "fixed_price" =>
      val p = num(m.group(1)); if (p > 0) p else originalPrice
    case "x_for_y" =>
      val qty = m.group(1).toInt
      if (qty > 0) num(m.group(2)) / qty else originalPrice
    case "x_plus_y_free" =>
      val buy = m.group(1).toInt; val free = m.group(2).toInt
      if (buy > 0 && free > 0) originalPrice * buy / (buy + free) else originalPrice
    case "percentage_discount" =>
      val pctStr = Option(m.group(1)).getOrElse(m.group(2))
      val pct = pctStr.toInt
      if (pct > 0 && pct <= 100) originalPrice * (1 - pct / 100.0) else originalPrice
    case "second_half_price" => originalPrice * 0.75
    case "second_free" => originalPrice * 0.5
    case "fixed_discount" => math.max(0, originalPrice - num(m.group(1)))
    case "pack_discount" | "volume_discount" =>
      val pct = m.group(1).toInt
      if (pct > 0 && pct < 100) originalPrice * (1 - pct / 100.0) else originalPrice
    case _ => originalPrice // conditional_buy/spend, delivery, kies_mix
  }

  /** Full per-pattern details — promotions.ts:194-303. */
  def extractDetails(p: Pattern, m: Regex.Match, originalPrice: Double): PromotionResult = {
    val eup = effectivePrice(p.id, m, originalPrice)
    val base = PromotionResult(p.promoType, m.source.toString, eup, math.max(0, originalPrice - eup))
    p.id match {
      case "fixed_price" =>
        val fixed = num(m.group(1))
        base.copy(effectiveUnitPrice = fixed,
          effectiveDiscount = math.max(0, originalPrice - fixed),
          isMultiPurchaseRequired = Some(false))
      case "x_for_y" =>
        base.copy(requiredQuantity = Some(m.group(1).toInt),
          totalPromotionPrice = Some(num(m.group(2))),
          isMultiPurchaseRequired = Some(true))
      case "x_plus_y_free" =>
        val buy = m.group(1).toInt; val free = m.group(2).toInt
        base.copy(requiredQuantity = Some(buy + free), paidQuantity = Some(buy),
          totalPromotionPrice = Some(originalPrice * buy),
          isMultiPurchaseRequired = Some(true))
      case "second_half_price" =>
        base.copy(requiredQuantity = Some(2), paidQuantity = Some(1.5),
          totalPromotionPrice = Some(originalPrice * 1.5),
          isMultiPurchaseRequired = Some(true))
      case "second_free" =>
        base.copy(requiredQuantity = Some(2), paidQuantity = Some(1),
          totalPromotionPrice = Some(originalPrice),
          isMultiPurchaseRequired = Some(true))
      case "conditional_buy" =>
        base.copy(thresholdItems = Some(m.group(1).toInt),
          isMultiPurchaseRequired = Some(true))
      case "conditional_spend" =>
        base.copy(thresholdAmount = Some(num(m.group(1))),
          isMultiPurchaseRequired = Some(false))
      case _ => base
    }
  }

  // precompiled: String.replaceAll / String.split compile a fresh Pattern
  // per call — per-row overhead in the adapter hot path
  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val segRe = java.util.regex.Pattern.compile("[;,]")

  /** T9 (calculate-fields.ts:128-227): normalize case/whitespace, split
    * multi-promos on `[;,]`, per segment first regex wins; 1 segment → that
    * result (UNKNOWN keeps currentPrice); >1 → MULTI_PROMO wrapper. */
  def parsePromotionMechanism(
      mechanism: String,
      originalPrice: Double,
      currentPrice: Double): PromotionResult = {
    val fallback = PromotionResult("UNKNOWN", Option(mechanism).getOrElse(""),
      currentPrice, Units.roundN(originalPrice - currentPrice, 2))
    if (mechanism == null || mechanism.isEmpty) return fallback

    val normalized = wsRe.matcher(mechanism.toLowerCase).replaceAll(" ").trim
    val segments = segRe.split(normalized, -1)

    val subs = segments.map { seg =>
      val segText = seg.trim
      val segDefault = fallback.copy(originalValue = segText)
      if (segText.isEmpty) segDefault
      else patterns.iterator
        .flatMap(p => p.regex.findFirstMatchIn(segText).map(p -> _))
        .nextOption() match {
          case Some((p, m)) =>
            val d = extractDetails(p, m, originalPrice)
            d.copy(originalValue = segText,
              effectiveUnitPrice = Units.roundN(d.effectiveUnitPrice, 2),
              effectiveDiscount = Units.roundN(d.effectiveDiscount, 2),
              totalPromotionPrice = d.totalPromotionPrice.map(Units.roundN(_, 2)))
          case None => segDefault
        }
    }.toSeq

    if (subs.length == 1)
      fallback.copy(
        promoType = subs.head.promoType,
        originalValue = subs.head.originalValue,
        effectiveUnitPrice = subs.head.effectiveUnitPrice,
        effectiveDiscount = subs.head.effectiveDiscount,
        requiredQuantity = subs.head.requiredQuantity,
        totalPromotionPrice = subs.head.totalPromotionPrice,
        paidQuantity = subs.head.paidQuantity,
        isMultiPurchaseRequired = subs.head.isMultiPurchaseRequired,
        thresholdItems = subs.head.thresholdItems,
        thresholdAmount = subs.head.thresholdAmount)
    else fallback.copy(promoType = "MULTI_PROMO", subPromotions = subs)
  }
}
