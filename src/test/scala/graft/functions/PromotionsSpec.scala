package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the promo-parser contract to the reference's semantics
  * (config/promotions.ts + calculate-fields.ts:128-227), including pattern
  * ORDER (e.g. "-25%" is a percentage, not a fixed discount). */
class PromotionsSpec extends AnyFunSuite {
  import Promotions._

  private def parse(m: String, orig: Double = 2.0, cur: Double = 2.0) =
    parsePromotionMechanism(m, orig, cur)

  test("x_for_y: '2 voor €3.00'") {
    val r = parse("2 voor €3.00")
    assert(r.promoType == "X_FOR_Y")
    assert(r.effectiveUnitPrice == 1.5)
    assert(r.requiredQuantity.contains(2.0))
    assert(r.totalPromotionPrice.contains(3.0))
    assert(r.isMultiPurchaseRequired.contains(true))
  }

  test("x_for_y with comma decimal: '2 voor 3,50'") {
    // the segment splitter cuts on ',' first — reference behavior: the
    // segment '2 voor 3' parses as X_FOR_Y total 3, plus a '50' segment
    val r = parse("2 voor 3,50")
    assert(r.promoType == "MULTI_PROMO")
    assert(r.subPromotions.head.promoType == "X_FOR_Y")
    assert(r.subPromotions.head.effectiveUnitPrice == 1.5)
  }

  test("x_plus_y_free: '1+1 gratis'") {
    val r = parse("1+1 gratis")
    assert(r.promoType == "X_PLUS_Y_FREE")
    assert(r.effectiveUnitPrice == 1.0)
    assert(r.requiredQuantity.contains(2.0))
    assert(r.paidQuantity.contains(1.0))
    assert(r.totalPromotionPrice.contains(2.0))
  }

  test("percentage: '25% korting' and '-25%' both hit the percentage pattern") {
    assert(parse("25% korting", 4.0, 4.0).effectiveUnitPrice == 3.0)
    val neg = parse("-25%", 4.0, 4.0)
    assert(neg.promoType == "PERCENTAGE_DISCOUNT")
    assert(neg.effectiveUnitPrice == 3.0)
  }

  test("second half price / second free") {
    val h = parse("2e halve prijs")
    assert(h.promoType == "SECOND_HALF_PRICE")
    assert(h.effectiveUnitPrice == 1.5)
    assert(h.requiredQuantity.contains(2.0))
    assert(h.paidQuantity.contains(1.5))
    assert(h.totalPromotionPrice.contains(3.0))
    val f = parse("2e gratis")
    assert(f.promoType == "SECOND_FREE")
    assert(f.effectiveUnitPrice == 1.0)
    assert(f.totalPromotionPrice.contains(2.0))
  }

  test("fixed discount: '-€0.50'") {
    val r = parse("-€0.50", 2.0, 2.0)
    assert(r.promoType == "FIXED_DISCOUNT")
    assert(r.effectiveUnitPrice == 1.5)
  }

  test("fixed price: 'Fixed price €0.99'") {
    val r = parse("Fixed price €0.99", 2.0, 2.0)
    assert(r.promoType == "FIXED_PRICE")
    assert(r.effectiveUnitPrice == 0.99)
    assert(r.isMultiPurchaseRequired.contains(false))
  }

  test("pack/volume discounts don't collide with the percentage pattern") {
    val p = parse("5% pakketkorting", 4.0, 4.0)
    assert(p.promoType == "PACK_DISCOUNT")
    assert(p.effectiveUnitPrice == 3.8)
    val v = parse("10% volume voordeel", 4.0, 4.0)
    assert(v.promoType == "VOLUME_DISCOUNT")
    assert(v.effectiveUnitPrice == 3.6)
  }

  test("conditional promotions keep the price") {
    val b = parse("bij elke 3 stuks", 2.0, 2.0)
    assert(b.promoType == "CONDITIONAL_BUY")
    assert(b.effectiveUnitPrice == 2.0)
    assert(b.thresholdItems.contains(3.0))
    assert(b.isMultiPurchaseRequired.contains(true))
    val s = parse("vanaf €10", 2.0, 2.0)
    assert(s.promoType == "CONDITIONAL_SPEND")
    assert(s.thresholdAmount.contains(10.0))
    assert(s.isMultiPurchaseRequired.contains(false))
  }

  test("delivery + kies&mix") {
    assert(parse("gratis bezorging").promoType == "DELIVERY_PROMO")
    assert(parse("Kies & Mix").promoType == "KIES_MIX")
    assert(parse("kies mix").promoType == "KIES_MIX")
  }

  test("unknown keeps current price, rounds the fallback discount") {
    val r = parse("mega deal", 2.99, 1.99)
    assert(r.promoType == "UNKNOWN")
    assert(r.effectiveUnitPrice == 1.99)
    assert(r.effectiveDiscount == 1.0)
  }

  test("multi promo on ';'") {
    val r = parse("2 voor 3.00; 3 voor 4.50", 2.0, 1.8)
    assert(r.promoType == "MULTI_PROMO")
    assert(r.effectiveUnitPrice == 1.8) // fallback pricing on top level
    assert(r.subPromotions.map(_.promoType) == Seq("X_FOR_Y", "X_FOR_Y"))
    assert(r.subPromotions(1).effectiveUnitPrice == 1.5)
  }

  test("empty/null mechanism → UNKNOWN fallback") {
    assert(parse("", 2.0, 1.5).promoType == "UNKNOWN")
    assert(parsePromotionMechanism(null, 2.0, 1.5).effectiveUnitPrice == 1.5)
  }

  test("case/whitespace normalization") {
    val r = parse("  2   VOOR   4.00 ")
    assert(r.promoType == "X_FOR_Y")
    assert(r.effectiveUnitPrice == 2.0)
  }
}
