package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins U1–U4 to the reference (config/units.ts, calculate-fields.ts:232-475):
  * alias mapping, multi-pack, category dispatch, 0.001 floors, the 10000 cap
  * and 2dp/1dp rounding. */
class UnitsSpec extends AnyFunSuite {
  import Units._

  test("normalizeUnit aliases") {
    assert(normalizeUnit("gram") == "g")
    assert(normalizeUnit("GRAM") == "g")
    assert(normalizeUnit("Kilos") == "kg")
    assert(normalizeUnit("liter") == "l")
    assert(normalizeUnit("ML") == "ml")
    assert(normalizeUnit("stuks") == "stuk")
    assert(normalizeUnit("wasbeurten") == "stuk")
    assert(normalizeUnit("rol") == "stuk")
    assert(normalizeUnit("meter") == "m")
    assert(normalizeUnit("m") == "m")
    assert(normalizeUnit("m²") == "m2")
  }

  test("normalizeUnit cleaning: per-prefix, punctuation, whitespace") {
    assert(normalizeUnit("per stuk") == "stuk")
    assert(normalizeUnit(" per  KG ") == "kg")
    assert(normalizeUnit("st.") == "stuk")
    assert(normalizeUnit("") == "stuk")
    assert(normalizeUnit(null) == "stuk")
  }

  test("normalizeUnit multi-pack takes the item unit") {
    assert(normalizeUnit("6 x 150g") == "g")
    assert(normalizeUnit("4x33cl") == "cl")
  }

  test("normalizeUnit pack sizes and partial matches") {
    assert(normalizeUnit("12-pack") == "stuk")
    assert(normalizeUnit("5-pack") == "stuk") // partial containment on 'pack'
    assert(normalizeUnit("onbekend") == "stuk") // default
  }

  test("standardizeQuantity weight → kg") {
    assert(standardizeQuantity(500, "gram") == StandardQuantity(0.5, "kg", 0.5))
    assert(standardizeQuantity(2, "kg") == StandardQuantity(2.0, "kg", 2.0))
    assert(standardizeQuantity(1, "mg") == StandardQuantity(0.001, "kg", 0.001)) // floor
  }

  test("standardizeQuantity volume → l") {
    assert(standardizeQuantity(250, "ml") == StandardQuantity(0.25, "l", 0.25))
    assert(standardizeQuantity(1.5, "liter") == StandardQuantity(1.5, "l", 1.5))
    assert(standardizeQuantity(33, "cl") == StandardQuantity(0.33, "l", 0.33))
  }

  test("standardizeQuantity pieces floor at 1") {
    assert(standardizeQuantity(3, "stuks") == StandardQuantity(3.0, "stuk", 3.0))
    assert(standardizeQuantity(0.5, "stuk") == StandardQuantity(1.0, "stuk", 1.0))
  }

  test("standardizeQuantity invalid inputs → 1 stuk") {
    assert(standardizeQuantity(0, "g") == StandardQuantity(1, "stuk", 1))
    assert(standardizeQuantity(-1, "g") == StandardQuantity(1, "stuk", 1))
    assert(standardizeQuantity(5, "") == StandardQuantity(1, "stuk", 1))
    assert(standardizeQuantity(5, null) == StandardQuantity(1, "stuk", 1))
  }

  test("pricePerUnit: the reference's own example, floors and cap") {
    assert(pricePerUnit(1.99, 0.25) == 7.96) // 250g at €1.99 → €7.96/kg
    assert(pricePerUnit(50, 0.001) == 10000) // capped
    assert(pricePerUnit(2.0, 0) == 2000.0)   // 0 cf → 0.001 floor
    assert(pricePerUnit(0, 0.5) == 0)
    assert(pricePerUnit(-1, 0.5) == 0)
  }

  test("discountMetrics rounding: 2dp amount, 1dp percentage") {
    assert(discountMetrics(2.0, 1.5) == DiscountMetrics(0.5, 25.0))
    assert(discountMetrics(2.99, 1.99) == DiscountMetrics(1.0, 33.4))
    assert(discountMetrics(2.0, 2.0) == DiscountMetrics(0, 0))
    assert(discountMetrics(1.5, 2.0) == DiscountMetrics(0, 0)) // inverted
    assert(discountMetrics(0, 1.0) == DiscountMetrics(0, 0))
  }

  test("unitCategory inference") {
    assert(unitCategory("g") == "weight")
    assert(unitCategory("l") == "volume")
    assert(unitCategory("m") == "length")
    assert(unitCategory("m2") == "area")
    assert(unitCategory("stuk") == "piece")
    // reference quirk: bare 'gallon' prefix-matches the weight regex ('g')
    // before volume inference; only the normalized 'gal' is volume
    assert(unitCategory("gallon") == "weight")
    assert(unitCategory("gal") == "volume")
    assert(unitCategory("xyz") == "piece")
  }
}
