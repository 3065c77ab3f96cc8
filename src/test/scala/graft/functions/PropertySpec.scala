package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 gap list): the promo parser is total on
  * arbitrary strings; unit standardization and price-per-unit respect their
  * documented invariants for all inputs. Raw ScalaCheck (no scalatestplus
  * bridge in the offline cache): each test checks a Prop over 200 cases. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g) { a => f(a); true })

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(ga, gb) { (a, b) => f(a, b); true })

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc) { (a, b, c) => f(a, b, c); true })

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("2", "voor", "€", "3.00", "+", "1", "gratis", "%",
      "korting", "2e", "halve", "prijs", ";", ",", "-", "vanaf", "stuks",
      "bij", "elke", "kies", "mix", "per", "kg")).map(_.mkString(" ")))

  test("parsePromotionMechanism is total and bounded on arbitrary input") {
    forAll(anyText, Gen.choose(0.01, 500.0), Gen.choose(0.01, 500.0)) {
      (mech, orig, cur) =>
        val r = Promotions.parsePromotionMechanism(mech, orig, cur)
        assert(r.promoType.nonEmpty)
        assert(!r.effectiveUnitPrice.isNaN)
        // effective price can exceed orig only via UNKNOWN keep-current;
        // +0.005 slack: the parser rounds to 2dp half-up (toFixed semantics)
        if (r.promoType != "UNKNOWN" && r.promoType != "MULTI_PROMO")
          assert(r.effectiveUnitPrice <= math.max(orig, cur) + 0.005)
        assert(r.effectiveDiscount >= 0 ||
          r.promoType == "UNKNOWN" || r.promoType == "MULTI_PROMO")
    }
  }

  test("promo segment count: MULTI_PROMO iff mechanism splits into >1 segment") {
    forAll(anyText) { mech =>
      val r = Promotions.parsePromotionMechanism(mech, 2.0, 2.0)
      val nSegs = mech.toLowerCase.replaceAll("\\s+", " ").trim.split("[;,]", -1).length
      if (mech.nonEmpty && nSegs > 1) assert(r.promoType == "MULTI_PROMO")
      else assert(r.promoType != "MULTI_PROMO")
    }
  }

  test("standardizeQuantity: conversion factor always positive, unit standard") {
    forAll(Gen.double, Gen.asciiPrintableStr) { (amount, unit) =>
      val r = Units.standardizeQuantity(amount, unit)
      assert(r.conversionFactor > 0)
      assert(Seq("kg", "l", "m", "m2", "stuk").contains(r.unit))
      assert(r.amount == r.conversionFactor ||
        (r.unit == "stuk" && r.amount >= 1))
    }
  }

  test("standardizeQuantity scaling: doubling a weight doubles the factor (above floor)") {
    forAll(Gen.choose(2.0, 100000.0)) { grams =>
      val one = Units.standardizeQuantity(grams, "g")
      val two = Units.standardizeQuantity(grams * 2, "g")
      assert(math.abs(two.conversionFactor - 2 * one.conversionFactor) < 1e-9)
    }
  }

  test("pricePerUnit: bounded to [0, 10000], zero iff invalid price") {
    forAll(Gen.double, Gen.double) { (price, cf) =>
      val r = Units.pricePerUnit(price, cf)
      assert(r >= 0 && r <= 10000)
      if (price.isNaN || price.isInfinite || price <= 0) assert(r == 0)
    }
  }

  test("discountMetrics: amount/percentage consistent and bounded") {
    forAll(Gen.choose(0.01, 10000.0), Gen.choose(0.01, 10000.0)) { (orig, cur) =>
      val r = Units.discountMetrics(orig, cur)
      assert(r.amount >= 0 && r.percentage >= 0 && r.percentage <= 100)
      if (cur >= orig) assert(r.amount == 0 && r.percentage == 0)
    }
  }

  test("normalizeUnit is total and idempotent on its outputs") {
    forAll(Gen.asciiPrintableStr) { u =>
      val once = Units.normalizeUnit(u)
      assert(once.nonEmpty)
      // normalizing a standard output again never escapes the standard space
      val twice = Units.normalizeUnit(once)
      assert(Units.normalizeUnit(twice) == twice)
    }
  }

  test("category cascade is total and lands in the 26 final categories") {
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (title, cat) =>
      val r = Categories.normalizeCategory(title, cat, "AH")
      assert(Categories.finalCategories.contains(r.category))
    }
  }

  test("simhash: 64 bits, deterministic, total") {
    forAll(Gen.asciiPrintableStr) { t =>
      val a = Text.simhashBits(t)
      assert(a.length == 64 && a.forall(c => c == '0' || c == '1'))
      assert(a == Text.simhashBits(t))
    }
  }

  test("TopKRowsAgg: any partition split merges to the sort-take model") {
    val pair = Gen.zip(Gen.choose(-50L, 50L), Gen.choose(0L, 20L))
    forAll(Gen.listOf(pair), Gen.listOf(pair), Gen.choose(1, 5)) {
      (xs, ys, k) =>
        val agg = TopKRowsAgg(k)
        val a = xs.foldLeft(agg.zero)(agg.reduce)
        val b = ys.foldLeft(agg.zero)(agg.reduce)
        val model = (xs ++ ys).sortBy { case (s, t) => (-s, t) }.take(k)
        assert(agg.merge(a, b) == model)
        assert(agg.merge(b, a) == model)
        assert(agg.merge(agg.merge(a, agg.zero), b) == model)
    }
  }
  // ---------------------------------------- BottomKRowsAgg (q521 family)

  // narrow key range forces hash-tie coverage; the tiebreak is made
  // UNIQUE per element below (zipWithIndex), matching the sketch's
  // contract — (hash, id) is unique because the id column is — without
  // which "the" bottom-k of equal (key, tiebreak) pairs with different
  // payloads is genuinely ambiguous
  private val triple: Gen[(Long, Long, Long)] = for {
    k <- Gen.choose(0L, 40L)
    p <- Gen.choose(-100L, 100L)
  } yield (k, 0L, p)

  test("BottomKRowsAgg: any partition split merges to the global bottom-k " +
      "(the re-aggregability the sketch merge path stands on)") {
    val agg = BottomKRowsAgg(5)
    forAll(Gen.listOf(triple), Gen.choose(0, 100)) { (xs0, cut0) =>
      val xs = xs0.zipWithIndex.map { case ((k, _, p), i) => (k, i.toLong, p) }
      val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val a = l.foldLeft(agg.zero)(agg.reduce)
      val b = r.foldLeft(agg.zero)(agg.reduce)
      val want = xs.sortBy(x => (x._1, x._2)).take(5)
      assert(agg.merge(a, b) == want)
      assert(agg.merge(b, a) == want)  // merge order never matters
    }
  }

  test("BottomKRowsAgg: buffer never exceeds k and is always sorted") {
    val agg = BottomKRowsAgg(3)
    forAll(Gen.listOf(triple)) { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(buf.length <= 3)
      assert(buf == buf.sortBy(x => (x._1, x._2)))
    }
  }
}
