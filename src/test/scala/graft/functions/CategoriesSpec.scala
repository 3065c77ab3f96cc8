package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the category cascade to the reference
  * (category/normalizer.ts:395-483), including the JS-Map overwrite where
  * 'kaas' ends up mapping to Zuivel (declared twice; last set wins). */
class CategoriesSpec extends AnyFunSuite {
  import Categories._

  private def norm(cat: String, title: String = "t", shop: String = "AH") =
    normalizeCategory(title, cat, shop)

  test("exact match, case-insensitive") {
    assert(norm("Bakkerij") == CategoryResult("Bakkerij", "direct"))
    assert(norm("bakkerij") == CategoryResult("Bakkerij", "direct"))
    assert(norm("ZUIVEL, EIEREN, BOTER") == CategoryResult("Zuivel, eieren, boter", "direct"))
  }

  test("normalized match incl. no-space variant") {
    assert(norm("zuivel-eieren-boter").category == "Zuivel, eieren, boter")
  }

  test("common pattern map") {
    assert(norm("brood") == CategoryResult("Bakkerij", "direct"))
    assert(norm("Zuivel, eieren") == CategoryResult("Zuivel, eieren, boter", "direct"))
    assert(norm("groente, aardappelen").category == "Aardappel, groente, fruit")
  }

  test("'kaas' maps to Zuivel — the reference's last-set-wins overwrite") {
    assert(norm("kaas").category == "Zuivel, eieren, boter")
  }

  test("partial containment") {
    assert(norm("verse groenten") == CategoryResult("Aardappel, groente, fruit", "partial"))
    assert(norm("pasta speciaal").category == "Pasta, rijst en wereldkeuken")
  }

  test("ALDI trots/aldi special case without ML → default") {
    // 'trots van aldi' itself is in the common map (direct), like the reference
    assert(normalizeCategory("melk", "trots van aldi", "ALDI") ==
      CategoryResult("Aardappel, groente, fruit", "direct"))
    val r = normalizeCategory("melk", "aldi trots producten", "ALDI")
    assert(r == CategoryResult("Aardappel, groente, fruit", "special_case"))
    // non-ALDI shop does NOT hit the special case; falls through to fuzzy
    val r2 = normalizeCategory("melk", "xyzaldixyz", "AH")
    assert(r2.method != "special_case")
  }

  test("ML prediction honored above fuzzy, mapped into final space") {
    val r = normalizeCategory("melk", "onbekende categorie 123", "JUMBO",
      Some(("Zuivel, eieren", 0.9)))
    assert(r == CategoryResult("Zuivel, eieren, boter", "ml"))
    // below threshold → fuzzy fallback
    val r2 = normalizeCategory("melk", "onbekende categorie 123", "JUMBO",
      Some(("Zuivel, eieren", 0.5)))
    assert(r2.method == "fuzzy")
  }

  test("fuzzy fallback argmax over the 26 categories") {
    assert(norm("Bakkerei").category == "Bakkerij")
    assert(norm("Diepvriez").category == "Diepvries")
  }

  test("empty category → ML or AGF default") {
    assert(norm("") == CategoryResult("Aardappel, groente, fruit", "default"))
    assert(norm(null) == CategoryResult("Aardappel, groente, fruit", "default"))
    val ml = normalizeCategory("melk", "", "AH", Some(("Zuivel, eieren, boter", 0.8)))
    assert(ml == CategoryResult("Zuivel, eieren, boter", "ml"))
  }

  test("normalizeString: punctuation + Dutch stop words") {
    assert(normalizeString("Aardappel, groente, fruit") == "aardappel groente fruit")
    assert(normalizeString("Bier en aperitieven") == "bier aperitieven")
    assert(normalizeString("Koken, tafelen, vrije tijd") == "koken tafelen vrije tijd")
  }

  test("levenshtein ground truth") {
    assert(levenshtein("kitten", "sitting") == 3)
    assert(levenshtein("", "abc") == 3)
    assert(levenshtein("abc", "abc") == 0)
  }
}
