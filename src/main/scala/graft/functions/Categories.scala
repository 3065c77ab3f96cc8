package graft.functions

/** Category normalization cascade (SURVEY.md §2.8 C1–C7).
  *
  * Reference: `projects/processor/src/core/services/category/normalizer.ts`.
  * Precedence: exact (case-insensitive) final-category match → normalized
  * match (incl. no-space variant) → common-pattern map → partial containment
  * (both directions, insertion order) → ALDI `trots`/`aldi` special case →
  * ML lookup (broadcast dimension, joined outside this function) → fuzzy
  * Levenshtein argmax over the 26 final categories.
  *
  * The ML prediction step (C6) is a broadcast-join against an offline-built
  * lookup table, handled at the DataFrame level (see the pipeline); this
  * object implements the deterministic string cascade, exposed as one UDF
  * plus a `mapping_method` side output (C9).
  */
object Categories {

  /** The 26 fixed Dutch categories — normalizer.ts:8-35. */
  val finalCategories: Vector[String] = Vector(
    "Aardappel, groente, fruit",
    "Baby en kind",
    "Bakkerij",
    "Bewuste voeding",
    "Bier en aperitieven",
    "Chips, noten, toast, popcorn",
    "Diepvries",
    "Drogisterij",
    "Frisdrank, sappen, siropen, water",
    "Gezondheid, sport",
    "Huisdier",
    "Huishouden",
    "Kaas, vleeswaren, tapas",
    "Koffie, thee",
    "Koken, tafelen, vrije tijd",
    "Ontbijtgranen en beleg",
    "Pasta, rijst en wereldkeuken",
    "Salades, pizza, maaltijden",
    "Seizoensartikelen",
    "Snoep, chocolade, koek",
    "Soepen, sauzen, kruiden, olie",
    "Tussendoortjes",
    "Vegetarisch, vegan en plantaardig",
    "Vlees, vis",
    "Wijn en bubbels",
    "Zuivel, eieren, boter")

  val defaultCategory = "Aardappel, groente, fruit"

  private val stopWords =
    "\\b(de|het|een|en|met|van|voor|bij|tot|aan|in|op|over|uit)\\b"

  // precompiled once: String.replaceAll re-compiles its Pattern per call,
  // which at one normalizeCategory per row was pure per-row overhead
  private val punctRe = java.util.regex.Pattern.compile("[,\\-_/\\\\()&]")
  private val stopWordsRe = java.util.regex.Pattern.compile(stopWords)
  private val wsRe = java.util.regex.Pattern.compile("\\s+")

  /** normalizer.ts:96-103 — lowercase, punctuation→space, Dutch stop-word
    * removal, whitespace squeeze. */
  def normalizeString(s: String): String = {
    if (s == null) return ""
    val a = punctRe.matcher(s.toLowerCase.trim).replaceAll(" ")
    val b = stopWordsRe.matcher(a).replaceAll("")
    wsRe.matcher(b).replaceAll(" ").trim
  }

  private val exactMatchMap: Map[String, String] =
    finalCategories.map(c => c.toLowerCase -> c).toMap

  private val normalizedCategoryMap: Map[String, String] =
    finalCategories.flatMap { c =>
      val n = normalizeString(c)
      Seq(n -> c, n.replaceAll("\\s+", "") -> c)
    }.toMap

  /** ~140 alias patterns, insertion-ordered (normalizer.ts:105-381). Order
    * matters for the partial-containment scan (first match wins). */
  val commonPatterns: Vector[(String, String)] = Vector(
    "aardappelen groente fruit" -> "Aardappel, groente, fruit",
    "aardappels groente fruit" -> "Aardappel, groente, fruit",
    "groente fruit" -> "Aardappel, groente, fruit",
    "agf" -> "Aardappel, groente, fruit",
    "groenten" -> "Aardappel, groente, fruit",
    "fruit" -> "Aardappel, groente, fruit",
    "baby peuter" -> "Baby en kind",
    "babyvoeding" -> "Baby en kind",
    "kindervoeding" -> "Baby en kind",
    "brood" -> "Bakkerij",
    "broodjes" -> "Bakkerij",
    "gebak" -> "Bakkerij",
    "banket" -> "Bakkerij",
    "biologisch" -> "Bewuste voeding",
    "eco" -> "Bewuste voeding",
    "fairtrade" -> "Bewuste voeding",
    "glutenvrij" -> "Bewuste voeding",
    "lactosevrij" -> "Bewuste voeding",
    "suikervrij" -> "Bewuste voeding",
    "speciaalbier" -> "Bier en aperitieven",
    "pils" -> "Bier en aperitieven",
    "alcohol" -> "Bier en aperitieven",
    "aperitieven" -> "Bier en aperitieven",
    "chips" -> "Chips, noten, toast, popcorn",
    "noten" -> "Chips, noten, toast, popcorn",
    "pinda" -> "Chips, noten, toast, popcorn",
    "popcorn" -> "Chips, noten, toast, popcorn",
    "toast" -> "Chips, noten, toast, popcorn",
    "zoutjes" -> "Chips, noten, toast, popcorn",
    "bevroren" -> "Diepvries",
    "frozen" -> "Diepvries",
    "ijsjes" -> "Diepvries",
    "drogist" -> "Drogisterij",
    "drogisterij artikelen" -> "Drogisterij",
    "verzorging" -> "Drogisterij",
    "persoonlijke verzorging" -> "Drogisterij",
    "frisdrank" -> "Frisdrank, sappen, siropen, water",
    "dranken" -> "Frisdrank, sappen, siropen, water",
    "sap" -> "Frisdrank, sappen, siropen, water",
    "sappen" -> "Frisdrank, sappen, siropen, water",
    "siroop" -> "Frisdrank, sappen, siropen, water",
    "water" -> "Frisdrank, sappen, siropen, water",
    "limonade" -> "Frisdrank, sappen, siropen, water",
    "gezond" -> "Gezondheid, sport",
    "sport" -> "Gezondheid, sport",
    "vitamine" -> "Gezondheid, sport",
    "supplementen" -> "Gezondheid, sport",
    "dier" -> "Huisdier",
    "hond" -> "Huisdier",
    "kat" -> "Huisdier",
    "diervoeding" -> "Huisdier",
    "dierenvoer" -> "Huisdier",
    "schoonmaak" -> "Huishouden",
    "wasmiddel" -> "Huishouden",
    "afwasmiddel" -> "Huishouden",
    "schoonmaakmiddel" -> "Huishouden",
    "huishoudelijk" -> "Huishouden",
    "wassen" -> "Huishouden",
    "kaas" -> "Kaas, vleeswaren, tapas",
    "vleeswaren" -> "Kaas, vleeswaren, tapas",
    "worst" -> "Kaas, vleeswaren, tapas",
    "tapas" -> "Kaas, vleeswaren, tapas",
    "delicatessen" -> "Kaas, vleeswaren, tapas",
    "koffie" -> "Koffie, thee",
    "thee" -> "Koffie, thee",
    "koken" -> "Koken, tafelen, vrije tijd",
    "tafelen" -> "Koken, tafelen, vrije tijd",
    "vrije tijd" -> "Koken, tafelen, vrije tijd",
    "keuken" -> "Koken, tafelen, vrije tijd",
    "keukengerei" -> "Koken, tafelen, vrije tijd",
    "non food" -> "Koken, tafelen, vrije tijd",
    "ontbijt" -> "Ontbijtgranen en beleg",
    "beleg" -> "Ontbijtgranen en beleg",
    "granen" -> "Ontbijtgranen en beleg",
    "cornflakes" -> "Ontbijtgranen en beleg",
    "muesli" -> "Ontbijtgranen en beleg",
    "hagelslag" -> "Ontbijtgranen en beleg",
    "jam" -> "Ontbijtgranen en beleg",
    "pasta" -> "Pasta, rijst en wereldkeuken",
    "rijst" -> "Pasta, rijst en wereldkeuken",
    "wereldkeuken" -> "Pasta, rijst en wereldkeuken",
    "aziatisch" -> "Pasta, rijst en wereldkeuken",
    "mexicaans" -> "Pasta, rijst en wereldkeuken",
    "italiaans" -> "Pasta, rijst en wereldkeuken",
    "salades" -> "Salades, pizza, maaltijden",
    "pizza" -> "Salades, pizza, maaltijden",
    "maaltijd" -> "Salades, pizza, maaltijden",
    "kant klaar" -> "Salades, pizza, maaltijden",
    "koelvers" -> "Salades, pizza, maaltijden",
    "ready to eat" -> "Salades, pizza, maaltijden",
    "seizoen" -> "Seizoensartikelen",
    "kerst" -> "Seizoensartikelen",
    "paas" -> "Seizoensartikelen",
    "pasen" -> "Seizoensartikelen",
    "sint" -> "Seizoensartikelen",
    "sinterklaas" -> "Seizoensartikelen",
    "bbq" -> "Seizoensartikelen",
    "feest" -> "Seizoensartikelen",
    "snoep" -> "Snoep, chocolade, koek",
    "chocolade" -> "Snoep, chocolade, koek",
    "koek" -> "Snoep, chocolade, koek",
    "koekjes" -> "Snoep, chocolade, koek",
    "zoetwaren" -> "Snoep, chocolade, koek",
    "soep" -> "Soepen, sauzen, kruiden, olie",
    "saus" -> "Soepen, sauzen, kruiden, olie",
    "sauzen" -> "Soepen, sauzen, kruiden, olie",
    "kruiden" -> "Soepen, sauzen, kruiden, olie",
    "specerijen" -> "Soepen, sauzen, kruiden, olie",
    "olie" -> "Soepen, sauzen, kruiden, olie",
    "azijn" -> "Soepen, sauzen, kruiden, olie",
    "conserven" -> "Soepen, sauzen, kruiden, olie",
    "tussendoor" -> "Tussendoortjes",
    "snack" -> "Tussendoortjes",
    "koeken" -> "Tussendoortjes",
    "repen" -> "Tussendoortjes",
    "vegetarisch" -> "Vegetarisch, vegan en plantaardig",
    "vegan" -> "Vegetarisch, vegan en plantaardig",
    "veggie" -> "Vegetarisch, vegan en plantaardig",
    "veganistisch" -> "Vegetarisch, vegan en plantaardig",
    "plantaardig" -> "Vegetarisch, vegan en plantaardig",
    "vega" -> "Vegetarisch, vegan en plantaardig",
    "vlees" -> "Vlees, vis",
    "kip" -> "Vlees, vis",
    "rundvlees" -> "Vlees, vis",
    "varkensvlees" -> "Vlees, vis",
    "gehakt" -> "Vlees, vis",
    "vis" -> "Vlees, vis",
    "zeevruchten" -> "Vlees, vis",
    "seafood" -> "Vlees, vis",
    "wijn" -> "Wijn en bubbels",
    "bubbels" -> "Wijn en bubbels",
    "champagne" -> "Wijn en bubbels",
    "prosecco" -> "Wijn en bubbels",
    "cava" -> "Wijn en bubbels",
    "zuivel" -> "Zuivel, eieren, boter",
    "melk" -> "Zuivel, eieren, boter",
    "yoghurt" -> "Zuivel, eieren, boter",
    "boter" -> "Zuivel, eieren, boter",
    "margarine" -> "Zuivel, eieren, boter",
    "eieren" -> "Zuivel, eieren, boter",
    // NOTE: the reference re-declares 'kaas' here mapping to Zuivel; in a JS
    // object that would overwrite, but this list feeds a Map built in
    // insertion order where the FIRST 'kaas' (→ Kaas, vleeswaren, tapas)
    // already claimed the key — reference uses a JS Map with set(), so the
    // LAST wins there. Mirror that with an explicit overwrite below.
    "kaas" -> "Zuivel, eieren, boter",
    "dairy" -> "Zuivel, eieren, boter",
    "trotsvanaldi" -> "Aardappel, groente, fruit",
    "trots aldi" -> "Aardappel, groente, fruit", // 'trots van aldi' normalized ('van' is a stop word)
    "bier likeuren" -> "Bier en aperitieven",
    "zonnebrand" -> "Drogisterij",
    "groente aardappelen" -> "Aardappel, groente, fruit",
    "groente aardappel" -> "Aardappel, groente, fruit",
    "fruit verse sappen" -> "Aardappel, groente, fruit",
    "verse sappen" -> "Aardappel, groente, fruit",
    "bier wijn aperitieven" -> "Bier en aperitieven",
    "koek snoep chocolade" -> "Snoep, chocolade, koek",
    "borrel chips snacks" -> "Chips, noten, toast, popcorn",
    "borrel" -> "Chips, noten, toast, popcorn",
    "snacks" -> "Chips, noten, toast, popcorn",
    "frisdrank sappen water" -> "Frisdrank, sappen, siropen, water",
    "gezondheid sport" -> "Gezondheid, sport",
    "zuivel eieren" -> "Zuivel, eieren, boter",
    "maaltijden salades" -> "Salades, pizza, maaltijden",
    "ontbijtgranen beleg" -> "Ontbijtgranen en beleg",
    "vis schaal schelpdieren" -> "Vlees, vis",
    "schaal schelpdieren" -> "Vlees, vis",
    "schelpdieren" -> "Vlees, vis",
    "vegetarisch vegan" -> "Vegetarisch, vegan en plantaardig",
    "huisdieren" -> "Huisdier")

  /** The lookup map built like the reference's JS `Map.set` loop over
    * normalized patterns: last duplicate wins, first-insertion order kept.
    * ('kaas' → Zuivel; 'seizoen' appears twice with same target; 'bier en
    * likeuren' normalizes to the same key as 'bier likeuren'.) */
  val commonMappings: Vector[(String, String)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    commonPatterns.foreach { case (p, t) => m(normalizeString(p)) = t }
    m.toVector
  }
  private val commonMap: Map[String, String] = commonMappings.toMap

  def levenshtein(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val prev = new Array[Int](b.length + 1)
    val curr = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      curr(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(curr, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  def fuzzyScore(a: String, b: String): Double =
    if (a.isEmpty || b.isEmpty) 0
    else 1.0 - levenshtein(a, b).toDouble / math.max(a.length, b.length)

  /** C7 (normalizer.ts:530-546): argmax similarity over the 26 categories on
    * normalized strings; strictly-greater keeps the first best; default AGF. */
  // (category, its normalized form) precomputed once — the fuzzy argmax
  // re-normalized all 26 candidates on every call
  private val normalizedFinals: Vector[(String, String)] =
    finalCategories.map(fc => fc -> normalizeString(fc)).toVector

  def findBestCategoryMatch(category: String): String = {
    val normIn = normalizeString(category)
    var best = defaultCategory
    var bestScore = 0.0
    normalizedFinals.foreach { case (fc, nfc) =>
      val s = fuzzyScore(normIn, nfc)
      if (s > bestScore) { bestScore = s; best = fc }
    }
    best
  }

  final case class CategoryResult(category: String, method: String)

  /** The deterministic cascade C1–C5+C7 (normalizer.ts:395-483), with the ML
    * steps factored out: `mlPrediction` is the already-joined (category,
    * confidence) for this title, or None. Returns the final category plus the
    * mapping method for the C9 side output. */
  def normalizeCategory(
      title: String,
      currentCategory: String,
      shopType: String,
      mlPrediction: Option[(String, Double)] = None,
      confidenceThreshold: Double = 0.65): CategoryResult = {

    def mlMapped(cat: String): String = mapMlPredictionToFinalCategory(cat)

    if (currentCategory == null || currentCategory.trim.isEmpty) {
      val r = mlPrediction.collect {
        case (c, conf) if conf >= confidenceThreshold && title != null && title.nonEmpty =>
          mlMapped(c)
      }
      return CategoryResult(r.getOrElse(defaultCategory), if (r.isDefined) "ml" else "default")
    }

    exactMatchMap.get(currentCategory.toLowerCase)
      .foreach(c => return CategoryResult(c, "direct"))

    val normalizedInput = normalizeString(currentCategory)
    normalizedCategoryMap.get(normalizedInput)
      .foreach(c => return CategoryResult(c, "direct"))

    commonMap.get(normalizedInput)
      .foreach(c => return CategoryResult(c, "direct"))

    commonMappings.collectFirst {
      case (p, t) if normalizedInput.contains(p) || p.contains(normalizedInput) => t
    }.foreach(c => return CategoryResult(c, "partial"))

    if (shopType == "ALDI" &&
        (normalizedInput.contains("trots") || normalizedInput.contains("aldi"))) {
      val r = mlPrediction.collect {
        case (c, conf) if conf >= 0.4 && title != null && title.nonEmpty => mlMapped(c)
      }
      return CategoryResult(r.getOrElse(defaultCategory), "special_case")
    }

    mlPrediction.collect {
      case (c, conf) if conf >= confidenceThreshold && title != null && title.nonEmpty =>
        mlMapped(c)
    }.foreach(c => return CategoryResult(c, "ml"))

    CategoryResult(findBestCategoryMatch(currentCategory), "fuzzy")
  }

  /** normalizer.ts:489-528 — map an ML-predicted category label into the
    * final space via the same normalized/common/partial/fuzzy ladder. */
  def mapMlPredictionToFinalCategory(mlCategory: String): String = {
    if (finalCategories.contains(mlCategory)) return mlCategory
    val n = normalizeString(mlCategory)
    normalizedCategoryMap.get(n).foreach(c => return c)
    commonMap.get(n).foreach(c => return c)
    commonMappings.collectFirst {
      case (p, t) if n.contains(p) || p.contains(n) => t
    }.foreach(c => return c)
    findBestCategoryMatch(mlCategory)
  }
}
