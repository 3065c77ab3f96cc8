package graft.functions

/** Unit normalization + quantity standardization (SURVEY.md §2.6 U1–U4).
  *
  * Semantics derived from the reference's unit config and calculate-fields
  * stage (`projects/processor/src/config/units.ts:14-198`,
  * `src/utils/calculate-fields.ts:232-475`): alias table → standard codes,
  * category dispatch to kg/l/m/m²/stuk with 0.001 floors, the 10000 cap on
  * price-per-unit, and 2dp/1dp half-up rounding.
  *
  * Pure JVM functions so they are unit-testable in isolation and cheap to
  * call from a Spark UDF (no Python/serialization cost; the alias map is a
  * per-JVM immutable singleton, effectively a broadcast).
  */
object Units {

  /** Alias → standard unit code, in declaration order (units.ts:14-98). The
    * reference iterates the JS object literal in insertion order for the
    * partial-containment scan, so order is semantic: first containing key wins.
    */
  val orderedMappings: Vector[(String, String)] = {
    def m(aliases: Seq[String], std: String) = aliases.map(_ -> std)
    (
      // weight
      m(Seq("gram", "gr", "grs", "grams", "gramm", "g", "gm", "grammes", "grm", "grammi"), "g") ++
      m(Seq("kilogram", "kilo", "kgrams", "kilos", "kg", "kgs", "kilograms", "kilogrammes"), "kg") ++
      m(Seq("ounce", "oz", "ounces"), "oz") ++
      m(Seq("pound", "lb", "lbs", "pounds"), "lb") ++
      m(Seq("mg", "milligram", "milligrams"), "mg") ++
      // volume
      m(Seq("liter", "liters", "litre", "litres", "lt", "l", "ltr", "litro", "litros"), "l") ++
      m(Seq("milliliter", "milliliters", "millilitre", "millilitres", "mililiters", "ml", "mls", "mililitro"), "ml") ++
      m(Seq("centiliter", "centiliters", "centilitre", "centilitres", "cl", "cls", "centilitro"), "cl") ++
      m(Seq("deciliter", "deciliters", "decilitre", "decilitres", "dl", "dls", "decilitro"), "dl") ++
      m(Seq("fluid ounce", "fl oz", "fl. oz."), "fl oz") ++
      m(Seq("gallon", "gal", "gallons"), "gal") ++
      m(Seq("pint", "pt", "pints"), "pt") ++
      m(Seq("quart", "qt", "quarts"), "qt") ++
      // pieces / counts / packaging / usage / misc / produce
      m(Seq(
        "stuk", "stuks", "st", "stks", "piece", "pieces", "pc", "pcs",
        "item", "items", "each", "ea", "count", "ct", "cnt", "aantal",
        "unit", "units", "eenheid", "eenheden", "single", "singles", "enkelvoud",
        "pack", "packs", "pak", "pakken", "multipack", "multipak", "multi-pack",
        "duo", "trio", "quad", "set", "twin", "double", "triple", "dubbel",
        "2-pack", "3-pack", "4-pack", "6-pack", "8-pack", "10-pack", "12-pack", "24-pack",
        "rol", "roll", "rolls", "rollen", "fles", "bottle", "bottles", "flessen",
        "doos", "box", "boxes", "dozen", "zak", "bag", "bags", "zakken",
        "zakje", "sachet", "sachets", "zakjes", "blik", "can", "cans", "blikken",
        "pot", "jar", "jars", "potten", "tube", "tubes", "tuben",
        "verpakking", "package", "packages", "pakket", "packet", "packets",
        "doseringen", "dosering", "dose", "doses", "portion", "portions",
        "capsule", "capsules", "cap", "caps", "tablet", "tablets", "tab", "tabs",
        "tabletten", "tabletjes", "pil", "pillen", "plakje", "plakjes", "slice", "slices",
        "wasbeurt", "wasbeurten", "wash", "washes", "gebruik", "gebruiken", "use", "uses",
        "toepassing", "toepassingen", "application", "persoon", "personen", "pers", "person",
        "portie_unit", "porties_unit", "serving", "servings", "maaltijd", "maaltijden", "meal", "meals",
        "paar", "pair", "pairs", "paren", "artikel", "artikelen", "article", "articles",
        "bosje", "bos", "bunch", "bunches", "tros", "trossen", "cluster", "clusters",
        "stengel", "stengels", "stalk", "stalks", "krop", "kroppen", "head", "heads"), "stuk") ++
      // area
      m(Seq("vierkante meter", "m2", "sq m", "square meter", "m²", "sqm",
        "square meters", "vierkante meters"), "m2") ++
      // length (declared last so bare 'm' resolves to meter, as in the reference)
      m(Seq("meter", "m", "meters", "metre", "metres"), "m") ++
      m(Seq("centimeter", "cm", "centimeters", "centimetre"), "cm") ++
      m(Seq("millimeter", "mm", "millimeters", "millimetre"), "mm")
    ).toVector
  }

  val unitMappings: Map[String, String] = orderedMappings.toMap

  val standardUnits: Seq[String] = Seq("kg", "l", "stuk")

  val weightFactors: Map[String, Double] =
    Map("g" -> 1, "mg" -> 0.001, "kg" -> 1000, "oz" -> 28.35, "lb" -> 453.59, "t" -> 1000000)
  val volumeFactors: Map[String, Double] =
    Map("ml" -> 1, "cl" -> 10, "dl" -> 100, "l" -> 1000, "fl oz" -> 29.57,
      "pt" -> 473.18, "qt" -> 946.35, "gal" -> 3785.41)
  val lengthFactors: Map[String, Double] =
    Map("mm" -> 1, "cm" -> 10, "m" -> 1000, "in" -> 25.4, "ft" -> 304.8)
  val areaFactors: Map[String, Double] =
    Map("mm2" -> 1, "cm2" -> 100, "m2" -> 1000000)

  private val unitCategories: Seq[(String, Seq[String])] = Seq(
    "weight" -> Seq("g", "mg", "kg", "oz", "lb", "t"),
    "volume" -> Seq("ml", "cl", "dl", "l", "fl oz", "pt", "qt", "gal"),
    "length" -> Seq("mm", "cm", "m", "in", "ft"),
    "area" -> Seq("mm2", "cm2", "m2"),
    "piece" -> Seq("stuk"))

  /** units.ts:159-186 — direct table membership, then prefix-regex inference,
    * default piece. */
  def unitCategory(unit: String): String = {
    val u = unit.toLowerCase
    unitCategories.collectFirst { case (cat, us) if us.contains(u) => cat }.getOrElse {
      if ("^(g|kg|mg|oz|lb|gram|kilo)".r.findFirstIn(u).isDefined) "weight"
      else if ("^(l|ml|cl|dl|liter|gallon|pint|quart)".r.findFirstIn(u).isDefined) "volume"
      else if ("^(m$|mm$|cm$|meter|foot|feet|inch)".r.findFirstIn(u).isDefined) "length"
      else if ("^(m2|m²|sq|square)".r.findFirstIn(u).isDefined) "area"
      else "piece"
    }
  }

  private val multiPackRe = "(?i)(\\d+)\\s*x\\s*(\\d+(?:\\.\\d+)?)\\s*([a-z]+)".r
  private val packSizeRe = "(?i)(\\d+)[\\s-]*(pack|stuks|pieces|items)".r
  // precompiled clean-up patterns (String.replaceAll compiles per call)
  private val perPrefixRe = java.util.regex.Pattern.compile("^per\\s+")
  private val punctRe = java.util.regex.Pattern.compile("[.,;:()]")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")

  /** U1 (calculate-fields.ts:341-403): clean → multi-pack item unit → exact
    * alias → partial containment (first declared key wins) → N-pack →
    * already-standard → default `stuk`. */
  def normalizeUnit(unit: String): String = {
    if (unit == null || unit.isEmpty) return "stuk"
    val clean = wsRe.matcher(punctRe.matcher(
        perPrefixRe.matcher(unit.toLowerCase.trim).replaceAll(""))
      .replaceAll("")).replaceAll(" ")
    multiPackRe.findFirstMatchIn(clean) match {
      case Some(mm) if unitMappings.contains(mm.group(3)) => return unitMappings(mm.group(3))
      case _ =>
    }
    unitMappings.get(clean).foreach(v => return v)
    orderedMappings.collectFirst { case (k, v) if clean.contains(k) => v }.foreach(v => return v)
    if (packSizeRe.findFirstMatchIn(clean).isDefined) return "stuk"
    if (standardUnits.contains(clean)) clean else "stuk"
  }

  final case class StandardQuantity(amount: Double, unit: String, conversionFactor: Double)

  /** U2 (calculate-fields.ts:232-332): normalize the unit, dispatch on its
    * category, convert to the standard unit with a 0.001 floor (piece floor 1). */
  def standardizeQuantity(amount: Double, unit: String): StandardQuantity = {
    if (amount <= 0 || unit == null || unit.isEmpty || amount.isNaN)
      return StandardQuantity(1, "stuk", 1)
    val norm = normalizeUnit(unit)
    unitCategory(norm) match {
      case "weight" =>
        val cf = math.max(amount * weightFactors.getOrElse(norm, 1.0) / 1000, 0.001)
        StandardQuantity(cf, "kg", cf)
      case "volume" =>
        val cf = math.max(amount * volumeFactors.getOrElse(norm, 1.0) / 1000, 0.001)
        StandardQuantity(cf, "l", cf)
      case "length" =>
        val cf = math.max(amount * lengthFactors.getOrElse(norm, 1.0) / 1000, 0.001)
        StandardQuantity(cf, "m", cf)
      case "area" =>
        val cf = math.max(amount * areaFactors.getOrElse(norm, 1.0) / 1000000, 0.001)
        StandardQuantity(cf, "m2", cf)
      case _ =>
        val a = math.max(amount, 1)
        StandardQuantity(a, "stuk", a)
    }
  }

  /** JS `toFixed(n)` parity for positive prices: HALF_UP over the EXACT
    * binary value (`new java.math.BigDecimal(x)`, not the shortest-repr
    * valueOf constructor). The two constructors differ only at decimal-repr
    * ties — (1.005).toFixed(2) is "1.00" in JS because the double is just
    * below the tie, which the exact-binary constructor reproduces while
    * shortest-repr ("1.005" → 1.01) would not. Oracle inputs avoid ties by
    * construction regardless (integer-cents money). */
  def roundN(x: Double, n: Int): Double =
    new java.math.BigDecimal(x)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  /** U3 (calculate-fields.ts:412-447): price / conversionFactor with a 0.001
    * minimum factor, 10000 cap, 2dp rounding; invalid price → 0. */
  def pricePerUnit(price: Double, conversionFactor: Double): Double = {
    if (price.isNaN || price.isInfinite || price <= 0) return 0
    val cf = if (conversionFactor.isNaN || conversionFactor.isInfinite || conversionFactor <= 0) 0.001
             else conversionFactor
    val r = price / cf
    if (r.isInfinite || r <= 0) 0
    else if (r > 10000) 10000
    else roundN(r, 2)
  }

  final case class DiscountMetrics(amount: Double, percentage: Double)

  /** U4 (calculate-fields.ts:452-475): 0 for invalid/inverted prices; amount
    * rounded 2dp, percentage 1dp. */
  def discountMetrics(originalPrice: Double, discountedPrice: Double): DiscountMetrics = {
    if (originalPrice <= 0 || discountedPrice <= 0 ||
        originalPrice.isNaN || discountedPrice.isNaN ||
        discountedPrice >= originalPrice) DiscountMetrics(0, 0)
    else {
      val amount = originalPrice - discountedPrice
      DiscountMetrics(roundN(amount, 2), roundN(amount / originalPrice * 100, 1))
    }
  }
}
