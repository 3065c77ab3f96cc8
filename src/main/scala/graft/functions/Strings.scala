package graft.functions

/** String scalar functions (SURVEY.md §2.7 X1–X3, X5–X6).
  *
  * Reference: `projects/processor/src/utils/string.ts` and the content-hash
  * helpers in `src/adapters/database-processor-adapter.ts:587-611`. In Spark
  * plans, prefer the built-ins (`lower`, `regexp_replace`, `levenshtein`,
  * `sha2`) — these JVM twins exist for the UDF-only paths and for unit tests
  * that pin semantics.
  */
object Strings {

  // precompiled once — String.replaceAll/replaceFirst compile per call,
  // a per-row cost where these run inside UDFs
  private val nonAlnumRe = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val numRe = "[-+]?\\d*\\.?\\d+".r
  private val priceNoiseRe = java.util.regex.Pattern.compile("[^0-9.,]")
  private val priceLeadRe = "^[0-9]*\\.?[0-9]+".r
  private val upperRe = java.util.regex.Pattern.compile("([A-Z])")
  private val numberNoiseRe = java.util.regex.Pattern.compile("[^0-9.-]")
  private val numberLeadRe = "^-?[0-9]*\\.?[0-9]+".r

  /** X1 (string.ts:51-59): lowercase, non-alnum runs → single space, trim. */
  def normalizeString(s: String): String = {
    if (s == null) return ""
    val a = nonAlnumRe.matcher(s.toLowerCase.trim).replaceAll(" ")
    wsRe.matcher(a).replaceAll(" ").trim
  }

  /** X2 (string.ts:68-107): Levenshtein similarity `1 - dist/maxLen`. */
  def similarity(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0
    else 1.0 - Categories.levenshtein(a, b).toDouble / math.max(a.length, b.length)
  }

  /** X3: all numbers in a string (string.ts:115-121). */
  def extractNumbers(s: String): Seq[Double] = {
    if (s == null) return Nil
    numRe.findAllIn(s).toSeq.map(_.toDouble)
  }

  /** X3: strip currency/noise, comma decimal → dot, parse; 0 on failure
    * (string.ts:152-165). NOTE: JS replaces only the FIRST comma. */
  def parsePrice(s: String): Double = {
    if (s == null || s.isEmpty) return 0
    val stripped = priceNoiseRe.matcher(s).replaceAll("")
    val ci = stripped.indexOf(',')
    val cleaned =
      if (ci < 0) stripped
      else stripped.substring(0, ci) + "." + stripped.substring(ci + 1)
    // JS parseFloat reads the longest valid numeric prefix.
    priceLeadRe.findFirstIn(cleaned).map(_.toDouble).getOrElse(0)
  }

  def camelToSnake(s: String): String =
    upperRe.matcher(s).replaceAll("_$1").toLowerCase

  def snakeToCamel(s: String): String =
    "_([a-z])".r.replaceAllIn(s, m => m.group(1).toUpperCase)

  /** X6 (database-processor-adapter.ts:604-611): strip everything but digits,
    * dot, minus, then parse the leading number; 0 on failure. */
  def parseNumber(s: String): Double = {
    if (s == null) return 0
    val cleaned = numberNoiseRe.matcher(s).replaceAll("")
    numberLeadRe.findFirstIn(cleaned).map(_.toDouble).getOrElse(0)
  }
}
