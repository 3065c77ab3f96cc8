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

  /** X1 (string.ts:51-59): lowercase, non-alnum runs → single space, trim. */
  def normalizeString(s: String): String = {
    if (s == null) return ""
    s.toLowerCase.trim
      .replaceAll("[^a-z0-9]+", " ")
      .replaceAll("\\s+", " ")
      .trim
  }

  /** X2 (string.ts:68-107): Levenshtein similarity `1 - dist/maxLen`. */
  def similarity(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) 0
    else 1.0 - Categories.levenshtein(a, b).toDouble / math.max(a.length, b.length)
  }

  /** X3: all numbers in a string (string.ts:115-121). */
  def extractNumbers(s: String): Seq[Double] = {
    if (s == null) return Nil
    "[-+]?\\d*\\.?\\d+".r.findAllIn(s).toSeq.map(_.toDouble)
  }

  /** X3: strip currency/noise, comma decimal → dot, parse; 0 on failure
    * (string.ts:152-165). NOTE: JS replaces only the FIRST comma. */
  def parsePrice(s: String): Double = {
    if (s == null || s.isEmpty) return 0
    val cleaned = s.replaceAll("[^0-9.,]", "").replaceFirst(",", ".")
    // JS parseFloat reads the longest valid numeric prefix.
    "^[0-9]*\\.?[0-9]+".r.findFirstIn(cleaned).map(_.toDouble).getOrElse(0)
  }

  def camelToSnake(s: String): String =
    s.replaceAll("([A-Z])", "_$1").toLowerCase

  def snakeToCamel(s: String): String =
    "_([a-z])".r.replaceAllIn(s, m => m.group(1).toUpperCase)

  /** X6 (database-processor-adapter.ts:604-611): strip everything but digits,
    * dot, minus, then parse the leading number; 0 on failure. */
  def parseNumber(s: String): Double = {
    if (s == null) return 0
    val cleaned = s.replaceAll("[^0-9.-]", "")
    "^-?[0-9]*\\.?[0-9]+".r.findFirstIn(cleaned).map(_.toDouble).getOrElse(0)
  }
}
