package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level vocabulary, feature-encoding, and boilerplate operators —
  * the dataset-wide half of the text-curation surface ([[Corpus]] holds the
  * per-document half). All outputs are integers or strings; ratios stay as
  * (numerator, denominator) pairs or pre-scaled integer quotients so the
  * cross-engine oracle compare is exact.
  */
object Vocab {

  /** (doc_id, pos, gram) sliding word n-grams; pos is 1-based. Same
    * constant-evaluation shape as [[Corpus.bigramsOf]] (slices, not a
    * per-element lambda over the token array). */
  private[graft] def ngramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    val grams = (0 until n).map { i =>
      val len = greatest(size(toks) - (n - 1), lit(0))
      slice(toks, lit(i + 1), len)
    }.reduce((a, b) => zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    docs.select(col(idCol), posexplode(grams).as(Seq("pos0", "gram")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gram"))
  }

  /** Dataset-level boilerplate audit (the cross-document analogue of the
    * Gopher intra-document repetition gates in [[Corpus.repetitionStats]]):
    * an n-gram is boilerplate when it appears in more than |docs|/freqDiv
    * distinct documents; per document, report total n-gram positions and
    * how many land on a boilerplate gram. The gram→doc-count aggregation
    * is combiner-friendly (distinct (doc,gram) then count by gram) and the
    * flag join is on the gram key — no all-pairs anything. */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, freqDiv: Int = 25): DataFrame = {
    val grams = ngramRows(docs, idCol, textCol, n)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val flagged = grams.select(col(idCol), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("n_docs_with"))
      .join(broadcast(nDocs))
      .filter(col("n_docs_with") * freqDiv > col("n_docs"))
      .select(col("gram"), lit(1).as("is_boiler"))
    grams.join(flagged, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("is_boiler")), lit(0L)).cast("long").as("n_boiler"))
  }

  /** Benchmark decontamination: per NON-eval document, how many of its
    * distinct word n-grams also occur in the eval split (`evalPred` rows),
    * plus a 0/1 contaminated flag. Eval sets are small by construction, so
    * their gram set broadcasts and the corpus never shuffles for the
    * overlap join; the distinct (doc, gram) pass and the per-doc count are
    * the only shuffles. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column, n: Int = 4): DataFrame = {
    val grams = ngramRows(docs, idCol, textCol, n)
      .select(col(idCol), col("gram")).distinct()
    val evalGrams = docs.filter(evalPred)
      .select(col(idCol)).join(grams, idCol)
      .select(col("gram")).distinct()
    val hits = docs.filter(!evalPred).select(col(idCol)).join(grams, idCol)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    docs.filter(!evalPred).select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n"), lit(0L)).as("n_shared"),
        when(coalesce(col("n"), lit(0L)) > 0, lit(1)).otherwise(lit(0))
          .as("contaminated"))
  }

  /** Hashing-trick feature counts: token → bucket via the repo's standard
    * cross-engine hash (first 4 sha256 hex digits, Strings/TrainingData
    * train-split recipe) mod `buckets`; output (doc, bucket, n). Bounded
    * output — ≤ buckets rows per doc — and one combiner-friendly shuffle. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    val bucket = conv(substring(sha2(col("token"), 256), 1, 4), 16, 10)
      .cast("long") % buckets
    docs.select(col(idCol), explode(Corpus.tokensOf(col(textCol))).as("token"))
      .select(col(idCol), bucket.as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Global frequency-ranked vocabulary: token_id 1.. by (count DESC,
    * token ASC). The ranking window runs over the DISTINCT-TERM table —
    * vocabulary-sized, not corpus-sized (a 100 TB corpus has a ~10⁷-term
    * vocabulary; ranking that on one partition is a few hundred MB, the
    * corpus-sized explode before it is the distributed part). */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(Corpus.tokensOf(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))))
  }

  /** Encode documents as (doc, pos, token_id) against the global
    * [[vocabulary]] — the id-mapping side of tokenization (broadcast dim
    * join; the vocabulary is small by construction). */
  def encode(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val vocab = vocabulary(docs, textCol).select(col("token"), col("token_id"))
    docs.select(col(idCol),
        posexplode(Corpus.tokensOf(col(textCol))).as(Seq("pos0", "token")))
      .join(broadcast(vocab), "token")
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("token_id"))
  }

  /** Bigram association strength as a pre-scaled integer PMI ratio:
    * score = (c_xy · N · scale) div (c_x · c_y), monotone in pointwise
    * mutual information (log of the same ratio) — ranking and
    * thresholding need the ratio, not the log, and the integer form
    * crosses engines exactly. N is the total token count. */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5, scale: Long = 100): DataFrame = {
    val toks = Corpus.tokensOf(col(textCol))
    val uni = docs.select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n = docs.select(explode(toks).as("t")).agg(count(lit(1)).as("n"))
    val bi = docs.select(explode(Corpus.bigramsOf(toks)).as("xy"))
      .groupBy(col("xy")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .withColumn("x", split(col("xy"), " ").getItem(0))
      .withColumn("y", split(col("xy"), " ").getItem(1))
    bi.join(broadcast(uni.select(col("t").as("x"), col("c").as("c_x"))), "x")
      .join(broadcast(uni.select(col("t").as("y"), col("c").as("c_y"))), "y")
      .join(broadcast(n))
      .select(col("xy"), col("c_xy"),
        expr(s"(c_xy * n * $scale) div (c_x * c_y)").as("pmi_scaled"))
  }
}
