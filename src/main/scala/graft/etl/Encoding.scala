package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-encoding operators for tabular training data: the categorical→
  * numeric transforms a feature pipeline fits on the TRAINING split and
  * applies everywhere, kept in exact integer arithmetic (sums and counts,
  * never a float mean) so encodings are reproducible bit-for-bit across
  * engines and re-runs.
  *
  * The reference has no modeling surface; these belong to the
  * training-data-pipeline layer the builder brief adds on top (same tier
  * as the split/sample operators in [[TrainingData]]).
  *
  * Scale shape shared by both operators: the category statistics table is
  * one map-side-combined aggregation (cardinality = #categories, tiny),
  * broadcast back onto the row stream — no window over a skewed category
  * partition, no per-row state. A 10⁹-row category costs the same one
  * combiner pass as a 10²-row one.
  */
object Encoding {

  /** Leave-one-out target encoding: each row's category is replaced by the
    * mean target of the OTHER rows in that category — the standard
    * high-cardinality encoder, with the row's own target excluded so the
    * encoding does not leak the label it will be asked to predict.
    *
    * The mean is returned as the exact fraction
    * `loo_num / loo_den = (Σ_cat target − target) / (n_cat − 1)` (null for
    * singleton categories, which have no "others" to average) — callers
    * divide at the very end, or feed the fraction onward exact. */
  def looTargetEncode(df: DataFrame, catCol: String,
      targetCol: String): DataFrame = {
    val stats = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_cat"), sum(col(targetCol)).as("_sum"))
    df.join(broadcast(stats), catCol)
      .withColumn("loo_num",
        when(col("n_cat") > 1, col("_sum") - col(targetCol)))
      .withColumn("loo_den", when(col("n_cat") > 1, col("n_cat") - 1))
      .drop("_sum")
  }

  /** Weight-of-evidence encoding of a category against a binary outcome,
    * in floored-log₂ integers: per category,
    *   woe_bits = (⌊log₂good_i⌋ + ⌊log₂Bad⌋) − (⌊log₂bad_i⌋ + ⌊log₂Good⌋)
    * via the `length(bin(·))` recipe on each FACTOR (the product form
    * good_i·Bad reaches N² and overflows long at 10⁹ rows; the decomposed
    * form is within ±1 bit and identical cross-engine), plus the
    * information-value contribution as the exact fraction
    * `iv_num / iv_den = (good_i·Bad − bad_i·Good)·woe_bits / (Good·Bad)`
    * in decimal(38,0) (N²-scale products), whose sum over categories is
    * the quantized IV feature-strength score. Laplace +1 on both counts
    * keeps every log argument positive for categories pure in one
    * class. */
  def woeEncode(df: DataFrame, catCol: String, goodCol: String): DataFrame = {
    val cat = df.groupBy(col(catCol))
      .agg((count(when(col(goodCol), lit(1))) + 1).as("good"),
        (count(when(!col(goodCol), lit(1))) + 1).as("bad"))
    val tot = cat.agg(sum(col("good")).as("_tg"), sum(col("bad")).as("_tb"))
    cat.crossJoin(broadcast(tot))
      .select(col(catCol), col("good"), col("bad"),
        col("_tg").as("good_total"), col("_tb").as("bad_total"),
        (length(expr("bin(good)")) + length(expr("bin(_tb)")) -
          length(expr("bin(bad)")) - length(expr("bin(_tg)")))
          .cast("long").as("woe_bits"))
      .withColumn("iv_num",
        (col("good").cast("decimal(38,0)") * col("bad_total") -
          col("bad").cast("decimal(38,0)") * col("good_total")) *
          col("woe_bits"))
      .withColumn("iv_den",
        col("good_total").cast("decimal(38,0)") * col("bad_total"))
  }
}
