package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact email addresses
  * and NL mobile numbers before text reaches a training mix. Everything is
  * codegen regexp column expressions — scan-only, no shuffle, so the pass
  * rides along with whatever else touches the text.
  *
  * The patterns deliberately stay inside the regex subset where Java's
  * engine and RE2 agree (character classes, bounded repeats, `\b`): both
  * this engine and SQL-engine oracles/colleagues must see identical
  * matches or a redaction diff becomes a silent corpus fork.
  */
object Privacy {

  /** Pragmatic email shape (not RFC 5322 — the corpus-cleaning standard). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NL mobile: 06- plus 8 digits, word-bounded. */
  val PhoneRe = "\\b06-[0-9]{8}\\b"

  /** Adds `n_emails` / `n_phones` match counts and a `redacted` copy of
    * `textCol` with emails replaced by `<EMAIL>` then phones by
    * `<PHONE>` (fixed order — replacement order is part of the
    * contract). */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailRe)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))

  /** l-diversity audit — the release gate k-anonymity (q148) misses: a
    * quasi-identifier group can hold ≥ k rows yet leak the sensitive
    * attribute if all k agree on it. Per QI group: row count, number of
    * distinct sensitive values (distinct l), the dominant sensitive
    * value's share in basis points (the homogeneity-attack surface), and
    * a pass/violates verdict against the required l.
    *
    * Two combiner-friendly shuffles — (QI, sensitive) counts, then the
    * per-QI fold — on aggregate-shrunk rows; nothing is quadratic in
    * group size, so a 10⁹-row QI cell costs what its distinct sensitive
    * domain costs. */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensCol: String,
      l: Int): DataFrame = {
    val qi = qiCols.map(col)
    df.filter(col(sensCol).isNotNull)
      .groupBy(qi :+ col(sensCol): _*)
      .agg(count(lit(1)).as("_sc"))
      .groupBy(qi: _*)
      .agg(sum(col("_sc")).cast("long").as("n"),
        count(lit(1)).as("l_distinct"),
        max(col("_sc")).cast("long").as("top_cnt"))
      .select(qi ++ Seq(col("n"), col("l_distinct"),
        expr("top_cnt * 10000L div n").as("top_share_bp"),
        when(col("l_distinct") >= l, lit("ok"))
          .otherwise(lit("violates")).as("diversity")): _*)
  }
}
