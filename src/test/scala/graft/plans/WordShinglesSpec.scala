package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The word_shingles Expression must agree with the JVM function it wraps
  * ([[graft.functions.Text.shingles]]) — and with the HOF chain it
  * replaced in [[graft.etl.Similarity.explodeShingles]] — under both eval
  * paths, including the edge cases the chain handled (multi-space runs,
  * too-short text, duplicate shingles). */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq("a b c d", "a  b   c", "a b a b a b", "one two",
    "", "   ", "x", "repeat repeat repeat repeat")

  test("parity with Text.shingles via the SQL registry entry") {
    val got = texts.toDF("t")
      .select($"t", call_function("word_shingles", $"t", lit(3)).as("sh"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach { t =>
      assert(got(t) == graft.functions.Text.shingles(t, 3).toSeq, s"for <$t>")
    }
  }

  test("parity with the replaced HOF chain, n = 2") {
    val toks = filter(split($"t", " "), x => x =!= "")
    val hof = array_distinct(
      when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => array_join(slice(toks, i + 1, lit(2)), " ")))
        .otherwise(array().cast("array<string>")))
    val rows = texts.toDF("t")
      .select($"t", call_function("word_shingles", $"t", lit(2)).as("a"),
        hof.as("b"))
      .as[(String, Seq[String], Seq[String])].collect()
    rows.foreach { case (t, a, b) => assert(a == b, s"for <$t>") }
  }

  test("word_ngrams keeps multiplicity and order (Text.ngrams parity)") {
    val got = texts.toDF("t")
      .select($"t", call_function("word_ngrams", $"t", lit(2)).as("g"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach { t =>
      assert(got(t) == graft.functions.Text.ngrams(t, 2).toSeq, s"for <$t>")
    }
    assert(got("a b a b a b") ==
      Seq("a b", "b a", "a b", "b a", "a b"))
  }

  test("null in, null out; interpreted eval agrees") {
    val r = spark.sql("SELECT word_shingles(CAST(NULL AS STRING), 3) AS v")
      .collect().head
    assert(r.isNullAt(0))
    val e = WordShingles(
      org.apache.spark.sql.catalyst.expressions.Literal("x y z w"), 2)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
    assert(got.toSeq == Seq("x y", "y z", "z w"))
  }
}
