package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The winnow_fps Expression must agree with the Seq-based original
  * ([[graft.functions.Text.winnow]]) under both eval paths, including
  * the shape edges the original encodes: empty text → empty array, text
  * shorter than k → its own single gram, ≤ window grams → one global
  * minimum, first-occurrence-order distinct minima otherwise. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq("", "ab", "abcde", "abcdefgh",
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaa", "repeat repeat repeat repeat",
    "key agg row scan slow fast table value part hash")

  test("parity with Text.winnow across k/window configs") {
    for ((k, w) <- Seq((5, 4), (3, 2), (16, 12), (8, 8))) {
      val got = texts.toDF("t")
        .select($"t",
          call_function("winnow_fps", $"t", lit(k), lit(w)).as("fps"))
        .as[(String, Seq[Long])].collect().toMap
      texts.foreach { t =>
        assert(got(t) == graft.functions.Text.winnow(t, k, w),
          s"for <$t> k=$k w=$w")
      }
    }
  }

  test("null in, null out; interpreted eval agrees with codegen") {
    val r = spark.sql("SELECT winnow_fps(CAST(NULL AS STRING), 5, 4) AS v")
      .collect().head
    assert(r.isNullAt(0))
    val e = Winnow(
      org.apache.spark.sql.catalyst.expressions.Literal("abcdefghij"), 5, 4)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    assert(got.toSeq == graft.functions.Text.winnow("abcdefghij", 5, 4))
  }
}
