package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The simhash Expression must agree with the JVM function it wraps
  * ([[graft.functions.Text.simhashBits]]) under both codegen and
  * interpreted eval, and handle NULL like the UDF it replaced. */
class SimhashSpec extends SparkSpec {
  import spark.implicits._

  test("parity with Text.simhashBits via the SQL registry entry") {
    val texts = Seq("hello world", "hello  world", "one", "",
      "a b c d e f g h", "unicode éü tokens")
    val got = texts.toDF("t")
      .select($"t", call_function("simhash", $"t").as("sh"))
      .as[(String, String)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == graft.functions.Text.simhashBits(t), s"for <$t>")
      assert(got(t).length == 64 && got(t).forall(c => c == '0' || c == '1'))
    }
  }

  test("null in, null out") {
    val r = spark.sql("SELECT simhash(CAST(NULL AS STRING)) AS v")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    // nullSafeEval is exercised directly (no codegen context)
    val e = Simhash(org.apache.spark.sql.catalyst.expressions.Literal("x y x"))
    assert(e.eval(null) ==
      org.apache.spark.unsafe.types.UTF8String.fromString(
        graft.functions.Text.simhashBits("x y x")))
  }
}
