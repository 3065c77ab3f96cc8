package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** sha_lanes must be VALUE-IDENTICAL to the sha2/conv/substring SQL recipe
  * it replaced in [[graft.queries.TrainingData.shaLaneSigs]] — the DuckDB
  * oracles of q442/q450/q472 still re-derive lanes from sha256's hex form,
  * so a byte-order or lane-offset slip here is an oracle break, not a perf
  * bug. The spec recomputes the old spelling inline and compares all 32
  * lanes per input. */
class ShaLanesSpec extends SparkSpec {
  import spark.implicits._

  private val inputs =
    Seq("one two three", "a", "", "unicode éü shingle", "0:weird prefix",
      "the quick brown fox", "x y z")

  test("all 32 lanes equal the sha2/conv/substring recipe") {
    val df = inputs.toDF("s").select(
      $"s",
      call_function("sha_lanes", $"s").as("_l"),
      array((0 until 32).map { i =>
        val d = i / 8; val j = i % 8
        expr(s"CAST(conv(substring(sha2(concat('$d:', s), 256), " +
          s"${1 + 8 * j}, 8), 16, 10) AS BIGINT)")
      }: _*).as("_old"))
    val rows = df.as[(String, Seq[Long], Seq[Long])].collect()
    assert(rows.length == inputs.length)
    rows.foreach { case (s, got, old) =>
      assert(got == old, s"lane mismatch for <$s>")
      assert(got.length == 32)
      got.foreach(v => assert(v >= 0L && v <= 0xffffffffL,
        s"lane outside unsigned-32 range for <$s>: $v"))
    }
  }

  test("null in, null out") {
    val r = spark.sql("SELECT sha_lanes(CAST(NULL AS STRING)) AS v")
      .collect().head
    assert(r.isNullAt(0))
  }

  test("interpreted eval path agrees with codegen") {
    val e = ShaLanes(org.apache.spark.sql.catalyst.expressions.Literal("x y"))
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val viaPlan = Seq("x y").toDF("s")
      .select(call_function("sha_lanes", $"s")).as[Seq[Long]].head()
    assert(interpreted.toSeq == viaPlan)
  }
}
