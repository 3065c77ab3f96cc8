package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The hll_regs TypedImperativeAggregate must produce exactly the
  * registers of the declarative `Sketches.hllRegisters` pipeline
  * (bit-identical hash → bucket → max-ρ), stay invariant under
  * repartitioning (the merge path is a register-wise max, so partition
  * boundaries can't show), and skip NULL / negative keys the way the
  * declarative filter does. */
class HllRegsAggSpec extends SparkSpec {
  import spark.implicits._

  test("parity with the declarative register pipeline") {
    val keys = (0L until 1000L).map(k => k * 37 % 5000)
    val df = keys.toDF("k")
    val declarative = graft.etl.Sketches.hllRegisters(df, "k", p = 6)
      .as[(Long, Int)].collect().toMap
    val udaf = df.agg(expr("hll_regs(k, 6)").as("r"))
      .select(posexplode($"r"))
      .as[(Int, Int)].collect().toMap
    (0 until 64).foreach { b =>
      assert(udaf(b) == declarative.getOrElse(b.toLong, 0),
        s"bucket $b")
    }
  }

  test("repartition-invariant: merge path equals single-partition fold") {
    val df = (0L until 500L).toDF("k")
    def regs(parts: Int) = df.repartition(parts)
      .agg(expr("hll_regs(k, 6)").as("r"))
      .select($"r").as[Seq[Int]].collect().head
    assert(regs(1) == regs(13))
  }

  test("NULL and negative keys are skipped") {
    val clean = Seq(5L, 9L).toDF("k")
    val dirty = Seq(Some(5L), Some(9L), None, Some(-3L)).toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.agg(expr("hll_regs(k, 6)").as("r"))
        .select($"r").as[Seq[Int]].collect().head
    assert(regs(dirty) == regs(clean))
  }
}
